#!/bin/bash
# Micro-profile of Houdayer label-propagation variants (the measured
# ICM bottleneck: cluster move > full 96-sweep round at 2048 scale).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip houdayer variants"; exit 0; fi
timeout 780 python scripts/profile_houdayer_variants.py \
  --out results/houdayer_variants.json || echo "profile failed (continuing)"
echo "HOUDAYER VARIANTS DONE"
