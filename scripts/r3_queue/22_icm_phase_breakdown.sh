#!/bin/bash
# Locate the non-sweep bottleneck in the EnsembleICM round at 2048 scale
# (round-kernel profile showed only 1.11x end-to-end).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
[ "$rem" -lt 900 ] && { echo "DEADLINE: skip icm phase breakdown"; exit 0; }
timeout 600 python scripts/profile_icm_phases.py \
  || echo "phase breakdown failed (continuing)"
echo "ICM PHASE BREAKDOWN DONE"
