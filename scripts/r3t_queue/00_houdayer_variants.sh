#!/bin/bash
# Houdayer perf validation on the real chip, post-land. The variant
# micro-profile already captured before the 20:05 UTC tunnel outage
# (results/houdayer_variants.json, committed); what remains is the
# end-to-end EnsembleICM phase breakdown at chimera2048 with the NEW
# default (matmul neighbor planes) vs round-2's sparse baseline
# (results/icm_phase_breakdown_blocked.json: houdayer 83.6 ms/round).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1200 ]; then echo "DEADLINE: skip houdayer profiles"; exit 0; fi
timeout 900 python scripts/profile_icm_phases.py \
  --out results/icm_phase_breakdown_matmul.json \
  || echo "phase breakdown failed (continuing)"
echo "HOUDAYER PROFILES DONE"
