#!/bin/bash
# A/B the new VMEM-resident sparse round kernel vs the streamed slab
# path at chimera2048 scale (and implicitly smoke-test the program the
# deep seed-1 runs at items 05/06 will compile). Runs BEFORE the deep
# runs so a compile regression is caught by a 15-min item, not a 3.5-h
# one.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1500 ]; then echo "DEADLINE: skip resident profile"; exit 0; fi
timeout 1200 python scripts/profile_round2048.py \
  --out results/round2048_profile_resident.json \
  || echo "resident profile failed (continuing)"
echo "RESIDENT PROFILE DONE"
