#!/bin/bash
# Retry the dcl8 device-beam sweep: the first pass tripped the DP
# verify assert on nearly every instance because the bound assumed
# 6-decimal print rounding while DCL files print 5 (1/7 -> 0.14286,
# 2.9e-6/edge). The bound now derives from the actual snap residual;
# error records in the JSONL retry on resume.
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }
DL=$(( ${DEADLINE:-9999999999} - 300 ))

if [ "$(rem)" -lt 1500 ]; then echo "DEADLINE: skip dcl8 retry"; exit 0; fi
timeout 7200 python scripts/run_beam_chimera_tpu.py --family dcl8 \
  --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/dcl8 || echo "dcl8 retry cut"
echo "DCL8 RETRY DONE"
