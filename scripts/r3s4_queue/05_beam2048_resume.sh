#!/bin/bash
# Resume the chimera2048 beam sweep (41/100 done; runner skips
# instances already in the JSONL). ~20% deterministic hit rate so far;
# every completed instance also saves a near-truth state for seeding.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beam 2048 resume"; exit 0; fi
DL=$(( ${DEADLINE:-9999999999} - 2700 ))
t=$(( rem - 2760 ))
[ "$t" -gt 14400 ] && t=14400
timeout "$t" python scripts/run_beam_chimera_tpu.py --family chimera2048 \
  --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/chimera2048 || echo "2048 beam cut"
echo "BEAM 2048 RESUME DONE"
