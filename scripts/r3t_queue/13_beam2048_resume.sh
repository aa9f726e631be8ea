#!/bin/bash
# Resume the chimera2048 beam sweep (cut at 41/100 by the seg2
# deadline; the runner skips instances already in the JSONL). Every
# completed instance adds either a deterministic hit (~20% rate so
# far) or a saved near-truth state for the seeded-ICM closure.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beam 2048 resume"; exit 0; fi
DL=$(( ${DEADLINE:-9999999999} - 300 ))
t=10800; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" python scripts/run_beam_chimera_tpu.py --family chimera2048 \
  --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/chimera2048 || echo "2048 beam cut"
echo "BEAM 2048 RESUME DONE"
