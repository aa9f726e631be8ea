#!/bin/bash
# Big-family beam sweeps, retried after the 01h fixes at beam 2^16 (the
# size hardware-proven on C8; 2^17 crashed the TPU worker on the C16
# grid with 33.5M-element sorts). chimera1152 FIRST (12x12 grid, ~2-4x
# cheaper per instance than C16) so at least one big family completes
# all 100 instances before the deadline; 2048 takes whatever remains
# (resumable, partial JSONL is still a result). refine-beam 15 keeps
# the windowed strip sub-solves (each a C{rows}x8 sub-grid, ~half the
# main solve's cells) from dominating miss cost.
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }
DL=$(( ${DEADLINE:-9999999999} - 300 ))

if [ "$(rem)" -lt 1500 ]; then echo "DEADLINE: skip big-family beams"; exit 0; fi
timeout 14400 python scripts/run_beam_chimera_tpu.py --family chimera1152 \
  --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/chimera1152 || echo "1152 sweep cut"

if [ "$(rem)" -gt 1800 ]; then
  timeout 18000 python scripts/run_beam_chimera_tpu.py --family chimera2048 \
    --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
    --save-states results/beam_states/chimera2048 || echo "2048 sweep cut"
fi
echo "BIG FAMILY BEAMS DONE"
