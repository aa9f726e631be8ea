#!/bin/bash
# Retry of the big-family beam sweeps after the 01h fixes: beam 2^17
# crashed the TPU worker on the C16 grid (33.5M-element sorts), so run
# at 2^16 — the size hardware-proven on C8 — and lean on the windowed
# refinement + second orientation; the 1152 truth-spin parse bug is
# fixed (energy-only truth files -> exact integer target from print).
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }
DL=$(( ${DEADLINE:-9999999999} - 300 ))

if [ "$(rem)" -lt 1500 ]; then echo "DEADLINE: skip big-family beams"; exit 0; fi
timeout 10800 python scripts/run_beam_chimera_tpu.py --family chimera2048 \
  --beam 16 --refine-beam 16 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/chimera2048 || echo "2048 sweep cut"

if [ "$(rem)" -gt 1800 ]; then
  timeout 9000 python scripts/run_beam_chimera_tpu.py --family chimera1152 \
    --beam 16 --refine-beam 16 --orientations 2 --deadline "$DL" \
    --save-states results/beam_states/chimera1152 || echo "1152 sweep cut"
fi
echo "BIG FAMILY BEAMS DONE"
