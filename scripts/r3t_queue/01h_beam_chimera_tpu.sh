#!/bin/bash
# Device tropical-beam sweep of the chimera families (the deterministic
# solver program): chimera2048 first (MCMC's 1/10 family), then 1152,
# then the full 512 set, then DCL. Integer-exact hit checks vs the
# shipped truth states; windowed beam refinement of misses. Resumable
# per instance; each family call is deadline-aware.
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }
DL=$(( ${DEADLINE:-9999999999} - 300 ))

if [ "$(rem)" -lt 1200 ]; then echo "DEADLINE: skip beam sweeps"; exit 0; fi
timeout 10800 python scripts/run_beam_chimera_tpu.py --family chimera2048 \
  --beam 17 --refine-beam 16 --orientations 2 --deadline "$DL" \
  --save-states results/beam_states/chimera2048 || echo "2048 sweep cut"

if [ "$(rem)" -gt 1800 ]; then
  timeout 9000 python scripts/run_beam_chimera_tpu.py --family chimera1152 \
    --beam 17 --refine-beam 16 --orientations 2 --deadline "$DL" \
    --save-states results/beam_states/chimera1152 || echo "1152 sweep cut"
fi

if [ "$(rem)" -gt 1800 ]; then
  timeout 7200 python scripts/run_beam_chimera_tpu.py --family chimera512 \
    --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
    --save-states results/beam_states/chimera512 || echo "512 sweep cut"
fi

for fam in dcl8 dcl16; do
  if [ "$(rem)" -gt 1800 ]; then
    timeout 7200 python scripts/run_beam_chimera_tpu.py --family $fam \
      --beam 16 --refine-beam 15 --orientations 2 --deadline "$DL" \
      --save-states results/beam_states/$fam || echo "$fam sweep cut"
  fi
done
echo "BEAM SWEEPS DONE"
