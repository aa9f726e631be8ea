#!/bin/bash
# Tail slot (REPLANNED from chimera2048 seed1): the 2048 seed-1 run needs
# ~2h to reach its first hit (seed 0: 6559 s), which no longer fits the
# deadline window; a chimera512 ALL-100 seed-1 run at a reduced 1.6M
# budget DOES fit and composes any-seed hits on top of seed 0's 93/100
# (the 7 misses sit at 0.03-0.07%; a fresh RNG stream re-rolls them).
# Compose with: python scripts/compose_any_seed.py \
#   results/campaign/chimera512_icm_all100.jsonl \
#   results/campaign/chimera512_icm_all100_seed1.jsonl
set -x
cd /root/repo
OUT=results/campaign

rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip chimera512 all100 seed1"; exit 0; fi
t=$((rem - 660))

timeout "$t" python -m nmc_tpu campaign --family chimera512 --instances 100 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --seed 1 \
  --sweeps 1600000 --out $OUT/chimera512_icm_all100_seed1.jsonl \
  || echo "run failed/cut (continuing)"

echo "CHIMERA512 ALL100 SEED1 DONE"
