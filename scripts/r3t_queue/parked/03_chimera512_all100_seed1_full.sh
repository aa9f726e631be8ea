#!/bin/bash
# Full rerun of the chimera512 ALL-100 seed-1 row (the r3 chain's copy
# was deadline-cut after ~30 min of the ~95 min needed). Seed-0 solved
# 93/100 with the 7 misses at 0.03-0.07% residual; a fresh RNG stream
# composes toward any-seed 100/100 (scripts/compose_any_seed.py).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1200 ]; then echo "DEADLINE: skip 512 seed1 full"; exit 0; fi
t=7200; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" python -m nmc_tpu campaign --family chimera512 --instances 100 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --seed 1 \
  --sweeps 1600000 --out results/campaign/chimera512_icm_all100_seed1.jsonl \
  || echo "run failed/cut (continuing)"
echo "CHIMERA512 ALL100 SEED1 FULL DONE"
