#!/bin/bash
# Round-2 campaign phase 7: the wishart hardness curve — N=40 alpha sweep
# over the reference's shipped wishart_small grid (hardness peaks near
# alpha ~0.5-0.7; gs_energies.txt exact planted truths per folder).
# alpha 0.30/0.50/0.70 already ran in phases 1-2; fill the curve.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT
W=/root/reference/NPT/examples/wishart_small

NMC="--nmc-cold 6 --lbp-every 1"
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"

for A in 0.20 0.40 0.60 0.80 1.00; do
  F=$W/wishart_planting_N_40_alpha_$A
  [ -d "$F" ] || continue
  timeout 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm pt \
    --out $OUT/wishart_n40_a${A}_pt.jsonl
  timeout 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm nmc $NMC \
    --out $OUT/wishart_n40_a${A}_nmc.jsonl
  timeout 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm icm --subreplicas 2 \
    --out $OUT/wishart_n40_a${A}_icm.jsonl
done

echo PHASE7_DONE
