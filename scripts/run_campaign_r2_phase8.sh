#!/bin/bash
# Round-2 campaign phase 8:
# (a) chimera512 NMC at global_beta=3 (the reference's own single-chain
#     chimera choice, chimera_example.py:61): LBP-backbone diagnostics
#     show beta=13.63 marks 74% of spins as backbone (churns most of the
#     system every cycle) vs 25% at beta=3 — test both threshold pairs;
# (b) ICM arms at the 2048-spin scale (ICM swept chimera512 19/20);
# (c) bigger budget (6.4M) for chimera2048 pt+icm — 1.6M got 0 hits.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

C512="--family chimera512 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
timeout 7200 python -m nmc_tpu campaign $C512 --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_gb3_3200k.jsonl
timeout 7200 python -m nmc_tpu campaign $C512 --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_gb3_loose_3200k.jsonl

C2048="--family chimera2048 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
DCL16="--family dcl16 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
timeout 7200 python -m nmc_tpu campaign $C2048 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera2048_icm_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $DCL16 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/dcl16_icm_1600k.jsonl

echo PHASE8_DONE
