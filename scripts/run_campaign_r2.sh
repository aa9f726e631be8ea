#!/bin/bash
# Round-2 solution-quality campaign of record: PT vs NMC vs ICM at two
# matched sweep budgets over the reference's shipped ground-truth families.
# Each invocation is resumable (instances already in the JSONL are skipped),
# so re-running this script continues where it stopped.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

C512="--family chimera512 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
NMC="--nmc-cold 6 --lbp-every 4"

# --- chimera512: budget A (640k sweeps/chain) and B (3.2M) ---------------
for B in 640000 3200000; do
  TAG=$((B / 1000))k
  timeout 3600 python -m nmc_tpu campaign $C512 --arm pt  --sweeps $B \
    --out $OUT/chimera512_pt_$TAG.jsonl
  timeout 3600 python -m nmc_tpu campaign $C512 --arm nmc $NMC --sweeps $B \
    --out $OUT/chimera512_nmc_$TAG.jsonl
  timeout 5400 python -m nmc_tpu campaign $C512 --arm icm --subreplicas 2 \
    --sweeps $B --out $OUT/chimera512_icm_$TAG.jsonl
done

# --- chimera1152 @3.2M ----------------------------------------------------
C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
timeout 5400 python -m nmc_tpu campaign $C1152 --arm pt  --sweeps 3200000 \
  --out $OUT/chimera1152_pt_3200k.jsonl
timeout 5400 python -m nmc_tpu campaign $C1152 --arm nmc $NMC --sweeps 3200000 \
  --out $OUT/chimera1152_nmc_3200k.jsonl
timeout 7200 python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 \
  --sweeps 3200000 --out $OUT/chimera1152_icm_3200k.jsonl

# --- DCL C8 @3.2M ---------------------------------------------------------
DCL8="--family dcl8 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
timeout 5400 python -m nmc_tpu campaign $DCL8 --arm pt  --sweeps 3200000 \
  --out $OUT/dcl8_pt_3200k.jsonl
timeout 5400 python -m nmc_tpu campaign $DCL8 --arm nmc $NMC --sweeps 3200000 \
  --out $OUT/dcl8_nmc_3200k.jsonl

# --- wishart N=40 alpha sweep (hardness bracket around 0.5) ---------------
for A in 0.30 0.70; do
  for ARM in pt nmc icm; do
    EXTRA=""
    [ $ARM = nmc ] && EXTRA="$NMC"
    [ $ARM = icm ] && EXTRA="--subreplicas 10"
    timeout 3600 python -m nmc_tpu campaign --family wishart_n40_a$A \
      --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 \
      --arm $ARM $EXTRA --sweeps 400000 \
      --out $OUT/wishart_n40_a${A}_${ARM}.jsonl
  done
done
echo CAMPAIGN_DONE
