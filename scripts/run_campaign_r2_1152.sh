#!/bin/bash
# chimera1152 with the round kernel routed to the STREAMED variant
# (NMC_TPU_ROUND_VMEM_CAP below the 6.2 MiB dense estimate): the dense
# round kernel at n_pad=1152 with 20-instance grids crashes the axon
# remote-compile helper regardless of scan chunk (phases 5 and 5b).
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT
export NMC_TPU_ROUND_VMEM_CAP=6000000

DEADLINE=${DEADLINE:-1786949400}
run() {
  local rem=$((DEADLINE - $(date +%s)))
  if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip $*"; return 1; fi
  local t=$1; shift
  [ "$rem" -lt "$t" ] && t=$rem
  timeout "$t" "$@"
}

C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 25"
run 7200 python -m nmc_tpu campaign $C1152 --arm pt --sweeps 1600000 \
  --out $OUT/chimera1152_pt_1600k.jsonl
run 7200 python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera1152_icm_1600k.jsonl
run 7200 python -m nmc_tpu campaign $C1152 --arm nmc --nmc-cold 6 --lbp-every 1 --sweeps 1600000 \
  --out $OUT/chimera1152_nmc_1600k.jsonl

echo P1152_DONE
