#!/bin/bash
# Round-3 campaign chain runner.
#
# Priority order from VERDICT.md round-3 list:
#   1. chimera1152 ICM at 10M sweeps (round-2: 2/20 at 1.6M, residuals
#      <=0.14% -- a budget problem). --trace streams per-chunk residual
#      curves so even a deadline-cut run yields the convergence data.
#   2. chimera2048 ICM at 10M sweeps (round-2: 0/10 at 1.6M, residuals
#      0.19-0.34%).
#   3. dynamic queue: consumes scripts/r3_queue/*.sh in sorted order as
#      they appear (wishart hardness surface, hybrid arm, ... -- written
#      and CPU-tested while phases 1-2 hold the chip).
#
# Hard wall-clock deadline so the driver's end-of-round bench.py gets an
# idle chip: nothing new starts within 10 minutes of DEADLINE and every
# solver invocation is timeout-capped at the time remaining.
set -x
cd /root/repo
OUT=results/campaign
QUEUE=scripts/r3_queue
mkdir -p $OUT $QUEUE
export DEADLINE=${DEADLINE:-1786994200}   # ~45 min before round end

run() {  # run <max_seconds> <args...>
  local rem=$((DEADLINE - $(date +%s)))
  if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip $*"; return 1; fi
  local t=$1; shift
  [ "$rem" -lt "$t" ] && t=$rem
  timeout "$t" "$@"
}
export -f run

# ---- phase 1: chimera1152 ICM @10M (est ~2.7h at round-2 rate) -------
# VMEM cap routes the n_pad=1152 dense round kernel to the STREAMED
# variant (the dense one crashes the axon remote-compile helper — same
# workaround as round 2's run_campaign_r2_1152.sh)
C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 25"
run 14400 env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 \
  --sweeps 10000000 --trace --out $OUT/chimera1152_icm_10M.jsonl

# ---- phase 2: chimera2048 ICM @10M (est ~5h at round-2 rate) ---------
C2048="--family chimera2048 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
run 23400 python -m nmc_tpu campaign $C2048 --arm icm --subreplicas 2 \
  --sweeps 10000000 --trace --out $OUT/chimera2048_icm_10M.jsonl

# ---- phase 3+: dynamic queue ----------------------------------------
while :; do
  rem=$((DEADLINE - $(date +%s)))
  [ "$rem" -lt 600 ] && break
  next=$(ls $QUEUE/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$next" ]; then sleep 60; continue; fi
  echo "QUEUE: running $next (rem=${rem}s)"
  bash "$next" > "${next%.sh}.log" 2>&1
  mv "$next" "${next}.done"
done
echo "CHAIN DONE"
