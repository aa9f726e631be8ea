#!/bin/bash
# Hybrid ICM+NMC arm (VERDICT round-3 item 4): Houdayer disagreement sets
# as heated-cluster masks for NMC phases. Campaign rows at the budgets of
# the round-2 single arms so med-TTS/hit-rate compare directly:
#   dcl8       (NMC won: 20/20, med TTS 32.5s)
#   chimera512 20 instances (ICM won: 19/20, med TTS 330s at this batch)
#   chimera1152 @1.6M (ICM 2/20 at this budget in round 2)
# Run directly or via scripts/r3_queue/ under the chain's deadline gate.
set -x
cd /root/repo
OUT=results/campaign

run_gate() {
  local rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
  if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip $*"; return 0; fi
  local t=$1; shift
  [ "$rem" -lt "$t" ] && t=$rem
  timeout "$t" "$@" || echo "run failed/cut (continuing)"
}

HY="--arm hybrid --subreplicas 2 --nmc-cold 6 --temp-x 20 --trace"

run_gate 2400 python -m nmc_tpu campaign --family dcl8 --instances 20 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 $HY --sweeps 3200000 \
  --out $OUT/dcl8_hybrid_3200k.jsonl

# 20 instances: direct comparison against the round-2 matched rows
# (chimera512_icm_3200k: 19/20, TTS p50 330 s at the same batch size)
run_gate 5400 python -m nmc_tpu campaign --family chimera512 --instances 20 \
  --replicas 32 --beta-max 32 --chunk-rounds 50 $HY --sweeps 3200000 \
  --out $OUT/chimera512_hybrid_3200k.jsonl

echo "HYBRID ARM DONE"
