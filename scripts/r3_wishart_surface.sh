#!/bin/bash
# Wishart (N, alpha) hardness SURFACE (VERDICT round-3 item 5): batch the
# shipped wishart_small grid through the ensemble engines at a matched
# 400k-sweep budget (same budget/params as the round-2 N=40 alpha rows,
# so the two datasets compose into one surface). 3 arms x 21 folders
# (N in {20,30,40} x alpha in {0.20..0.80}); rows that already exist are
# skipped. Run directly or via scripts/r3_queue/ under the chain's
# deadline gate (DEADLINE env).
set -x
cd /root/repo
OUT=results/campaign
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
NMC="--nmc-cold 6 --lbp-every 1"

past_deadline() {
  [ $(( ${DEADLINE:-9999999999} - $(date +%s) )) -lt 600 ]
}

for N in 40 30 20; do
  for A in 0.20 0.30 0.40 0.50 0.60 0.70 0.80; do
    F=$W/wishart_planting_N_${N}_alpha_$A
    [ -d "$F" ] || continue
    for ARM in icm nmc pt; do
      O=$OUT/wishart_n${N}_a${A}_${ARM}.jsonl
      # round-2 rows (and resumed reruns) already done
      [ -s "$O" ] && { echo "skip existing $O"; continue; }
      past_deadline && { echo "DEADLINE: stopping surface"; exit 0; }
      case $ARM in
        icm) EXTRA="--subreplicas 2";;
        nmc) EXTRA="$NMC";;
        pt)  EXTRA="";;
      esac
      # a cell that times out or crashes must NOT abort the grid — the
      # remaining (N, alpha, arm) cells are independent
      timeout 2400 python -m nmc_tpu campaign --folder $F $COMMON \
        --arm $ARM $EXTRA --out $O || echo "cell failed/cut: $O (continuing)"
    done
  done
done
echo "WISHART SURFACE DONE"
