#!/bin/bash
# Wishart (N, alpha) hardness SURFACE (VERDICT round-3 item 5): batch the
# shipped wishart_small grid through the ensemble engines at a matched
# 400k-sweep budget (same budget/params as the round-2 N=40 alpha rows,
# so the two datasets compose into one surface). 3 arms x 21 folders
# (N in {20,30,40} x alpha in {0.20..0.80}); N=40 alpha in
# {0.30,0.40,0.70} rows already exist from round 2 and are skipped.
# Drop into scripts/r3_queue/ to run under the chain's deadline gate.
set -x
cd /root/repo
OUT=results/campaign
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
NMC="--nmc-cold 6 --lbp-every 1"

run_gate() {  # <max_seconds> <args...>  (DEADLINE exported by the chain)
  local rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
  if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip $*"; return 1; fi
  local t=$1; shift
  [ "$rem" -lt "$t" ] && t=$rem
  timeout "$t" "$@"
}

for N in 40 30 20; do
  for A in 0.20 0.30 0.40 0.50 0.60 0.70 0.80; do
    F=$W/wishart_planting_N_${N}_alpha_$A
    [ -d "$F" ] || continue
    for ARM in icm nmc pt; do
      O=$OUT/wishart_n${N}_a${A}_${ARM}.jsonl
      # round-2 rows (and resumed reruns) already done
      [ -s "$O" ] && { echo "skip existing $O"; continue; }
      case $ARM in
        icm) EXTRA="--subreplicas 2";;
        nmc) EXTRA="$NMC";;
        pt)  EXTRA="";;
      esac
      run_gate 2400 python -m nmc_tpu campaign --folder $F $COMMON \
        --arm $ARM $EXTRA --out $O || exit 0
    done
  done
done
echo "WISHART SURFACE DONE"
