#!/bin/bash
# ALL-100 rows for the two fast families (chimera128, DCL C8), matching
# the chimera512 all-100 story: every shipped instance of the family
# solved in ONE batched SPMD program per arm. The reference ships ~100
# instances per family (SURVEY §6); round-2/3 rows covered 20 each.
# Estimated ~45 min total at observed 20-instance rates.
set -x
cd /root/repo
OUT=results/campaign

gate() {  # gate <min_rem_seconds>
  [ $(( ${DEADLINE:-9999999999} - $(date +%s) )) -lt "$1" ]
}

run_cell() {  # run_cell <timeout> <out> <args...>
  local t=$1 o=$2; shift 2
  [ -s "$o" ] && { echo "skip existing $o"; return 0; }
  gate 600 && { echo "DEADLINE: skip $o"; return 1; }
  timeout "$t" python -m nmc_tpu campaign "$@" --out "$o" \
    || echo "cell failed/cut: $o (continuing)"
}

C128="--family chimera128 --instances 100 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
run_cell 1200 $OUT/chimera128_pt_all100.jsonl  $C128 --arm pt
run_cell 2400 $OUT/chimera128_icm_all100.jsonl $C128 --arm icm --subreplicas 2
run_cell 2400 $OUT/chimera128_nmc_all100.jsonl $C128 --arm nmc --nmc-cold 6 --lbp-every 1

DCL8="--family dcl8 --instances 100 --replicas 32 --beta-max 32 --chunk-rounds 25 --sweeps 3200000"
run_cell 1800 $OUT/dcl8_pt_all100.jsonl  $DCL8 --arm pt
run_cell 1800 $OUT/dcl8_nmc_all100.jsonl $DCL8 --arm nmc --nmc-cold 6 --lbp-every 1
run_cell 2400 $OUT/dcl8_icm_all100.jsonl $DCL8 --arm icm --subreplicas 2

echo "ALL100 QUICK FAMILIES DONE"
