#!/bin/bash
# Round-2 campaign chain runner: executes the remaining phases in
# priority order with a hard wall-clock deadline so the driver's
# end-of-round bench.py gets an idle chip. Each solver invocation gets
# timeout min(requested, time-to-deadline); nothing new starts within
# 10 minutes of the deadline. Campaign runs resume per instance, so a
# cut run keeps its streamed results.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

DEADLINE=${DEADLINE:-1786949400}   # ~06:50 UTC, ~45 min before round end

run() {  # run <max_seconds> <args...>
  local rem=$((DEADLINE - $(date +%s)))
  if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip $*"; return 1; fi
  local t=$1; shift
  [ "$rem" -lt "$t" ] && t=$rem
  timeout "$t" "$@"
}

# ---- priority 1: contrived tree family (the NMC-design family) -------
BK=$OUT/contrived_n50_best_known.json
FAM="--family contrived_n50_a0.20 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
NMCC="--nmc-cold 6 --lbp-every 1 --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999"
run 3600 python -m nmc_tpu campaign $FAM --arm pt --sweeps 400000 \
  --out $OUT/contrived_n50_pt_explore.jsonl
run 3600 python -m nmc_tpu campaign $FAM --arm nmc $NMCC --sweeps 400000 \
  --out $OUT/contrived_n50_nmc_explore.jsonl
run 3600 python -m nmc_tpu campaign $FAM --arm icm --subreplicas 2 --sweeps 400000 \
  --out $OUT/contrived_n50_icm_explore.jsonl
python -m nmc_tpu campaign --collect-best \
  $OUT/contrived_n50_pt_explore.jsonl $OUT/contrived_n50_nmc_explore.jsonl \
  $OUT/contrived_n50_icm_explore.jsonl --out $BK || true
run 3600 python -m nmc_tpu campaign $FAM --best-known $BK --arm pt --sweeps 400000 \
  --out $OUT/contrived_n50_pt.jsonl
run 3600 python -m nmc_tpu campaign $FAM --best-known $BK --arm nmc $NMCC --sweeps 400000 \
  --out $OUT/contrived_n50_nmc.jsonl
run 3600 python -m nmc_tpu campaign $FAM --best-known $BK --arm icm --subreplicas 2 --sweeps 400000 \
  --out $OUT/contrived_n50_icm.jsonl

# ---- priority 2: chimera512 at the reference's full 100 instances ----
C512ALL="--family chimera512 --instances 100 --replicas 32 --beta-max 32 --chunk-rounds 50"
run 10800 python -m nmc_tpu campaign $C512ALL --arm icm --subreplicas 2 --sweeps 3200000 \
  --out $OUT/chimera512_icm_all100.jsonl
run 7200 python -m nmc_tpu campaign $C512ALL --arm pt --sweeps 3200000 \
  --out $OUT/chimera512_pt_all100.jsonl
run 7200 python -m nmc_tpu campaign $C512ALL --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_all100.jsonl

# ---- priority 3: chimera1152 retry (chunk 10; chunk-25 program-size
# crash documented in phase 5 log) ------------------------------------
C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 10"
run 7200 python -m nmc_tpu campaign $C1152 --arm pt --sweeps 1600000 \
  --out $OUT/chimera1152_pt_1600k.jsonl
run 7200 python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera1152_icm_1600k.jsonl
run 7200 python -m nmc_tpu campaign $C1152 --arm nmc --nmc-cold 6 --lbp-every 1 --sweeps 1600000 \
  --out $OUT/chimera1152_nmc_1600k.jsonl

# ---- priority 4: NMC global_beta=3 diagnosis + 2048-scale ICM arms ---
C512="--family chimera512 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
run 7200 python -m nmc_tpu campaign $C512 --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --sweeps 3200000 --out $OUT/chimera512_nmc_gb3_3200k.jsonl
run 7200 python -m nmc_tpu campaign $C512 --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_gb3_loose_3200k.jsonl
C2048="--family chimera2048 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
DCL16="--family dcl16 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
run 7200 python -m nmc_tpu campaign $C2048 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera2048_icm_1600k.jsonl
run 7200 python -m nmc_tpu campaign $DCL16 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/dcl16_icm_1600k.jsonl

# ---- priority 5: wishart alpha-hardness fills ------------------------
W=/root/reference/NPT/examples/wishart_small
NMCW="--nmc-cold 6 --lbp-every 1"
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
for A in 0.20 0.40 0.60 0.80 1.00; do
  F=$W/wishart_planting_N_40_alpha_$A
  [ -d "$F" ] || continue
  run 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm pt \
    --out $OUT/wishart_n40_a${A}_pt.jsonl
  run 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm nmc $NMCW \
    --out $OUT/wishart_n40_a${A}_nmc.jsonl
  run 3600 python -m nmc_tpu campaign --folder $F $COMMON --arm icm --subreplicas 2 \
    --out $OUT/wishart_n40_a${A}_icm.jsonl
done

# ---- priority 6: the reference's exact APT-ladder pipeline -----------
APT="--family chimera512 --instances 20 --ladder apt --beta-min 0.5 --beta-max 64 --chunk-rounds 50"
run 7200 python -m nmc_tpu campaign $APT --arm pt --sweeps 3200000 \
  --out $OUT/chimera512_pt_apt_3200k.jsonl
run 7200 python -m nmc_tpu campaign $APT --arm nmc --nmc-cold 6 --lbp-every 4 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_apt_3200k.jsonl

echo CHAIN_DONE
