#!/bin/bash
# Round-2 campaign phase 6: the contrived wishart-backbone TREE family —
# the instances the reference's NMC was designed for
# (contrived_wishart_example.py). No exact ground truths ship, so:
#   pass 1 (explore): all three arms run the full budget, recording
#                     best-found energies;
#   collect-best:     merge into best_known.json;
#   pass 2 (scored):  re-run all arms against the best-known targets for
#                     per-instance TTS + hit rates.
# NMC arm follows the reference's contrived example knobs: global_beta=3,
# thresholds 0.9999/0.999 (contrived_wishart_example.py:61-66).
set -x
cd /root/repo
OUT=results/campaign
BK=$OUT/contrived_n50_best_known.json
mkdir -p $OUT

FAM="--family contrived_n50_a0.20 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
NMC="--nmc-cold 6 --lbp-every 1 --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999"

timeout 7200 python -m nmc_tpu campaign $FAM --arm pt --sweeps 400000 \
  --out $OUT/contrived_n50_pt_explore.jsonl
timeout 7200 python -m nmc_tpu campaign $FAM --arm nmc $NMC --sweeps 400000 \
  --out $OUT/contrived_n50_nmc_explore.jsonl
timeout 7200 python -m nmc_tpu campaign $FAM --arm icm --subreplicas 2 --sweeps 400000 \
  --out $OUT/contrived_n50_icm_explore.jsonl

python -m nmc_tpu campaign --collect-best \
  $OUT/contrived_n50_pt_explore.jsonl \
  $OUT/contrived_n50_nmc_explore.jsonl \
  $OUT/contrived_n50_icm_explore.jsonl \
  --out $BK

timeout 7200 python -m nmc_tpu campaign $FAM --best-known $BK --arm pt --sweeps 400000 \
  --out $OUT/contrived_n50_pt.jsonl
timeout 7200 python -m nmc_tpu campaign $FAM --best-known $BK --arm nmc $NMC --sweeps 400000 \
  --out $OUT/contrived_n50_nmc.jsonl
timeout 7200 python -m nmc_tpu campaign $FAM --best-known $BK --arm icm --subreplicas 2 --sweeps 400000 \
  --out $OUT/contrived_n50_icm.jsonl

echo PHASE6_DONE
