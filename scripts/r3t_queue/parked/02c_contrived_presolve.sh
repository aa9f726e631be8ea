#!/bin/bash
# Contrived trees with --presolve: exact peel to the ~170-spin 2-core,
# then ICM at the matched 400k budget (baseline without presolve:
# 16/20 vs best-known, 780 s). Smaller core => denser effective sweeps;
# expect faster TTS and possibly new best-knowns (record residuals vs
# the best_known JSON either way).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1500 ]; then echo "DEADLINE: skip contrived presolve"; exit 0; fi
t=2400; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" python -m nmc_tpu campaign --family contrived_n50_a0.20 \
  --best-known results/campaign/contrived_n50_best_known.json \
  --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --presolve \
  --sweeps 400000 --out results/campaign/contrived_n50_icm_presolve.jsonl \
  || echo "run failed/cut (continuing)"
echo "CONTRIVED PRESOLVE DONE"
