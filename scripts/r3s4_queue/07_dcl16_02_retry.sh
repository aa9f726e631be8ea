#!/bin/bash
# dcl16 02.txt — the one seed-0 miss among instances 00-09 (all three
# arms). Retry with the hybrid arm (the measured TTS winner on DCL C16)
# at seed 1 and a deeper budget.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2700 ]; then echo "DEADLINE: skip dcl16 02 retry"; exit 0; fi
t=$(( rem - 660 )); [ "$t" -gt 3600 ] && t=3600
timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 100 \
  --only 02.txt --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm hybrid --nmc-cold 6 --subreplicas 2 --temp-x 20 --seed 1 --trace \
  --sweeps 3200000 --out results/campaign/dcl16_hybrid_3200k_s1_i02.jsonl \
  || echo "dcl16 02 retry failed/cut"
echo "DCL16 02 RETRY DONE"
