#!/bin/bash
# dcl16 at family scale: the coverage scoreboard exposed that DCL C16
# has only ever been attempted on 10/100 shipped instances (9/10 hit by
# each arm at 1.6M). Run the full 100 with the proven NMC-arm config
# (fastest of the three 9/10 arms: 1182 s for the 10-instance batch),
# split into two 50-instance programs to bound compile size/HBM.
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }

for part in a b; do
  if [ "$part" = a ]; then LO=0; HI=49; else LO=50; HI=99; fi
  O=results/campaign/dcl16_nmc_1600k_${part}.jsonl
  [ -s "$O" ] && { echo "skip existing $O"; continue; }
  r=$(rem); [ "$r" -lt 2400 ] && { echo "DEADLINE: stop dcl16 fill"; exit 0; }
  t=9000; [ "$r" -lt "$t" ] && t=$((r - 660))
  ONLY=$(seq -f "%02g.txt" $LO $HI | paste -sd,)
  timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 100 \
    --only "$ONLY" --replicas 32 --beta-max 32 --chunk-rounds 25 \
    --arm nmc --nmc-cold 6 --lbp-every 4 --trace \
    --sweeps 1600000 --out "$O" || echo "dcl16 $part failed/cut"
done
echo "DCL16 ALL100 DONE"
