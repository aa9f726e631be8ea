#!/bin/bash
# dcl16 family-scale fill, resumed from the segment-3 cut (the i10
# chunk died with the session at launch; its crash snapshot shows only
# early-sweep residuals). 10-instance programs are the hardware-proven
# batch (~1182 s each; the 50-instance attempt hit the axon
# remote-compile 413 size ceiling). Proven NMC-arm config from the
# seed-0 run (9/10 hits at 1.6M sweeps).
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }

for LO in 10 20 30 40 50 60 70 80 90; do
  HI=$((LO + 9))
  O=results/campaign/dcl16_nmc_1600k_i${LO}.jsonl
  [ -s "$O" ] && { echo "skip existing $O"; continue; }
  r=$(rem); [ "$r" -lt 2400 ] && { echo "DEADLINE: stop dcl16 fill"; exit 0; }
  t=2700; [ "$r" -lt "$t" ] && t=$((r - 660))
  ONLY=$(seq -f "%02g.txt" $LO $HI | paste -sd,)
  timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 100 \
    --only "$ONLY" --replicas 32 --beta-max 32 --chunk-rounds 25 \
    --arm nmc --nmc-cold 6 --lbp-every 4 --trace \
    --sweeps 1600000 --out "$O" || echo "dcl16 chunk $LO failed/cut"
done
echo "DCL16 FILL DONE"
