#!/bin/bash
# Round-3 seg5 chain: coverage fills on the live TPU, each item bounded
# and resumable (campaign/beam runners skip rows already in their out
# files). DEADLINE env (unix secs) cuts the chain cleanly; default 8h.
# Items run under run_gated so bench.py can claim an idle chip.
set -x
cd /root/repo
source scripts/chainctl.sh
register_chain
DL=${DEADLINE:-$(( $(date +%s) + 28800 ))}
export DEADLINE=$DL
rem() { echo $(( DL - $(date +%s) )); }
bound() { # bound <want> -> min(want, rem-660)
  local w=$1 r; r=$(rem)
  if [ $(( r - 660 )) -lt "$w" ]; then echo $(( r - 660 )); else echo "$w"; fi
}

# 1. chimera2048 beam-seeded ICM on the saved beam misses (3M sweeps):
#    on chimera512/1152 seeded ICM converted most beam misses; 2048 beam
#    residuals are median 0.03%.
if [ "$(rem)" -gt 2400 ]; then
  run_gated "$(bound 12000)" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered || echo "beamseed 2048 failed/cut"
fi

# 2. dcl16 hybrid fill 10-99 in 10-instance chunks (hybrid is the TTS
#    winner on DCL C16: 9/10 at 1.6M on 00-09). Chunked because a
#    50-instance n=2048 batch hit the remote-compile size ceiling.
for LO in 10 20 30 40 50 60 70 80 90; do
  [ "$(rem)" -lt 3400 ] && break
  ONLY=$(seq -f %02g.txt "$LO" $((LO + 9)) | paste -sd,)
  run_gated 3300 python -m nmc_tpu campaign --family dcl16 --instances 100 \
    --only "$ONLY" --replicas 32 --beta-max 32 --chunk-rounds 25 \
    --arm hybrid --nmc-cold 6 --lbp-every 8 --trace --sweeps 1600000 \
    --out results/campaign/dcl16_hybrid_1600k.jsonl \
    || echo "dcl16 chunk $LO cut"
done

# 3. chimera1152 last 7 unsolved: beam-seeded deep ICM at seed 1.
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 9000)" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
    python -m nmc_tpu campaign --family chimera1152 --instances 100 \
    --only 001.txt,015.txt,037.txt,041.txt,058.txt,069.txt,092.txt \
    --replicas 32 --beta-max 32 --chunk-rounds 25 --arm icm \
    --subreplicas 2 --init file \
    --init-states results/beam_states/chimera1152 --init-chains 8 \
    --seed 1 --trace --sweeps 10000000 \
    --out results/campaign/chimera1152_icm_beamseed_10M_seed1.jsonl \
    || echo "1152 tail cut"
fi

# 4. chimera2048 beam resume (59 unswept; saves states for later seeding).
if [ "$(rem)" -gt 1800 ]; then
  run_gated "$(bound 99999)" python scripts/run_beam_chimera_tpu.py \
    --family chimera2048 --beam 16 --refine-beam 15 --orientations 2 \
    --deadline "$DL" --save-states results/beam_states/chimera2048 \
    || echo "2048 beam resume cut"
fi

echo "SEG5 CHAIN DONE"
