#!/bin/bash
# Round-4 chain, rebalanced (v2).  The v1 ordering would have spent the
# whole remaining round on dcl16 2200-s gates + one unbounded beamseed:
# bash had already parsed the dcl16 loop (so its gates could not be
# edited in place), and item 3's bound() let it absorb all slack.  v2
# guarantees every VERDICT-r3 coverage item hardware time by putting a
# hard per-item budget FIRST for the judge's #1 family (chimera2048
# beam-seeded ICM), then the high-yield dcl16 fill with tighter gates
# (19/20 of the measured first-pass hits land < 500 s; the 1300-s gate
# captures everything observed except one 1895-s straggler), then the
# 1152 tail, then the exact N=34-40 verify, with leftover slack going to
# a dcl16 seed-1 miss retry and a beamseed continuation.
# Everything is resumable: campaign skips FINAL rows (hits stream at
# discovery since fb97e6e's parent), the beamseed runner skips covered
# instances, the exact verifier skips completed folders.
set -x
cd /root/repo
source scripts/chainctl.sh
register_chain
DL=${DEADLINE:-$(( $(date +%s) + 36000 ))}
export DEADLINE=$DL
rem() { echo $(( DL - $(date +%s) )); }
bound() { # bound <want> -> min(want, rem-660)
  local w=$1 r; r=$(rem)
  if [ $(( r - 660 )) -lt "$w" ]; then echo $(( r - 660 )); else echo "$w"; fi
}
CAP=NMC_TPU_ROUND_VMEM_CAP=6000000

# 1. chimera2048 beam-seeded ICM (VERDICT r3 next #1b) — the judge's #1
#    family gets its budget before anything open-ended can starve it.
if [ "$(rem)" -gt 2400 ]; then
  run_gated "$(bound 3600)" env $CAP \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered || echo "beamseed 2048 cut"
fi

# 2. dcl16 all-100 fill, remaining instances (VERDICT r3 next #2).
#    21.txt rides with the 30s chunk: the v1 chunk it belonged to was
#    stopped mid-run; campaign skips the nine already-FINAL rows.
#    Reserve 4500 s for items 3-4 + margin: run a chunk only while
#    rem > 5800.
for CHUNK in \
    21.txt,30.txt,31.txt,32.txt,33.txt,34.txt,35.txt,36.txt,37.txt,38.txt,39.txt \
    40.txt,41.txt,42.txt,43.txt,44.txt,45.txt,46.txt,47.txt,48.txt,49.txt \
    50.txt,51.txt,52.txt,53.txt,54.txt,55.txt,56.txt,57.txt,58.txt,59.txt \
    60.txt,61.txt,62.txt,63.txt,64.txt,65.txt,66.txt,67.txt,68.txt,69.txt \
    70.txt,71.txt,72.txt,73.txt,74.txt,75.txt,76.txt,77.txt,78.txt,79.txt \
    80.txt,81.txt,82.txt,83.txt,84.txt,85.txt,86.txt,87.txt,88.txt,89.txt \
    90.txt,91.txt,92.txt,93.txt,94.txt,95.txt,96.txt,97.txt,98.txt,99.txt; do
  [ "$(rem)" -lt 5800 ] && { echo "dcl16 fill: reserving tail budget"; break; }
  run_gated 1300 env $CAP \
    python -m nmc_tpu campaign --family dcl16 --instances 100 \
    --only "$CHUNK" --replicas 32 --beta-max 32 --chunk-rounds 25 \
    --arm hybrid --nmc-cold 6 --lbp-every 8 --trace --sweeps 800000 \
    --out results/campaign/dcl16_hybrid_800k.jsonl \
    || echo "dcl16 chunk cut"
done

# 3. chimera1152 last 7 (VERDICT r3 next #3): beam-seeded deep ICM at
#    seed 1 (seed-0 runs missed these; all 7 have saved beam states;
#    the window-10 strip refine converted 0/7 — recorded negative).
if [ "$(rem)" -gt 2600 ]; then
  run_gated "$(bound 2000)" env $CAP \
    python -m nmc_tpu campaign --family chimera1152 --instances 100 \
    --only 001.txt,015.txt,037.txt,041.txt,058.txt,069.txt,092.txt \
    --replicas 32 --beta-max 32 --chunk-rounds 25 --arm icm \
    --subreplicas 2 --init file \
    --init-states results/beam_states/chimera1152 --init-chains 8 \
    --seed 1 --trace --sweeps 10000000 \
    --out results/campaign/chimera1152_icm_beamseed_10M_seed1.jsonl \
    || echo "1152 tail cut"
fi

# 4. Exact wishart verification N=34-40 (VERDICT r3 next #5): int8
#    digit-plane Pallas MITM, resumable per folder.
if [ "$(rem)" -gt 2300 ]; then
  B=$(bound 1700)
  run_gated $(( B + 300 )) python scripts/run_exact_verify_tpu.py \
    --min-n 34 --max-n 40 --budget-s "$B" || echo "exact verify cut"
fi

# 5. Slack (early chunk exits land here): dcl16 seed-1 retry on
#    whatever the first pass missed, 10-instance chunks.
if [ "$(rem)" -gt 3100 ]; then
  python - <<'EOF' > /tmp/dcl16_miss_chunks
import sys
sys.path.insert(0, "scripts")
from coverage_report import scan_family, shipped_instances, FAMILIES
tiers = scan_family("dcl16")
covered = set().union(*tiers.values()) if tiers else set()
miss = sorted(set(shipped_instances(FAMILIES["dcl16"])) - covered)
for i in range(0, len(miss), 10):
    print(",".join(miss[i:i + 10]))
EOF
  while read -r MISS; do
    [ -z "$MISS" ] && continue
    [ "$(rem)" -lt 1450 ] && { echo "DEADLINE: stopping dcl16 retry"; break; }
    run_gated "$(bound 2400)" env $CAP \
      python -m nmc_tpu campaign --family dcl16 --instances 100 \
      --only "$MISS" --replicas 32 --beta-max 32 --chunk-rounds 25 \
      --arm hybrid --nmc-cold 6 --lbp-every 8 \
      --seed 1 --trace --sweeps 3200000 \
      --out results/campaign/dcl16_hybrid_retry_3200k.jsonl \
      || echo "dcl16 retry chunk cut"
  done < /tmp/dcl16_miss_chunks
fi

# 6. Remaining slack: beamseed continuation on chimera2048 (converts
#    more of the saved near-miss states; more valuable per second today
#    than beaming new instances, which lands in round 5).
if [ "$(rem)" -gt 1500 ]; then
  run_gated "$(bound 99999)" env $CAP \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered \
    --out results/campaign/chimera2048_icm_beamseed2_3000k.jsonl \
    || echo "beamseed2 2048 cut"
fi

echo "R4B CHAIN DONE"
