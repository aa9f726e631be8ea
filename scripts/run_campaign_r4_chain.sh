#!/bin/bash
# Round-4 chain: finish-the-sweep coverage on the live TPU, ordered by
# certainty-of-yield per hour (VERDICT r3 "Next round" items 1-6).
# Short, high-certainty items first; open-ended sweeps last — the r3
# lesson where seg6's whole queue starved behind seg5's item 1.
# Every item is individually gated (run_gated) and resumable: the
# campaign runners skip instances already FINAL in their out files, the
# beam/exact runners skip completed rows/folders.  DEADLINE env (unix
# secs) cuts the chain cleanly; default 10 h.
set -x
cd /root/repo
source scripts/chainctl.sh
register_chain
DL=${DEADLINE:-$(( $(date +%s) + 36000 ))}
export DEADLINE=$DL
START=$(date +%s)
# Phase-1 cutoff: the dcl16 first pass may use at most ~55% of the chain
# budget, so the chimera2048/1152 items (VERDICT r3 next #1/#3) are
# guaranteed wall-clock even when every dcl16 chunk runs to its gate.
P1=$(( START + (DL - START) * 55 / 100 ))
rem() { echo $(( DL - $(date +%s) )); }
bound() { # bound <want> -> min(want, rem-660)
  local w=$1 r; r=$(rem)
  if [ $(( r - 660 )) -lt "$w" ]; then echo $(( r - 660 )); else echo "$w"; fi
}
# production kernel routing for the big-n families (see ensemble_nmc.py:
# the axon compile helper 500s on dense n_pad>=1152 programs)
CAP=NMC_TPU_ROUND_VMEM_CAP=6000000

# 1. LBP planes hardware A/B (VERDICT r3 weak #1 / next #4): the r3
#    attempt died in a scoped-VMEM stack OOM at dcl16 shapes, fixed by
#    the per-kernel vmem_limit_bytes raise in ops/round_pallas.py.
if [ ! -s results/nmc_phase_breakdown_planes.json ] && [ "$(rem)" -gt 3800 ]; then
  run_gated 3200 python scripts/profile_nmc_phases.py \
    --out results/nmc_phase_breakdown_planes.json \
    || echo "planes A/B failed"
fi

# 2. DCL C16 all-100 fill (VERDICT r3 next #2): instances 10-99, hybrid
#    arm (measured TTS winner: 9/10 at 1.6M, median hit 405 s), 800k
#    first pass (8/10 of measured hits land under 600k sweeps) in
#    10-instance chunks (50-instance batches hit the remote-compile 413
#    size ceiling). Misses retried deeper in item 7.
for LO in 10 20 30 40 50 60 70 80 90; do
  [ "$(rem)" -lt 2600 ] && break
  [ "$(date +%s)" -gt "$P1" ] && { echo "P1 budget spent: deferring dcl16 $LO+ to item 7"; break; }
  ONLY=$(seq -f %02g.txt "$LO" $((LO + 9)) | paste -sd,)
  run_gated 2200 env $CAP \
    python -m nmc_tpu campaign --family dcl16 --instances 100 \
    --only "$ONLY" --replicas 32 --beta-max 32 --chunk-rounds 25 \
    --arm hybrid --nmc-cold 6 --lbp-every 8 --trace --sweeps 800000 \
    --out results/campaign/dcl16_hybrid_800k.jsonl \
    || echo "dcl16 chunk $LO cut"
done

# 3. chimera2048 beam-seeded ICM (VERDICT r3 next #1b): rerun of the r3
#    partial that was cut at 2225/5208 rounds with residuals already at
#    1-16 energy quanta. --skip-covered drops instances any tier has
#    since hit.
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 7200)" env $CAP \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered || echo "beamseed 2048 failed/cut"
fi

# 4. chimera1152 last 7 (VERDICT r3 next #3): beam-seeded deep ICM at
#    seed 1 (seed-0 runs missed these; all 7 have saved beam states).
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 7200)" env $CAP \
    python -m nmc_tpu campaign --family chimera1152 --instances 100 \
    --only 001.txt,015.txt,037.txt,041.txt,058.txt,069.txt,092.txt \
    --replicas 32 --beta-max 32 --chunk-rounds 25 --arm icm \
    --subreplicas 2 --init file \
    --init-states results/beam_states/chimera1152 --init-chains 8 \
    --seed 1 --trace --sweeps 10000000 \
    --out results/campaign/chimera1152_icm_beamseed_10M_seed1.jsonl \
    || echo "1152 tail cut"
fi

# 5. Exact wishart verification N=36-40 (VERDICT r3 next #5): int8
#    digit-plane Pallas MITM, resumable per folder, internal budget so
#    it stops cleanly between instances.
if [ "$(rem)" -gt 2400 ]; then
  B=$(bound 5400)
  run_gated $(( B + 300 )) python scripts/run_exact_verify_tpu.py \
    --min-n 34 --max-n 40 --budget-s "$B" || echo "exact verify cut"
fi

# 6. Wishart hardness-surface fill (VERDICT r3 next #6): ICM on every
#    shipped folder; NMC/PT matched rows at alpha in {0.20,0.50,0.80}.
#    Resume relies on campaign's own per-instance row skipping; a cell
#    is pre-skipped only when its out file already has 20 FINAL rows
#    (ADVICE r3: a [-s] guard would skip cells cut mid-run forever).
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
cell_done() {  # cell_done <out.jsonl> -> 0 when 20 distinct final rows
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
      --arm $ARM $EXTRA --out "$O" || echo "cell failed/cut: $O (continuing)"
  done
done

# 7. dcl16 miss retry: whatever item 2 left unsolved, rerun at seed 1
#    with the proven hybrid configuration at a 3.2M budget (the 00-09
#    baseline had hits out to 1.28M sweeps). NOT beam-seeded: DCL beam
#    states are 1-2 % off (recorded negative) and only 3 exist.
if [ "$(rem)" -gt 3600 ]; then
  # chunks of 10 per line: bigger n=2048 batches hit the remote-compile
  # 413 program-size ceiling
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
    [ "$(rem)" -lt 4200 ] && { echo "DEADLINE: stopping dcl16 retry"; break; }
    run_gated 3600 env $CAP \
      python -m nmc_tpu campaign --family dcl16 --instances 100 \
      --only "$MISS" --replicas 32 --beta-max 32 --chunk-rounds 25 \
      --arm hybrid --nmc-cold 6 --lbp-every 8 \
      --seed 1 --trace --sweeps 3200000 \
      --out results/campaign/dcl16_hybrid_retry_3200k.jsonl \
      || echo "dcl16 retry chunk cut"
  done < /tmp/dcl16_miss_chunks
fi

# 8. chimera2048 beam resume (59 unswept; saves states for seeding).
if [ "$(rem)" -gt 1800 ]; then
  run_gated "$(bound 99999)" python scripts/run_beam_chimera_tpu.py \
    --family chimera2048 --beam 16 --refine-beam 15 --orientations 2 \
    --deadline "$DL" --save-states results/beam_states/chimera2048 \
    || echo "2048 beam resume cut"
fi

# 9. chimera2048 beam-seeded ICM pass 2 on the NEW beam states.
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 7200)" env $CAP \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered \
    --out results/campaign/chimera2048_icm_beamseed2_3000k.jsonl \
    || echo "beamseed2 2048 cut"
fi

echo "R4 CHAIN DONE"
