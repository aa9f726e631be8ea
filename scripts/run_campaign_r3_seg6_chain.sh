#!/bin/bash
# Round-3 seg6 chain: runs after seg5 (waits on /tmp/seg5.pid), drains
# the remaining parked r3t items on the live TPU. Resumable throughout;
# items run under run_gated so bench.py can claim an idle chip.
set -x
cd /root/repo
source scripts/chainctl.sh
register_chain
if [ -f /tmp/seg5.pid ]; then
  # Validate the pid actually IS seg5 before waiting on it: a stale pid
  # file plus PID reuse could otherwise block forever on an unrelated
  # long-lived process (ADVICE r3).
  P=$(cat /tmp/seg5.pid)
  while kill -0 "$P" 2>/dev/null \
      && grep -qa seg5 "/proc/$P/cmdline" 2>/dev/null; do
    check_stop
    sleep 60
  done
fi
DL=${DEADLINE:-$(( $(date +%s) + 43200 ))}
export DEADLINE=$DL
rem() { echo $(( DL - $(date +%s) )); }
bound() {
  local w=$1 r; r=$(rem)
  if [ $(( r - 660 )) -lt "$w" ]; then echo $(( r - 660 )); else echo "$w"; fi
}

# 1. Bench amortization study (parked 01iy): separates tunnel dispatch
#    latency from chip throughput for the capture methodology.
if [ "$(rem)" -gt 1500 ]; then
  run_gated 900 python scripts/bench_amortize.py || echo "amortize failed"
fi

# 2. LBP planes hardware A/B (parked 01iya): flip the EnsembleNMC
#    default if planes wins like the matmul Houdayer did (2.3x).
if [ "$(rem)" -gt 2400 ]; then
  run_gated 1800 python scripts/profile_nmc_phases.py \
    --out results/nmc_phase_breakdown_planes.json \
    || echo "planes A/B failed"
fi

# 3. dcl16 leftovers: whatever the seg5 hybrid fill missed, retried as
#    beam-seeded deep ICM (states exist for every dcl16 instance).
if [ "$(rem)" -gt 3600 ]; then
  MISS=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from coverage_report import scan_family, shipped_instances, FAMILIES
tiers = scan_family("dcl16")
covered = set().union(*tiers.values()) if tiers else set()
print(",".join(sorted(set(shipped_instances(FAMILIES["dcl16"])) - covered)))
EOF
)
  if [ -n "$MISS" ]; then
    run_gated "$(bound 10800)" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
      python -m nmc_tpu campaign --family dcl16 --instances 100 \
      --only "$MISS" --replicas 32 --beta-max 32 --chunk-rounds 25 \
      --arm icm --subreplicas 2 --init file \
      --init-states results/beam_states/dcl16 --init-chains 8 \
      --seed 1 --trace --sweeps 5000000 \
      --out results/campaign/dcl16_icm_beamseed_5000k.jsonl \
      || echo "dcl16 leftovers cut"
  fi
fi

# 4. chimera2048 beam-seeded ICM pass 2: converts the NEW beam states
#    saved by seg5's beam resume (skip-covered drops earlier hits).
if [ "$(rem)" -gt 3600 ]; then
  run_gated "$(bound 14400)" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
    python scripts/run_beam_seeded_icm.py --family chimera2048 \
    --sweeps 3000000 --skip-covered \
    --out results/campaign/chimera2048_icm_beamseed2_3000k.jsonl \
    || echo "beamseed2 2048 cut"
fi

# 5. Wishart hardness-surface fill (parked 07, inlined so every cell is
#    individually gated/resumable): ICM over every shipped folder; NMC/PT
#    matched rows on the alpha in {0.20,0.50,0.80} columns.
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
for F in $(ls -d $W/wishart_planting_N_*_alpha_* | sort -t_ -k4 -n); do
  base=${F##*/wishart_planting_N_}
  N=${base%%_alpha_*}
  A=${base##*_alpha_}
  for ARM in icm nmc pt; do
    if [ "$ARM" != "icm" ]; then
      case $A in 0.20|0.50|0.80) ;; *) continue;; esac
    fi
    O=results/campaign/wishart_n${N}_a${A}_${ARM}.jsonl
    # Skip a cell only when it has all 20 FINAL rows — a bare [ -s ]
    # guard would silently skip forever any cell cut mid-run by the
    # gate/stop file (ADVICE r3); campaign's own per-instance row
    # skipping makes the resume cheap either way.
    python - "$O" <<'EOF' && continue
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
    [ "$(rem)" -lt 2400 ] && { echo "DEADLINE: stopping wishart fill"; break 2; }
    case $ARM in
      icm) EXTRA="--subreplicas 2";;
      nmc) EXTRA="--nmc-cold 6 --lbp-every 1";;
      pt)  EXTRA="";;
    esac
    run_gated 1800 python -m nmc_tpu campaign --folder "$F" $COMMON \
      --arm $ARM $EXTRA --out "$O" || echo "cell failed/cut: $O (continuing)"
  done
done

echo "SEG6 CHAIN DONE"
