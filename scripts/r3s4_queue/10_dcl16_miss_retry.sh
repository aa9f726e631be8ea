#!/bin/bash
# After the dcl16 fill: retry every instance still unsolved by any
# tier with the hybrid arm (the measured TTS winner on DCL C16) at
# seed 1. Miss list computed live from the coverage scan.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip dcl16 miss retry"; exit 0; fi
MISS=$(python - <<'PY'
import sys; sys.path.insert(0, "scripts")
from coverage_report import scan_family, shipped_instances, FAMILIES
tiers = scan_family("dcl16")
covered = set().union(*tiers.values()) if tiers else set()
missing = [s for s in shipped_instances(FAMILIES["dcl16"]) if s not in covered]
print(",".join(missing[:10]))
PY
)
[ -z "$MISS" ] && { echo "dcl16 fully covered, nothing to retry"; exit 0; }
echo "dcl16 miss retry targets: $MISS"
t=$(( rem - 660 )); [ "$t" -gt 5400 ] && t=5400
timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 100 \
  --only "$MISS" --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm hybrid --nmc-cold 6 --subreplicas 2 --temp-x 20 --seed 1 --trace \
  --sweeps 3200000 --out results/campaign/dcl16_hybrid_3200k_s1_retry.jsonl \
  || echo "dcl16 miss retry failed/cut"
echo "DCL16 MISS RETRY DONE"
