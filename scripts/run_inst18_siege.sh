#!/bin/bash
# The last instance standing of all 8300 shipped wishart instances:
# cwb N=50 alpha=0.20 inst_18 (gs -616800). Every spectral/DM variant
# funnels to a 4-flip-stable decoy at -607200 (residual 1.56%); ~2.5M
# basin-hop descents from the decoy stay stuck. Alternate deep
# spectral-seeded ICM and NMC (nonlocal backbone moves tunnel out of
# decoys) at 2M sweeps across seeds; stop on hit. CPU-only.
set -u
cd "$(dirname "$0")/.."
OUT=results/campaign
F=data/holdout_n18
mkdir -p "$OUT"
if [ ! -s "$F/gs_energies.txt" ]; then
  CWB=/root/reference/NPT/examples/contrived_wishart_backbone/wishart_planting_N_50_alpha_0.20
  mkdir -p "$F"
  cp "$CWB"/wishart_planting_N_50_alpha_0.20_inst_18.txt "$F"/
  grep -h "inst_18\.txt" "$CWB"/gs_energies.txt > "$F"/gs_energies.txt
fi

hit() {
  python - "$1" <<'EOF'
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except FileNotFoundError:
    sys.exit(1)
sys.exit(0 if any(r.get("hit") for r in rows) else 1)
EOF
}

for s in 0 1 2 3; do
  for arm in icm nmc; do
    f="$OUT/holdout18_${arm}2M_s${s}.jsonl"
    if [ ! -s "$f" ]; then
      python -m nmc_tpu campaign --cpu --folder "$F" --kind wishart \
        --arm "$arm" --init spectral --init-chains 6 \
        --spectral-dm 2048 --spectral-dm-iters 2000 \
        --replicas 24 --beta-min 0.25 --beta-max 48 --sweeps 2000000 \
        --swap-attempts 400 --nmc-cold 6 --seed "$s" --out "$f" || true
    fi
    hit "$f" && { echo "INST_18 CRACKED by $arm seed $s"; exit 0; }
  done
done
echo "inst_18 resisted all 2M-sweep arms"
