#!/bin/bash
# Fill the wishart_small hardness surface to EVERY shipped folder
# (161 total; N in {8..40} x alpha in {0.2..1.0}). The ICM arm covers
# the full grid; NMC/PT add matched rows on the alpha in {0.20,0.50,0.80}
# columns (the existing N in {20,30,40} x alpha x 3-arm block already
# covers the arm comparison there). Existing rows are skipped, so this
# composes with the round-2/3 data into one surface. Small-N cells share
# compiled programs (same shapes) via the compilation cache.
set -x
cd /root/repo
OUT=results/campaign
W=/root/reference/NPT/examples/wishart_small
COMMON="--kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50 --sweeps 400000"
NMC="--nmc-cold 6 --lbp-every 1"

past_deadline() {
  [ $(( ${DEADLINE:-9999999999} - $(date +%s) )) -lt 900 ]
}

for F in $(ls -d $W/wishart_planting_N_*_alpha_* | sort -t_ -k4 -n); do
  base=${F##*/wishart_planting_N_}
  N=${base%%_alpha_*}
  A=${base##*_alpha_}
  for ARM in icm nmc pt; do
    if [ "$ARM" != "icm" ]; then
      case $A in 0.20|0.50|0.80) ;; *) continue;; esac
    fi
    O=$OUT/wishart_n${N}_a${A}_${ARM}.jsonl
    [ -s "$O" ] && { echo "skip existing $O"; continue; }
    past_deadline && { echo "DEADLINE: stopping wishart fill"; exit 0; }
    case $ARM in
      icm) EXTRA="--subreplicas 2";;
      nmc) EXTRA="$NMC";;
      pt)  EXTRA="";;
    esac
    timeout 1800 python -m nmc_tpu campaign --folder $F $COMMON \
      --arm $ARM $EXTRA --out $O || echo "cell failed/cut: $O (continuing)"
  done
done
echo "WISHART FILL DONE"
