#!/bin/bash
# Round-2 campaign phase 3: the reference's EXACT pipeline shape on
# chimera512 — APT-built sigma_E-adaptive ladder (beta 0.5..64, like
# chimera_example.py), then PT vs NMC on top of it at 3.2M sweeps.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

APT="--family chimera512 --instances 20 --ladder apt --beta-min 0.5 --beta-max 64 --chunk-rounds 50"
NMC="--nmc-cold 6 --lbp-every 4"

timeout 7200 python -m nmc_tpu campaign $APT --arm pt  --sweeps 3200000 \
  --out $OUT/chimera512_pt_apt_3200k.jsonl
timeout 7200 python -m nmc_tpu campaign $APT --arm nmc $NMC --sweeps 3200000 \
  --out $OUT/chimera512_nmc_apt_3200k.jsonl

echo PHASE3_DONE
