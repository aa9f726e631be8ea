#!/bin/bash
# PROVABLY exact ground state of the last unsolved shipped instance
# (cwb N=50 inst_18) by meet-in-the-middle on the MXU: 2^49 energies,
# fused Pallas min/argmin epilogue (nmc_tpu/exact.py). Also re-derives
# the shipped truth -616800 if MCMC already found it — either way the
# framework INDEPENDENTLY proves a reference ground truth at n=50.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 6000 ]; then echo "DEADLINE: skip inst18 exact"; exit 0; fi
mkdir -p data/holdout_n18 results
if [ ! -s data/holdout_n18/gs_energies.txt ]; then
  CWB=/root/reference/NPT/examples/contrived_wishart_backbone/wishart_planting_N_50_alpha_0.20
  cp "$CWB"/wishart_planting_N_50_alpha_0.20_inst_18.txt data/holdout_n18/
  grep -h "inst_18\.txt" "$CWB"/gs_energies.txt > data/holdout_n18/gs_energies.txt
fi
# hardware smoke at N=40 (seconds per try): walk a config ladder —
# int8 digit planes first, then f32, then smaller tiles (the
# [blk_a, blk_b] table tile is the VMEM limiter and this exact shape
# has never compiled on hardware) — and run 2^49 with the first config
# that verifies the shipped N=40 truth.
SMOKE=$(ls /root/reference/NPT/examples/wishart_small/wishart_planting_N_40_alpha_0.50/*inst_1.txt | head -1)
CFG=""
for cfg in "on 512 4096" "off 512 4096" "on 256 4096" "off 256 4096"; do
  set -- $cfg
  if timeout 600 python -m nmc_tpu exact "$SMOKE" \
       --backend pallas --planes "$1" --block-a "$2" --block-b "$3" \
       --out results/exact_i8_smoke_n40.jsonl; then
    CFG="$cfg"; break
  fi
done
if [ -z "$CFG" ]; then echo "inst18 exact: no smoke config compiled"; exit 0; fi
set -- $CFG
echo "smoke picked: planes=$1 block_a=$2 block_b=$3"
timeout 5400 python -m nmc_tpu exact \
  data/holdout_n18/wishart_planting_N_50_alpha_0.20_inst_18.txt \
  --backend pallas --planes "$1" --block-a "$2" --block-b "$3" \
  --out results/inst18_exact.jsonl \
  --save-state results/inst18_ground_state.txt \
  || echo "inst18 exact failed/timed out"
echo "INST18 EXACT DONE"
