#!/bin/bash
# Device difference-map recovery at scale (TPU): continuum Wishart
# instances at N=128..1024 — the spectral-stage preconditioner as pure
# MXU matmuls. Recovery + wall per size to results/dm_device_scale.json.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2400 ]; then echo "DEADLINE: skip dm_device_scale"; exit 0; fi
timeout 2000 python scripts/dm_device_scale.py \
  --sizes 128,256,512 --instances 4 --starts 4096 --iters 3000 \
  --out results/dm_device_scale.json || echo "dm_device_scale failed"
echo "DM DEVICE SCALE DONE"
