#!/bin/bash
# Round-2 campaign phase 5: chimera1152 (VERDICT item 1 names it
# explicitly), ICM arm at 2048-spin scale, and the contrived-backbone
# wishart folder (N=50 backbone, exact planted gs_energies shipped with
# the reference's contrived_wishart_backbone examples).
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

NMC="--nmc-cold 6 --lbp-every 1"

C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 25"
timeout 7200 python -m nmc_tpu campaign $C1152 --arm pt --sweeps 1600000 \
  --out $OUT/chimera1152_pt_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $C1152 --arm nmc $NMC --sweeps 1600000 \
  --out $OUT/chimera1152_nmc_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera1152_icm_1600k.jsonl

# contrived-backbone wishart N=50 alpha=0.20 (raw Wishart backbone with
# exact planted ground states; the hard core of the contrived family)
CWB="--folder /root/reference/NMC/examples/contrived_wishart_backbone/wishart_planting_N_50_alpha_0.20 --kind wishart --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 50"
timeout 7200 python -m nmc_tpu campaign $CWB --arm pt --sweeps 400000 \
  --out $OUT/cwb_n50_pt.jsonl
timeout 7200 python -m nmc_tpu campaign $CWB --arm nmc $NMC --sweeps 400000 \
  --out $OUT/cwb_n50_nmc.jsonl
timeout 7200 python -m nmc_tpu campaign $CWB --arm icm --subreplicas 2 --sweeps 400000 \
  --out $OUT/cwb_n50_icm.jsonl

echo PHASE5_DONE
