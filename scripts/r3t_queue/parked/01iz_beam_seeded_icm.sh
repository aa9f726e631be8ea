#!/bin/bash
# Beam-seeded ICM on the big families' beam misses: the coldest chains
# start from the deterministic beam's states (within ~0.1% of truth)
# instead of infinite temperature. chimera512 showed beam and ICM
# misses are complementary (81 vs 93, union 100/100); this composes
# them per instance. Also sweeps the chimera512 beam misses as a
# measured seeded-vs-plain comparison row.
set -x
cd /root/repo
rem() { echo $(( ${DEADLINE:-9999999999} - $(date +%s) )); }

for fam in chimera1152 chimera2048 chimera512; do
  if [ "$(rem)" -lt 1500 ]; then echo "DEADLINE: skip seeded $fam"; break; fi
  t=5400; r=$(rem); [ "$r" -lt "$t" ] && t=$((r - 660))
  timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
    python scripts/run_beam_seeded_icm.py --family $fam \
    --sweeps 5000000 || echo "seeded $fam failed/cut"
done
echo "BEAM SEEDED ICM DONE"
