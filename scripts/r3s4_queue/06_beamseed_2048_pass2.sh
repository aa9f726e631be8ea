#!/bin/bash
# Second seeded-ICM pass over chimera2048: picks up the beam misses
# item 05 newly swept (plus any pass-1 leftovers); --skip-covered
# drops everything already hit by any tier.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beamseed 2048 p2"; exit 0; fi
t=$(( rem - 660 )); [ "$t" -gt 9000 ] && t=9000
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/run_beam_seeded_icm.py --family chimera2048 \
  --sweeps 3000000 --skip-covered \
  --out results/campaign/chimera2048_icm_beamseed_3000k_p2.jsonl \
  || echo "beamseed 2048 p2 failed/cut"
echo "BEAMSEED 2048 P2 DONE"
