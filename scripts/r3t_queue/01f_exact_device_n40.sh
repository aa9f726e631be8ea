#!/bin/bash
# TPU validation of the exact XLA tier (solve_exact_device): re-derive
# 10 shipped N=40 ground truths on hardware (2^39 energies each, tiled
# HIGHEST-precision matmul + min/argmin scan). Complements the CPU bulk
# verification (N<=26, scripts/run_exact_verify_small.py).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2400 ]; then echo "DEADLINE: skip exact device n40"; exit 0; fi
timeout 2200 python - <<'EOF' || echo "exact device n40 failed"
import json, sys, time
sys.path.insert(0, "/root/repo")
from nmc_tpu.evaluation import wishart_folder_instances
from nmc_tpu.exact import solve_exact_device
from nmc_tpu.utils.compcache import enable_compilation_cache
enable_compilation_cache()
folder = ("/root/reference/NPT/examples/wishart_small/"
          "wishart_planting_N_40_alpha_0.50")
rows = []
for name, prob, gs in wishart_folder_instances(folder, limit=10):
    t0 = time.perf_counter()
    e, s = solve_exact_device(prob, block_a=1024, block_b=1 << 15)
    rows.append(dict(name=name, shipped=gs, exact=e, match=bool(e == gs),
                     wall_s=round(time.perf_counter() - t0, 2)))
    print(rows[-1], flush=True)
with open("results/exact_device_n40.json", "w") as f:
    json.dump(rows, f, indent=1)
print("matches:", sum(r["match"] for r in rows), "/", len(rows))
EOF
echo "EXACT DEVICE N40 DONE"
