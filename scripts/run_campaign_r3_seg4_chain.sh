#!/bin/bash
# Round-3 segment-4 chain (session restarted 2026-08-19 02:09 UTC with
# the TPU tunnel back up). Drains scripts/r3s4_queue ordered by
# coverage gain per TPU-hour: dcl16 family fill (+~80 expected),
# chimera2048 beam-seeded ICM (+~20), chimera1152 closure (7 left),
# LBP-planes A/B, chimera2048 beam resume + pass-2 seeding, dcl16 02
# retry. Liveness-probed, one item at a time, logs + .done markers,
# resumable runners inside.
# Launch with: DEADLINE=<epoch> bash scripts/run_campaign_r3_seg4_chain.sh
set -x
cd /root/repo
QUEUE=scripts/r3s4_queue
mkdir -p results/campaign "$QUEUE"
echo $$ > /tmp/r3_seg4_chain.pid

export DEADLINE=${DEADLINE:?set DEADLINE explicitly for seg4}

tpu_alive() {
  timeout 150 python - <<'PY' >/dev/null 2>&1
import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
(jnp.ones((128,128)) @ jnp.ones((128,128))).block_until_ready()
PY
}

while :; do
  rem=$((DEADLINE - $(date +%s)))
  [ "$rem" -lt 600 ] && break
  next=$(ls $QUEUE/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$next" ]; then echo "QUEUE EMPTY"; break; fi
  if ! tpu_alive; then
    echo "PROBE: TPU unreachable, holding queue (rem=${rem}s)"; sleep 120
    continue
  fi
  echo "QUEUE: running $next (rem=${rem}s)"
  bash "$next" > "${next%.sh}.log" 2>&1
  mv "$next" "${next}.done"
  python scripts/coverage_report.py > /tmp/coverage_now.md 2>/dev/null
done
echo "SEG4 CHAIN DONE"
