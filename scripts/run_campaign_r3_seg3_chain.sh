#!/bin/bash
# Round-3 segment-3 chain (contingency): if the round outlives the
# seg2 deadline (21:40 UTC Aug 18), drain the remaining r3t_queue items
# with an extended deadline. Same structure as seg2: liveness-probed,
# one item at a time, logs + .done markers, resumable runners inside.
# Launch with: DEADLINE=<epoch> bash scripts/run_campaign_r3_seg3_chain.sh
set -x
cd /root/repo
QUEUE=scripts/r3t_queue
mkdir -p results/campaign "$QUEUE"
echo $$ > /tmp/r3_seg3_chain.pid

export DEADLINE=${DEADLINE:?set DEADLINE explicitly for seg3}

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
done
echo "SEG3 CHAIN DONE"
