#!/bin/bash
# Round-3 segment-2 chain: the axon tunnel recovered ~11:55 UTC Aug 18
# after a 16h outage; drain the r3t_queue immediately (no round gate).
# DEADLINE leaves ~45 min of idle chip before the driver's end-of-round
# bench capture.
set -x
cd /root/repo
QUEUE=scripts/r3t_queue
mkdir -p results/campaign "$QUEUE"
echo $$ > /tmp/r3_seg2_chain.pid

export DEADLINE=${DEADLINE:-1787089200}   # 21:40 UTC Aug 18

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
echo "SEG2 CHAIN DONE"
