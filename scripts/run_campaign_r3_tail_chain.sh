#!/bin/bash
# Round-3 TAIL chain v2: adds a TPU liveness probe before each queue item
# (the axon tunnel went unreachable ~20:05-20:50 UTC; items must not burn
# their timeout budgets against a dead tunnel). Same bench-window gate as
# v1: wait for the driver to reach round >= 4 in PROGRESS.jsonl, or for
# 22:00 UTC if the round runs long.
set -x
cd /root/repo
QUEUE=scripts/r3t_queue
mkdir -p results/campaign "$QUEUE"
echo $$ > /tmp/r3_tail_chain.pid

export DEADLINE=${DEADLINE:-1787029800}   # 05:50 UTC

LATE=1787004000                           # 22:00 UTC
while :; do
  now=$(date +%s)
  [ "$now" -ge "$LATE" ] && { echo "GATE: 22:00 passed, round runs long"; break; }
  last_round=$(tail -1 PROGRESS.jsonl 2>/dev/null \
               | sed -n 's/.*"round": *\([0-9]*\).*/\1/p')
  if [ -n "$last_round" ] && [ "$last_round" -ge 4 ]; then
    echo "GATE: driver moved to round $last_round, bench done"; break
  fi
  sleep 60
done

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
  if [ -z "$next" ]; then sleep 60; continue; fi
  if ! tpu_alive; then
    echo "PROBE: TPU unreachable, holding queue (rem=${rem}s)"; sleep 120
    continue
  fi
  echo "QUEUE: running $next (rem=${rem}s)"
  bash "$next" > "${next%.sh}.log" 2>&1
  mv "$next" "${next}.done"
done
echo "TAIL CHAIN v2 DONE"
