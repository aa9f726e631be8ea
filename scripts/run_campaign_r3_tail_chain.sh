#!/bin/bash
# Round-3 TAIL chain: resumes deep-budget campaign work AFTER the
# driver's end-of-round bench window, without knowing the exact round
# boundary.
#
# Why the gate: the round-2 verdict (weak #2) traced a 34% bench-artifact
# regression to campaign contention on the shared chip. The round end is
# only estimated (~20:00 or ~21:30 UTC candidates), so instead of a
# wall-clock guess this chain watches PROGRESS.jsonl (the driver appends
# a row every ~15 min with the current round number):
#   - last row shows round >= 4  -> round 3 ended, bench done, GO
#   - 22:00 UTC passes and rows still say round 3 -> the round runs long
#     (ends ~06:30), safe to GO until DEADLINE
# Either way nothing heavy runs during a plausible bench window.
#
# Queue protocol identical to run_campaign_r3_chain.sh: consumes
# scripts/r3t_queue/*.sh sorted, moves to .done, logs alongside.
set -x
cd /root/repo
QUEUE=scripts/r3t_queue
mkdir -p results/campaign "$QUEUE"
echo $$ > /tmp/r3_tail_chain.pid

export DEADLINE=${DEADLINE:-1787029800}   # 05:50 UTC, ~40 min before a
                                          # 06:30 round end (worst case)

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

while :; do
  rem=$((DEADLINE - $(date +%s)))
  [ "$rem" -lt 600 ] && break
  next=$(ls $QUEUE/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$next" ]; then sleep 60; continue; fi
  echo "QUEUE: running $next (rem=${rem}s)"
  bash "$next" > "${next%.sh}.log" 2>&1
  mv "$next" "${next}.done"
done
echo "TAIL CHAIN DONE"
