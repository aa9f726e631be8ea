set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
[ "$rem" -lt 900 ] && { echo "DEADLINE: skip houdayer blocked profile"; exit 0; }
# re-run the phase breakdown: now also times the blocked union-tile
# Houdayer (the new 'auto' fast path) vs the edge-list segment_min one,
# and checks move parity on device at chimera2048 scale
timeout 900 python scripts/profile_icm_phases.py \
  --out results/icm_phase_breakdown_blocked.json \
  || echo "blocked houdayer profile failed (continuing)"
echo "HOUDAYER BLOCKED PROFILE DONE"
