"""Pin the idle-chip capture protocol between bench.py and the campaign
chains (scripts/chainctl.sh).

The round-2 bench artifact was depressed 34% by capture-time contention
with in-flight campaign runs (VERDICT r2 weak #2: "gate the capture on
an idle chip"). The protocol: bench writes a stop file; chains poll it,
kill their in-flight item, and exit. Both directions are exercised here
on CPU with stand-in workloads — no TPU or real chain needed.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def test_quiesce_noop_without_live_pids(tmp_path):
    pidf = tmp_path / "chain.pids"
    pidf.write_text("999999\n")            # not a live pid
    stop = tmp_path / "stop"
    t0 = time.time()
    bench._quiesce_chains(wait_s=30, pid_files=(str(pidf),),
                          stop_file=str(stop))
    assert time.time() - t0 < 5
    assert not stop.exists()


def test_quiesce_stops_a_polling_chain(tmp_path):
    """A stand-in 'chain' that polls the stop file like chainctl.sh
    must be asked to stop and be gone when _quiesce_chains returns."""
    stop = tmp_path / "stop"
    script = (f"while [ ! -f {stop} ]; do sleep 0.2; done; exit 0")
    proc = subprocess.Popen(["bash", "-c", script])
    pidf = tmp_path / "chain.pids"
    pidf.write_text(f"{proc.pid}\n")
    t0 = time.time()
    bench._quiesce_chains(wait_s=30, pid_files=(str(pidf),),
                          stop_file=str(stop))
    took = time.time() - t0
    assert stop.exists()                   # the claim was posted
    assert proc.poll() is not None         # the chain exited
    assert took < 25


@pytest.mark.parametrize("mode", ["stop", "timeout", "normal"])
def test_run_gated_kills_item_on_stop(tmp_path, mode):
    """chainctl.run_gated: a stopped chain kills its in-flight item and
    exits 0; a timed-out item is killed with rc 124; a normal item's rc
    passes through."""
    stop = tmp_path / "stop"
    marker = tmp_path / "item_survived"
    if mode == "stop":
        body = (f"( sleep 1; touch {stop} ) & "
                f"run_gated 60 bash -c 'sleep 30; touch {marker}'; "
                f"echo rc=$?")
    elif mode == "timeout":
        body = (f"run_gated 2 bash -c 'sleep 30; touch {marker}'; "
                f"echo rc=$?")
    else:
        body = "run_gated 30 bash -c 'exit 7'; echo rc=$?"
    out = subprocess.run(
        ["bash", "-c",
         f"STOP={stop}; source {REPO}/scripts/chainctl.sh; STOP={stop}; "
         + body],
        capture_output=True, text=True, timeout=60)
    if mode == "stop":
        assert "CHAIN STOP" in out.stdout
        assert not marker.exists()
    elif mode == "timeout":
        assert "rc=124" in out.stdout
        assert not marker.exists()
    else:
        assert "rc=7" in out.stdout
