"""Pin the driver artifacts: __graft_entry__.dryrun_multichip must stay green.

Round-2 regression: an skR parameterization bug in the entry file broke the
8-device dryrun (MULTICHIP_r02.json rc=1) while the library itself was fine.
These tests execute the SAME code path the driver runs, on the same
8-virtual-CPU mesh the conftest provides, so the artifact can never silently
regress again. Reference-equivalent being validated: the process-pool replica
parallelism at /root/reference/NPT/npt.py:616-640.
"""

import jax
import pytest

import __graft_entry__ as graft


def test_dryrun_multichip_8_devices():
    """The full driver dryrun: every sharded path on an 8-device mesh."""
    assert len(jax.devices()) >= 8
    graft.dryrun_multichip(8)  # raises on any regression


def test_dryrun_multichip_2_devices():
    """The R_local % 8 gate must hold on ANY device count, not just 8."""
    graft.dryrun_multichip(2)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    m, e_best = out
    assert m.shape[0] == 64  # R replicas
    import numpy as np
    assert np.isfinite(np.asarray(e_best)).all()
