"""Beam boundary-DP chimera solver: exactness when the beam never
overflows, dominance-dedup validity at small beams, and orientation
remapping correctness. The large-family hit-rate evidence lives in
results/beam_*.jsonl (scripts/run_beam_chimera.py)."""

import numpy as np
import pytest

from test_exact_chimera import synth_chimera


@pytest.mark.parametrize("rows,cols", [(2, 2), (3, 2), (2, 3)])
def test_beam_exact_when_unpruned(rows, cols):
    """A beam wide enough to never prune is provably exact and must
    reproduce the dense DP's optimum."""
    from nmc_tpu.beam_chimera import solve_beam_chimera
    from nmc_tpu.exact_chimera import solve_exact_chimera

    prob = synth_chimera(rows, cols, seed=rows * 7 + cols)
    e_ref, _ = solve_exact_chimera(prob, rows=rows, cols=cols)
    cap = 16 ** (cols + 1)
    e, s, info = solve_beam_chimera(prob, rows=rows, cols=cols,
                                    beam=cap, expand_top=cap * 256)
    assert info["exact"]
    assert abs(e - e_ref) < 1e-9
    assert abs(float(prob.energy(s)) - e) < 1e-9


def test_beam_small_is_valid_upper_bound():
    """A tiny beam must still return a self-consistent state bounded
    below by the true optimum."""
    from nmc_tpu.beam_chimera import solve_beam_chimera
    from nmc_tpu.exact_chimera import solve_exact_chimera

    prob = synth_chimera(3, 3, seed=5)
    e_ref, _ = solve_exact_chimera(prob)
    e, s, info = solve_beam_chimera(prob, beam=64)
    assert not info["exact"]
    assert abs(float(prob.energy(s)) - e) < 1e-9
    assert e >= e_ref - 1e-9


def test_multi_orientation_remap():
    """Each orientation's returned state must evaluate to its reported
    energy in the ORIGINAL index space, and the best-of must be <= the
    identity orientation."""
    from nmc_tpu.beam_chimera import (solve_beam_chimera,
                                      solve_beam_chimera_multi)

    prob = synth_chimera(3, 2, seed=9)
    e_id, _, _ = solve_beam_chimera(prob, rows=3, cols=2, beam=128)
    e, s, info = solve_beam_chimera_multi(prob, rows=3, cols=2, beam=128)
    assert abs(float(prob.energy(s)) - e) < 1e-9
    assert e <= e_id + 1e-9
    assert 1 <= len(info["per_orientation"]) <= 4
