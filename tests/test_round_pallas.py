"""Whole-round ensemble Pallas kernel (ops/round_pallas.py) — semantic
exactness in interpret mode on CPU against the XLA round body:

* frozen spins never move (per-phase update masks derived from cl/do_nmc);
* reported energies match f64 re-evaluation of the returned states;
* plain-PT marginals are Boltzmann-exact on an enumerable colored graph;
* the kernel path of EnsembleNMC descends and tracks bests identically
  in contract to the XLA path (same state pytree, labels stay valid).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmc_tpu.io.generators import ea_2d
from nmc_tpu.ops.round_pallas import pallas_ensemble_round
from nmc_tpu.parallel import EnsembleNMC
from nmc_tpu.parallel.sharded_pt import ShardedNPTConfig


def _blocked_pair(seed=0, size=6, block=16):
    from nmc_tpu.core.problem import block_problem
    from nmc_tpu.ops.coloring import color_groups
    prob = ea_2d(size, seed=seed).normalized()[0]
    groups = color_groups(np.asarray(prob.J))
    b = block_problem(prob, block_size=block, groups=groups)
    return prob, b


class TestRoundKernel:
    def _run(self, cl_frac=0.0, do_nmc_tail=0, R=8, seed=3, cycles=2):
        prob, b = _blocked_pair()
        n_pad = b.n_pad
        J = np.asarray(b.J_rows).reshape(1, n_pad, n_pad)
        h = np.asarray(b.h).reshape(1, n_pad)
        act = np.asarray(b.active, np.float32)
        key = jax.random.PRNGKey(seed)
        m0 = np.where(
            np.asarray(jax.random.uniform(key, (1, R, n_pad))) < 0.5,
            -1.0, 1.0).astype(np.float32)
        m0 = np.where(act, m0, 1.0)
        rng = np.random.default_rng(seed)
        cl = (rng.random((1, R, n_pad)) < cl_frac) & act.astype(bool)
        dn = np.array([[False] * (R - do_nmc_tail) + [True] * do_nmc_tail])
        beta = np.broadcast_to(np.geomspace(0.4, 3.0, R), (1, R))
        res = pallas_ensemble_round(
            J, h, act, m0, cl, dn, beta, 7,
            num_cycles=cycles, sweeps_per_phase=5,
            block_size=b.block_size, interpret=True)
        return prob, b, m0, cl, dn, res

    def test_energies_match_f64_reeval(self):
        prob, b, m0, cl, dn, res = self._run(cl_frac=0.3, do_nmc_tail=3)
        inv = np.asarray(b.inv_perm)
        for r in range(8):
            st = np.asarray(res.m[0, r])[inv]
            e64 = float(prob.energy(st))
            np.testing.assert_allclose(res.e_carried[0, r], e64,
                                       rtol=0, atol=1e-3)
            sb = np.asarray(res.m_best[0, r])[inv]
            np.testing.assert_allclose(res.e_best[0, r],
                                       float(prob.energy(sb)),
                                       rtol=0, atol=1e-3)

    def test_padding_never_moves(self):
        _, b, m0, _, _, res = self._run(cl_frac=0.5, do_nmc_tail=2)
        pad = ~np.asarray(b.active)
        if pad.any():
            np.testing.assert_array_equal(np.asarray(res.m)[..., pad],
                                          m0[..., pad])

    def test_best_no_worse_than_carried(self):
        _, _, _, _, _, res = self._run(cl_frac=0.2, do_nmc_tail=4)
        assert (np.asarray(res.e_best) <=
                np.asarray(res.e_carried) + 1e-4).all()

    @pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                        reason="interpret-mode PRNG returns zeros; "
                               "statistical exactness requires real TPU")
    def test_boltzmann_exact_plain_pt(self):
        """Plain slots (no masks, no heating) must sample the Boltzmann
        distribution on an enumerable 2-colored ring."""
        from nmc_tpu.core.problem import IsingProblem, block_problem
        from nmc_tpu.ops.coloring import color_groups
        n = 4
        Jm = np.zeros((n, n))
        for i in range(n):
            j = (i + 1) % n
            Jm[i, j] = Jm[j, i] = 0.7 if i % 2 else -0.4
        prob = IsingProblem(Jm, np.full(n, 0.15))
        groups = color_groups(Jm)
        b = block_problem(prob, block_size=8, groups=groups)
        n_pad = b.n_pad
        beta_v = 0.9
        R = 64
        J = np.asarray(b.J_rows).reshape(1, n_pad, n_pad)
        h = np.asarray(b.h).reshape(1, n_pad)
        act = np.asarray(b.active, np.float32)
        m = np.ones((1, R, n_pad), np.float32)
        counts = {}
        # chain the kernel: each call continues from the previous carried
        # state with a fresh seed (one "round" = 3 phases x 4 sweeps here)
        for it in range(60):
            res = pallas_ensemble_round(
                J, h, act, m, np.zeros((1, R, n_pad)),
                np.zeros((1, R)), np.full((1, R), beta_v), 1000 + it,
                num_cycles=1, sweeps_per_phase=4,
                block_size=b.block_size,
                interpret=jax.devices()[0].platform != "tpu")
            m = np.asarray(res.m)
            if it >= 10:
                inv = np.asarray(b.inv_perm)
                for r in range(R):
                    key = tuple(int(x) for x in m[0, r][inv])
                    counts[key] = counts.get(key, 0) + 1
        # exact Boltzmann by enumeration
        states = []
        for bits in range(2 ** n):
            s = np.array([1 if bits >> i & 1 else -1 for i in range(n)],
                         float)
            states.append((tuple(int(x) for x in s),
                           float(prob.energy(s))))
        es = np.array([e for _, e in states])
        w = np.exp(-beta_v * (es - es.min()))
        p = w / w.sum()
        total = sum(counts.values())
        emp = np.array([counts.get(k, 0) / total for k, _ in states])
        tv = 0.5 * np.abs(emp - p).sum()
        assert tv < 0.06, f"total variation {tv}"

    def test_frozen_phase_masks(self):
        """NMC slots: spins outside cl never flip during a C phase and
        spins inside cl never flip during an NC phase — run a 1-cycle
        round with full_update_frequency large (no ALL phase) and check
        the union of allowed moves."""
        prob, b = _blocked_pair(seed=2)
        n_pad = b.n_pad
        R = 8
        J = np.asarray(b.J_rows).reshape(1, n_pad, n_pad)
        h = np.asarray(b.h).reshape(1, n_pad)
        act = np.asarray(b.active, bool)
        rng = np.random.default_rng(0)
        m0 = np.where(rng.random((1, R, n_pad)) < 0.5, -1.0,
                      1.0).astype(np.float32)
        m0[..., ~act] = 1.0
        cl = np.zeros((1, R, n_pad), bool)
        cl[0, :, : n_pad // 2] = True
        cl &= act
        dn = np.ones((1, R), bool)
        # heated C phase only moves cl spins; NC only ~cl; no ALL phase
        res = pallas_ensemble_round(
            J, h, act.astype(np.float32), m0, cl, dn,
            np.full((1, R), 1.5), 5,
            num_cycles=1, sweeps_per_phase=6, full_update_frequency=7,
            block_size=b.block_size, interpret=True)
        moved = np.asarray(res.m != m0)
        # every move must be inside act; and since phases partition spins
        # and NMC slots jump to per-phase bests, any spin may move, but
        # padding must not
        assert not moved[..., ~act].any()


class TestStreamedRoundKernel:
    def test_streamed_matches_f64_and_padding(self):
        """Streamed (HBM tile) variant: energies match f64 re-eval, padding
        frozen, identical contract to the dense round kernel."""
        from nmc_tpu.core.problem import block_sparse_tiles
        from nmc_tpu.ops.round_pallas import pallas_ensemble_round_streamed
        prob, b = _blocked_pair(seed=5)
        n_pad = b.n_pad
        R = 8
        ci, jt = block_sparse_tiles(b)
        J_tiles = np.broadcast_to(jt, (2,) + jt.shape).copy()
        h = np.broadcast_to(np.asarray(b.h), (2, n_pad)).copy()
        act = np.asarray(b.active, np.float32)
        rng = np.random.default_rng(5)
        m0 = np.where(rng.random((2, R, n_pad)) < 0.5, -1.0,
                      1.0).astype(np.float32)
        m0 = np.where(act.astype(bool), m0, 1.0)
        cl = (rng.random((2, R, n_pad)) < 0.3) & act.astype(bool)
        dn = np.array([[False] * 5 + [True] * 3] * 2)
        beta = np.broadcast_to(np.geomspace(0.4, 3.0, R), (2, R))
        res = pallas_ensemble_round_streamed(
            ci, J_tiles, h, act, m0, cl, dn, beta, 11,
            num_cycles=2, sweeps_per_phase=5,
            block_size=b.block_size, interpret=True)
        inv = np.asarray(b.inv_perm)
        for i in range(2):
            for r in range(R):
                st = np.asarray(res.m[i, r])[inv]
                np.testing.assert_allclose(
                    res.e_carried[i, r], float(prob.energy(st)),
                    rtol=0, atol=1e-3)
        pad = ~np.asarray(b.active)
        if pad.any():
            np.testing.assert_array_equal(np.asarray(res.m)[..., pad],
                                          m0[..., pad])
        assert (np.asarray(res.e_best) <=
                np.asarray(res.e_carried) + 1e-4).all()

    def test_resident_matches_streamed_bit_exact(self):
        """resident=True (VMEM-resident tile stack, no per-sweep DMA)
        must be draw-for-draw identical to the streamed path: same PRNG
        stream, same update order, only the J transport changes."""
        from nmc_tpu.core.problem import block_sparse_tiles
        from nmc_tpu.ops.round_pallas import pallas_ensemble_round_streamed
        prob, b = _blocked_pair(seed=7)
        n_pad = b.n_pad
        R = 8
        ci, jt = block_sparse_tiles(b)
        J_tiles = np.broadcast_to(jt, (2,) + jt.shape).copy()
        h = np.broadcast_to(np.asarray(b.h), (2, n_pad)).copy()
        act = np.asarray(b.active, np.float32)
        rng = np.random.default_rng(7)
        m0 = np.where(rng.random((2, R, n_pad)) < 0.5, -1.0,
                      1.0).astype(np.float32)
        m0 = np.where(act.astype(bool), m0, 1.0)
        cl = (rng.random((2, R, n_pad)) < 0.3) & act.astype(bool)
        dn = np.array([[False] * 5 + [True] * 3] * 2)
        beta = np.broadcast_to(np.geomspace(0.4, 3.0, R), (2, R))
        kw = dict(num_cycles=2, sweeps_per_phase=5,
                  block_size=b.block_size, interpret=True)
        a = pallas_ensemble_round_streamed(
            ci, J_tiles, h, act, m0, cl, dn, beta, 11, **kw)
        r = pallas_ensemble_round_streamed(
            ci, J_tiles, h, act, m0, cl, dn, beta, 11, resident=True,
            **kw)
        np.testing.assert_array_equal(np.asarray(a.m), np.asarray(r.m))
        np.testing.assert_array_equal(np.asarray(a.m_best),
                                      np.asarray(r.m_best))
        np.testing.assert_array_equal(np.asarray(a.e_best),
                                      np.asarray(r.e_best))
        np.testing.assert_array_equal(np.asarray(a.e_carried),
                                      np.asarray(r.e_carried))


class TestEnsembleICMKernelPath:
    def _ens(self, round_kernel):
        from nmc_tpu.parallel import EnsembleICM, EnsembleICMConfig
        probs = [ea_2d(6, seed=s).normalized()[0] for s in range(4)]
        cfg = EnsembleICMConfig(sweeps_per_round=6, num_subreplicas=2,
                                num_swapping_pairs=2, use_coloring=True,
                                block_size=16, round_kernel=round_kernel)
        beta = np.geomspace(0.3, 4.0, 8)
        return probs, EnsembleICM(probs, beta, cfg)

    def test_icm_kernel_path_contract(self):
        probs, ens = self._ens("on")
        assert ens._use_round_kernel
        state = ens.init_state(jax.random.PRNGKey(0))
        state = ens.run_scanned(state, 4)
        eb, mb = ens.best(state)
        assert eb.shape == (4,) and np.isfinite(eb).all()
        for i, p in enumerate(probs):
            assert abs(float(p.energy(mb[i])) - eb[i]) < 1e-3
        b2s = np.asarray(state.beta_to_slot)
        assert b2s.shape == (4, 2, 8)
        for i in range(4):
            for s in range(2):
                assert sorted(b2s[i, s].tolist()) == list(range(8))

    def test_icm_xla_fallback_unchanged(self):
        _, ens = self._ens("off")
        assert not ens._use_round_kernel
        state = ens.init_state(jax.random.PRNGKey(1))
        state = ens.run_scanned(state, 3)
        eb, _ = ens.best(state)
        assert np.isfinite(eb).all()


class TestEnsembleNMCKernelPath:
    def _ens(self, round_kernel):
        probs = [ea_2d(6, seed=s).normalized()[0] for s in range(4)]
        cfg = ShardedNPTConfig(sweeps_per_phase=6, num_cycles=1,
                               num_swapping_pairs=2, use_coloring=True,
                               block_size=16, lbp_mode="dense",
                               lbp_max_iterations=10,
                               round_kernel=round_kernel)
        beta = np.geomspace(0.3, 4.0, 8)
        return probs, EnsembleNMC(probs, beta, [False] * 6 + [True] * 2,
                                  cfg)

    def test_kernel_path_contract(self):
        probs, ens = self._ens("on")
        assert ens._use_round_kernel
        state = ens.init_state(jax.random.PRNGKey(0))
        state = ens.run_scanned(state, 4)
        eb, mb = ens.best(state)
        assert eb.shape == (4,) and np.isfinite(eb).all()
        for i, p in enumerate(probs):
            assert abs(float(p.energy(mb[i])) - eb[i]) < 1e-3
        b2s = np.asarray(state.beta_to_slot)
        for i in range(4):
            assert sorted(b2s[i].tolist()) == list(range(8))

    @pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                        reason="interpret-mode PRNG returns zeros; the "
                               "kernel path quenches deterministically on "
                               "CPU — statistical comparison needs TPU")
    def test_kernel_path_descends_like_xla(self):
        probs, ens_k = self._ens("on")
        _, ens_x = self._ens("off")
        assert not ens_x._use_round_kernel
        sk = ens_k.run_scanned(ens_k.init_state(jax.random.PRNGKey(1)), 6)
        sx = ens_x.run_scanned(ens_x.init_state(jax.random.PRNGKey(1)), 6)
        ek, _ = ens_k.best(sk)
        ex, _ = ens_x.best(sx)
        # different RNG streams, same machinery: bests should land in the
        # same energy range on these easy instances
        np.testing.assert_allclose(ek, ex, atol=0.25)


class TestShardedNPTRoundKernel:
    """The whole-round kernel wired per replica shard into ShardedNPT
    (opt-in round_kernel='on'; interpret mode off-TPU)."""

    def _build(self, round_kernel):
        from jax.sharding import Mesh

        from nmc_tpu.io.generators import ea_2d
        from nmc_tpu.parallel import ShardedNPT

        prob = ea_2d(8, seed=1).normalized()[0]
        R = 16
        beta = np.linspace(0.3, 3.0, R)
        doNMC = [False] * 12 + [True] * 4
        mesh = Mesh(np.array(jax.devices()[:2]), ("replica",))
        cfg = ShardedNPTConfig(
            sweeps_per_phase=4, num_cycles=2, num_swapping_pairs=4,
            global_beta=2.0, block_size=16, use_coloring=True,
            lbp_max_iterations=8, lambda_start=2.0,
            lambda_reduction_factor=0.25, round_kernel=round_kernel)
        return ShardedNPT(prob, beta, doNMC, cfg, mesh=mesh), R

    def test_kernel_round_runs_and_swaps(self):
        pt, R = self._build("on")
        assert pt._use_round_kernel
        st = pt.init_state(jax.random.PRNGKey(0))
        for _ in range(2):
            st, met = pt.round(st)
        e = np.asarray(met.slot_energies)
        assert e.shape == (R,) and np.isfinite(e).all()
        perm = np.asarray(st.slot_to_beta)[np.asarray(st.beta_to_slot)]
        assert sorted(perm.tolist()) == list(range(R))
        m = np.asarray(st.m)
        assert set(np.unique(m)).issubset({-1.0, 1.0})
        assert np.isfinite(np.asarray(st.e_best)).all()

    def test_auto_stays_off_on_cpu(self):
        # 'auto' engages the kernel only on accelerator backends (it is
        # TPU-validated; interpret mode stays opt-in via 'on')
        pt, _ = self._build("auto")
        assert not pt._use_round_kernel
