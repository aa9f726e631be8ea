"""Instance loaders (4 dialects), ground-truth readers, generators."""

import os

import numpy as np
import pytest

from nmc_tpu.io.generators import (contrived_wishart_backbone, ea_2d, ea_3d,
                                   random_sk, wishart_planted)
from nmc_tpu.io.loaders import (load_chimera, load_contrived_tree, load_dcl,
                                load_wishart, read_gs_energies,
                                read_otn2d_groundstates)

REF = "/root/reference"


class TestLoaders:
    def test_wishart_dialect(self, tmp_path):
        p = tmp_path / "w.txt"
        p.write_text("# comment\n0 1 2.0\n1 2 -1.5\n2 2 9.9\n")
        prob = load_wishart(str(p))
        assert prob.n == 3
        assert prob.J[0, 1] == -2.0 and prob.J[1, 0] == -2.0  # negated
        assert prob.J[1, 2] == 1.5
        assert prob.J[2, 2] == 0.0  # diagonal skipped
        assert np.all(prob.h == 0)

    def test_chimera_dialect(self, tmp_path):
        p = tmp_path / "c.txt"
        p.write_text("#\n1 1 0.25\n1 2 1.0\n2 2 -0.5\n")
        prob = load_chimera(str(p))
        assert prob.n == 2
        assert prob.h[0] == -0.25 and prob.h[1] == 0.5
        assert prob.J[0, 1] == -1.0

    def test_contrived_tree_dialect(self, tmp_path):
        p = tmp_path / "t.txt"
        p.write_text("0 0 0.3\n0 1 -1.0\n")
        prob = load_contrived_tree(str(p))
        assert prob.n == 2
        assert prob.h[0] == -0.3
        assert prob.J[0, 1] == 1.0

    def test_gs_energies_reader(self, tmp_path):
        p = tmp_path / "gs_energies.txt"
        p.write_text("inst_1.txt\t-55616\ninst_2.txt\t-56452\n")
        gs = read_gs_energies(str(p))
        assert gs["inst_1.txt"] == -55616

    def test_otn2d_reader(self, tmp_path):
        p = tmp_path / "groundstates_otn2d.txt"
        p.write_text("001.txt : -210.933333 0 1 1 0\n")
        out = read_otn2d_groundstates(str(p))
        e, state = out["001.txt"]
        assert e == -210.933333
        np.testing.assert_array_equal(state, [-1, 1, 1, -1])


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
class TestRealInstances:
    def test_wishart_instance_energy_matches_gs(self):
        folder = os.path.join(
            REF, "NPT/examples/wishart_small/wishart_planting_N_22_alpha_0.50")
        gs = read_gs_energies(os.path.join(folder, "gs_energies.txt"))
        name = "wishart_planting_N_22_alpha_0.50_inst_1.txt"
        prob = load_wishart(os.path.join(folder, name))
        assert prob.n == 22
        assert name in gs
        # the planted gs energy must be achievable: check it's below the
        # energy of 200 random states (sanity, not solving here)
        rng = np.random.default_rng(0)
        rand_e = prob.energy(np.sign(rng.normal(size=(200, 22))))
        assert gs[name] < rand_e.min()

    def test_chimera512_mat_matches_txt(self):
        """chimera512's JJ.mat/h.mat hold instance 001 (negated, scaled
        1/5); after rescale the loader must equal the .txt path exactly,
        and ground_energies.mat must equal groundstates_otn2d.txt —
        a free cross-check on loader sign/index conventions (VERDICT r2
        missing #5)."""
        from nmc_tpu.io.loaders import (load_chimera_mat,
                                        read_ground_energies_mat)
        folder = os.path.join(
            REF, "NMC/examples/Chimera_droplet_instances/chimera512_spinglass_power")
        pm = load_chimera_mat(folder)
        pt = load_chimera(os.path.join(folder, "001.txt"))
        assert pm.n == pt.n == 512
        np.testing.assert_allclose(np.asarray(pm.J), np.asarray(pt.J),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(pm.h).ravel(),
                                   np.asarray(pt.h).ravel(), atol=1e-9)
        ge = read_ground_energies_mat(
            os.path.join(folder, "ground_energies.mat"))
        gs = read_otn2d_groundstates(
            os.path.join(folder, "groundstates_otn2d.txt"))
        assert ge.shape == (100,)
        for i in range(100):
            np.testing.assert_allclose(ge[i], gs[f"{i+1:03d}.txt"][0],
                                       atol=1e-6)
        # and the .mat ground energy must be the energy of the shipped
        # ground state under the .mat-loaded problem
        e0, state0 = gs["001.txt"]
        np.testing.assert_allclose(pm.energy(state0.astype(float)), e0,
                                   atol=1e-3)

    def test_chimera128_instance_gs_state_energy(self):
        folder = os.path.join(
            REF, "NMC/examples/Chimera_droplet_instances/chimera128_spinglass_power")
        prob = load_chimera(os.path.join(folder, "001.txt"))
        out = read_otn2d_groundstates(
            os.path.join(folder, "groundstates_otn2d.txt"))
        e_gs, state = out["001.txt"]
        assert prob.n == state.shape[0] == 128
        # the shipped ground state must evaluate to the shipped energy
        np.testing.assert_allclose(prob.energy(state.astype(float)), e_gs,
                                   atol=1e-4)


class TestGenerators:
    def test_sk_properties(self):
        prob = random_sk(32, seed=0)
        assert np.allclose(prob.J, prob.J.T)
        assert np.all(np.diag(prob.J) == 0)

    def test_ea2d_degree(self):
        prob = ea_2d(4, seed=0)
        deg = (prob.J != 0).sum(axis=1)
        np.testing.assert_array_equal(deg, 4)  # torus: 4 neighbors each
        assert set(np.unique(prob.J[prob.J != 0])) <= {-1.0, 1.0}

    def test_ea3d_degree(self):
        prob = ea_3d(3, seed=0)
        deg = (prob.J != 0).sum(axis=1)
        assert np.all(deg == 6)

    def test_wishart_planted_state_is_local_min(self):
        prob, t, e_gs = wishart_planted(24, alpha=0.6, seed=1)
        np.testing.assert_allclose(prob.energy(t), e_gs)
        # single-flip stability: every neighbor has higher energy
        for i in range(24):
            t2 = t.copy()
            t2[i] *= -1
            assert prob.energy(t2) > e_gs - 1e-12
        # global check by brute force on a smaller instance
        small, ts, es = wishart_planted(14, alpha=0.6, seed=2)
        import itertools
        states = np.array(list(itertools.product([-1, 1], repeat=14)), float)
        assert abs(small.energy(states).min() - es) < 1e-9

    def test_contrived_backbone(self):
        prob, t, e_gs = contrived_wishart_backbone(6, alpha=0.5, seed=3)
        assert prob.n == 6 + 6 * 6  # depth-2 binary trees: 6 nodes each
        np.testing.assert_allclose(prob.energy(t), e_gs)
        # planted state is single-flip stable
        for i in range(prob.n):
            t2 = t.copy()
            t2[i] *= -1
            assert prob.energy(t2) > e_gs - 1e-12


def test_chimera_graph_generator():
    from nmc_tpu.io.generators import chimera_graph
    from nmc_tpu.ops.coloring import num_colors
    prob = chimera_graph(2, 2, t=4, seed=0)
    assert prob.n == 2 * 4 * 2 * 2  # 2*t*m*n = 32
    assert np.allclose(prob.J, prob.J.T)
    # degree: intra-cell t plus up to 2 inter-cell links
    deg = (prob.J != 0).sum(axis=1)
    assert deg.min() >= 4 and deg.max() <= 6
    assert num_colors(prob.J) <= 4


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_dcl_solution_reader_and_instance():
    from nmc_tpu.io.loaders import read_dcl_solution
    folder = os.path.join(REF, "NMC/examples/DCL_instances/C8")
    meta = read_dcl_solution(os.path.join(folder, "01_sol.txt"))
    assert meta["min_energy"] == -368.57143
    from nmc_tpu.io.loaders import load_dcl
    prob = load_dcl(os.path.join(folder, "01.txt"))
    assert prob.n >= 455  # nq from metadata (some qubits may be isolated)
    # planted energy must beat random states
    rng = np.random.default_rng(0)
    rand_e = prob.energy(np.sign(rng.normal(size=(100, prob.n))))
    assert meta["min_energy"] < rand_e.min()


class TestContrivedReferenceParity:
    """Reference-faithful contrived generator (VERDICT round 1 #10)."""

    REF = ("/root/reference/NMC/examples/contrived_wishart_backbone/"
           "wishart_contrived_trees/wishart_planting_N_10_alpha_0.20"
           "_contrived_tree/wishart_planting_N_10_alpha_0.20_inst_1"
           "_contrived_tree.txt")
    CORES = ("/root/reference/NMC/examples/contrived_wishart_backbone/"
             "wishart_planting_N_10_alpha_0.20")

    def test_structure_matches_shipped_instance(self, tmp_path):
        """Same topology class as a reference-GENERATED instance: node
        count, complete core, binary-tree degrees, core scale, h range."""
        from nmc_tpu.io.generators import contrived_wishart_backbone_reference
        from nmc_tpu.io.loaders import load_contrived_tree, load_wishart
        ref = load_contrived_tree(self.REF)
        core = load_wishart(os.path.join(
            self.CORES, "wishart_planting_N_10_alpha_0.20_inst_1.txt"))
        ours = contrived_wishart_backbone_reference(
            10, levels=2, alpha=0.20, seed=1346, core=core,
            num_cross_connections=50)
        assert ours.n == ref.n == 10 * (2 ** 3 - 1)
        # complete 10-node core, scaled to max weight 10 in BOTH
        for prob in (ref, ours):
            corej = prob.J[:10, :10]
            assert np.count_nonzero(corej) == 90
            np.testing.assert_allclose(np.abs(corej).max(), 10.0, rtol=1e-6)
        # identical core couplings (same shipped core instance, same scaling)
        np.testing.assert_allclose(ours.J[:10, :10], ref.J[:10, :10],
                                   rtol=1e-6)
        # off-core weights bounded by max_outside_weight; h by 2*max_h*10
        for prob in (ref, ours):
            off = prob.J[10:, :]
            assert np.abs(off).max() <= 1.0 + 1e-9
            assert np.abs(prob.h).max() <= 2.0 + 1e-9
            # total edges: core 45 + trees 10*6 + 50 cross (minus any
            # cross link landing on an existing tree edge)
            e = np.count_nonzero(np.triu(prob.J, 1))
            assert 45 + 60 <= e <= 45 + 60 + 50

    def test_emit_ensemble_roundtrip(self, tmp_path):
        from nmc_tpu.io.generators import emit_contrived_ensemble
        from nmc_tpu.io.loaders import load_contrived_tree
        paths = emit_contrived_ensemble(
            str(tmp_path), 2, base_seed=7, n_backbone=10, levels=2,
            alpha=0.20, cores_folder=self.CORES, num_cross_connections=20)
        assert len(paths) == 2
        assert paths[0].endswith(
            "wishart_planting_N_10_alpha_0.20_contrived_tree/"
            "wishart_planting_N_10_alpha_0.20_inst_1_contrived_tree.txt")
        p = load_contrived_tree(paths[0])
        assert p.n == 70 and np.abs(p.J[:10, :10]).max() > 9.99
        assert np.count_nonzero(p.h) > 0

    def test_remove_edges_quirk(self):
        """Reference order reinstates removed core edges via the core
        overwrite; remove_after_core=True actually removes them."""
        from nmc_tpu.io.generators import contrived_wishart_backbone_reference
        quirky = contrived_wishart_backbone_reference(
            8, levels=1, seed=3, num_remove_edges=5)
        assert np.count_nonzero(np.triu(quirky.J[:8, :8], 1)) == 28
        real = contrived_wishart_backbone_reference(
            8, levels=1, seed=3, num_remove_edges=5, remove_after_core=True)
        assert np.count_nonzero(np.triu(real.J[:8, :8], 1)) == 23
