"""Verification-mode exact enumeration of cwb N=50 inst_18: use the
shipped ground-truth energy as the branch-and-bound radius (the standard
B&B-with-known-optimum setting — every MCMC arm also receives the target
for early stopping). Radius 2*(gs + q - c0) with q one coupling quantum:
any state strictly below gs + q is the ground state. Exhaustion without
a find would falsify the shipped truth.

Writes results/inst18_enum_proof.json; state to
results/inst18_ground_state_enum.txt on success.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np
    import scipy.linalg as sla

    from nmc_tpu.io.loaders import load_wishart
    from nmc_tpu.native import exact_enumerate

    inst = ("data/holdout_n18/"
            "wishart_planting_N_50_alpha_0.20_inst_18.txt")
    prob = load_wishart(inst)
    J = np.asarray(prob.J, np.float64)
    n = J.shape[0]
    gs = -616800.0
    w, v = np.linalg.eigh(J)
    lmax = float(w[-1])
    c0 = -0.5 * lmax * n
    M = np.sqrt(np.maximum(lmax - w, 0.0))[:, None] * v.T
    _, _, piv = sla.qr(M, pivoting=True)
    order = piv[::-1].copy()
    _, R = sla.qr(M[:, order], mode="economic")
    A = np.abs(R)
    W = np.zeros_like(R)
    for k in range(n):
        W[k, k + 1:] = np.cumsum(A[k, k:-1])

    q = 32.0                          # one energy quantum for this family
    r2 = 2.0 * (gs + q - c0)
    t0 = time.time()
    progress = np.zeros(1, np.int64)

    import threading

    def watcher():
        while not done_evt.wait(60):
            print(f"... {progress[0]/1e9:.2f}e9 nodes, "
                  f"{time.time()-t0:.0f}s", flush=True)

    done_evt = threading.Event()
    threading.Thread(target=watcher, daemon=True).start()
    # f64 ONLY for proofs: the f32 box bound's slack error scales with
    # row magnitude (~2*slack*delta per row) and can exceed the radius
    # headroom — measured wrongly pruning this very instance's decoy
    found, z, best_r2, nodes, complete = exact_enumerate(
        R, W, r2, max_nodes=0, use_f32=False, progress=progress)
    done_evt.set()
    wall = time.time() - t0
    rec = dict(instance=os.path.basename(inst), gs_shipped=gs,
               radius_sq=r2, found=bool(found), complete=bool(complete),
               nodes=int(nodes), wall_s=round(wall, 1))
    if found:
        s = np.empty(n)
        s[order] = z
        e = float(prob.energy(s))
        rec["energy_found"] = e
        rec["residual"] = e - gs
        if e <= gs + 1e-6:
            os.makedirs("results", exist_ok=True)
            np.savetxt("results/inst18_ground_state_enum.txt", s, fmt="%+d")
    os.makedirs("results", exist_ok=True)
    with open("results/inst18_enum_proof.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
