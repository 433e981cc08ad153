"""Convergence prototype: does a two-level (coarse-grid) preconditioner pay
on city10000?

Round-3/4 named a multiplicative coarse-grid preconditioner as the top
candidate to cut the fused kernel's CG budget (69% of each GN iteration is
the CG loop; /root/reference/src/graph/src/graph.cpp:119 is the call this
solve rebuilds). This script measures the MATH — CG iterations to a given
residual reduction under each preconditioner — in scipy, where building the
coarse operator is cheap, before any Pallas work. The decision metric is
H@v count (the dominant kernel cost), not CG count:

  tridiag PCG:            1 H@v + 1 tri-solve / iter
  two-level (one-sided):  2 H@v + 1 tri-solve + coarse / iter
  two-level (symmetric):  3 H@v + 2 tri-solve + coarse / iter
  deflated PCG (ideal):   1 H@v + 1 tri-solve / iter (+ setup)

So one-sided must cut CG count >2x and symmetric >3x to break even on TPU.
Deflation (Krylov recycling's idealized limit: exact smallest eigenvectors)
bounds what recycling across GN iterations could ever buy.

Run (CPU, ~1 min): JAX_PLATFORMS=cpu python scripts/proto_twolevel.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

import jax
import jax.numpy as jnp


def build_sparse_system(name="city10000", gn_iters=5):
    """Linearization-point system H, b in scipy CSR at the refinement regime
    (after gn_iters GN iterations — where the steady-state solves live)."""
    from graphslam_tpu.config import SolverConfig
    from graphslam_tpu.factors import from_dataset
    from graphslam_tpu.factors.linearize import linearize
    from graphslam_tpu.io import datasets
    from graphslam_tpu.solver.lm import _gn_loop
    from graphslam_tpu.solver.normal_eq import build_blocks

    data = getattr(datasets, name)()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    cfg = SolverConfig(mode="pcg", cg_max_iterations=50)
    poses = _gn_loop(poses0, graph, cfg, "pcg", gn_iters)

    lin = linearize(poses, graph)
    bs = build_blocks(lin, graph, poses.shape[0])
    N, T = bs.g.shape
    c = graph.chain_prefix

    Aii = np.asarray(bs.Aii)
    Aij = np.asarray(bs.Aij)
    diag = np.asarray(bs.diag)
    g = np.asarray(bs.g)
    edges = np.asarray(bs.edges)
    mask = np.asarray(graph.edge_mask)

    rows, cols, vals = [], [], []

    def add_block(i, j, B):
        r0, c0 = 3 * i, 3 * j
        for a in range(T):
            for b_ in range(T):
                rows.append(r0 + a)
                cols.append(c0 + b_)
                vals.append(B[a, b_])

    for n in range(N):
        add_block(n, n, diag[n] + 1e-8 * np.eye(T))
    for e in range(edges.shape[0]):
        if not mask[e]:
            continue
        i, j = edges[e]
        add_block(i, j, Aij[e])
        add_block(j, i, Aij[e].T)
    H = sp.csr_matrix(
        (vals, (rows, cols)), shape=(N * T, N * T)
    )
    b = -g.reshape(-1)

    # chain/tridiagonal part only (the kernel's PCR preconditioner)
    rows, cols, vals = [], [], []
    for n in range(N):
        add_block(n, n, diag[n] + 1e-8 * np.eye(T))
    for e in range(min(c, edges.shape[0])):
        if not mask[e]:
            continue
        i, j = edges[e]
        add_block(i, j, Aij[e])
        add_block(j, i, Aij[e].T)
    Mtri = sp.csc_matrix((vals, (rows, cols)), shape=(N * T, N * T))
    return H, b, Mtri, N, T


def pcg(H, b, apply_M, maxit=400, tols=(1e-2, 1e-4, 1e-6), count_hv=1):
    """PCG recording iterations (and H@v count) to each rel-residual tol.
    count_hv = H@v applications per preconditioner application + 1."""
    x = np.zeros_like(b)
    r = b.copy()
    z = apply_M(r)
    p = z.copy()
    rz = r @ z
    nb = np.linalg.norm(b)
    hits = {}
    hv = count_hv - 1  # preconditioner H@v cost of the initial apply
    for k in range(1, maxit + 1):
        Hp = H @ p
        hv += 1
        alpha = rz / max(p @ Hp, 1e-300)
        x += alpha * p
        r -= alpha * Hp
        rel = np.linalg.norm(r) / nb
        for t in tols:
            if t not in hits and rel < t:
                hits[t] = (k, hv)
        if len(hits) == len(tols):
            break
        z = apply_M(r)
        hv += count_hv - 1
        rz_new = r @ z
        beta = rz_new / max(rz, 1e-300)
        p = z + beta * p
        rz = rz_new
    return hits, rel


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "city10000"
    print(f"building {name} refinement-regime system...", flush=True)
    H, b, Mtri, N, T = build_sparse_system(name)
    lu = spla.splu(Mtri)
    tri = lu.solve

    def report(label, hits, rel, cost_note):
        row = "  ".join(
            f"{t:g}: it={hits[t][0]:3d} H@v={hits[t][1]:3d}" if t in hits
            else f"{t:g}: >max (rel {rel:.1e})"
            for t in (1e-2, 1e-4, 1e-6)
        )
        print(f"{label:34s} {row}   [{cost_note}]", flush=True)

    hits, rel = pcg(H, b, tri, count_hv=1)
    report("tridiag (kernel baseline)", hits, rel, "1 H@v/iter")
    base_hv = dict(hits)

    for G in (32, 64, 128):
        Ng = -(-N // G)
        gid = np.arange(N) // G
        P = sp.csr_matrix(
            (np.ones(N * T), (np.arange(N * T), 3 * gid.repeat(T) + np.tile(np.arange(T), N))),
            shape=(N * T, Ng * T),
        )
        Ac = (P.T @ H @ P).toarray() + 1e-8 * np.eye(Ng * T)
        Ac_lu = np.linalg.cholesky(Ac)

        from scipy.linalg import cho_solve
        def coarse_solve(v, L=Ac_lu):
            return cho_solve((L, True), v)

        def onesided(r):
            z1 = tri(r)
            rc = P.T @ (r - H @ z1)
            return z1 + P @ coarse_solve(rc)

        def symmetric(r):
            z1 = tri(r)
            rc = P.T @ (r - H @ z1)
            z2 = z1 + P @ coarse_solve(rc)
            return z2 + tri(r - H @ z2)

        hits, rel = pcg(H, b, onesided, count_hv=2)
        report(f"two-level one-sided G={G}", hits, rel, "2 H@v/iter")
        hits, rel = pcg(H, b, symmetric, count_hv=3)
        report(f"two-level symmetric G={G}", hits, rel, "3 H@v/iter")

    # Deflation bound: exact smallest generalized eigenvectors (the ideal
    # limit of Krylov recycling across GN iterations).
    try:
        k = 16
        X = np.random.default_rng(0).standard_normal((H.shape[0], k))
        vals, W = spla.lobpcg(
            H, X, M=spla.LinearOperator(H.shape, matvec=tri),
            largest=False, maxiter=80, tol=1e-4,
        )[:2]
        HW = H @ W
        E = W.T @ HW
        Einv = np.linalg.inv(E)

        def deflated(r):
            # project out the deflation space, then tridiag-smooth
            rd = r - HW @ (Einv @ (W.T @ r))
            z = tri(rd)
            return z - W @ (Einv @ (HW.T @ z)) + W @ (Einv @ (W.T @ r))

        hits, rel = pcg(H, b, deflated, count_hv=1)
        report(f"deflated (k={k} exact eigvecs)", hits, rel,
               "1 H@v/iter + setup")
    except Exception as e:  # lobpcg can fail on tough spectra
        print(f"deflation probe failed: {e}")


if __name__ == "__main__":
    main()
