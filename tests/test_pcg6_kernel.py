"""Fused SE(3) (T=6) PCG kernel (interpret mode) vs XLA PCG / dense.

Sizes are deliberately tiny: the interpreter executes the unrolled PCR
levels + CG loop op-by-op on CPU (~seconds per CG iteration); the
Mosaic-compiled path is exercised on the real chip by bench_all config 5.
"""

import jax.numpy as jnp
import numpy as np

from graphslam_tpu.factors import from_dataset
from graphslam_tpu.factors.linearize import linearize
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.pcg6_kernel import fused_pcg6_solve
from graphslam_tpu.solver.normal_eq import build_blocks, dense_solve, pcg_solve


def se3_system(n_rings=6, poses_per_ring=8, seed=1, chain_only=False):
    data = datasets.sphere(n_rings=n_rings, poses_per_ring=poses_per_ring, seed=seed)
    graph = from_dataset(data)
    if chain_only:
        keep = jnp.arange(graph.num_edges) < graph.chain_prefix
        graph = graph.replace(edge_mask=graph.edge_mask & keep)
    poses = jnp.asarray(data["poses"])
    lin = linearize(poses, graph)
    sys = build_blocks(lin, graph, poses.shape[0])
    return sys, graph


def test_fused_pcg6_converges_to_dense():
    # The kernel's PCR and XLA's folding CR are equivalent solvers with
    # slightly different per-level ridges, so fixed-low-iteration
    # trajectories differ legitimately; the correctness statement is
    # convergence to the exact damped-Newton step.
    sys, graph = se3_system()
    lam = jnp.asarray(1e-3)
    exact = dense_solve(sys, lam)
    out = fused_pcg6_solve(sys, lam, max_iters=40, chain_prefix=graph.chain_prefix)
    ref = pcg_solve(
        sys, lam, max_iters=40, tol=0.0, chain_prefix=graph.chain_prefix
    )
    scale = np.abs(np.asarray(exact)).max()
    err_fused = np.abs(np.asarray(out) - np.asarray(exact)).max()
    err_xla = np.abs(np.asarray(ref) - np.asarray(exact)).max()
    # at equal iteration count the fused kernel must be as converged as the
    # XLA path (same preconditioner family), and close to the exact step
    assert err_fused < max(2.0 * err_xla, 2e-3 * scale), (err_fused, err_xla)


def test_fused_pcg6_chain_only_matches_dense():
    # pure chain: the PCR preconditioner is a near-exact solve, so a handful
    # of CG iterations reaches the dense answer.
    sys, graph = se3_system(n_rings=5, poses_per_ring=8, chain_only=True)
    lam = jnp.asarray(1e-3)
    exact = dense_solve(sys, lam)
    out = fused_pcg6_solve(sys, lam, max_iters=6, chain_prefix=graph.chain_prefix)
    err = np.abs(np.asarray(out) - np.asarray(exact)).max()
    scale = np.abs(np.asarray(exact)).max()
    assert err < 5e-3 * max(scale, 1e-3), (err, scale)
