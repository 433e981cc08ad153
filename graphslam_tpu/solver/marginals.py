"""Marginal covariance recovery — gtsam::Marginals::marginalCovariance.

The reference computed (well, commented out — graph.cpp:120,126-127) the
per-keyframe marginal covariance after each solve. Two TPU paths:

  * dense  — invert the full Hessian via Cholesky and read the diagonal
    blocks; one MXU-bound factorization, right for graphs that fit dense.
  * cg     — for selected poses on large graphs: solve H x = e_k for the T
    canonical columns of each requested pose with the same preconditioned CG
    machinery the optimizer uses; the T solves run as one batched CG with a
    (N*T, T) block rhs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors.graph import FactorGraph
from graphslam_tpu.factors.linearize import linearize
from graphslam_tpu.solver.normal_eq import (
    BlockSystem,
    _block_inv,
    _damped_diag,
    assemble_dense,
    build_blocks,
    hvp,
)


def marginal_covariances_dense(poses: jnp.ndarray, graph: FactorGraph) -> jnp.ndarray:
    """(N, T, T) marginal covariance of every pose, dense path."""
    lin = linearize(poses, graph)
    sys = build_blocks(lin, graph, poses.shape[0])
    N, T = sys.g.shape
    Hf = assemble_dense(sys, jnp.asarray(0.0, poses.dtype), lm_diag_scaling=False)
    cov = jnp.linalg.inv(Hf)
    return cov.reshape(N, T, N, T)[jnp.arange(N), :, jnp.arange(N), :]


def marginal_covariance_cg(
    poses: jnp.ndarray,
    graph: FactorGraph,
    pose_index: jnp.ndarray,
    cfg: SolverConfig = SolverConfig(),
) -> jnp.ndarray:
    """(T, T) marginal covariance of one pose on a large graph: T CG solves
    H x = e_col, vmapped into one batched run."""
    lin = linearize(poses, graph)
    sys = build_blocks(lin, graph, poses.shape[0])
    N, T = sys.g.shape
    damped = _damped_diag(sys, jnp.asarray(0.0, poses.dtype), False)
    Minv = _block_inv(damped)

    def solve_one(col):
        b = jnp.zeros((N, T), poses.dtype).at[pose_index, col].set(1.0)

        def precond(r):
            return jnp.einsum("nij,nj->ni", Minv, r)

        x = jnp.zeros_like(b)
        r = b - hvp(sys, damped, x)
        z = precond(r)
        p = z
        rz = jnp.vdot(r, z)
        thresh = cfg.cg_tol**2 * jnp.vdot(b, b)

        def cond(s):
            x, r, p, rz, k = s
            return (k < cfg.cg_max_iterations) & (jnp.vdot(r, r) > thresh)

        def body(s):
            x, r, p, rz, k = s
            Ap = hvp(sys, damped, p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.vdot(r, z)
            p = z + rz_new / jnp.maximum(rz, 1e-30) * p
            return x, r, p, rz_new, k + 1

        x, *_ = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.int32(0)))
        return x[pose_index]

    return jax.vmap(solve_one)(jnp.arange(T)).T
