"""Mesh-sharded partitioned Schur reduction — BASELINE config 5.

The SchurPlan's blocks are sharded over the mesh axis: every device
assembles and factorizes only ITS blocks' interior systems (batched dense
Cholesky on the MXU), the separator normal equations are combined with ONE
psum (ICI within a slice, DCN across hosts), each device solves the
(replicated) separator system redundantly, and interiors back-substitute
locally. The only cross-device traffic all solve long is the (Q*T)^2
separator matrix + rhs — the textbook 'combine separator systems via
all-reduce' layout of the north star.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphslam_tpu.solver.normal_eq import BlockSystem
from graphslam_tpu.solver.schur import SchurPlan, _assemble


def pad_plan(plan: SchurPlan, n_dev: int) -> SchurPlan:
    """Pad the block axis to a multiple of the mesh size (padded blocks have
    no interiors: mask all-false, identity diagonals)."""
    B = plan.B
    pad = (-B) % n_dev
    if pad == 0:
        return plan
    return plan._replace(
        B=B + pad,
        interior_ids=np.concatenate(
            [plan.interior_ids, np.full((pad, plan.S), -1, plan.interior_ids.dtype)]
        ),
        interior_mask=np.concatenate(
            [plan.interior_mask, np.zeros((pad, plan.S), bool)]
        ),
    )


def dist_schur_solve(
    plan: SchurPlan,
    sys: BlockSystem,
    lam,
    mesh: Mesh,
    axis: str = "dev",
    lm_diag_scaling: bool = True,
) -> jnp.ndarray:
    """Distributed version of solver.schur.schur_solve. The assembly runs
    replicated (it is cheap scatter work over edges); the expensive per-block
    factorizations and Schur products run block-sharded."""
    n_dev = mesh.shape[axis]
    plan = pad_plan(plan, n_dev)
    T = sys.g.shape[-1]
    B, S, q = plan.B, plan.S, plan.q_pad

    HII, HIS, HSS, gI, gS = _assemble(plan, sys, lam, lm_diag_scaling)
    A = HII.transpose(0, 1, 3, 2, 4).reshape(B, S * T, S * T)
    Bm = HIS.transpose(0, 1, 3, 2, 4).reshape(B, S * T, q * T)
    C = HSS.transpose(0, 2, 1, 3).reshape(q * T, q * T)
    bI = -gI.reshape(B, S * T)
    bS = -gS.reshape(q * T)

    bsh = NamedSharding(mesh, P(axis))
    A = jax.device_put(A, bsh)
    Bm = jax.device_put(Bm, bsh)
    bI = jax.device_put(bI, bsh)

    def body(A_loc, B_loc, bI_loc, C_rep, bS_rep):
        eye = jnp.eye(S * T, dtype=A_loc.dtype)
        L = jnp.linalg.cholesky(A_loc + 1e-8 * eye)

        def block_solve(Lb, rhs):
            y = jax.scipy.linalg.solve_triangular(Lb, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(Lb.T, y, lower=False)

        W = jax.vmap(block_solve)(L, B_loc)
        u = jax.vmap(block_solve)(L, bI_loc[..., None])[..., 0]

        # Separator combine: the one all-reduce of the whole solve.
        S_part = jnp.einsum("bip,biq->pq", B_loc, W)
        r_part = jnp.einsum("bip,bi->p", B_loc, u)
        S_hat = C_rep - jax.lax.psum(S_part, axis)
        rhs_hat = bS_rep - jax.lax.psum(r_part, axis)

        Ls = jnp.linalg.cholesky(S_hat + 1e-8 * jnp.eye(q * T, dtype=A_loc.dtype))
        ys = jax.scipy.linalg.solve_triangular(Ls, rhs_hat, lower=True)
        xS = jax.scipy.linalg.solve_triangular(Ls.T, ys, lower=False)

        xI = u - jnp.einsum("bip,p->bi", W, xS)
        return xI, xS

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P()),
    )
    xI, xS = jax.jit(fn)(A, Bm, bI, C, bS)

    dx = jnp.zeros((plan.num_poses, T), sys.g.dtype)
    int_ids = jnp.asarray(plan.interior_ids)
    imask = jnp.asarray(plan.interior_mask)
    dx = dx.at[jnp.maximum(int_ids, 0)].add(
        jnp.where(imask[..., None], xI.reshape(B, S, T), 0.0)
    )
    sep_ids = jnp.asarray(plan.sep_ids)
    smask = jnp.asarray(plan.sep_mask)
    dx = dx.at[jnp.maximum(sep_ids, 0)].add(
        jnp.where(smask[:, None], xS.reshape(q, T), 0.0)
    )
    return dx


def dist_schur_gn_solve(
    poses,
    graph,
    plan: SchurPlan,
    mesh: Mesh,
    iterations: int = 10,
    lam: float = 1e-6,
    axis: str = "dev",
):
    """Gauss-Newton with the mesh-sharded partitioned-Schur DIRECT solve as
    the inner linear solver — BASELINE config 5 end-to-end (sphere2500-class
    SE(3) graphs across hosts). Linearization is replicated (cheap); the
    per-block factorizations are the sharded heavy lift."""
    from graphslam_tpu.factors.linearize import group_for, linearize
    from graphslam_tpu.solver.normal_eq import build_blocks
    from graphslam_tpu.geometry import se3 as se3_mod

    g = group_for(graph.tangent_dim)
    for _ in range(iterations):
        lin = linearize(poses, graph)
        sys = build_blocks(lin, graph, poses.shape[0])
        dx = dist_schur_solve(plan, sys, jnp.asarray(lam, poses.dtype), mesh, axis)
        poses = g.retract(poses, dx)
        if poses.shape[-1] == 12:
            poses = se3_mod.renormalize(poses)
    return poses
