"""Fused PCG pose-graph solve for SE(3) (T=6) — whole CG loop in one kernel.

Generalizes ops/pcg_kernel.py's plane-space block algebra from 3x3 to 6x6
blocks by treating every 6x6 block field as a 2x2 grid of 3x3 plane sets
[[P, Q], [R, S]]: block products are 8 plane products, the block inverse is
the Schur complement of S built from the 3x3 adjugate inverse (the same
decomposition solver/normal_eq.py::_block_inv uses in XLA), and tangent
vectors are (6, Npad) component planes. The preconditioner is the same
parallel cyclic reduction over the odometry chain, now with 6x6 blocks;
loop closures gather/scatter through on-the-fly one-hot matmuls on the MXU
in the component-column layout of ops/gn_kernel.py.

This lifts round 1's T=3 restriction (pcg_kernel.py:383): sphere2500/garage
(SE(3)) now run the launch-free fused solve, matching what GTSAM's LM does
for Pose3 (the reference's one optimize call, graph.cpp:119).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphslam_tpu.ops.pcg_kernel import (
    _EDGE_TILE,
    _pad_axis0,
    _pl_binv,
    _pl_bmm,
    _pl_bmv,
    _pl_ridge,
    _roll,
    _rot_planes,
    _shift_blocks,
    _sub_roll,
)

# ---------------------------------------------------------------------------
# 6x6 block algebra as 2x2 grids of 3x3 plane sets.
# A "grid" is a 4-tuple (P, Q, R, S) of plane sets: M = [[P, Q], [R, S]].
# ---------------------------------------------------------------------------


def _pl_T(A):
    """Plane-set transpose: PT[d] = sub_roll(P[(-d) % 3], d)."""
    return tuple(_sub_roll(A[(-d) % 3], d) for d in range(3))


def _pl_add(A, B):
    return tuple(a + b for a, b in zip(A, B))


def _g_bmm(A, B):
    AP, AQ, AR, AS = A
    BP, BQ, BR, BS = B
    return (
        _pl_add(_pl_bmm(AP, BP), _pl_bmm(AQ, BR)),
        _pl_add(_pl_bmm(AP, BQ), _pl_bmm(AQ, BS)),
        _pl_add(_pl_bmm(AR, BP), _pl_bmm(AS, BR)),
        _pl_add(_pl_bmm(AR, BQ), _pl_bmm(AS, BS)),
    )


def _g_sub(A, B):
    return tuple(tuple(a - b for a, b in zip(pa, pb)) for pa, pb in zip(A, B))


def _g_neg(A):
    return tuple(tuple(-x for x in pa) for pa in A)


def _g_lane_roll(A, h: int):
    return tuple(tuple(_roll(x, h, 1) for x in pa) for pa in A)


def _g_T(A):
    AP, AQ, AR, AS = A
    return (_pl_T(AP), _pl_T(AR), _pl_T(AQ), _pl_T(AS))


def _g_ridge(M, eps: float):
    """M + (eps * |trace| / 6 + 1e-8) * I in grid space (cf. _pl_ridge)."""
    P, Q, R, S = M
    tr3 = lambda D: D[0] + _sub_roll(D[0], 1) + _sub_roll(D[0], 2)
    t = jnp.abs(tr3(P) + tr3(S)) * (eps / 6.0) + 1e-8
    return (
        (P[0] + t, P[1], P[2]),
        Q,
        R,
        (S[0] + t, S[1], S[2]),
    )


def _g_binv(M):
    """6x6 block inverse via the Schur complement of S (normal_eq.py:208-221),
    with all 3x3 inverses the plane-space adjugate (_pl_binv)."""
    P, Q, R, S = M
    Sinv = _pl_binv(S)
    QSi = _pl_bmm(Q, Sinv)
    schur = tuple(p - q for p, q in zip(P, _pl_bmm(QSi, _pl_T(Q))))
    TL = _pl_binv(schur)
    TR = _pl_neg3(_pl_bmm(TL, QSi))
    BR = tuple(s - x for s, x in zip(Sinv, _pl_bmm(_pl_T(QSi), TR)))
    return (TL, TR, _pl_T(TR), BR)


def _pl_neg3(A):
    return tuple(-x for x in A)


def _g_bmv(M, v):
    """Grid block-diagonal matvec: v is (6, Npad); returns (6, Npad)."""
    P, Q, R, S = M
    vt, vb = v[:3], v[3:]
    top = _pl_bmv(P, vt) + _pl_bmv(Q, vb)
    bot = _pl_bmv(R, vt) + _pl_bmv(S, vb)
    return jnp.concatenate([top, bot], axis=0)


def _g_cast(A, dtype):
    return tuple(tuple(x.astype(dtype) for x in pa) for pa in A)


def _g_pcr_factor(Dt, Ut, Lt, K: int, eps: float, store_dtype=None):
    """PCR elimination over 6x6 block-tridiagonal grids (cf. _pl_pcr_factor).

    store_dtype (e.g. bf16) casts the stored alpha/gamma coefficient grids —
    preconditioner-only, CG corrects the rounding — halving the dominant
    VMEM tenant when a target is VMEM-bound. None keeps f32 (exact match
    with the XLA cyclic-reduction preconditioner).
    """
    if store_dtype is None:
        store_dtype = Dt[0][0].dtype
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _g_ridge(Dt, eps)
        Dinv = _g_binv(Dt)
        alpha = _g_bmm(Lt, _g_lane_roll(Dinv, h))
        gamma = _g_bmm(Ut, _g_lane_roll(Dinv, -h))
        A_steps.append(_g_cast(alpha, store_dtype))
        G_steps.append(_g_cast(gamma, store_dtype))
        Dt = _g_sub(
            _g_sub(Dt, _g_bmm(alpha, _g_lane_roll(Ut, h))),
            _g_bmm(gamma, _g_lane_roll(Lt, -h)),
        )
        Lt, Ut = (
            _g_neg(_g_bmm(alpha, _g_lane_roll(Lt, h))),
            _g_neg(_g_bmm(gamma, _g_lane_roll(Ut, -h))),
        )
    DinvF = _g_binv(_g_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _g_pcr_apply(A_steps, G_steps, DinvF, b):
    for k in range(len(A_steps)):
        h = 1 << k
        bm = _roll(b, h, 1)
        bp = _roll(b, -h, 1)
        Af = _g_cast(A_steps[k], b.dtype)
        Gf = _g_cast(G_steps[k], b.dtype)
        b = b - _g_bmv(Af, bm) - _g_bmv(Gf, bp)
    return _g_bmv(DinvF, b)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _hi_lo(x, n_splits: int):
    # bit-level bf16 rounding: proof against --xla_allow_excess_precision
    # eliding the narrowing round-trip (see gn_kernel._round_bf16)
    from graphslam_tpu.ops.gn_kernel import _round_bf16

    parts = []
    rem = x
    for _ in range(n_splits - 1):
        p = _round_bf16(rem)
        parts.append(p.astype(jnp.bfloat16))
        rem = rem - p
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _mxu(a_parts, b, out_dtype, dims):
    """One stacked matmul over the hi/lo pieces (see gn_kernel._mxu)."""
    n = len(a_parts)
    if n == 1:
        return jax.lax.dot_general(
            a_parts[0], b, dims, preferred_element_type=out_dtype
        )
    stacked = jnp.concatenate(a_parts, axis=0)
    y = jax.lax.dot_general(stacked, b, dims, preferred_element_type=out_dtype)
    R = a_parts[0].shape[0]
    return sum(y[i * R : (i + 1) * R] for i in range(n))


# transposed one-hot layout: ohT is (Npad, 2T)
_GATHER_DIMS = (((1,), (0,)), ((), ()))   # (6, Npad) x (Npad, 2T) -> (6, 2T)
_SCATTER_DIMS = (((1,), (1,)), ((), ()))  # (R, 2T) x (Npad, 2T) -> (R, Npad)


def _kernel6(
    DP_ref, DQ_ref, DR_ref, DS_ref,
    UP_ref, UQ_ref, UR_ref, US_ref,
    LP_ref, LQ_ref, LR_ref, LS_ref,
    b_ref, eidx_ref, eblk_ref, out_ref, *,
    K: int, cg_iters: int, n_tiles: int, Npad: int, eps: float,
):
    dtype = b_ref.dtype

    def grid(refs):
        """Plane sets read fresh from refs at each use site (keeps the CG
        loop from pinning a second VMEM copy of the inputs)."""
        return tuple(tuple(r[d] for d in range(3)) for r in refs)

    D_refs = (DP_ref, DQ_ref, DR_ref, DS_ref)
    U_refs = (UP_ref, UQ_ref, UR_ref, US_ref)
    L_refs = (LP_ref, LQ_ref, LR_ref, LS_ref)
    A_steps, G_steps, DinvF = _g_pcr_factor(
        grid(D_refs), grid(U_refs), grid(L_refs), K, eps
    )

    node_col = jax.lax.broadcasted_iota(jnp.int32, (Npad, 1), 0)

    def hvp(v):
        out = _g_bmv(grid(D_refs), v)
        out += _g_bmv(grid(U_refs), _roll(v, -1, 1))
        out += _g_bmv(grid(L_refs), _roll(v, 1, 1))
        if n_tiles:
            v_parts = _hi_lo(v, 2)

            def tile(t, acc):
                sl = pl.ds(t * 2 * _EDGE_TILE, 2 * _EDGE_TILE)
                # (Npad, 2T) one-hot from a broadcast compare against the
                # (1, 2*Epad) index row — no (2Epad, 128) index array.
                ohT = (node_col == eidx_ref[0:1, sl]).astype(jnp.bfloat16)
                vg = _mxu(v_parts, ohT, dtype, _GATHER_DIMS)  # (6, 2T) [v_i|v_j]
                # swap halves: columns become [v_j | v_i]
                vs = pltpu.roll(vg, _EDGE_TILE, 1)
                # dual-layout blocks: row (6a+b) holds A[a,b] on the i-half
                # lanes and A^T[a,b]=A[b,a] on the j-half, so a single
                # full-width FMA sweep yields ys[a] = [A v_j | A^T v_i][a]
                # with no lane concatenation (Mosaic can't concat offset
                # slices on the lane axis).
                Ad = eblk_ref[:, sl]  # (36, 2T)
                ys = jnp.concatenate(
                    [
                        sum(
                            Ad[6 * a + b_ : 6 * a + b_ + 1] * vs[b_ : b_ + 1]
                            for b_ in range(6)
                        )
                        for a in range(6)
                    ],
                    axis=0,
                )
                y_parts = _hi_lo(ys, 2)
                return acc + _mxu(y_parts, ohT, dtype, _SCATTER_DIMS)

            out = jax.lax.fori_loop(0, n_tiles, tile, out)
        return out

    tiny = jnp.asarray(1e-30, dtype)
    b = b_ref[:]
    r = b
    z = _g_pcr_apply(A_steps, G_steps, DinvF, r)
    p = z
    rz = jnp.sum(r * z)
    x = jnp.zeros_like(b)

    def cg_body(_, carry):
        x, r, p, rz = carry
        Ap = hvp(p)
        pAp = jnp.sum(p * Ap)
        # Krylov-exhaustion guard: on an (at-optimum) near-zero RHS,
        # f32 roundoff can drive pAp <= 0; clamping alone turns the
        # sign flip into a ~1e30 step (measured NaN blowup in warm-
        # started online solves, RESULTS.md round 5). Freeze the
        # update instead — the exact semantics of a converged CG.
        alpha = jnp.where(pAp > tiny, rz / jnp.maximum(pAp, tiny), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = _g_pcr_apply(A_steps, G_steps, DinvF, r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r, p, rz))
    out_ref[:] = x


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _quadrant_planes(M):
    """(n, 6, 6) -> four (3, 3, n) rotation-plane stacks [[P,Q],[R,S]]."""
    return (
        _rot_planes(M[:, :3, :3]),
        _rot_planes(M[:, :3, 3:]),
        _rot_planes(M[:, 3:, :3]),
        _rot_planes(M[:, 3:, 3:]),
    )


@partial(
    jax.jit,
    static_argnames=("max_iters", "lm_diag_scaling", "chain_prefix", "interpret"),
)
def fused_pcg6_solve(
    sys,  # solver.normal_eq.BlockSystem, T == 6
    lam: jnp.ndarray,
    max_iters: int = 25,
    lm_diag_scaling: bool = True,
    chain_prefix: int = 0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """SE(3) drop-in for pcg_solve(..., preconditioner="tridiag") with a
    fixed iteration count. Returns dx (N, 6)."""
    from graphslam_tpu.solver.normal_eq import _damped_diag

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    N, T = sys.g.shape
    if T != 6:
        raise ValueError("fused_pcg6_solve supports T=6 (SE3) only")
    dtype = sys.g.dtype
    Npad = -(-N // 128) * 128
    K = max(1, math.ceil(math.log2(max(N, 2))))

    damped = _damped_diag(sys, lam, lm_diag_scaling)
    c = min(chain_prefix, N - 1)
    U = jnp.zeros((N, 6, 6), dtype)
    if c > 0:
        U = U.at[:c].set(sys.Aij[:c])

    damped_p = jnp.concatenate(
        [damped, jnp.broadcast_to(jnp.eye(6, dtype=dtype), (Npad - N, 6, 6))],
        axis=0,
    )
    U_p = jnp.pad(U, ((0, Npad - N), (0, 0), (0, 0)))
    L_p = _shift_blocks(jnp.swapaxes(U_p, -1, -2), 1)

    Dq = _quadrant_planes(damped_p)
    Uq = _quadrant_planes(U_p)
    Lq = _quadrant_planes(L_p)

    b = jnp.zeros((6, Npad), dtype).at[:, :N].set(-sys.g.T)

    E_loop = int(sys.edges.shape[0]) - c
    if E_loop > 0:
        Epad = -(-E_loop // _EDGE_TILE) * _EDGE_TILE
        n_tiles = Epad // _EDGE_TILE
        idx_i = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(sys.edges[c:, 0])
        idx_j = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(sys.edges[c:, 1])
        idx_stack = jnp.stack(
            [idx_i.reshape(n_tiles, _EDGE_TILE), idx_j.reshape(n_tiles, _EDGE_TILE)],
            axis=1,
        ).reshape(2 * Epad)
        eidx = idx_stack[None]  # (1, 2*Epad) index row
        A36 = jnp.zeros((Epad, 36), dtype).at[:E_loop].set(
            sys.Aij[c:].reshape(E_loop, 36)
        )
        AT36 = jnp.zeros((Epad, 36), dtype).at[:E_loop].set(
            jnp.swapaxes(sys.Aij[c:], -1, -2).reshape(E_loop, 36)
        )
        # per tile: [A-half (i lanes); A^T-half (j lanes)] -> (36, 2*Epad)
        eblk = jnp.stack(
            [A36.reshape(n_tiles, _EDGE_TILE, 36),
             AT36.reshape(n_tiles, _EDGE_TILE, 36)], axis=1
        ).reshape(2 * Epad, 36).T
    else:
        eidx = jnp.zeros((1, 2 * _EDGE_TILE), jnp.int32)
        eblk = jnp.zeros((36, 2 * _EDGE_TILE), dtype)
        n_tiles = 0

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        partial(
            _kernel6, K=K, cg_iters=max_iters, n_tiles=n_tiles, Npad=Npad,
            eps=3e-4,
        ),
        in_specs=[vspec] * 15,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((6, Npad), dtype),
        # v5e has 128 MiB of physical VMEM; the 16 MiB default is only the
        # compiler's conservative scoped budget. The K-level PCR coefficient
        # stack at SE(3) sizes needs more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*Dq, *Uq, *Lq, b, eidx, eblk)
    return x[:, :N].T
