"""Fully fused PCG pose-graph solve — one Pallas kernel for the whole loop.

The XLA pcg_solve path (solver/normal_eq.py) spends ~80 small HLO ops per CG
iteration (H@v, cyclic-reduction preconditioner, CG scalars); at SE(2) SLAM
sizes every one of them is launch-latency-bound on TPU, so 25 CG iterations
cost ~4 ms of pure overhead. This module runs the ENTIRE preconditioned CG
loop inside a single Mosaic kernel:

  * Tangent vectors live as (3, Npad) component planes (poses on lanes) —
    one (8, 128)-tile row set per component, everything VPU-shaped.
  * Block-diagonal / chain matvecs use the rotation trick: for 3x3 blocks,
    (M v)[a] = sum_d P_d[a] * roll(v, -d, sublanes) with P_d[a, n] =
    M[n, a, (a+d) mod 3] — three fused multiply-adds over full planes, no
    per-component slicing.
  * The chain off-diagonal (odometry) part of H@v is two lane rolls; loop
    closures gather/scatter through on-the-fly one-hot matmuls on the MXU
    (exact: precision=HIGHEST — see CLAUDE.md on bf16 matmul precision).
  * The preconditioner is PARALLEL cyclic reduction (PCR): unlike the
    folding cyclic reduction in solver/tridiag.py (whose stride-2
    deinterleaves Mosaic cannot express), PCR keeps every row in place and
    eliminates neighbors at doubling distances — each of the log2(N) steps
    is two lane rolls plus two block matvecs with precomputed coefficients.
    PCR solves the same block-tridiagonal chain system exactly, so the CG
    trajectory quality matches the "tridiag" preconditioner.

The PCR elimination coefficients depend only on the damped Hessian, not the
residual; they are factored once per (outer) solve in XLA (`pcr_factor`) and
streamed into the kernel as rotation planes.

Replaces the hot path of gtsam's LM inner solve (SURVEY.md §3.3,
graph.cpp:119) at TPU speed of light: the m3500 CG loop collapses from
~2000 kernel launches to one.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST
_EDGE_TILE = 128


# ---------------------------------------------------------------------------
# PCR factorization (XLA side, once per damped system)
# ---------------------------------------------------------------------------


def _shift_blocks(X: jnp.ndarray, s: int) -> jnp.ndarray:
    """result[i] = X[i-s] with zero fill (s may be negative)."""
    if s == 0:
        return X
    Y = jnp.roll(X, s, axis=0)
    idx = jnp.arange(X.shape[0])
    mask = idx >= s if s > 0 else idx < X.shape[0] + s
    return jnp.where(mask[:, None, None], Y, 0.0)


def pcr_factor(
    D: jnp.ndarray, U: jnp.ndarray, eps: float = 3e-4
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PCR elimination coefficients for the block-tridiagonal (D, U).

    D (n, T, T): diagonal blocks (identity on padding rows).
    U (n, T, T): U[i] couples rows i and i+1 (zero at i >= n_real-1).

    Returns (A, G, Dinv): A[k], G[k] are the step-k elimination coefficients
    (alpha_i = L_i Dinv_{i-h}, gamma_i = U_i Dinv_{i+h}, h = 2^k) and Dinv
    the final decoupled-diagonal inverse. The rhs recursion
        b_i <- b_i - A[k]_i b_{i-h} - G[k]_i b_{i+h}
    followed by x = Dinv b solves (D, U) x = b exactly.

    Same per-level relative ridge as solver/tridiag.py::cr_factor — the
    level-k Schur complements of a barely-pinned chain can go indefinite in
    f32; CG corrects the (tiny) preconditioner inexactness.
    """
    from graphslam_tpu.solver.normal_eq import _block_inv
    from graphslam_tpu.solver.tridiag import _regularize

    n = D.shape[0]
    K = max(1, math.ceil(math.log2(max(n, 2))))
    L = _shift_blocks(jnp.swapaxes(U, -1, -2), 1)  # L[i] = U[i-1]^T
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        D = _regularize(D, eps)
        Dinv = _block_inv(D)
        alpha = jnp.einsum("nij,njk->nik", L, _shift_blocks(Dinv, h))
        gamma = jnp.einsum("nij,njk->nik", U, _shift_blocks(Dinv, -h))
        A_steps.append(alpha)
        G_steps.append(gamma)
        D = (
            D
            - jnp.einsum("nij,njk->nik", alpha, _shift_blocks(U, h))
            - jnp.einsum("nij,njk->nik", gamma, _shift_blocks(L, -h))
        )
        L = -jnp.einsum("nij,njk->nik", alpha, _shift_blocks(L, h))
        U = -jnp.einsum("nij,njk->nik", gamma, _shift_blocks(U, -h))
    Dinv = _block_inv(_regularize(D, eps))
    return jnp.stack(A_steps), jnp.stack(G_steps), Dinv


def pcr_apply_reference(A, G, Dinv, b):
    """Pure-jnp PCR solve (tests): b (n, T) -> x (n, T)."""
    def shift_vec(x, s):
        y = jnp.roll(x, s, axis=0)
        idx = jnp.arange(x.shape[0])
        mask = idx >= s if s > 0 else idx < x.shape[0] + s
        return jnp.where(mask[:, None], y, 0.0)

    for k in range(A.shape[0]):
        h = 1 << k
        b = (
            b
            - jnp.einsum("nij,nj->ni", A[k], shift_vec(b, h))
            - jnp.einsum("nij,nj->ni", G[k], shift_vec(b, -h))
        )
    return jnp.einsum("nij,nj->ni", Dinv, b)


# ---------------------------------------------------------------------------
# Plane packing (rotation-trick layout)
# ---------------------------------------------------------------------------


def _rot_planes(M: jnp.ndarray) -> jnp.ndarray:
    """(n, 3, 3) blocks -> (3, 3, n) rotation planes P[d, a] = M[:, a, (a+d)%3].

    In this layout a block matvec is three plane FMAs against sublane-rolled
    copies of the vector: (M v)[a, :] = sum_d P[d, a, :] * v[(a+d)%3, :].
    """
    return jnp.stack(
        [
            jnp.stack([M[:, a, (a + d) % 3] for a in range(3)], axis=0)
            for d in range(3)
        ],
        axis=0,
    )


def _pad_axis0(x: jnp.ndarray, n: int, eye: bool = False) -> jnp.ndarray:
    m = x.shape[0]
    if m == n:
        return x
    if eye:
        pad = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (n - m, 3, 3))
        return jnp.concatenate([x, pad], axis=0)
    return jnp.pad(x, ((0, n - m),) + ((0, 0),) * (x.ndim - 1))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _roll(v, s: int, axis: int):
    """Circular roll with np.roll semantics; pltpu.roll wants shift >= 0."""
    n = v.shape[axis]
    s = s % n
    return v if s == 0 else pltpu.roll(v, s, axis)


def _sub_roll(v, d):
    return _roll(v, -d, 0)


# -- in-kernel plane-space block algebra -------------------------------------
# A "plane set" is a 3-tuple of (3, Npad) arrays: P[d][a, n] = M[n, a, (a+d)%3]
# (the rotation-trick layout of _rot_planes). All 3x3 block-field algebra
# reduces to sublane rolls + elementwise FMAs on full planes.


def _pl_bmm(A, B):
    """Per-pose block product C[n] = A[n] @ B[n] in plane space:
    C_d = sum_d' A_d' * sub_roll(B_{(d-d') mod 3}, d')."""
    return tuple(
        sum(A[dp] * _sub_roll(B[(d - dp) % 3], dp) for dp in range(3))
        for d in range(3)
    )


def _pl_sub(A, B):
    return tuple(a - b for a, b in zip(A, B))


def _pl_neg(A):
    return tuple(-a for a in A)


def _pl_lane_roll(A, h: int):
    return tuple(_roll(p, h, 1) for p in A)


def _pl_ridge(D, eps: float):
    """D + (eps * |trace| / 3 + 1e-8) * I — the solver/tridiag.py
    _regularize ridge plus _block_inv's absolute floor, in plane space.
    Every row of tr3 equals the trace (sum of sublane-rolled diagonals)."""
    tr3 = D[0] + _sub_roll(D[0], 1) + _sub_roll(D[0], 2)
    return (D[0] + (eps / 3.0) * jnp.abs(tr3) + 1e-8, D[1], D[2])


def _pl_binv(D):
    """Adjugate/cofactor 3x3 inverse in plane space. For cyclic index
    algebra the cofactor needs no explicit signs:
      adj[c, a] = M[c+1,a+1] M[c+2,a+2] - M[c+1,a+2] M[c+2,a+1]
    and Minv_d[a] = adj[(a+d)%3, a] / det with every factor a sublane roll
    of an input plane."""
    adj = []
    for d in range(3):
        adj.append(
            _sub_roll(D[(-d) % 3], d + 1) * _sub_roll(D[(-d) % 3], d + 2)
            - _sub_roll(D[(1 - d) % 3], d + 1) * _sub_roll(D[(2 - d) % 3], d + 2)
        )
    det = D[0] * adj[0] + D[1] * adj[1] + D[2] * adj[2]
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    return tuple(a * inv_det for a in adj)


def _pl_pcr_factor(Dt, Ut, Lt, K: int, eps: float, store_dtype=None):
    """In-kernel PCR factorization over plane sets.

    Boundary zero-fill is implicit: L is zero at rows i < 2^k and U at
    rows i >= Npad - 2^k by induction from the exactly-zero initial
    planes, so circular lane wraps multiply into zeros.

    Returns (A_steps, G_steps, DinvF): the per-level elimination plane sets
    and the final decoupled-diagonal inverse. store_dtype (e.g. bf16) casts
    the stored alpha/gamma coefficient planes — preconditioner-only, CG
    corrects the rounding; at city10000 sizes the K*6 plane stack is the
    dominant VMEM tenant.
    """
    cast = (lambda P: tuple(p.astype(store_dtype) for p in P)) if store_dtype \
        else (lambda P: P)
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _pl_ridge(Dt, eps)
        Dinv = _pl_binv(Dt)
        alpha = _pl_bmm(Lt, _pl_lane_roll(Dinv, h))
        gamma = _pl_bmm(Ut, _pl_lane_roll(Dinv, -h))
        A_steps.append(cast(alpha))
        G_steps.append(cast(gamma))
        Dt = _pl_sub(
            _pl_sub(Dt, _pl_bmm(alpha, _pl_lane_roll(Ut, h))),
            _pl_bmm(gamma, _pl_lane_roll(Lt, -h)),
        )
        Lt, Ut = (
            _pl_neg(_pl_bmm(alpha, _pl_lane_roll(Lt, h))),
            _pl_neg(_pl_bmm(gamma, _pl_lane_roll(Ut, -h))),
        )
    DinvF = _pl_binv(_pl_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _pl_bmv(pl3, v):
    """Block-diagonal matvec in plane space: pl3 indexable -> (3, Npad)."""
    out = pl3[0] * v
    out += pl3[1] * _sub_roll(v, 1)
    out += pl3[2] * _sub_roll(v, 2)
    return out


def _pl_pcr_apply(A_steps, G_steps, DinvF, b):
    """Apply the PCR preconditioner to b (3, Npad) inside a kernel."""
    for k in range(len(A_steps)):  # static unroll; h is a Python int
        h = 1 << k
        bm = _roll(b, h, 1)    # b_{i-h} (coef zero where invalid)
        bp = _roll(b, -h, 1)   # b_{i+h}
        t = b
        for d in range(3):
            t -= A_steps[k][d].astype(b.dtype) * _sub_roll(bm, d)
            t -= G_steps[k][d].astype(b.dtype) * _sub_roll(bp, d)
        b = t
    return _pl_bmv(DinvF, b)


def _kernel(
    Dpl_ref, Upl_ref, UTpl_ref, b_ref, eidx_ref, eblk_ref, out_ref, *,
    K: int, cg_iters: int, n_tiles: int, Npad: int, eps: float,
):
    # ---- PCR factorization, fully in-kernel (plane space) ----------------
    Dt = tuple(Dpl_ref[d] for d in range(3))
    Ut = tuple(Upl_ref[d] for d in range(3))
    Lt = tuple(UTpl_ref[d] for d in range(3))   # L[i] = U[i-1]^T
    A_steps, G_steps, DinvF = _pl_pcr_factor(Dt, Ut, Lt, K, eps)

    def bmv(pl3, v):
        """pl3: indexable giving (3, Npad) planes for d=0,1,2."""
        out = pl3[0] * v
        out += pl3[1] * _sub_roll(v, 1)
        out += pl3[2] * _sub_roll(v, 2)
        return out

    def hvp(v):
        out = bmv(Dpl_ref, v)
        # chain: out_i += U_i v_{i+1} + U_{i-1}^T v_{i-1}. Plane coefficients
        # are zero at the boundaries, so circular lane wrap is harmless.
        out += bmv(Upl_ref, _roll(v, -1, 1))
        out += bmv(UTpl_ref, _roll(v, 1, 1))

        if n_tiles:
            # Exact-enough f32 gather/scatter on the bf16 MXU: hi/lo split
            # (x = bf16(x) + bf16(x - bf16(x)), ~2^-17 relative — far below
            # the f32 CG residual floor). Per tile of 128 edges one (2T, N)
            # one-hot serves both endpoint gathers AND both scatters: the
            # host stacks indices per tile as [j; i] and blocks as [A^T; A],
            # so after a half-height sublane roll of the gathered tangents
            # every output row r holds the value destined for oh row r.
            bf = jnp.bfloat16
            v_hi = v.astype(bf)
            v_lo = (v - v_hi.astype(v.dtype)).astype(bf)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (2 * _EDGE_TILE, Npad), 1
            )

            def tile(t, acc):
                sl = pl.ds(t * 2 * _EDGE_TILE, 2 * _EDGE_TILE)
                oh = (lane == eidx_ref[sl, 0:1]).astype(bf)
                vg = jax.lax.dot_general(
                    oh, v_hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc.dtype,
                ) + jax.lax.dot_general(
                    oh, v_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=acc.dtype,
                )                                        # (2T, 3) = [v_j; v_i]
                vg = pltpu.roll(vg, _EDGE_TILE, 0)       # -> [v_i; v_j]
                P = eblk_ref[sl, :]                      # (2T, 16): [A^T; A]
                ys = jnp.concatenate(
                    [
                        sum(P[:, 3 * a + c : 3 * a + c + 1] * vg[:, c : c + 1]
                            for c in range(3))
                        for a in range(3)
                    ],
                    axis=1,
                )                                        # [A^T v_i; A v_j]
                y_hi = ys.astype(bf)
                y_lo = (ys - y_hi.astype(ys.dtype)).astype(bf)
                acc += jax.lax.dot_general(
                    y_hi, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc.dtype,
                )
                acc += jax.lax.dot_general(
                    y_lo, oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=acc.dtype,
                )
                return acc

            out = jax.lax.fori_loop(0, n_tiles, tile, out)
        return out

    def precond(b):
        return _pl_pcr_apply(A_steps, G_steps, DinvF, b)

    tiny = jnp.asarray(1e-30, b_ref.dtype)
    b = b_ref[:]
    r = b
    z = precond(r)
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
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r, p, rz))
    out_ref[:] = x


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("max_iters", "lm_diag_scaling", "chain_prefix", "interpret"),
)
def fused_pcg_solve(
    sys,  # solver.normal_eq.BlockSystem, T == 3
    lam: jnp.ndarray,
    max_iters: int = 25,
    lm_diag_scaling: bool = True,
    chain_prefix: int = 0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for pcg_solve(..., preconditioner="tridiag") with a FIXED
    iteration count (no residual-tolerance early exit — the whole loop is
    one kernel). Returns dx (N, 3). interpret=None: auto (Mosaic on TPU,
    interpreter elsewhere — the CPU test path)."""
    from graphslam_tpu.solver.normal_eq import _damped_diag

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    N, T = sys.g.shape
    if T != 3:
        raise ValueError("fused_pcg_solve supports T=3 (SE2) only")
    dtype = sys.g.dtype
    Npad = -(-N // 128) * 128
    K = max(1, math.ceil(math.log2(max(N, 2))))

    damped = _damped_diag(sys, lam, lm_diag_scaling)
    c = min(chain_prefix, N - 1)
    U = jnp.zeros((N, 3, 3), dtype)
    if c > 0:
        # edges[:c] are exactly (k, k+1) (FactorGraph chain-prefix contract,
        # see build_blocks) — the chain off-diagonal is a static slice.
        U = U.at[:c].set(sys.Aij[:c])

    damped_p = _pad_axis0(damped, Npad, eye=True)
    U_p = _pad_axis0(U, Npad)

    Dpl = _rot_planes(damped_p)
    Upl = _rot_planes(U_p)
    UTpl = _rot_planes(_shift_blocks(jnp.swapaxes(U_p, -1, -2), 1))

    b = jnp.zeros((3, Npad), dtype).at[:, :N].set(-sys.g.T)

    # loop (non-chain-prefix) edges, stacked per tile of 128 edges as
    # [j-half; i-half]: indices (2*Epad, 128) col 0, blocks (2*Epad, 16) with
    # the j half holding A^T entries (scattered to j) and the i half A
    # (scattered to i). Padding rows keep index 0 but ZERO blocks.
    E_loop = int(sys.edges.shape[0]) - c
    if E_loop > 0:
        Epad = -(-E_loop // _EDGE_TILE) * _EDGE_TILE
        n_tiles = Epad // _EDGE_TILE
        idx_i = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(sys.edges[c:, 0])
        idx_j = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(sys.edges[c:, 1])
        A9 = jnp.zeros((Epad, 9), dtype).at[:E_loop].set(
            sys.Aij[c:].reshape(E_loop, 9)
        )
        AT9 = jnp.zeros((Epad, 9), dtype).at[:E_loop].set(
            jnp.swapaxes(sys.Aij[c:], -1, -2).reshape(E_loop, 9)
        )
        # (n_tiles, 2, TILE, ...) -> interleave halves per tile
        idx_stack = jnp.stack(
            [idx_j.reshape(n_tiles, _EDGE_TILE),
             idx_i.reshape(n_tiles, _EDGE_TILE)], axis=1
        ).reshape(2 * Epad)
        blk_stack = jnp.stack(
            [AT9.reshape(n_tiles, _EDGE_TILE, 9),
             A9.reshape(n_tiles, _EDGE_TILE, 9)], axis=1
        ).reshape(2 * Epad, 9)
        eidx = jnp.zeros((2 * Epad, 128), jnp.int32).at[:, 0].set(idx_stack)
        eblk = jnp.zeros((2 * Epad, 16), dtype).at[:, :9].set(blk_stack)
    else:
        eidx = jnp.zeros((2 * _EDGE_TILE, 128), jnp.int32)
        eblk = jnp.zeros((2 * _EDGE_TILE, 16), dtype)
        n_tiles = 0

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        partial(
            _kernel, K=K, cg_iters=max_iters, n_tiles=n_tiles, Npad=Npad,
            eps=3e-4,
        ),
        in_specs=[vspec] * 6,
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((3, Npad), dtype),
        interpret=interpret,
    )(Dpl, Upl, UTpl, b, eidx, eblk)
    return x[:, :N].T
