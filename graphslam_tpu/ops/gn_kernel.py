"""Fully fused SE(2) Gauss-Newton — K complete GN iterations in ONE kernel.

Round-1 profiling showed that after the fused PCG kernel (ops/pcg_kernel.py)
collapsed the inner CG loop to ~0.75 ms on m3500, the REST of each GN
iteration — linearize (factors/linearize.py), block assembly
(solver/normal_eq.py::build_blocks), retract — still cost ~1.4 ms of
launch-latency-bound XLA op soup. This module fuses the whole outer loop:

  for k in range(iterations):               # one pallas_call total
      linearize chain edges    (lane-parallel SE(2) math on component rows)
      linearize priors         (same, per node)
      linearize loop edges     (per 128-edge tile: one-hot MXU gather of
                                endpoint poses, row-level SE(2) math,
                                one-hot MXU scatter of H/g contributions)
      assemble block-tridiag D/U + gradient g
      PCR-factor the chain preconditioner  (plane space, in-kernel)
      preconditioned CG                    (fixed iteration count)
      retract poses on the SE(2) manifold

Data layout (round 3, "P8"): every logical node field is SUBLANE-PACKED —
a per-node scalar row lives as an (8, L) array with L = Npad/8 and node
n = s*L + l at sublane s, lane l. Round-3 profiling showed the previous
(1, Npad) component-row layout left 7/8 VPU sublanes idle and the chain
linearize + assembly dominated the whole GN iteration (m3500: ~0.50 ms of
0.60; city10000: ~1.3 of 1.4 ms — measured with cg_iters=0 + chain-only
graphs). Packing fills all 8 sublanes; a node roll becomes one lane roll
plus two sublane rolls and a lane-iota select (`_proll`). 3x3 block
fields are 9 such arrays (row-major); plane sets become nested Python
tuples (component reindexing is free at trace time, where the old layout
paid a sublane roll per access).

Chain edges (k, k+1) linearize with NO gathers at all: x_j is one packed
roll of the pose field. Loop edges gather/scatter through TWO-LEVEL
one-hot matmuls (factor node index n = q*128 + r: a K=128 MXU matmul over
r on the "tall" (A*Q, 128) reshape at full M utilization, then an exact
VPU select over q — see the comment above _tile_qr) with hi/lo bf16
splits (3-way for pose gathers — exact to ~f32; 2-way for
Hessian/gradient scatters, see CLAUDE.md on MXU precision). The row-major
(8, L) -> (8*L/128, 128) reshape preserves linear node indices, so the
packed layout reuses the tall gather machinery unchanged. The two-level
factorization replaced flat (Npad, 2T) one-hots earlier in round 3: at
city10000 scale those contracted K=10240 with M=3..16 of 128 MXU rows and
dominated the whole GN iteration (68.7 -> 378 it/s measured).

This replaces gtsam::LevenbergMarquardtOptimizer's inner loop
(/root/reference/src/graph/src/graph.cpp:119, SURVEY.md §3.3) — the one
call the reference backend exists to make — at one kernel launch per solve.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphslam_tpu.ops.pcg_kernel import _EDGE_TILE, _roll

_TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# Row-level SE(2) math. A "rowvec" is a 3-tuple of (1, W) arrays; a "rowmat"
# is a 9-tuple (row-major 3x3). Everything is elementwise on full lane rows,
# so one expression linearizes every chain edge / prior / tile edge at once.
# ---------------------------------------------------------------------------


def _wrap(x):
    return x - _TWO_PI * jnp.floor((x + math.pi) / _TWO_PI)


def _m3_mul(A, B):
    return tuple(
        sum(A[3 * a + b] * B[3 * b + c] for b in range(3)) for a in range(3) for c in [0, 1, 2]
    )


def _m3_T(A):
    return (A[0], A[3], A[6], A[1], A[4], A[7], A[2], A[5], A[8])


def _m3_vec(A, v):
    return tuple(sum(A[3 * a + b] * v[b] for b in range(3)) for a in range(3))


def _m3_Tvec(A, v):
    return tuple(sum(A[3 * b + a] * v[b] for b in range(3)) for a in range(3))


def _m3_neg(A):
    return tuple(-x for x in A)


def _m3_scale(A, s):
    return tuple(x * s for x in A)


def _se2_between(ax, ay, ath, bx, by, bth):
    """a^-1 * b on component rows."""
    c, s = jnp.cos(ath), jnp.sin(ath)
    dx, dy = bx - ax, by - ay
    return c * dx + s * dy, -s * dx + c * dy, _wrap(bth - ath)


def _se2_log(x, y, th):
    w = _wrap(th)
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    halfs = ws / 2.0
    A = jnp.where(small, 1.0 - w * w / 12.0, halfs * jnp.cos(halfs) / jnp.sin(halfs))
    half = w / 2.0
    return A * x + half * y, -half * x + A * y, w


def _se2_exp(vx, vy, w):
    small = jnp.abs(w) < 1e-6
    ws = jnp.where(small, 1.0, w)
    half = ws / 2.0
    a = jnp.where(small, 1.0 - w * w / 6.0, jnp.sin(ws) / ws)
    b = jnp.where(small, w / 2.0 - w**3 / 24.0, 2.0 * jnp.sin(half) ** 2 / ws)
    return a * vx - b * vy, b * vx + a * vy, _wrap(w)


def _se2_compose(ax, ay, ath, bx, by, bth):
    c, s = jnp.cos(ath), jnp.sin(ath)
    return ax + c * bx - s * by, ay + s * bx + c * by, _wrap(ath + bth)


def _V_terms(w):
    """a = sin w / w, b = (1-cos w)/w and derivatives (geometry/se2.py)."""
    small = jnp.abs(w) < 1e-4
    ws = jnp.where(small, 1.0, w)
    half = ws / 2.0
    a = jnp.where(small, 1.0 - w * w / 6.0, jnp.sin(ws) / ws)
    b = jnp.where(small, w / 2.0 - w**3 / 24.0, 2.0 * jnp.sin(half) ** 2 / ws)
    da = jnp.where(
        small, -w / 3.0 + w**3 / 30.0, (ws * jnp.cos(ws) - jnp.sin(ws)) / (ws * ws)
    )
    db = jnp.where(
        small, 0.5 - w * w / 8.0,
        (ws * jnp.sin(ws) - 2.0 * jnp.sin(half) ** 2) / (ws * ws),
    )
    return a, b, da, db


def _se2_jl_inv(vx, vy, w):
    """Inverse left Jacobian as a rowmat (geometry/se2.py:117-150)."""
    a, b, da, db = _V_terms(w)
    Vv_x = a * vx - b * vy
    Vv_y = b * vx + a * vy
    dVv_x = da * vx - db * vy
    dVv_y = db * vx + da * vy
    D_x = dVv_x + Vv_y
    D_y = dVv_y - Vv_x
    small = jnp.abs(w) < 1e-4
    ws = jnp.where(small, 1.0, w)
    halfs = ws / 2.0
    A = jnp.where(small, 1.0 - w * w / 12.0, halfs * jnp.cos(halfs) / jnp.sin(halfs))
    B = w / 2.0
    E_x = -(A * D_x + B * D_y)
    E_y = -(-B * D_x + A * D_y)
    zero = jnp.zeros_like(w)
    one = jnp.ones_like(w)
    return (A, B, E_x, -B, A, E_y, zero, zero, one)


def _se2_jr_inv(vx, vy, w):
    return _se2_jl_inv(-vx, -vy, -w)


def _se2_adjoint(px, py, pth):
    c, s = jnp.cos(pth), jnp.sin(pth)
    zero = jnp.zeros_like(pth)
    one = jnp.ones_like(pth)
    return (c, -s, py, s, c, -px, zero, zero, one)


def _se2_inverse(px, py, pth):
    c, s = jnp.cos(pth), jnp.sin(pth)
    return -(c * px + s * py), -(-s * px + c * py), -pth


def _linearize_rows(xi, xj, z, R, huber_delta: float):
    """Whitened (rw, Jiw, Jjw) rowvec/rowmats for between factors on rows.

    Mirrors factors/linearize.py::linearize_edges (analytic SE(2) path):
      h = x_i^-1 x_j;  r = Log(z^-1 h)
      Jj = Jr^{-1}(r);  Ji = -Jr^{-1}(r) Ad(h^-1)
    R is the (masked) sqrt-information rowmat; huber_delta > 0 applies the
    IRLS sqrt-weight min(1, delta/||rw||) (loop edges only — callers pass
    delta <= 0 on the chain).
    """
    h = _se2_between(*xi, *xj)
    d = _se2_between(*z, *h)
    r = _se2_log(*d)
    Jr_inv = _se2_jr_inv(*r)
    Ad_hinv = _se2_adjoint(*_se2_inverse(*h))
    Jj = Jr_inv
    Ji = _m3_neg(_m3_mul(Jr_inv, Ad_hinv))
    rw = _m3_vec(R, r)
    Jiw = _m3_mul(R, Ji)
    Jjw = _m3_mul(R, Jj)
    if huber_delta > 0.0:
        n2 = rw[0] * rw[0] + rw[1] * rw[1] + rw[2] * rw[2]
        n = jnp.sqrt(jnp.maximum(n2, 1e-24))
        sw = jnp.sqrt(jnp.minimum(1.0, huber_delta / n))
        rw = tuple(x * sw for x in rw)
        Jiw = _m3_scale(Jiw, sw)
        Jjw = _m3_scale(Jjw, sw)
    return rw, Jiw, Jjw


def _outer_blocks(Jiw, Jjw, rw):
    """Aii = Ji^T Ji, Aij = Ji^T Jj, Ajj = Jj^T Jj, gi, gj."""
    JiT = _m3_T(Jiw)
    Aii = _m3_mul(JiT, Jiw)
    Aij = _m3_mul(JiT, Jjw)
    Ajj = _m3_mul(_m3_T(Jjw), Jjw)
    gi = _m3_Tvec(Jiw, rw)
    gj = _m3_Tvec(Jjw, rw)
    return Aii, Aij, Ajj, gi, gj


def _rows_to_planes(M):
    """Rowmat (9 x (1, W)) -> plane set: P[d] = rows [M[a, (a+d)%3]]_a."""
    return tuple(
        jnp.concatenate([M[3 * a + (a + d) % 3] for a in range(3)], axis=0)
        for d in range(3)
    )


def _split3(x):
    return x[0:1], x[1:2], x[2:3]


# ---------------------------------------------------------------------------
# Packed ("P8") layout: a per-node scalar field is an (8, L) array with node
# n = s*L + l (sublane s, lane l), L = Npad/8 — all 8 VPU sublanes live. A
# rowmat is 9 such arrays; a plane set is a NESTED tuple P[d][a] (the
# rotation-trick planes of pcg_kernel.py, but with the component axis at
# Python level: component reindexing is free at trace time instead of a
# sublane roll per access).
# ---------------------------------------------------------------------------


def _proll(v, s: int):
    """Packed node roll: y[n] = x[(n - s) mod Npad] on an (8, L) field.

    One lane roll + (up to) two sublane rolls + a lane-iota select: with
    s = a*L + b, lanes l >= b take sublane shift a, lanes l < b take a+1
    (the lane roll borrowed across the sublane boundary).
    """
    S, L = v.shape
    s = s % (S * L)
    if s == 0:
        return v
    a, b = divmod(s, L)
    z = _roll(v, b, 1)
    za = _roll(z, a, 0)
    if b == 0:
        return za
    zb = _roll(z, a + 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane < b, zb, za)


def _proll3(v3, s: int):
    return tuple(_proll(v, s) for v in v3)


def _p_planes(M):
    """Rowmat (9 packed arrays) -> plane set P[d][a] = M[3a + (a+d)%3]."""
    return tuple(
        tuple(M[3 * a + (a + d) % 3] for a in range(3)) for d in range(3)
    )


def _p_ridge(D, eps: float):
    """Plane-space ridge (see pcg_kernel._pl_ridge) on a packed plane set."""
    tr = D[0][0] + D[0][1] + D[0][2]
    r = (eps / 3.0) * jnp.abs(tr) + 1e-8
    return (tuple(D[0][a] + r for a in range(3)), D[1], D[2])


def _p_binv(D):
    """Adjugate 3x3 inverse on a packed plane set (pcg_kernel._pl_binv)."""
    adj = []
    for d in range(3):
        adj.append(tuple(
            D[(-d) % 3][(a + d + 1) % 3] * D[(-d) % 3][(a + d + 2) % 3]
            - D[(1 - d) % 3][(a + d + 1) % 3] * D[(2 - d) % 3][(a + d + 2) % 3]
            for a in range(3)
        ))
    det = [sum(D[d][a] * adj[d][a] for d in range(3)) for a in range(3)]
    inv = [1.0 / jnp.where(jnp.abs(x) < 1e-20, 1e-20, x) for x in det]
    return tuple(tuple(adj[d][a] * inv[a] for a in range(3)) for d in range(3))


def _p_bmm(A, B):
    """Per-node block product in packed plane space."""
    return tuple(
        tuple(
            sum(A[dp][a] * B[(d - dp) % 3][(a + dp) % 3] for dp in range(3))
            for a in range(3)
        )
        for d in range(3)
    )


def _p_T(A):
    """Plane-set transpose: PT[d][a] = A[(-d)%3][(a+d)%3]."""
    return tuple(
        tuple(A[(-d) % 3][(a + d) % 3] for a in range(3)) for d in range(3)
    )


def _p_sub(A, B):
    return tuple(tuple(x - y for x, y in zip(ra, rb)) for ra, rb in zip(A, B))


def _p_neg(A):
    return tuple(tuple(-x for x in r) for r in A)


def _p_lane_roll(A, h: int):
    return tuple(tuple(_proll(x, h) for x in r) for r in A)


def _p_bmv(P, v):
    """Block matvec: out[a] = sum_d P[d][a] * v[(a+d)%3]."""
    return tuple(
        sum(P[d][a] * v[(a + d) % 3] for d in range(3)) for a in range(3)
    )


def _p_pcr_factor(Dt, Ut, Lt, K: int, eps: float, store_dtype=None):
    """PCR factorization over packed plane sets (pcg_kernel._pl_pcr_factor).

    Boundary zero-fill is implicit exactly as in the unpacked version: the
    packed roll is circular in the linear node index, and the coefficient
    planes are zero at the same linear indices."""
    if store_dtype is not None:
        cast = lambda P: tuple(
            tuple(x.astype(store_dtype) for x in r) for r in P
        )
    else:
        cast = lambda P: P
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _p_ridge(Dt, eps)
        Dinv = _p_binv(Dt)
        alpha = _p_bmm(Lt, _p_lane_roll(Dinv, h))
        gamma = _p_bmm(Ut, _p_lane_roll(Dinv, -h))
        A_steps.append(cast(alpha))
        G_steps.append(cast(gamma))
        Dt = _p_sub(
            _p_sub(Dt, _p_bmm(alpha, _p_lane_roll(Ut, h))),
            _p_bmm(gamma, _p_lane_roll(Lt, -h)),
        )
        Lt = _p_neg(_p_bmm(alpha, _p_lane_roll(Lt, h)))
        Ut = _p_neg(_p_bmm(gamma, _p_lane_roll(Ut, -h)))
    DinvF = _p_binv(_p_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _p_pcr_apply(A_steps, G_steps, DinvF, b):
    """Apply the packed PCR preconditioner to a 3-tuple of (8, L) fields."""
    for k in range(len(A_steps)):
        h = 1 << k
        bm = _proll3(b, h)
        bp = _proll3(b, -h)
        b = tuple(
            b[a]
            - sum(
                A_steps[k][d][a].astype(b[a].dtype) * bm[(a + d) % 3]
                for d in range(3)
            )
            - sum(
                G_steps[k][d][a].astype(b[a].dtype) * bp[(a + d) % 3]
                for d in range(3)
            )
            for a in range(3)
        )
    return _p_bmv(DinvF, b)


def _p_tall(comps):
    """Packed components -> the tall (n_comp*Q, 128) gather layout. The
    row-major (8, L) -> (8*L/128, 128) reshape preserves linear node
    indices, so tall row a*Q + q holds exactly block q of component a."""
    return jnp.concatenate([c.reshape(-1, 128) for c in comps], axis=0)


def _p_untall(t, n_comp: int, L: int):
    """Inverse of _p_tall for scatter accumulators: (n_comp*Q, 128) ->
    tuple of (8, L)."""
    Q = t.shape[0] // n_comp
    return tuple(
        t[a * Q : (a + 1) * Q].reshape(8, L) for a in range(n_comp)
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _round_bf16(x):
    """Round f32 to the nearest bf16 VALUE (round-to-nearest-even) via
    integer bit manipulation, staying in f32.

    NOT equivalent to astype(bf16).astype(f32) under this environment's
    XLA flags: the TPU relay compiles with --xla_allow_excess_precision,
    which lets XLA elide the narrowing round-trip — measured on the XLA
    dist_fused path, where it silently collapsed every hi/lo split into
    plain bf16 (poses off by 0.147 vs the exact CPU result after ONE
    CG iteration, bit-identical across hvp_splits — both smoking guns).
    Bit ops cannot be elided; Mosaic lowers them too (reduce_precision,
    the dedicated op for this, is not implemented in Pallas TPU)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    bias = jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    v = (u + bias) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(v, jnp.float32)


def _hi_lo(x, n_splits: int):
    """Split an f32 array into n bf16 pieces summing (nearly) exactly to x."""
    parts = []
    rem = x
    for _ in range(n_splits - 1):
        p = _round_bf16(rem)
        parts.append(p.astype(jnp.bfloat16))
        rem = rem - p
    parts.append(rem.astype(jnp.bfloat16))
    return parts


def _mxu(a_parts, b, out_dtype, dims):
    """Sum of dot_generals over the split pieces (b exact in bf16).

    The pieces are stacked along the non-contracted dimension into ONE
    matmul (M is tiny — 3..16 rows — so n pieces fit the same 128-row MXU
    pass) and the row groups summed after: one MXU op instead of n.
    """
    n = len(a_parts)
    if n == 1:
        return jax.lax.dot_general(
            a_parts[0], b, dims, preferred_element_type=out_dtype
        )
    stacked = jnp.concatenate(a_parts, axis=0)
    y = jax.lax.dot_general(stacked, b, dims, preferred_element_type=out_dtype)
    R = a_parts[0].shape[0]
    return sum(y[i * R : (i + 1) * R] for i in range(n))


# transposed one-hot layout: ohT is (Npad, 2*tile)
_GATHER_DIMS = (((1,), (0,)), ((), ()))   # (3, Npad) x (Npad, 2T) -> (3, 2T)
_SCATTER_DIMS = (((1,), (1,)), ((), ()))  # (R, 2T) x (Npad, 2T) -> (R, Npad)


# ---------------------------------------------------------------------------
# Two-level one-hot gather/scatter.
#
# A flat one-hot gather of E tile columns from (A, Npad) costs an MXU pass
# with contraction K = Npad and M = A (3..16 of 128 rows — ~5% utilization)
# plus an (Npad, 2T) VPU compare to build the one-hot; at city10000 scale
# (Npad = 10240) the tile sweeps dominated the whole GN iteration. Factoring
# the node index as n = q*128 + r turns this into
#   (1) an MXU matmul over r with K = 128 on the "tall" layout
#       (A*Q, 128) = (A, Npad).reshape — full M utilization, and
#   (2) an exact VPU select over q (multiply by a {0,1} mask and sum Q rows
#       of which exactly one is nonzero per column).
# Cost drops from O(A_slots * Npad) to O(A * Q * 128) per tile with BETTER
# numerics (step 2 is exact in f32). Scatter is the transpose of the same
# factorization; accumulators live in the tall layout across the tile loop
# and reshape back to (R, Npad) once per sweep.
# ---------------------------------------------------------------------------

_R_GATHER_DIMS = (((1,), (0,)), ((), ()))  # (AQ, 128) x (128, 2T) -> (AQ, 2T)


def _tile_qr(idx, Q: int, dtype):
    """One-hot pieces for a tile's node indices idx (1, 2T) int32: ohr
    (128, 2T) bf16 one-hot of idx % 128, qsel (Q, 2T) one-hot of idx // 128."""
    W = idx.shape[1]
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (128, W), 0)
    sub_q = jax.lax.broadcasted_iota(jnp.int32, (Q, W), 0)
    ohr = (sub_r == (idx & 127)).astype(jnp.bfloat16)
    qsel = (sub_q == jax.lax.shift_right_logical(idx, 7)).astype(dtype)
    return ohr, qsel


def _gather2(p_tall_parts, ohr, qsel, A: int, Q: int, dtype):
    """Gather an A-row field at the tile's nodes -> (A, 2T). p_tall_parts are
    hi/lo bf16 pieces of field.reshape(A*Q, 128)."""
    G = _mxu(p_tall_parts, ohr, dtype, _R_GATHER_DIMS)  # (A*Q, 2T)
    return jnp.concatenate(
        [
            jnp.sum(G[a * Q : (a + 1) * Q] * qsel, axis=0, keepdims=True)
            for a in range(A)
        ],
        axis=0,
    )


def _scatter2(C, ohr, qsel, dtype, n_splits: int = 2):
    """Tall-layout scatter contribution of per-edge rows C (R, 2T): returns
    (R*Q, 128) to accumulate; acc.reshape(R, Npad) recovers the wide form."""
    R = C.shape[0]
    S1 = jnp.concatenate([C[c : c + 1] * qsel for c in range(R)], axis=0)
    return _mxu(_hi_lo(S1, n_splits), ohr, dtype, _SCATTER_DIMS)


# ---------------------------------------------------------------------------
# Page-windowed tile machinery (ops/bucketize.py): when the loop edges are
# bucket-ordered, a tile's i-endpoints all fall in pages [q0i, q0i+W) and
# its j-endpoints in [q0j, q0j+W), so the gather/scatter matmuls contract
# over 2W pages instead of all Q — the dominant MXU cost at city10000 scale
# (Q=80, measured ~6x sweep reduction at W=8).
# ---------------------------------------------------------------------------


def _tile_qr_win(idx, q0i, q0j, W: int, tile: int, dtype):
    """Windowed one-hot pieces: ohr (128, 2T) as in _tile_qr; qsel (2W, 2T)
    where rows [0, W) select i-half pages relative to q0i and rows [W, 2W)
    j-half pages relative to q0j (cross-half selections masked off, so
    overlapping windows never double-count)."""
    T2 = idx.shape[1]
    sub_r = jax.lax.broadcasted_iota(jnp.int32, (128, T2), 0)
    ohr = (sub_r == (idx & 127)).astype(jnp.bfloat16)
    page = jax.lax.shift_right_logical(idx, 7)  # (1, 2T)
    roww = jax.lax.broadcasted_iota(jnp.int32, (2 * W, T2), 0)
    colw = jax.lax.broadcasted_iota(jnp.int32, (2 * W, T2), 1)
    target = jnp.where(roww < W, q0i + roww, q0j + (roww - W))
    half_ok = (roww < W) == (colw < tile)
    qsel = ((target == page) & half_ok).astype(dtype)
    return ohr, qsel


def _win_parts(p_full, A: int, Q: int, W: int, q0i, q0j):
    """Windowed tall slice of the FULL-PRECISION tall array (A*Q, 128):
    rows [a*Q+q0i, +W) then [a*Q+q0j, +W) per component a -> (A*2W, 128).

    Implemented as DYNAMIC sublane rotates + static slices: Mosaic has no
    value-level dynamic_slice, and its dynamic rotate is 32-bit-only — so
    the window is cut from the f32 source and hi/lo-split afterwards
    (callers split per tile; the window is tiny)."""
    si = (Q - q0i) % Q
    sj = (Q - q0j) % Q
    rows = []
    for a in range(A):
        blk = p_full[a * Q : (a + 1) * Q]
        rows.append(pltpu.roll(blk, si, 0)[:W])
        rows.append(pltpu.roll(blk, sj, 0)[:W])
    return jnp.concatenate(rows, axis=0)


def _acc_win_add(acc, contrib, R: int, Q: int, W: int, q0i, q0j):
    """Add a windowed scatter contribution (R*2W, 128) into the full tall
    accumulator (R*Q, 128) at the tile's window rows: zero-pad each half to
    Q rows and rotate it into place (dynamic sublane rotate). The two
    halves add independently, so q0i == q0j (diagonal buckets) is exact."""
    outs = []
    zeros = jnp.zeros((Q - W, 128), acc.dtype)
    for rc in range(R):
        blk = acc[rc * Q : (rc + 1) * Q]
        ci = contrib[rc * 2 * W : rc * 2 * W + W]
        cj = contrib[rc * 2 * W + W : rc * 2 * W + 2 * W]
        zi = jnp.concatenate([ci, zeros], axis=0)
        zj = jnp.concatenate([cj, zeros], axis=0)
        outs.append(
            blk + pltpu.roll(zi, q0i, 0) + pltpu.roll(zj, q0j, 0)
        )
    return jnp.concatenate(outs, axis=0)


def _residual_rows(xi, xj, z, R):
    """Whitened between residual rows (no Jacobians — the chi2 pass)."""
    h = _se2_between(*xi, *xj)
    d = _se2_between(*z, *h)
    r = _se2_log(*d)
    return _m3_vec(R, r)


def _c3(ref):
    """(24, L) ref -> 3-tuple of packed (8, L) component fields."""
    return tuple(ref[8 * a : 8 * (a + 1)] for a in range(3))


def _c9(ref):
    """(72, L) ref -> 9-tuple of packed (8, L) rowmat entries."""
    return tuple(ref[8 * e : 8 * (e + 1)] for e in range(9))


def _gn_kernel(
    nt_ref, poses_ref, cz_ref, cR_ref, pz_ref, pR_ref, eidx_ref, eld_ref,
    q0_ref,
    out_ref, stats_ref, Aij_ref, *,
    N: int, Npad: int, K: int, n_gn: int, cg_iters: int, n_tiles: int,
    eps: float, huber_delta: float, tile: int, pcr_bf16: bool,
    hvp_splits: int, win: int, warm_start: bool, cg_ramp,
    lm: bool, lam0: float, lam_factor: float, lam_min: float, lam_max: float,
    abs_tol: float, rel_tol: float,
):
    # Live tile count (SMEM scalar): loop-edge slots fill contiguously, so
    # the tile loops run over ceil(live_edges / tile) instead of the
    # preallocated capacity — online solve cost tracks occupancy
    # (slam/pipeline.py buckets the poses; this bounds the edges).
    nt = jnp.minimum(nt_ref[0, 0], n_tiles)
    dtype = poses_ref.dtype
    Q = Npad // 128
    L = Npad // 8

    def tile_sel(t, idx):
        """Per-tile one-hot pieces + (windowed) gather-row count."""
        if win:
            q0i = q0_ref[0, t]
            q0j = q0_ref[1, t]
            ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
            return ohr, qsel, q0i, q0j, 2 * win
        ohr, qsel = _tile_qr(idx, Q, dtype)
        return ohr, qsel, None, None, Q

    def prep_src(tall, ns):
        """Gather source for the tile sweeps: windowed mode keeps the f32
        tall array (the per-tile window is hi/lo-split after slicing —
        Mosaic's dynamic rotate is 32-bit only); full mode pre-splits."""
        return tall if win else _hi_lo(tall, ns)

    def tile_gather(p_src, ohr, qsel, A, q0i, q0j, rows, ns):
        if win:
            parts = _hi_lo(_win_parts(p_src, A, Q, win, q0i, q0j), ns)
            return _gather2(parts, ohr, qsel, A, rows, dtype)
        return _gather2(p_src, ohr, qsel, A, rows, dtype)

    def tile_accumulate(acc, contrib, R, q0i, q0j):
        if win:
            return _acc_win_add(acc, contrib, R, Q, win, q0i, q0j)
        return acc + contrib
    nidx = (
        jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    )
    padrow = (nidx >= N).astype(dtype)  # identity on padding nodes

    def chi2_of(poses):
        """Total robustified cost (factors/linearize.py::chi2 semantics:
        Huber rho on loop edges when enabled, plain squares elsewhere)."""
        xi = poses
        xj = _proll3(poses, -1)
        cz = _c3(cz_ref)
        cR = _c9(cR_ref)
        rw = _residual_rows(xi, xj, cz, cR)
        e = sum(jnp.sum(x * x) for x in rw)

        pz = _c3(pz_ref)
        pR = _c9(pR_ref)
        dp = _se2_between(*pz, *xi)
        rp = _se2_log(*dp)
        rpw = _m3_vec(pR, rp)
        e += sum(jnp.sum(x * x) for x in rpw)

        if n_tiles:
            p_src = prep_src(_p_tall(poses), 3)

            def tile_body(t, acc):
                idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                pg = tile_gather(p_src, ohr, qsel, 3, q0i, q0j, rows, 3)
                xi_t = tuple(pg[a : a + 1, :tile] for a in range(3))
                xj_t = tuple(pg[a : a + 1, tile:] for a in range(3))
                eld = eld_ref[:, pl.ds(t * tile, tile)]
                z_t = tuple(eld[a : a + 1] for a in range(3))
                R_t = tuple(eld[3 + a : 4 + a] for a in range(9))
                rw_t = _residual_rows(xi_t, xj_t, z_t, R_t)
                et = rw_t[0] ** 2 + rw_t[1] ** 2 + rw_t[2] ** 2
                if huber_delta > 0.0:
                    n_ = jnp.sqrt(jnp.maximum(et, 1e-24))
                    et = jnp.where(
                        n_ <= huber_delta,
                        et,
                        2.0 * huber_delta * n_ - huber_delta**2,
                    )
                return acc + jnp.sum(et)

            e = jax.lax.fori_loop(0, nt, tile_body, e)
        return e

    def solve_dx(poses, lam, x0=None, cg_n=None):
        if cg_n is None:
            cg_n = cg_iters
        xi = poses
        xj = _proll3(poses, -1)

        # --- chain edges: edge k couples nodes (k, k+1); everything is a
        # packed roll, no gathers. Masked/absent edges have zero cR rows.
        cz = _c3(cz_ref)
        cR = _c9(cR_ref)
        rw, Jiw, Jjw = _linearize_rows(xi, xj, cz, cR, -1.0)
        Aii, Aij, Ajj, gi, gj = _outer_blocks(Jiw, Jjw, rw)

        # node n: D[n] = Aii[n] + Ajj[n-1] + prior; g likewise.
        D = tuple(
            Aii[e] + _proll(Ajj[e], 1) for e in range(9)
        )
        g = tuple(gi[a] + _proll(gj[a], 1) for a in range(3))
        U = Aij  # U[k] couples rows k, k+1

        # --- priors: r = Log(z^-1 x), J = Jr^{-1}(r) (linearize_priors).
        pz = _c3(pz_ref)
        pR = _c9(pR_ref)
        dp = _se2_between(*pz, *xi)
        rp = _se2_log(*dp)
        Jp = _se2_jr_inv(*rp)
        rpw = _m3_vec(pR, rp)
        Jpw = _m3_mul(pR, Jp)
        JpT = _m3_T(Jpw)
        Ap = _m3_mul(JpT, Jpw)
        gp = _m3_Tvec(Jpw, rpw)
        D = tuple(D[e] + Ap[e] for e in range(9))
        g = tuple(g[a] + gp[a] for a in range(3))
        # keep padding lanes nonsingular
        D = tuple(D[e] + (padrow if e in (0, 4, 8) else 0.0) for e in range(9))

        # --- loop edges: tile loop, two-level one-hot gather/scatter -------
        if n_tiles:
            p_src = prep_src(_p_tall(poses), 3)  # ~f32-exact

            def tile_body(t, carry):
                Dg = carry  # tall (12*Q, 128): rows 0-8 D entries, 9-11 g
                idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                pg = tile_gather(p_src, ohr, qsel, 3, q0i, q0j, rows, 3)
                xi_t = tuple(pg[a : a + 1, :tile] for a in range(3))
                xj_t = tuple(pg[a : a + 1, tile:] for a in range(3))
                eld = eld_ref[:, pl.ds(t * tile, tile)]
                z_t = tuple(eld[a : a + 1] for a in range(3))
                R_t = tuple(eld[3 + a : 4 + a] for a in range(9))
                rw_t, Jiw_t, Jjw_t = _linearize_rows(
                    xi_t, xj_t, z_t, R_t, huber_delta
                )
                Aii_t, Aij_t, Ajj_t, gi_t, gj_t = _outer_blocks(
                    Jiw_t, Jjw_t, rw_t
                )
                # stash Aij for the CG matvec (9 rows per tile)
                for a in range(9):
                    Aij_ref[a : a + 1, pl.ds(t * tile, tile)] = Aij_t[a]
                # contributions C (12, 2T): i-half columns carry (Aii, gi),
                # j-half (Ajj, gj); one scatter accumulates both.
                C = jnp.concatenate(
                    [jnp.concatenate([Aii_t[e], Ajj_t[e]], axis=1) for e in range(9)]
                    + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1) for a in range(3)],
                    axis=0,
                )
                return tile_accumulate(
                    Dg, _scatter2(C, ohr, qsel, dtype), 12, q0i, q0j
                )

            Dg0 = jnp.zeros((12 * Q, 128), dtype)
            Dg = _p_untall(jax.lax.fori_loop(0, nt, tile_body, Dg0), 12, L)
            D = tuple(D[e] + Dg[e] for e in range(9))
            g = tuple(g[a] + Dg[9 + a] for a in range(3))

        # Marquardt damping: diagonal entries scale by (1 + lam)
        # (normal_eq.py::_damped_diag with lm_diag_scaling). lam == 0 in GN.
        D = tuple(D[e] * (1.0 + lam) if e in (0, 4, 8) else D[e] for e in range(9))

        # --- plane sets + PCR factorization of the chain preconditioner ----
        Dpl = _p_planes(D)
        Upl = _p_planes(U)
        # L[i] = U[i-1]^T: transpose = entry relabel, shift = packed roll
        UT = _m3_T(U)
        Lpl = _p_lane_roll(_p_planes(UT), 1)
        # zero the wrapped node-0 garbage (U[Npad-1] is already zero —
        # chain entries are zero beyond c <= N-1 — so the roll is clean).
        A_steps, G_steps, DinvF = _p_pcr_factor(
            Dpl, Upl, Lpl, K, eps,
            store_dtype=jnp.bfloat16 if pcr_bf16 else None,
        )

        b = tuple(-g[a] for a in range(3))

        def hvp(v):
            h1 = _p_bmv(Dpl, v)
            h2 = _p_bmv(Upl, _proll3(v, -1))
            h3 = _p_bmv(Lpl, _proll3(v, 1))
            out = tuple(h1[a] + h2[a] + h3[a] for a in range(3))
            if n_tiles:
                v_src = prep_src(_p_tall(v), hvp_splits)

                def tile_body(t, acc):
                    idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                    ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                    vg = tile_gather(v_src, ohr, qsel, 3, q0i, q0j, rows,
                                     hvp_splits)
                    vi = tuple(vg[a : a + 1, :tile] for a in range(3))
                    vj = tuple(vg[a : a + 1, tile:] for a in range(3))
                    A = tuple(
                        Aij_ref[a : a + 1, pl.ds(t * tile, tile)]
                        for a in range(9)
                    )
                    yi = _m3_vec(A, vj)    # A v_j -> node i
                    yj = _m3_Tvec(A, vi)   # A^T v_i -> node j
                    ys = jnp.concatenate(
                        [jnp.concatenate([yi[a], yj[a]], axis=1) for a in range(3)],
                        axis=0,
                    )
                    return tile_accumulate(
                        acc,
                        _scatter2(ys, ohr, qsel, dtype, n_splits=hvp_splits),
                        3, q0i, q0j,
                    )

                acc0 = jnp.zeros((3 * Q, 128), dtype)
                tg = _p_untall(
                    jax.lax.fori_loop(0, nt, tile_body, acc0), 3, L
                )
                out = tuple(out[a] + tg[a] for a in range(3))
            return out

        # --- preconditioned CG (fixed iteration count) ----------------------
        tiny = jnp.asarray(1e-30, dtype)
        if x0 is None:
            x = tuple(jnp.zeros_like(v) for v in b)
            r = b
        else:
            # Warm start with the previous GN step's solution: the
            # linearization drifts slowly near convergence, so the previous
            # dx is an excellent initial iterate — one extra H@v buys a
            # much smaller initial residual (the hot config runs fewer CG
            # iterations at equal quality; measured on city10000).
            x = x0
            hx = hvp(x0)
            r = tuple(b[a] - hx[a] for a in range(3))
        z = _p_pcr_apply(A_steps, G_steps, DinvF, r)
        p = z
        rz = sum(jnp.sum(r[a] * z[a]) for a in range(3))

        def cg_body(_, carry):
            x, r, p, rz = carry
            Ap = hvp(p)
            pAp = sum(jnp.sum(p[a] * Ap[a]) for a in range(3))
            # Krylov-exhaustion guard: on an (at-optimum) near-zero RHS,
            # f32 roundoff can drive pAp <= 0; clamping alone turns the
            # sign flip into a ~1e30 step (measured NaN blowup in warm-
            # started online solves, RESULTS.md round 5). Freeze the
            # update instead — the exact semantics of a converged CG.
            alpha = jnp.where(pAp > tiny, rz / jnp.maximum(pAp, tiny), 0.0)
            x = tuple(x[a] + alpha * p[a] for a in range(3))
            r = tuple(r[a] - alpha * Ap[a] for a in range(3))
            z = _p_pcr_apply(A_steps, G_steps, DinvF, r)
            rz_new = sum(jnp.sum(r[a] * z[a]) for a in range(3))
            beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
            p = tuple(z[a] + beta * p[a] for a in range(3))
            return x, r, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, cg_n, cg_body, (x, r, p, rz))
        return x

    def retract(poses, x):
        e = _se2_exp(*x)
        return _se2_compose(*poses, *e)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    poses0 = _c3(poses_ref)

    def write_out(poses):
        for a in range(3):
            out_ref[8 * a : 8 * (a + 1)] = poses[a]

    if not lm:
        zero = jnp.asarray(0.0, dtype)
        if warm_start or cg_ramp:
            # Optionally ramp the CG budget over GN phases: early iterations
            # (large pose updates) get the full Krylov budget, later ones
            # (warm-started, tiny updates) a reduced one.
            phases = cg_ramp if cg_ramp else ((n_gn, cg_iters),)
            x00 = tuple(jnp.zeros((8, L), dtype) for _ in range(3))
            carry = (poses0, x00)
            for n_k, cg_k in phases:
                def gn_iter(_, c, cg_k=cg_k):
                    poses, x_prev = c
                    x = solve_dx(
                        poses, zero, x_prev if warm_start else None, cg_k
                    )
                    return retract(poses, x), x

                carry = jax.lax.fori_loop(0, n_k, gn_iter, carry)
            write_out(carry[0])
        else:
            def gn_iter(_, poses):
                return retract(poses, solve_dx(poses, zero))

            write_out(jax.lax.fori_loop(0, n_gn, gn_iter, poses0))
        stats_ref[:] = jnp.zeros((8, 128), dtype)
    else:
        # Full Levenberg-Marquardt: damped solve, candidate chi2,
        # accept/reject, classic lambda up/down schedule (solver/lm.py's
        # _lm_loop semantics minus the convergence early-exit — converged
        # iterations keep polishing at zero risk since worse steps reject).
        # n_acc counts ACCEPTED steps and conv latches the _lm_loop
        # convergence test (small accepted decrease, or lambda saturated) —
        # so a stalled solve is distinguishable from a converged one
        # (stats slots 2 and 3).
        def lm_iter(_, carry):
            poses, lam, err, n_acc, conv = carry
            x = solve_dx(poses, lam)
            cand = retract(poses, x)
            new_err = chi2_of(cand)
            accepted = new_err < err
            poses = tuple(
                jnp.where(accepted, cand[a], poses[a]) for a in range(3)
            )
            decrease = err - new_err
            conv = conv | (
                accepted
                & ((decrease < abs_tol) | (decrease < rel_tol * err))
            ) | (lam >= lam_max)
            lam = jnp.where(
                accepted,
                jnp.maximum(lam / lam_factor, lam_min),
                jnp.minimum(lam * lam_factor, lam_max),
            )
            err = jnp.where(accepted, new_err, err)
            n_acc = n_acc + jnp.where(accepted, 1.0, 0.0).astype(dtype)
            return poses, lam, err, n_acc, conv

        err0 = chi2_of(poses0)
        poses, lam, err, n_acc, conv = jax.lax.fori_loop(
            0, n_gn, lm_iter,
            (poses0, jnp.asarray(lam0, dtype), err0,
             jnp.asarray(0.0, dtype), jnp.bool_(False)),
        )
        write_out(poses)
        stats_ref[:] = (
            jnp.where((i0 == 0) & (i1 == 0), err, 0.0)
            + jnp.where((i0 == 0) & (i1 == 1), lam, 0.0)
            + jnp.where((i0 == 0) & (i1 == 2), n_acc, 0.0)
            + jnp.where((i0 == 0) & (i1 == 3), conv.astype(dtype), 0.0)
        ).astype(dtype)


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _pack_loop_edges(edges, meas, sqrt_info, mask, c, dtype, tile: int):
    """Loop (non-chain) edge data in the kernel's layouts.

    Returns (eidx (1, 2*Epad) int32 — per-tile-stacked [i; j] halves — and
    eld (16, Epad): rows 0-2 z, 3-11 masked sqrt-info, rows 12-15 zero),
    plus n_tiles. With huber enabled the kernel weights EVERY tile edge;
    this matches linearize(use_huber=True) because every non-chain edge of
    a SLAM graph is a loop closure.
    """
    E_loop = int(edges.shape[0]) - c
    if E_loop <= 0:
        return (
            jnp.zeros((1, 2 * tile), jnp.int32),
            jnp.zeros((16, tile), dtype),
            0,
        )
    Epad = -(-E_loop // tile) * tile
    n_tiles = Epad // tile
    idx_i = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(edges[c:, 0])
    idx_j = jnp.zeros(Epad, jnp.int32).at[:E_loop].set(edges[c:, 1])
    eidx = jnp.stack(
        [idx_i.reshape(n_tiles, tile), idx_j.reshape(n_tiles, tile)],
        axis=1,
    ).reshape(1, 2 * Epad)

    m = mask[c:].astype(dtype)
    R = sqrt_info[c:] * m[:, None, None]
    z = meas[c:] * m[:, None]
    eld = jnp.zeros((16, Epad), dtype)
    eld = eld.at[0:3, :E_loop].set(z.T)
    eld = eld.at[3:12, :E_loop].set(R.reshape(E_loop, 9).T)
    return eidx, eld, n_tiles


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "cg_iters", "huber_delta", "interpret", "lm",
        "lam0", "lam_factor", "lam_min", "lam_max", "pcr_levels",
        "edge_tile", "hvp_splits", "abs_tol", "rel_tol", "warm_start",
        "cg_ramp",
    ),
)
def _fused_solve(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (T == 3)
    iterations: int = 10,
    cg_iters: int = 25,
    huber_delta: float = -1.0,
    interpret: bool | None = None,
    lm: bool = False,
    lam0: float = 1e-5,
    lam_factor: float = 10.0,
    lam_min: float = 1e-10,
    lam_max: float = 1e7,
    pcr_levels: int | None = None,
    edge_tile: int = _EDGE_TILE,
    hvp_splits: int = 2,
    abs_tol: float = 1e-9,
    rel_tol: float = 1e-6,
    warm_start: bool = False,
    cg_ramp=None,
):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N, T = poses0.shape
    if T != 3:
        raise ValueError("fused_gn_solve supports T=3 (SE2) only")
    dtype = poses0.dtype
    # Packed (8, L) node fields need L = Npad/8 to be a lane multiple.
    Npad = -(-N // 1024) * 1024
    L = Npad // 8
    K = max(1, math.ceil(math.log2(max(N, 2))))
    if pcr_levels is not None:
        # Truncated PCR: eliminate couplings only up to distance 2^levels.
        # The preconditioner becomes inexact (CG corrects); the per-solve
        # factorization cost drops linearly in levels.
        K = min(K, max(1, pcr_levels))
    c = min(graph.chain_prefix, N - 1)
    # Edge tiles are 128-multiples wide: Mosaic requires lane-axis
    # dynamic-slice offsets to be 128-multiples. Large graphs (city10000)
    # fit via the raised vmem_limit below (v5e has 128 MiB physical VMEM;
    # 16 MiB is only the compiler's default scoped budget).
    tile = edge_tile
    pcr_bf16 = False

    def pack(x):
        """(R, Npad) node rows -> the packed (8R, L) layout (n = s*L + l)."""
        R = x.shape[0]
        return x.reshape(R, 8, L).reshape(8 * R, L)

    poses_pl = pack(jnp.zeros((3, Npad), dtype).at[:, :N].set(poses0.T))

    # chain edge data: rows over nodes k in [0, c)
    cm = graph.edge_mask[:c].astype(dtype)
    cz = pack(jnp.zeros((3, Npad), dtype).at[:, :c].set(
        (graph.measurements[:c] * cm[:, None]).T
    ))
    cR = pack(jnp.zeros((9, Npad), dtype).at[:, :c].set(
        (graph.sqrt_info[:c] * cm[:, None, None]).reshape(c, 9).T
    ))

    # priors scattered per node
    pz_n = jnp.zeros((Npad, 3), dtype).at[graph.prior_idx].set(
        graph.prior_meas * graph.prior_mask[:, None].astype(dtype)
    )
    pR_n = jnp.zeros((Npad, 3, 3), dtype).at[graph.prior_idx].set(
        graph.prior_sqrt_info * graph.prior_mask[:, None, None].astype(dtype)
    )
    pz = pack(pz_n.T)
    pR = pack(pR_n.reshape(Npad, 9).T)

    eidx, eld, n_tiles = _pack_loop_edges(
        graph.edges, graph.measurements, graph.sqrt_info, graph.edge_mask,
        c, dtype, tile,
    )
    Epad = eld.shape[1]

    # Page-windowed bucketing (ops/bucketize.py): the graph carries its
    # window map; the bucketizer's tile width must match edge_tile.
    win = graph.page_window
    if win and n_tiles:
        q0 = graph.tile_page0
        if q0.shape[1] != n_tiles:
            raise ValueError(
                f"bucketized graph has {q0.shape[1]} tiles but edge_tile="
                f"{tile} packs {n_tiles}; bucketize_loops(tile=...) must "
                "match SolverConfig.edge_tile"
            )
    else:
        q0 = jnp.zeros((2, 1), jnp.int32)

    # Live tile count: loop slots fill contiguously (masked tail), so tiles
    # past the last unmasked edge contribute nothing and are skipped.
    # (Bucketized graphs interleave masked padding, but their last slot is
    # always live, so every tile stays on — correct either way.)
    E_loop = int(graph.edges.shape[0]) - c
    if E_loop > 0 and n_tiles > 0:
        idx_e = jnp.arange(E_loop, dtype=jnp.int32)
        live = jnp.max(jnp.where(graph.edge_mask[c:], idx_e + 1, 0))
        nt = ((live + tile - 1) // tile).astype(jnp.int32).reshape(1, 1)
    else:
        nt = jnp.zeros((1, 1), jnp.int32)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out, stats = pl.pallas_call(
        partial(
            _gn_kernel, N=N, Npad=Npad, K=K, n_gn=iterations,
            cg_iters=cg_iters, n_tiles=n_tiles, eps=3e-4,
            huber_delta=huber_delta, tile=tile, pcr_bf16=pcr_bf16,
            hvp_splits=hvp_splits, win=win, warm_start=warm_start,
            cg_ramp=cg_ramp,
            lm=lm, lam0=lam0, lam_factor=lam_factor, lam_min=lam_min,
            lam_max=lam_max, abs_tol=abs_tol, rel_tol=rel_tol,
        ),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
        + [vspec] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((24, L), dtype),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((9, Epad), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nt, poses_pl, cz, cR, pz, pR, eidx, eld, q0)
    return out.reshape(3, Npad)[:, :N].T, stats


def fused_gn_solve(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (T == 3)
    iterations: int = 10,
    cg_iters: int = 25,
    huber_delta: float = -1.0,
    interpret: bool | None = None,
    pcr_levels: int | None = None,
    edge_tile: int = _EDGE_TILE,
    hvp_splits: int = 2,
    warm_start: bool = False,
    cg_ramp=None,
) -> jnp.ndarray:
    """Run `iterations` full Gauss-Newton iterations in one Pallas kernel.

    Drop-in for solver/lm.py::_gn_loop(mode="pcg_fused") — same math
    (analytic SE(2) linearization, tridiagonal-PCR-preconditioned CG with a
    fixed inner iteration count, right retraction), zero per-iteration
    launches. huber_delta > 0 applies Huber IRLS weights to the loop edges
    (matching linearize(..., use_huber=True) for graphs whose non-chain
    edges are all loops). Requires graph.chain_prefix > 0 (SLAM graphs).
    """
    out, _ = _fused_solve(
        poses0, graph, iterations=iterations, cg_iters=cg_iters,
        huber_delta=huber_delta, interpret=interpret, lm=False,
        pcr_levels=pcr_levels, edge_tile=edge_tile, hvp_splits=hvp_splits,
        warm_start=warm_start, cg_ramp=cg_ramp,
    )
    return out


def fused_lm_solve(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (T == 3)
    iterations: int = 30,
    cg_iters: int = 25,
    huber_delta: float = -1.0,
    lam0: float = 1e-5,
    lam_factor: float = 10.0,
    lam_min: float = 1e-10,
    lam_max: float = 1e7,
    interpret: bool | None = None,
    pcr_levels: int | None = None,
    edge_tile: int = _EDGE_TILE,
    hvp_splits: int = 2,
    abs_tol: float = 1e-9,
    rel_tol: float = 1e-6,
):
    """Full Levenberg-Marquardt — damped solve, candidate chi2,
    accept/reject, lambda schedule — entirely inside ONE Pallas kernel for
    all `iterations` trust-region steps. The TPU-native form of THE call
    the reference backend exists to make:
    gtsam::LevenbergMarquardtOptimizer(graph, initial).optimize()
    (/root/reference/src/graph/src/graph.cpp:119).

    Returns (poses (N, 3), final_chi2 (), final_lambda (),
    accepted_steps (), converged ()). Matches
    solver/lm.py::_lm_loop(mode="pcg_fused") step-for-step except the
    convergence early-exit (converged iterations keep polishing; worse
    steps reject, so the result is at least as converged). accepted_steps
    counts the LM steps that actually improved chi2, and converged latches
    _lm_loop's convergence test (small accepted decrease per abs_tol /
    rel_tol, or lambda saturated) — a stalled solve reports
    accepted_steps << iterations and converged=False.
    """
    out, stats = _fused_solve(
        poses0, graph, iterations=iterations, cg_iters=cg_iters,
        huber_delta=huber_delta, interpret=interpret, lm=True,
        lam0=lam0, lam_factor=lam_factor, lam_min=lam_min, lam_max=lam_max,
        pcr_levels=pcr_levels, edge_tile=edge_tile, hvp_splits=hvp_splits,
        abs_tol=abs_tol, rel_tol=rel_tol,
    )
    return out, stats[0, 0], stats[0, 1], stats[0, 2], stats[0, 3]
