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

Data layout: everything is component-rows — a pose field is a (3, Npad)
array with poses on lanes, a 3x3 block field is 9 such rows (row-major).
Chain edges (k, k+1) linearize with NO gathers at all: x_j is one lane roll
of the pose planes. Loop edges gather/scatter through TWO-LEVEL one-hot
matmuls (factor node index n = q*128 + r: a K=128 MXU matmul over r on the
"tall" (A*Q, 128) reshape at full M utilization, then an exact VPU select
over q — see the comment above _tile_qr) with hi/lo bf16 splits (3-way for
pose gathers — exact to ~f32; 2-way for Hessian/gradient scatters, see
CLAUDE.md on MXU precision). This replaced flat (Npad, 2T) one-hots in
round 3: at city10000 scale those contracted K=10240 with M=3..16 of 128
MXU rows and dominated the whole GN iteration (68.7 -> 176+ it/s).

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

from graphslam_tpu.ops.pcg_kernel import (
    _EDGE_TILE,
    _pl_bmv,
    _pl_pcr_apply,
    _pl_pcr_factor,
    _roll,
    _sub_roll,
)

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
# The kernel
# ---------------------------------------------------------------------------


def _hi_lo(x, n_splits: int):
    """Split an f32 array into n bf16 pieces summing (nearly) exactly to x."""
    parts = []
    rem = x
    for _ in range(n_splits - 1):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(x.dtype)
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


def _residual_rows(xi, xj, z, R):
    """Whitened between residual rows (no Jacobians — the chi2 pass)."""
    h = _se2_between(*xi, *xj)
    d = _se2_between(*z, *h)
    r = _se2_log(*d)
    return _m3_vec(R, r)


def _gn_kernel(
    nt_ref, poses_ref, cz_ref, cR_ref, pz_ref, pR_ref, eidx_ref, eld_ref,
    out_ref, stats_ref, Aij_ref, *,
    N: int, Npad: int, K: int, n_gn: int, cg_iters: int, n_tiles: int,
    eps: float, huber_delta: float, tile: int, pcr_bf16: bool,
    hvp_splits: int,
    lm: bool, lam0: float, lam_factor: float, lam_min: float, lam_max: float,
):
    # Live tile count (SMEM scalar): loop-edge slots fill contiguously, so
    # the tile loops run over ceil(live_edges / tile) instead of the
    # preallocated capacity — online solve cost tracks occupancy
    # (slam/pipeline.py buckets the poses; this bounds the edges).
    nt = jnp.minimum(nt_ref[0, 0], n_tiles)
    dtype = poses_ref.dtype
    Q = Npad // 128
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Npad), 1)
    padrow = (lane >= N).astype(dtype)  # identity on padding lanes

    def chi2_of(poses):
        """Total robustified cost (factors/linearize.py::chi2 semantics:
        Huber rho on loop edges when enabled, plain squares elsewhere)."""
        px, py, pth = _split3(poses)
        xi = (px, py, pth)
        xj = (_roll(px, -1, 1), _roll(py, -1, 1), _roll(pth, -1, 1))
        cz = (cz_ref[0:1], cz_ref[1:2], cz_ref[2:3])
        cR = tuple(cR_ref[a : a + 1] for a in range(9))
        rw = _residual_rows(xi, xj, cz, cR)
        e = sum(jnp.sum(x * x) for x in rw)

        pz = (pz_ref[0:1], pz_ref[1:2], pz_ref[2:3])
        pR = tuple(pR_ref[a : a + 1] for a in range(9))
        dp = _se2_between(*pz, *xi)
        rp = _se2_log(*dp)
        rpw = _m3_vec(pR, rp)
        e += sum(jnp.sum(x * x) for x in rpw)

        if n_tiles:
            p_parts = _hi_lo(poses.reshape(3 * Q, 128), 3)

            def tile_body(t, acc):
                idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                ohr, qsel = _tile_qr(idx, Q, dtype)
                pg = _gather2(p_parts, ohr, qsel, 3, Q, dtype)
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

    def solve_dx(poses, lam):
        px, py, pth = _split3(poses)
        xi = (px, py, pth)
        xj = (_roll(px, -1, 1), _roll(py, -1, 1), _roll(pth, -1, 1))

        # --- chain edges: edge k couples nodes (k, k+1); everything is a
        # lane roll, no gathers. Masked/absent edges have zero cR rows.
        cz = (cz_ref[0:1], cz_ref[1:2], cz_ref[2:3])
        cR = tuple(cR_ref[a : a + 1] for a in range(9))
        rw, Jiw, Jjw = _linearize_rows(xi, xj, cz, cR, -1.0)
        Aii, Aij, Ajj, gi, gj = _outer_blocks(Jiw, Jjw, rw)

        # node n: D[n] = Aii[n] + Ajj[n-1] + prior; g likewise.
        D = tuple(
            Aii[e] + _roll(Ajj[e], 1, 1) for e in range(9)
        )
        g = tuple(gi[a] + _roll(gj[a], 1, 1) for a in range(3))
        U = Aij  # U[k] couples rows k, k+1

        # --- priors: r = Log(z^-1 x), J = Jr^{-1}(r) (linearize_priors).
        pz = (pz_ref[0:1], pz_ref[1:2], pz_ref[2:3])
        pR = tuple(pR_ref[a : a + 1] for a in range(9))
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
            p_parts = _hi_lo(poses.reshape(3 * Q, 128), 3)  # ~f32-exact

            def tile_body(t, carry):
                Dg = carry  # tall (12*Q, 128): rows 0-8 D entries, 9-11 g
                idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                ohr, qsel = _tile_qr(idx, Q, dtype)
                pg = _gather2(p_parts, ohr, qsel, 3, Q, dtype)  # (3, 2T)
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
                return Dg + _scatter2(C, ohr, qsel, dtype)

            Dg0 = jnp.zeros((12 * Q, 128), dtype)
            Dg = jax.lax.fori_loop(0, nt, tile_body, Dg0).reshape(12, Npad)
            D = tuple(D[e] + Dg[e : e + 1] for e in range(9))
            g = tuple(g[a] + Dg[9 + a : 10 + a] for a in range(3))

        # Marquardt damping: diagonal entries scale by (1 + lam)
        # (normal_eq.py::_damped_diag with lm_diag_scaling). lam == 0 in GN.
        D = tuple(D[e] * (1.0 + lam) if e in (0, 4, 8) else D[e] for e in range(9))

        # --- plane sets + PCR factorization of the chain preconditioner ----
        Dpl = _rows_to_planes(D)
        Upl = _rows_to_planes(U)
        # L[i] = U[i-1]^T: transpose = row relabel, shift = lane roll
        UT = _m3_T(U)
        Lpl = tuple(_roll(p, 1, 1) for p in _rows_to_planes(UT))
        # zero the wrapped lane-0 garbage (U[Npad-1] is already zero rows —
        # chain rows are zero beyond c <= N-1 — so the roll is clean).
        A_steps, G_steps, DinvF = _pl_pcr_factor(
            Dpl, Upl, Lpl, K, eps,
            store_dtype=jnp.bfloat16 if pcr_bf16 else None,
        )

        b = -jnp.concatenate(g, axis=0)  # (3, Npad)

        def hvp(v):
            out = _pl_bmv(Dpl, v)
            out += _pl_bmv(Upl, _roll(v, -1, 1))
            out += _pl_bmv(Lpl, _roll(v, 1, 1))
            if n_tiles:
                v_parts = _hi_lo(v.reshape(3 * Q, 128), hvp_splits)

                def tile_body(t, acc):
                    idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                    ohr, qsel = _tile_qr(idx, Q, dtype)
                    vg = _gather2(v_parts, ohr, qsel, 3, Q, dtype)  # (3, 2T)
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
                    return acc + _scatter2(
                        ys, ohr, qsel, dtype, n_splits=hvp_splits
                    )

                acc0 = jnp.zeros((3 * Q, 128), dtype)
                out = out + jax.lax.fori_loop(
                    0, nt, tile_body, acc0
                ).reshape(3, Npad)
            return out

        # --- preconditioned CG (fixed iteration count) ----------------------
        tiny = jnp.asarray(1e-30, dtype)
        r = b
        z = _pl_pcr_apply(A_steps, G_steps, DinvF, r)
        p = z
        rz = jnp.sum(r * z)
        x = jnp.zeros_like(b)

        def cg_body(_, carry):
            x, r, p, rz = carry
            Ap = hvp(p)
            pAp = jnp.sum(p * Ap)
            alpha = rz / jnp.maximum(pAp, tiny)
            x = x + alpha * p
            r = r - alpha * Ap
            z = _pl_pcr_apply(A_steps, G_steps, DinvF, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, tiny)
            p = z + beta * p
            return x, r, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r, p, rz))
        return x

    def retract(poses, x):
        px, py, pth = _split3(poses)
        e = _se2_exp(x[0:1], x[1:2], x[2:3])
        nx, ny, nth = _se2_compose(px, py, pth, *e)
        return jnp.concatenate([nx, ny, nth], axis=0)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    if not lm:
        zero = jnp.asarray(0.0, dtype)

        def gn_iter(_, poses):
            return retract(poses, solve_dx(poses, zero))

        out_ref[:] = jax.lax.fori_loop(0, n_gn, gn_iter, poses_ref[:])
        stats_ref[:] = jnp.zeros((8, 128), dtype)
    else:
        # Full Levenberg-Marquardt: damped solve, candidate chi2,
        # accept/reject, classic lambda up/down schedule (solver/lm.py's
        # _lm_loop semantics minus the convergence early-exit — converged
        # iterations keep polishing at zero risk since worse steps reject).
        def lm_iter(_, carry):
            poses, lam, err = carry
            x = solve_dx(poses, lam)
            cand = retract(poses, x)
            new_err = chi2_of(cand)
            accepted = new_err < err
            poses = jnp.where(accepted, cand, poses)
            lam = jnp.where(
                accepted,
                jnp.maximum(lam / lam_factor, lam_min),
                jnp.minimum(lam * lam_factor, lam_max),
            )
            err = jnp.where(accepted, new_err, err)
            return poses, lam, err

        err0 = chi2_of(poses_ref[:])
        poses, lam, err = jax.lax.fori_loop(
            0, n_gn, lm_iter,
            (poses_ref[:], jnp.asarray(lam0, dtype), err0),
        )
        out_ref[:] = poses
        stats_ref[:] = (
            jnp.where((i0 == 0) & (i1 == 0), err, 0.0)
            + jnp.where((i0 == 0) & (i1 == 1), lam, 0.0)
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
        "edge_tile", "hvp_splits",
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
):
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    N, T = poses0.shape
    if T != 3:
        raise ValueError("fused_gn_solve supports T=3 (SE2) only")
    dtype = poses0.dtype
    Npad = -(-N // 128) * 128
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

    poses_pl = jnp.zeros((3, Npad), dtype).at[:, :N].set(poses0.T)

    # chain edge data: rows over lanes k in [0, c)
    cm = graph.edge_mask[:c].astype(dtype)
    cz = jnp.zeros((3, Npad), dtype).at[:, :c].set(
        (graph.measurements[:c] * cm[:, None]).T
    )
    cR = jnp.zeros((9, Npad), dtype).at[:, :c].set(
        (graph.sqrt_info[:c] * cm[:, None, None]).reshape(c, 9).T
    )

    # priors scattered per node
    pz_n = jnp.zeros((Npad, 3), dtype).at[graph.prior_idx].set(
        graph.prior_meas * graph.prior_mask[:, None].astype(dtype)
    )
    pR_n = jnp.zeros((Npad, 3, 3), dtype).at[graph.prior_idx].set(
        graph.prior_sqrt_info * graph.prior_mask[:, None, None].astype(dtype)
    )
    pz = pz_n.T
    pR = pR_n.reshape(Npad, 9).T

    eidx, eld, n_tiles = _pack_loop_edges(
        graph.edges, graph.measurements, graph.sqrt_info, graph.edge_mask,
        c, dtype, tile,
    )
    Epad = eld.shape[1]

    # Live tile count: loop slots fill contiguously (masked tail), so tiles
    # past the last unmasked edge contribute nothing and are skipped.
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
            hvp_splits=hvp_splits,
            lm=lm, lam0=lam0, lam_factor=lam_factor, lam_min=lam_min,
            lam_max=lam_max,
        ),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
        + [vspec] * 7,
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((3, Npad), dtype),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((9, Epad), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nt, poses_pl, cz, cR, pz, pR, eidx, eld)
    return out[:, :N].T, stats


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
):
    """Full Levenberg-Marquardt — damped solve, candidate chi2,
    accept/reject, lambda schedule — entirely inside ONE Pallas kernel for
    all `iterations` trust-region steps. The TPU-native form of THE call
    the reference backend exists to make:
    gtsam::LevenbergMarquardtOptimizer(graph, initial).optimize()
    (/root/reference/src/graph/src/graph.cpp:119).

    Returns (poses (N, 3), final_chi2 (), final_lambda ()). Matches
    solver/lm.py::_lm_loop(mode="pcg_fused") step-for-step except the
    convergence early-exit (converged iterations keep polishing; worse
    steps reject, so the result is at least as converged).
    """
    out, stats = _fused_solve(
        poses0, graph, iterations=iterations, cg_iters=cg_iters,
        huber_delta=huber_delta, interpret=interpret, lm=True,
        lam0=lam0, lam_factor=lam_factor, lam_min=lam_min, lam_max=lam_max,
        pcr_levels=pcr_levels, edge_tile=edge_tile, hvp_splits=hvp_splits,
    )
    return out, stats[0, 0], stats[0, 1]
