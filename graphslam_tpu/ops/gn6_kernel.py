"""Fully fused SE(3) Gauss-Newton / Levenberg-Marquardt — K complete
iterations in ONE Pallas kernel.

The SE(3) analog of ops/gn_kernel.py. Round-2 profiling showed sphere2500
(SE(3), BASELINE config) at 267 it/s with the fused whole-CG-loop solve
(ops/pcg6_kernel.py): the remaining ~2.5 ms per GN iteration is the SAME
launch-latency-bound XLA op soup the SE(2) mega-kernel eliminated —
linearize (factors/linearize.py analytic SE(3) path), block assembly
(solver/normal_eq.py::build_blocks), chi2, retract. This module fuses the
whole outer loop:

  for k in range(iterations):               # one pallas_call total
      linearize chain edges    (row-level SE(3)/SO(3) math on component rows)
      linearize priors
      linearize loop edges     (per 128-edge tile: one-hot MXU gather of
                                endpoint poses, row-level SE(3) math,
                                one-hot MXU scatter of H/g contributions)
      assemble 6x6 block-tridiag D/U + gradient g
      PCR-factor the chain preconditioner  (2x2 grids of 3x3 plane sets)
      preconditioned CG                    (fixed iteration count)
      retract poses (right Exp) + one polar-Newton rotation renormalize

Data layout: everything is component rows — a pose field is a (12, Npad)
array (rows 0-8 the row-major rotation, 9-11 the translation) with poses on
lanes; a 6x6 block field is a 2x2 grid of 3x3 "rowmats" (each a 9-tuple of
(1, W) rows). Chain edges (k, k+1) linearize with NO gathers (x_j is a lane
roll); loop edges gather/scatter via the two-level one-hot factorization
(gn_kernel.py::_tile_qr/_gather2/_scatter2 — K=128 MXU matmul over r =
idx % 128 on the tall reshape, exact VPU select over q = idx // 128) with
hi/lo bf16 splits exactly as in gn_kernel.py. The chain preconditioner and
CG reuse ops/pcg6_kernel.py's 6x6 grid-of-planes algebra verbatim.

All the Lie math mirrors geometry/so3.py / geometry/se3.py line-for-line
(same series switch points, same near-pi log recovery) so the fused solver
reproduces the XLA trajectory.

This replaces gtsam::LevenbergMarquardtOptimizer for Pose3 graphs — the one
call the reference backend exists to make
(/root/reference/src/graph/src/graph.cpp:119; GTSAM treats Pose2 and Pose3
identically) — at one kernel launch per solve.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphslam_tpu.ops.gn_kernel import (
    _acc_win_add,
    _gather2,
    _hi_lo,
    _scatter2,
    _tile_qr,
    _tile_qr_win,
    _win_parts,
    _m3_T,
    _m3_mul,
    _m3_neg,
    _m3_scale,
    _m3_Tvec,
    _m3_vec,
    _p_binv,
    _p_bmm,
    _p_bmv,
    _p_lane_roll,
    _p_planes,
    _p_T,
    _p_tall,
    _p_untall,
    _proll,
)
from graphslam_tpu.ops.pcg_kernel import _EDGE_TILE


# ---------------------------------------------------------------------------
# Packed 6x6 grid algebra: a "pg6" is a 4-tuple (P, Q, R, S) of PACKED plane
# sets (gn_kernel.py's nested tuples P[d][a] of (8, L) fields): M = [[P, Q],
# [R, S]]. The packed mirror of pcg6_kernel.py's grid-of-planes algebra —
# component reindexing is free at trace time, every op fills all 8 VPU
# sublanes.
# ---------------------------------------------------------------------------


def _p_add(A, B):
    return tuple(tuple(x + y for x, y in zip(ra, rb)) for ra, rb in zip(A, B))


def _pg_bmm(A, B):
    AP, AQ, AR, AS = A
    BP, BQ, BR, BS = B
    return (
        _p_add(_p_bmm(AP, BP), _p_bmm(AQ, BR)),
        _p_add(_p_bmm(AP, BQ), _p_bmm(AQ, BS)),
        _p_add(_p_bmm(AR, BP), _p_bmm(AS, BR)),
        _p_add(_p_bmm(AR, BQ), _p_bmm(AS, BS)),
    )


def _p_subps(A, B):
    return tuple(tuple(x - y for x, y in zip(ra, rb)) for ra, rb in zip(A, B))


def _pg_sub(A, B):
    return tuple(_p_subps(pa, pb) for pa, pb in zip(A, B))


def _pg_neg(A):
    return tuple(
        tuple(tuple(-x for x in r) for r in q) for q in A
    )


def _pg_lane_roll(A, h: int):
    return tuple(_p_lane_roll(q, h) for q in A)


def _pg_T(A):
    AP, AQ, AR, AS = A
    return (_p_T(AP), _p_T(AR), _p_T(AQ), _p_T(AS))


def _pg_ridge(M, eps: float):
    """M + (eps * |trace| / 6 + 1e-8) * I in grid space (cf. _g_ridge)."""
    P, Q, R, S = M
    tr = P[0][0] + P[0][1] + P[0][2] + S[0][0] + S[0][1] + S[0][2]
    t = jnp.abs(tr) * (eps / 6.0) + 1e-8
    return (
        (tuple(P[0][a] + t for a in range(3)), P[1], P[2]),
        Q,
        R,
        (tuple(S[0][a] + t for a in range(3)), S[1], S[2]),
    )


def _pg_binv(M):
    """6x6 block inverse via the Schur complement of S (cf. _g_binv)."""
    P, Q, R, S = M
    Sinv = _p_binv(S)
    QSi = _p_bmm(Q, Sinv)
    schur = _p_subps(P, _p_bmm(QSi, _p_T(Q)))
    TL = _p_binv(schur)
    TR = tuple(tuple(-x for x in r) for r in _p_bmm(TL, QSi))
    BR = _p_subps(Sinv, _p_bmm(_p_T(QSi), TR))
    return (TL, TR, _p_T(TR), BR)


def _pg_bmv(M, v):
    """Grid block matvec on a 6-tuple of packed fields."""
    P, Q, R, S = M
    vt, vb = v[:3], v[3:]
    top = tuple(
        x + y for x, y in zip(_p_bmv(P, vt), _p_bmv(Q, vb))
    )
    bot = tuple(
        x + y for x, y in zip(_p_bmv(R, vt), _p_bmv(S, vb))
    )
    return top + bot


def _pg_cast(A, dtype):
    return tuple(
        tuple(tuple(x.astype(dtype) for x in r) for r in q) for q in A
    )


def _pg_pcr_factor(Dt, Ut, Lt, K: int, eps: float, store_dtype=None):
    """PCR elimination over packed 6x6 block-tridiagonal grids."""
    if store_dtype is None:
        store_dtype = Dt[0][0][0].dtype
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _pg_ridge(Dt, eps)
        Dinv = _pg_binv(Dt)
        alpha = _pg_bmm(Lt, _pg_lane_roll(Dinv, h))
        gamma = _pg_bmm(Ut, _pg_lane_roll(Dinv, -h))
        A_steps.append(_pg_cast(alpha, store_dtype))
        G_steps.append(_pg_cast(gamma, store_dtype))
        Dt = _pg_sub(
            _pg_sub(Dt, _pg_bmm(alpha, _pg_lane_roll(Ut, h))),
            _pg_bmm(gamma, _pg_lane_roll(Lt, -h)),
        )
        Lt, Ut = (
            _pg_neg(_pg_bmm(alpha, _pg_lane_roll(Lt, h))),
            _pg_neg(_pg_bmm(gamma, _pg_lane_roll(Ut, -h))),
        )
    DinvF = _pg_binv(_pg_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _pg_pcr_apply(A_steps, G_steps, DinvF, b):
    dt = b[0].dtype
    for k in range(len(A_steps)):
        h = 1 << k
        bm = tuple(_proll(x, h) for x in b)
        bp = tuple(_proll(x, -h) for x in b)
        t1 = _pg_bmv(_pg_cast(A_steps[k], dt), bm)
        t2 = _pg_bmv(_pg_cast(G_steps[k], dt), bp)
        b = tuple(b[a] - t1[a] - t2[a] for a in range(6))
    return _pg_bmv(DinvF, b)


# ---------------------------------------------------------------------------
# 6x6 grid algebra over rowmats. A "g6" is a 4-tuple (P, Q, R, S) of rowmat
# 9-tuples: M = [[P, Q], [R, S]]. A "v6" is a 6-tuple of (1, W) rows.
# ---------------------------------------------------------------------------


def _v3_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _m3_add(A, B):
    return tuple(x + y for x, y in zip(A, B))


def _g6_mul(A, B):
    AP, AQ, AR, AS = A
    BP, BQ, BR, BS = B
    return (
        _m3_add(_m3_mul(AP, BP), _m3_mul(AQ, BR)),
        _m3_add(_m3_mul(AP, BQ), _m3_mul(AQ, BS)),
        _m3_add(_m3_mul(AR, BP), _m3_mul(AS, BR)),
        _m3_add(_m3_mul(AR, BQ), _m3_mul(AS, BS)),
    )


def _g6_T(A):
    return (_m3_T(A[0]), _m3_T(A[2]), _m3_T(A[1]), _m3_T(A[3]))


def _g6_neg(A):
    return tuple(_m3_neg(q) for q in A)


def _g6_add(A, B):
    return tuple(_m3_add(qa, qb) for qa, qb in zip(A, B))


def _g6_scale(A, s):
    return tuple(_m3_scale(q, s) for q in A)


def _g6_vec(A, v):
    """g6 @ v6 -> v6."""
    vt, vb = v[:3], v[3:]
    top = _v3_add(_m3_vec(A[0], vt), _m3_vec(A[1], vb))
    bot = _v3_add(_m3_vec(A[2], vt), _m3_vec(A[3], vb))
    return top + bot


def _g6_Tvec(A, v):
    """g6^T @ v6 -> v6."""
    vt, vb = v[:3], v[3:]
    top = _v3_add(_m3_Tvec(A[0], vt), _m3_Tvec(A[2], vb))
    bot = _v3_add(_m3_Tvec(A[1], vt), _m3_Tvec(A[3], vb))
    return top + bot


def _g6_outer(Jiw, Jjw, rw):
    """Aii = Ji^T Ji, Aij = Ji^T Jj, Ajj = Jj^T Jj, gi = Ji^T r, gj."""
    JiT = _g6_T(Jiw)
    Aii = _g6_mul(JiT, Jiw)
    Aij = _g6_mul(JiT, Jjw)
    Ajj = _g6_mul(_g6_T(Jjw), Jjw)
    gi = _g6_Tvec(Jiw, rw)
    gj = _g6_Tvec(Jjw, rw)
    return Aii, Aij, Ajj, gi, gj


# ---------------------------------------------------------------------------
# Row-level SO(3): rotations are rowmats (9-tuples of (1, W) rows, row-major),
# rotation vectors are 3-tuples. Mirrors geometry/so3.py exactly.
# ---------------------------------------------------------------------------


def _eye3(like):
    one = jnp.ones_like(like)
    zero = jnp.zeros_like(like)
    return (one, zero, zero, zero, one, zero, zero, zero, one)


def _so3_hat(w):
    x, y, z = w
    zero = jnp.zeros_like(x)
    return (zero, -z, y, z, zero, -x, -y, x, zero)


def _w_theta(w):
    theta2 = w[0] * w[0] + w[1] * w[1] + w[2] * w[2]
    return theta2, jnp.sqrt(theta2)


def _aI_bW_cW2(w, a, b, c):
    """a*I + b*hat(w) + c*hat(w)^2 using hat(w)^2 = w w^T - theta^2 I."""
    x, y, z = w
    theta2 = x * x + y * y + z * z
    d = a - c * theta2
    return (
        d + c * x * x, -b * z + c * x * y, b * y + c * x * z,
        b * z + c * y * x, d + c * y * y, -b * x + c * y * z,
        -b * y + c * z * x, b * x + c * z * y, d + c * z * z,
    )


def _so3_exp(w):
    """Rodrigues (so3.py::exp), series-safe near zero."""
    theta2, theta = _w_theta(w)
    small = theta < 1e-6
    ts = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(ts) / ts)
    b = jnp.where(small, 0.5 - theta2 / 24.0, 2.0 * jnp.sin(ts / 2.0) ** 2 / (ts * ts))
    return _aI_bW_cW2(w, jnp.ones_like(theta), a, b)


def _acos_no_trig(c, s):
    """theta = arccos(c) for theta in [0, pi], given s = sin(theta) >= 0.

    Mosaic TPU has no arccos/atan2 lowering, so: tan-half-angle t =
    s/(1+c) = tan(theta/2), reduce t > 1 via atan(t) = pi/2 - atan(1/t),
    odd minimax polynomial for atan on [0, 1] (~1.5e-5 rad), then ONE
    Newton step on cos(theta) = c polishes to f32 exactness. Callers
    guarantee c is bounded away from -1 (the near-pi branch takes over
    below c = -0.99, so 1 + c >= 0.01).
    """
    t = s / (1.0 + c)
    inv = t > 1.0
    x = jnp.where(inv, 1.0 / jnp.maximum(t, 1e-20), t)
    x2 = x * x
    p = x * (
        0.99997726
        + x2 * (-0.33262347
        + x2 * (0.19354346
        + x2 * (-0.11643287
        + x2 * (0.05265332
        + x2 * (-0.01172120)))))
    )
    half = jnp.where(inv, 0.5 * math.pi - p, p)
    theta = 2.0 * half
    # Newton: theta <- theta + (cos(theta) - c)/sin(theta); sin bounded
    # below by s >= sin of the near-pi cutoff on the live branch.
    theta = theta + (jnp.cos(theta) - c) / jnp.maximum(jnp.sin(theta), 1e-6)
    return theta


def _so3_log(R):
    """Rotation vector from rowmat (so3.py::log semantics).

    k = theta/sin(theta) switches to the series in u = 1 - c near the
    identity (where sin -> 0 cancels); the generic branch computes theta
    without inverse-trig primitives (_acos_no_trig — Mosaic has none); the
    near-pi branch recovers the axis from the largest column of R + I
    (select, not argmax).
    """
    trace = R[0] + R[4] + R[8]
    c = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    wx = (R[7] - R[5]) / 2.0
    wy = (R[2] - R[6]) / 2.0
    wz = (R[3] - R[1]) / 2.0  # = sin(theta) * axis

    near_id = c > 0.95
    near_pi = c < -0.99

    u = 1.0 - c
    s2 = jnp.maximum(1.0 - c * c, 1e-12)
    s = jnp.sqrt(s2)
    c_safe = jnp.where(near_id | near_pi, 0.0, c)
    s_safe = jnp.where(near_id | near_pi, 1.0, s)
    k_generic = _acos_no_trig(c_safe, s_safe) / s_safe
    k_series = 1.0 + u / 3.0 + (2.0 / 15.0) * u * u + (2.0 / 35.0) * u * u * u
    k = jnp.where(near_id, k_series, k_generic)
    w_main = (k * wx, k * wy, k * wz)

    # Near pi: axis from the largest column of R + I (so3.py:80-91).
    v = 1.0 + c
    theta_pi = math.pi - jnp.sqrt(jnp.maximum(2.0 * v, 0.0)) * (1.0 + v / 12.0)
    Rp = list(R)
    Rp[0] = R[0] + 1.0
    Rp[4] = R[4] + 1.0
    Rp[8] = R[8] + 1.0
    cols = [(Rp[j], Rp[3 + j], Rp[6 + j]) for j in range(3)]
    n2 = [col[0] ** 2 + col[1] ** 2 + col[2] ** 2 for col in cols]
    use0 = (n2[0] >= n2[1]) & (n2[0] >= n2[2])
    use1 = (~use0) & (n2[1] >= n2[2])
    axis_raw = tuple(
        jnp.where(use0, cols[0][a], jnp.where(use1, cols[1][a], cols[2][a]))
        for a in range(3)
    )
    inv_n = jax.lax.rsqrt(
        jnp.maximum(sum(x * x for x in axis_raw), 1e-12)
    )
    axis = tuple(x * inv_n for x in axis_raw)
    dot = axis[0] * wx + axis[1] * wy + axis[2] * wz
    sgn = jnp.where(dot < 0.0, -1.0, 1.0)
    w_pi = tuple(theta_pi * a * sgn for a in axis)

    return tuple(jnp.where(near_pi, p, m) for p, m in zip(w_pi, w_main))


def _so3_jl(w):
    """SO(3) left Jacobian rowmat (so3.py::left_jacobian)."""
    theta2, theta = _w_theta(w)
    small = theta < 1e-6
    ts = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 0.5 - theta2 / 24.0, 2.0 * jnp.sin(ts / 2.0) ** 2 / (ts * ts))
    B = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (ts - jnp.sin(ts)) / (ts**3))
    return _aI_bW_cW2(w, jnp.ones_like(theta), A, B)


def _so3_jl_inv(w):
    """Inverse SO(3) left Jacobian rowmat (so3.py::left_jacobian_inv)."""
    theta2, theta = _w_theta(w)
    small = theta < 1e-6
    ts = jnp.where(small, 1.0, theta)
    half = ts / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (ts * ts),
    )
    return _aI_bW_cW2(w, jnp.ones_like(theta), jnp.full_like(theta, -0.5), cot_term)


# ---------------------------------------------------------------------------
# Row-level SE(3): a pose is (Rm, t) with Rm a rowmat and t a 3-tuple.
# Tangents are v6 = (rho, phi) 6-tuples. Mirrors geometry/se3.py.
# ---------------------------------------------------------------------------


def _se3_between(a, b):
    """(Ra, ta)^-1 * (Rb, tb)."""
    Ra, ta = a
    Rb, tb = b
    RaT = _m3_T(Ra)
    d = tuple(x - y for x, y in zip(tb, ta))
    return _m3_mul(RaT, Rb), _m3_vec(RaT, d)


def _se3_inverse(p):
    Rm, t = p
    RT = _m3_T(Rm)
    return RT, tuple(-x for x in _m3_vec(RT, t))


def _se3_compose(a, b):
    Ra, ta = a
    Rb, tb = b
    return _m3_mul(Ra, Rb), _v3_add(_m3_vec(Ra, tb), ta)


def _se3_log(p):
    """-> v6 (rho, phi)."""
    Rm, t = p
    phi = _so3_log(Rm)
    rho = _m3_vec(_so3_jl_inv(phi), t)
    return rho + phi


def _se3_exp(xi):
    rho, phi = xi[:3], xi[3:]
    Rm = _so3_exp(phi)
    t = _m3_vec(_so3_jl(phi), rho)
    return Rm, t


def _se3_adjoint(p):
    """g6 adjoint [[R, hat(t) R], [0, R]] (se3.py::adjoint)."""
    Rm, t = p
    zero = tuple(jnp.zeros_like(x) for x in Rm)
    return (Rm, _m3_mul(_so3_hat(t), Rm), zero, Rm)


def _Q_rows(rho, phi):
    """Barfoot's Q(rho, phi) rowmat (se3.py::_Q_matrix, same series)."""
    theta2 = phi[0] ** 2 + phi[1] ** 2 + phi[2] ** 2
    theta = jnp.sqrt(theta2)
    small = theta < 0.7
    ts = jnp.where(small, 1.0, theta)
    c1 = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
        (ts - jnp.sin(ts)) / ts**3,
    )
    c2 = jnp.where(
        small,
        -1.0 / 24.0 + theta2 / 720.0 - theta2 * theta2 / 40320.0,
        (1.0 - ts * ts / 2.0 - jnp.cos(ts)) / ts**4,
    )
    c3i = jnp.where(
        small,
        -1.0 / 120.0 + theta2 / 5040.0 - theta2 * theta2 / 362880.0,
        (ts - jnp.sin(ts) - ts**3 / 6.0) / ts**5,
    )
    rx = _so3_hat(rho)
    px = _so3_hat(phi)
    pxrx = _m3_mul(px, rx)
    rxpx = _m3_mul(rx, px)
    pxrxpx = _m3_mul(pxrx, px)
    t1 = _m3_scale(rx, 0.5)
    t2 = _m3_scale(_m3_add(_m3_add(pxrx, rxpx), pxrxpx), c1)
    inner = _m3_add(
        _m3_add(_m3_mul(px, pxrx), _m3_mul(rxpx, px)),
        _m3_scale(pxrxpx, -3.0),
    )
    t3 = _m3_scale(inner, -c2)
    t4 = _m3_scale(
        _m3_add(_m3_mul(pxrxpx, px), _m3_mul(px, pxrxpx)),
        -0.5 * (c2 - 3.0 * c3i),
    )
    return _m3_add(_m3_add(t1, t2), _m3_add(t3, t4))


def _se3_jr_inv(xi):
    """Inverse SE(3) right Jacobian g6: Jl^{-1}(-xi) (se3.py:143-162)."""
    nrho = tuple(-x for x in xi[:3])
    nphi = tuple(-x for x in xi[3:])
    Jinv = _so3_jl_inv(nphi)
    Q = _Q_rows(nrho, nphi)
    TR = _m3_neg(_m3_mul(_m3_mul(Jinv, Q), Jinv))
    zero = tuple(jnp.zeros_like(x) for x in Jinv)
    return (Jinv, TR, zero, Jinv)


def _renorm(Rm):
    """One polar-Newton step R (1.5 I - 0.5 R^T R) (so3.py::normalize)."""
    RtR = _m3_mul(_m3_T(Rm), Rm)
    M = tuple(
        (1.5 if e in (0, 4, 8) else 0.0) - 0.5 * RtR[e] for e in range(9)
    )
    return _m3_mul(Rm, M)


# ---------------------------------------------------------------------------
# Linearization rows
# ---------------------------------------------------------------------------


def _pose_of(rows):
    """12-tuple of rows -> (rowmat, t3)."""
    return tuple(rows[:9]), tuple(rows[9:12])


def _linearize6(xi, xj, z, W, huber_delta: float):
    """Whitened (rw v6, Jiw g6, Jjw g6) for between factors on rows.

    Mirrors factors/linearize.py's analytic SE(3) path:
      h = x_i^-1 x_j;  r = Log(z^-1 h)
      Jj = Jr^{-1}(r);  Ji = -Jr^{-1}(r) Ad(h^-1)
    W is the (masked) 6x6 sqrt-information g6. huber_delta > 0 applies the
    IRLS sqrt-weight min(1, delta/||rw||) (loop tiles only).
    """
    h = _se3_between(xi, xj)
    d = _se3_between(z, h)
    r = _se3_log(d)
    Jr_inv = _se3_jr_inv(r)
    Ad_hinv = _se3_adjoint(_se3_inverse(h))
    Jj = Jr_inv
    Ji = _g6_neg(_g6_mul(Jr_inv, Ad_hinv))
    rw = _g6_vec(W, r)
    Jiw = _g6_mul(W, Ji)
    Jjw = _g6_mul(W, Jj)
    if huber_delta > 0.0:
        n2 = sum(x * x for x in rw)
        n = jnp.sqrt(jnp.maximum(n2, 1e-24))
        sw = jnp.sqrt(jnp.minimum(1.0, huber_delta / n))
        rw = tuple(x * sw for x in rw)
        Jiw = _g6_scale(Jiw, sw)
        Jjw = _g6_scale(Jjw, sw)
    return rw, Jiw, Jjw


def _residual6(xi, xj, z, W):
    h = _se3_between(xi, xj)
    d = _se3_between(z, h)
    return _g6_vec(W, _se3_log(d))


def _tuple_g6(rows):
    """Indexable of 36 packed fields (6x6 row-major) -> g6 of rowmats."""
    def quad(r0, c0):
        return tuple(
            rows[6 * (r0 + a) + c0 + b] for a in range(3) for b in range(3)
        )

    return (quad(0, 0), quad(0, 3), quad(3, 0), quad(3, 3))


def _pg_to_planes(G):
    return tuple(_p_planes(q) for q in G)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _gn6_kernel(
    nt_ref, poses_ref, cz_ref, cW_ref, pz_ref, pW_ref, eidx_ref, eld_ref,
    q0_ref,
    out_ref, stats_ref, Aij_ref, *,
    N: int, Npad: int, K: int, n_gn: int, cg_iters: int, n_tiles: int,
    eps: float, huber_delta: float, tile: int, hvp_splits: int, win: int,
    warm_start: bool, cg_ramp,
    lm: bool, lam0: float, lam_factor: float, lam_min: float, lam_max: float,
    abs_tol: float, rel_tol: float,
):
    nt = jnp.minimum(nt_ref[0, 0], n_tiles)
    dtype = poses_ref.dtype
    Q = Npad // 128
    L = Npad // 8

    def tile_sel(t, idx):
        """Per-tile one-hot pieces + (page-windowed) gather-row count
        (see gn_kernel.py / ops/bucketize.py)."""
        if win:
            q0i = q0_ref[0, t]
            q0j = q0_ref[1, t]
            ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
            return ohr, qsel, q0i, q0j, 2 * win
        ohr, qsel = _tile_qr(idx, Q, dtype)
        return ohr, qsel, None, None, Q

    def prep_src(tall, ns):
        """Windowed mode keeps the f32 tall array (the per-tile window is
        hi/lo-split after slicing — Mosaic's dynamic rotate is 32-bit only);
        full mode pre-splits (see gn_kernel.py)."""
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
    padrow = (nidx >= N).astype(dtype)

    def _comps(ref, n):
        return tuple(ref[8 * a : 8 * (a + 1)] for a in range(n))

    def _rows_g6p(ref):
        """Packed g6 from 36 consecutive 8-row groups (6x6 row-major)."""
        def quad(r0, c0):
            return tuple(
                ref[8 * (6 * (r0 + a) + c0 + b) : 8 * (6 * (r0 + a) + c0 + b) + 8]
                for a in range(3) for b in range(3)
            )

        return (quad(0, 0), quad(0, 3), quad(3, 0), quad(3, 3))

    def chain_parts(poses):
        xi = _pose_of(poses)
        xj = _pose_of(tuple(_proll(r, -1) for r in poses))
        z = _pose_of(_comps(cz_ref, 12))
        W = _rows_g6p(cW_ref)
        return xi, xj, z, W

    def prior_parts():
        z = _pose_of(_comps(pz_ref, 12))
        W = _rows_g6p(pW_ref)
        return z, W

    def tile_edge_parts(poses_src, t):
        """Gather endpoint poses + unpack tile measurement/info rows."""
        idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
        ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
        pg = tile_gather(poses_src, ohr, qsel, 12, q0i, q0j, rows, 3)
        xi_t = _pose_of(tuple(pg[a : a + 1, :tile] for a in range(12)))
        xj_t = _pose_of(tuple(pg[a : a + 1, tile:] for a in range(12)))
        sle = pl.ds(t * tile, tile)
        z_t = _pose_of(tuple(eld_ref[a : a + 1, sle] for a in range(12)))
        W_t = _rows_g6_off(eld_ref, sle)
        return (ohr, qsel, q0i, q0j), xi_t, xj_t, z_t, W_t

    def chi2_of(poses):
        xi, xj, z, W = chain_parts(poses)
        rw = _residual6(xi, xj, z, W)
        e = sum(jnp.sum(x * x) for x in rw)

        pz, pW = prior_parts()
        dp = _se3_between(pz, xi)
        rp = _g6_vec(pW, _se3_log(dp))
        e += sum(jnp.sum(x * x) for x in rp)

        if n_tiles:
            p_src = prep_src(_p_tall(poses), 3)

            def tile_body(t, acc):
                _, xi_t, xj_t, z_t, W_t = tile_edge_parts(p_src, t)
                rw_t = _residual6(xi_t, xj_t, z_t, W_t)
                et = sum(x * x for x in rw_t)
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
        xi, xj, z, W = chain_parts(poses)
        rw, Jiw, Jjw = _linearize6(xi, xj, z, W, -1.0)
        Aii, Aij, Ajj, gi, gj = _g6_outer(Jiw, Jjw, rw)

        # node n: D[n] = Aii[n] + Ajj[n-1] (+ prior); g likewise.
        D = tuple(
            tuple(qa[e] + _proll(qb[e], 1) for e in range(9))
            for qa, qb in zip(Aii, Ajj)
        )
        g = tuple(gi[a] + _proll(gj[a], 1) for a in range(6))
        U = Aij

        # priors: r = Log(z^-1 x), J = Jr^{-1}(r).
        pz, pW = prior_parts()
        dp = _se3_between(pz, xi)
        rp = _se3_log(dp)
        Jp = _se3_jr_inv(rp)
        rpw = _g6_vec(pW, rp)
        Jpw = _g6_mul(pW, Jp)
        Ap = _g6_mul(_g6_T(Jpw), Jpw)
        gp = _g6_Tvec(Jpw, rpw)
        D = _g6_add_grid(D, Ap)
        g = _v3_add(g[:3], gp[:3]) + _v3_add(g[3:], gp[3:])
        # keep padding lanes nonsingular (identity on both diagonal quadrants)
        D = (
            tuple(D[0][e] + (padrow if e in (0, 4, 8) else 0.0) for e in range(9)),
            D[1], D[2],
            tuple(D[3][e] + (padrow if e in (0, 4, 8) else 0.0) for e in range(9)),
        )

        # loop edges
        if n_tiles:
            p_src = prep_src(_p_tall(poses), 3)

            def tile_body(t, carry):
                Dg = carry  # tall (42*Q, 128): rows 0-35 D entries, 36-41 g
                oh, xi_t, xj_t, z_t, W_t = tile_edge_parts(p_src, t)
                rw_t, Jiw_t, Jjw_t = _linearize6(xi_t, xj_t, z_t, W_t, huber_delta)
                Aii_t, Aij_t, Ajj_t, gi_t, gj_t = _g6_outer(Jiw_t, Jjw_t, rw_t)
                # stash Aij rows for the CG matvec (36 rows per tile)
                rows36 = _g6_rows36(Aij_t)
                for a in range(36):
                    Aij_ref[a : a + 1, pl.ds(t * tile, tile)] = rows36[a]
                Aii36 = _g6_rows36(Aii_t)
                Ajj36 = _g6_rows36(Ajj_t)
                C = jnp.concatenate(
                    [jnp.concatenate([Aii36[e], Ajj36[e]], axis=1) for e in range(36)]
                    + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1) for a in range(6)],
                    axis=0,
                )
                return tile_accumulate(
                    Dg, _scatter2(C, oh[0], oh[1], dtype), 42, oh[2], oh[3]
                )

            Dg0 = jnp.zeros((42 * Q, 128), dtype)
            Dg = _p_untall(
                jax.lax.fori_loop(0, nt, tile_body, Dg0), 42, L
            )
            D = _g6_add_grid(D, _tuple_g6(Dg))
            g = tuple(g[a] + Dg[36 + a] for a in range(6))

        # Marquardt damping on the 6 diagonal entries.
        scale = 1.0 + lam
        D = (
            tuple(D[0][e] * scale if e in (0, 4, 8) else D[0][e] for e in range(9)),
            D[1], D[2],
            tuple(D[3][e] * scale if e in (0, 4, 8) else D[3][e] for e in range(9)),
        )

        # grids of plane sets + PCR factorization of the chain preconditioner
        Dpl = _pg_to_planes(D)
        Upl = _pg_to_planes(U)
        # L[i] = U[i-1]^T; U entries are zero at the last chain node and
        # beyond, so the circular roll wraps only zeros.
        Lpl = _pg_lane_roll(_pg_T(Upl), 1)
        A_steps, G_steps, DinvF = _pg_pcr_factor(Dpl, Upl, Lpl, K, eps)

        b = tuple(-g[a] for a in range(6))

        def hvp(v):
            h1 = _pg_bmv(Dpl, v)
            h2 = _pg_bmv(Upl, tuple(_proll(x, -1) for x in v))
            h3 = _pg_bmv(Lpl, tuple(_proll(x, 1) for x in v))
            out = tuple(h1[a] + h2[a] + h3[a] for a in range(6))
            if n_tiles:
                v_src = prep_src(_p_tall(v), hvp_splits)

                def tile_body(t, acc):
                    idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
                    ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                    vg = tile_gather(v_src, ohr, qsel, 6, q0i, q0j, rows,
                                     hvp_splits)
                    vi = tuple(vg[a : a + 1, :tile] for a in range(6))
                    vj = tuple(vg[a : a + 1, tile:] for a in range(6))
                    sle = pl.ds(t * tile, tile)
                    A = tuple(Aij_ref[a : a + 1, sle] for a in range(36))
                    yi = tuple(
                        sum(A[6 * a + b_] * vj[b_] for b_ in range(6))
                        for a in range(6)
                    )
                    yj = tuple(
                        sum(A[6 * a + b_] * vi[a] for a in range(6))
                        for b_ in range(6)
                    )
                    ys = jnp.concatenate(
                        [jnp.concatenate([yi[a], yj[a]], axis=1) for a in range(6)],
                        axis=0,
                    )
                    return tile_accumulate(
                        acc,
                        _scatter2(ys, ohr, qsel, dtype,
                                  n_splits=hvp_splits),
                        6, q0i, q0j,
                    )

                acc0 = jnp.zeros((6 * Q, 128), dtype)
                tg = _p_untall(
                    jax.lax.fori_loop(0, nt, tile_body, acc0), 6, L
                )
                out = tuple(out[a] + tg[a] for a in range(6))
            return out

        tiny = jnp.asarray(1e-30, dtype)
        if x0 is None:
            x = tuple(jnp.zeros_like(v) for v in b)
            r = b
        else:
            # Warm start with the previous GN step's solution (see
            # gn_kernel.py): near convergence the linearization drifts
            # slowly, so one extra H@v buys a much smaller initial residual.
            x = x0
            hx = hvp(x0)
            r = tuple(b[a] - hx[a] for a in range(6))
        zv = _pg_pcr_apply(A_steps, G_steps, DinvF, r)
        p = zv
        rz = sum(jnp.sum(r[a] * zv[a]) for a in range(6))

        def cg_body(_, carry):
            x, r, p, rz = carry
            Ap_ = hvp(p)
            pAp = sum(jnp.sum(p[a] * Ap_[a]) for a in range(6))
            # Krylov-exhaustion guard: on an (at-optimum) near-zero RHS,
            # f32 roundoff can drive pAp <= 0; clamping alone turns the
            # sign flip into a ~1e30 step (measured NaN blowup in warm-
            # started online solves, RESULTS.md round 5). Freeze the
            # update instead — the exact semantics of a converged CG.
            alpha = jnp.where(pAp > tiny, rz / jnp.maximum(pAp, tiny), 0.0)
            x = tuple(x[a] + alpha * p[a] for a in range(6))
            r = tuple(r[a] - alpha * Ap_[a] for a in range(6))
            zv = _pg_pcr_apply(A_steps, G_steps, DinvF, r)
            rz_new = sum(jnp.sum(r[a] * zv[a]) for a in range(6))
            beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
            p = tuple(zv[a] + beta * p[a] for a in range(6))
            return x, r, p, rz_new

        x, _, _, _ = jax.lax.fori_loop(0, cg_n, cg_body, (x, r, p, rz))
        return x

    def retract(poses, x):
        Rm, t = _pose_of(poses)
        e = _se3_exp(x)
        Rn, tn = _se3_compose((Rm, t), e)
        Rn = _renorm(Rn)
        return tuple(Rn) + tuple(tn)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    poses0 = _comps(poses_ref, 12)

    def write_out(poses):
        for a in range(12):
            out_ref[8 * a : 8 * (a + 1)] = poses[a]

    if not lm:
        zero = jnp.asarray(0.0, dtype)
        if warm_start or cg_ramp:
            # CG budget phases + warm-started inner solves (see gn_kernel.py:
            # early iterations get the full Krylov budget; later warm-started
            # ones a reduced one).
            phases = cg_ramp if cg_ramp else ((n_gn, cg_iters),)
            x00 = tuple(jnp.zeros((8, L), dtype) for _ in range(6))
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
        # n_acc counts ACCEPTED steps and conv latches the _lm_loop
        # convergence test (see gn_kernel.py) — stats slots 2 and 3.
        def lm_iter(_, carry):
            poses, lam, err, n_acc, conv = carry
            x = solve_dx(poses, lam)
            cand = retract(poses, x)
            new_err = chi2_of(cand)
            accepted = new_err < err
            poses = tuple(
                jnp.where(accepted, cand[a], poses[a]) for a in range(12)
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


def _g6_add_grid(A, B):
    return tuple(_m3_add(qa, qb) for qa, qb in zip(A, B))


def _g6_rows36(G):
    """g6 -> 36 rows in 6x6 row-major order."""
    P, Q, R, S = G
    rows = []
    for a in range(3):
        rows += [P[3 * a + b] for b in range(3)]
        rows += [Q[3 * a + b] for b in range(3)]
    for a in range(3):
        rows += [R[3 * a + b] for b in range(3)]
        rows += [S[3 * a + b] for b in range(3)]
    return rows


def _rows_g6_off(ref, sl):
    """g6 from 36 info rows starting at row 12 of eld (rows 12..47)."""
    def row(a):
        return ref[12 + a : 13 + a, sl]

    def quad(r0, c0):
        return tuple(row(6 * (r0 + a) + c0 + b) for a in range(3) for b in range(3))

    return (quad(0, 0), quad(0, 3), quad(3, 0), quad(3, 3))


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _identity_rows12(Npad, dtype):
    rows = jnp.zeros((12, Npad), dtype)
    return rows.at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)


def _mask_to_identity(z, m):
    """(E, 12) poses -> masked entries become the identity pose."""
    ident = jnp.zeros((12,), z.dtype).at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)
    return jnp.where(m[:, None], z, ident)


def _pack_loop_edges6(edges, meas, sqrt_info, mask, c, dtype, tile: int):
    """Loop (non-chain) edge data: eidx (1, 2*Epad) and eld (48, Epad):
    rows 0-11 z (identity where masked), 12-47 masked 6x6 sqrt-info."""
    E_loop = int(edges.shape[0]) - c
    if E_loop <= 0:
        return (
            jnp.zeros((1, 2 * tile), jnp.int32),
            jnp.zeros((48, tile), dtype),
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

    m = mask[c:]
    W = sqrt_info[c:] * m[:, None, None].astype(dtype)
    z = _mask_to_identity(meas[c:], m)
    eld = jnp.zeros((48, Epad), dtype)
    # padding columns: identity poses keep the row math well-conditioned
    eld = eld.at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)
    eld = eld.at[0:12, :E_loop].set(z.T)
    eld = eld.at[12:48, :E_loop].set(W.reshape(E_loop, 36).T)
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
def _fused_solve6(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (tangent_dim == 6)
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
    N, P = poses0.shape
    if P != 12:
        raise ValueError("fused_gn6_solve expects (N, 12) SE(3) poses")
    dtype = poses0.dtype
    # Packed (8, L) node fields need L = Npad/8 to be a lane multiple.
    Npad = -(-N // 1024) * 1024
    Lp = Npad // 8
    K = max(1, math.ceil(math.log2(max(N, 2))))
    if pcr_levels is not None:
        # Truncated PCR (see gn_kernel.py): inexact chain preconditioner,
        # linearly cheaper factorization; CG absorbs the difference.
        K = min(K, max(1, pcr_levels))
    c = min(graph.chain_prefix, N - 1)
    tile = edge_tile

    def pack(x):
        """(R, Npad) node rows -> the packed (8R, L) layout (n = s*L + l)."""
        R = x.shape[0]
        return x.reshape(R, 8, Lp).reshape(8 * R, Lp)

    poses_pl = pack(_identity_rows12(Npad, dtype).at[:, :N].set(poses0.T))

    # chain edge data: nodes k in [0, c); identity pose where masked.
    cm = graph.edge_mask[:c]
    cz_rows = _mask_to_identity(graph.measurements[:c], cm)
    cz = pack(_identity_rows12(Npad, dtype).at[:, :c].set(cz_rows.T))
    cW = pack(jnp.zeros((36, Npad), dtype).at[:, :c].set(
        (graph.sqrt_info[:c] * cm[:, None, None].astype(dtype)).reshape(c, 36).T
    ))

    # priors scattered per node (identity measurement where masked)
    pz_n = jnp.broadcast_to(
        jnp.zeros((12,), dtype).at[0].set(1.0).at[4].set(1.0).at[8].set(1.0),
        (Npad, 12),
    )
    pz_n = pz_n.at[graph.prior_idx].set(
        _mask_to_identity(graph.prior_meas, graph.prior_mask)
    )
    pW_n = jnp.zeros((Npad, 6, 6), dtype).at[graph.prior_idx].set(
        graph.prior_sqrt_info * graph.prior_mask[:, None, None].astype(dtype)
    )
    pz = pack(pz_n.T)
    pW = pack(pW_n.reshape(Npad, 36).T)

    eidx, eld, n_tiles = _pack_loop_edges6(
        graph.edges, graph.measurements, graph.sqrt_info, graph.edge_mask,
        c, dtype, tile,
    )
    Epad = eld.shape[1]

    # page-windowed bucketing metadata (ops/bucketize.py, see gn_kernel.py)
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
            _gn6_kernel, N=N, Npad=Npad, K=K, n_gn=iterations,
            cg_iters=cg_iters, n_tiles=n_tiles, eps=3e-4,
            huber_delta=huber_delta, tile=tile, hvp_splits=hvp_splits,
            win=win, warm_start=warm_start, cg_ramp=cg_ramp,
            lm=lm, lam0=lam0, lam_factor=lam_factor, lam_min=lam_min,
            lam_max=lam_max, abs_tol=abs_tol, rel_tol=rel_tol,
        ),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
        + [vspec] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((96, Lp), dtype),
            jax.ShapeDtypeStruct((8, 128), dtype),
        ),
        scratch_shapes=[pltpu.VMEM((36, Epad), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nt, poses_pl, cz, cW, pz, pW, eidx, eld, q0)
    return out.reshape(12, Npad)[:, :N].T, stats


def fused_gn6_solve(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (tangent_dim == 6)
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
    """Run `iterations` full SE(3) Gauss-Newton iterations in one Pallas
    kernel. Drop-in for solver/lm.py::_gn_loop(mode="pcg_fused") at T=6 —
    same math (analytic SE(3) linearization with the Barfoot-Q Jacobian
    inverse, 6x6 PCR-preconditioned CG, right retraction + rotation
    renormalize), zero per-iteration launches. Requires graph.chain_prefix
    > 0 (SLAM graphs). warm_start seeds each CG solve with the previous GN
    step's solution (the refinement-regime speedup, matching the reference's
    own warm start at graph.cpp:130); cg_ramp phases the CG budget as
    ((n_iters, cg_k), ...)."""
    out, _ = _fused_solve6(
        poses0, graph, iterations=iterations, cg_iters=cg_iters,
        huber_delta=huber_delta, interpret=interpret, lm=False,
        pcr_levels=pcr_levels, edge_tile=edge_tile, hvp_splits=hvp_splits,
        warm_start=warm_start, cg_ramp=cg_ramp,
    )
    return out


def fused_lm6_solve(
    poses0: jnp.ndarray,
    graph,  # FactorGraph (tangent_dim == 6)
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
    """Full SE(3) Levenberg-Marquardt — damped solve, candidate chi2,
    accept/reject, lambda schedule — entirely inside ONE Pallas kernel.
    Returns (poses (N, 12), final_chi2 (), final_lambda (),
    accepted_steps (), converged ()) — see fused_lm_solve (gn_kernel.py)
    for the accepted/converged semantics. Matches
    solver/lm.py::_lm_loop(mode="pcg_fused") step-for-step except the
    convergence early-exit (converged iterations keep polishing)."""
    out, stats = _fused_solve6(
        poses0, graph, iterations=iterations, cg_iters=cg_iters,
        huber_delta=huber_delta, interpret=interpret, lm=True,
        lam0=lam0, lam_factor=lam_factor, lam_min=lam_min, lam_max=lam_max,
        pcr_levels=pcr_levels, edge_tile=edge_tile, hvp_splits=hvp_splits,
        abs_tol=abs_tol, rel_tol=rel_tol,
    )
    return out, stats[0, 0], stats[0, 1], stats[0, 2], stats[0, 3]
