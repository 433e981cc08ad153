"""Distributed Gauss-Newton / LM at fused-kernel speed.

Round-3's factor-sharded path (parallel/dist.py) is functionally correct
but forfeits the fused mega-kernel machinery: its XLA scatter-based
assembly and per-edge gather/scatter CG matvec run ~100x slower per chip
than ops/gn_kernel.py (76 vs 8194 it/s on m3500 — RESULTS.md), making
scale-out pointless below ~100 chips. This module is the same GN/LM
*mathematics* as the mega-kernel — packed (8, L) node layout, lane-parallel
chain linearization, two-level one-hot MXU gather/scatter for loop edges,
PCR-factored chain preconditioner, fixed-iteration PCG — decomposed into
per-device SPMD stages under `shard_map`:

  * Loop-edge tiles are SHARDED over the mesh: each device linearizes,
    scatters, and mat-vecs only its own tiles (the dominant cost on
    loop-dense graphs — city10000's CG tile sweeps are ~69% of an
    iteration).
  * The odometry chain is SHARDED BY LANE SLAB: device d linearizes lanes
    [d*L/D, (d+1)*L/D) of the packed layout (8 strided node runs); slab
    results are embedded full-width and combined in the same all-reduce as
    the tile scatters.
  * Normal equations combine with ONE psum per GN iteration (all 21 packed
    D/U/g rows concatenated into a single collective), and the CG loop
    costs ONE psum per iteration (the partial loop-edge H@p in its tall
    (3Q, 128) layout) — the separator all-reduce of SURVEY.md §2.4 riding
    ICI/DCN.
  * CG vectors, the PCR preconditioner, priors, damping, and retraction are
    replicated (tiny: O(N) rows), computed redundantly and bit-identically
    on every device — zero extra communication.

Everything is plain jnp on packed arrays — the gather/scatter matmuls
compile straight onto the MXU — so the SAME code runs multi-chip on TPU and
on the virtual CPU mesh (tests, scaling measurements, the driver's
dry-run): no interpret-mode emulation, no second code path. The layout
helpers are imported from ops/gn_kernel.py; only the roll-based ones are
re-derived here on jnp.roll (the kernel originals must use pltpu.roll,
which exists only inside Pallas).

Replaces gtsam::LevenbergMarquardtOptimizer at pod scale
(/root/reference/src/graph/src/graph.cpp:119; SURVEY.md §2.4, BASELINE
config 5).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors.graph import FactorGraph
from graphslam_tpu.parallel.cg_step import cg_step, gn_setup, stage_a
from graphslam_tpu.ops.gn_kernel import (
    _c3,
    _c9,
    _gather2,
    _hi_lo,
    _linearize_rows,
    _m3_T,
    _m3_Tvec,
    _m3_mul,
    _m3_vec,
    _outer_blocks,
    _p_binv,
    _p_bmm,
    _p_bmv,
    _p_neg,
    _p_planes,
    _p_ridge,
    _p_sub,
    _p_tall,
    _p_untall,
    _pack_loop_edges,
    _residual_rows,
    _scatter2,
    _se2_between,
    _se2_compose,
    _se2_exp,
    _se2_jr_inv,
    _se2_log,
    _tile_qr,
    _tile_qr_win,
)


# ---------------------------------------------------------------------------
# jnp.roll twins of the kernel's packed-roll helpers (gn_kernel._proll etc.
# call pltpu.roll, which only lowers inside a Pallas kernel; XLA's jnp.roll
# has identical np.roll semantics).
# ---------------------------------------------------------------------------


def _proll(v, s: int):
    """Packed node roll on an (8, L) field: y[n] = x[(n - s) mod Npad]."""
    S, L = v.shape
    s = s % (S * L)
    if s == 0:
        return v
    a, b = divmod(s, L)
    z = jnp.roll(v, b, 1)
    za = jnp.roll(z, a, 0)
    if b == 0:
        return za
    zb = jnp.roll(z, a + 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane < b, zb, za)


def _proll3(v3, s: int):
    return tuple(_proll(v, s) for v in v3)


def _win_parts(p_parts, A: int, Q: int, W: int, q0i, q0j):
    """XLA twin of gn_kernel._win_parts (jnp.roll takes traced shifts)."""
    outs = []
    for part in p_parts:
        rows = []
        for a in range(A):
            blk = part[a * Q : (a + 1) * Q]
            rows.append(jnp.roll(blk, -q0i, 0)[:W])
            rows.append(jnp.roll(blk, -q0j, 0)[:W])
        outs.append(jnp.concatenate(rows, axis=0))
    return outs


def _acc_win_add(acc, contrib, R: int, Q: int, W: int, q0i, q0j):
    """XLA twin of gn_kernel._acc_win_add."""
    outs = []
    zeros = jnp.zeros((Q - W, 128), acc.dtype)
    for rc in range(R):
        blk = acc[rc * Q : (rc + 1) * Q]
        ci = contrib[rc * 2 * W : rc * 2 * W + W]
        cj = contrib[rc * 2 * W + W : rc * 2 * W + 2 * W]
        zi = jnp.concatenate([ci, zeros], axis=0)
        zj = jnp.concatenate([cj, zeros], axis=0)
        outs.append(blk + jnp.roll(zi, q0i, 0) + jnp.roll(zj, q0j, 0))
    return jnp.concatenate(outs, axis=0)


def _p_lane_roll(A, h: int):
    return tuple(tuple(_proll(x, h) for x in r) for r in A)


def _p_pcr_factor(Dt, Ut, Lt, K: int, eps: float):
    """gn_kernel._p_pcr_factor on jnp.roll (same math, XLA-traceable)."""
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _p_ridge(Dt, eps)
        Dinv = _p_binv(Dt)
        alpha = _p_bmm(Lt, _p_lane_roll(Dinv, h))
        gamma = _p_bmm(Ut, _p_lane_roll(Dinv, -h))
        A_steps.append(alpha)
        G_steps.append(gamma)
        Dt = _p_sub(
            _p_sub(Dt, _p_bmm(alpha, _p_lane_roll(Ut, h))),
            _p_bmm(gamma, _p_lane_roll(Lt, -h)),
        )
        Lt = _p_neg(_p_bmm(alpha, _p_lane_roll(Lt, h)))
        Ut = _p_neg(_p_bmm(gamma, _p_lane_roll(Ut, -h)))
    DinvF = _p_binv(_p_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _p_pcr_apply(A_steps, G_steps, DinvF, b):
    for k in range(len(A_steps)):
        h = 1 << k
        bm = _proll3(b, h)
        bp = _proll3(b, -h)
        b = tuple(
            b[a]
            - sum(A_steps[k][d][a] * bm[(a + d) % 3] for d in range(3))
            - sum(G_steps[k][d][a] * bp[(a + d) % 3] for d in range(3))
            for a in range(3)
        )
    return _p_bmv(DinvF, b)


# ---------------------------------------------------------------------------
# Lane-slab ("v2") machinery: the PCR factorization/application and the
# chain H@v — the CG loop's replicated costs — computed per device on its
# lane slab plus a halo of H = 2^K lanes. Inside a slab+halo window the
# packed node roll is a PLAIN lane roll, because the window is sliced from
# the node-circular lane extension below (which carries the true
# cross-sublane neighbor values at lane boundaries); values within the halo
# depth of the window edge are garbage and are discarded with the halo.
# Requires truncated PCR with 2^(K+1) <= L/D — the distributed default
# (pcr_levels=4) satisfies it for every BASELINE graph at 8 devices.
# ---------------------------------------------------------------------------


def _ext(x, H: int):
    """(8, L) -> (8, L+2H) node-circular lane extension: lane -1 of
    sublane s is node s*L-1 = (sublane s-1, lane L-1), and symmetrically on
    the right — exactly _proll's wrap semantics."""
    return jnp.concatenate(
        [jnp.roll(x, 1, 0)[:, -H:], x, jnp.roll(x, -1, 0)[:, :H]], axis=1
    )


def _wslice(x, H: int, start, Wn: int):
    """Slab+halo window [start-H, start+Lc+H) in true lane coords (start is
    the slab's first lane; the extension shifts it by +H)."""
    return jax.lax.dynamic_slice(_ext(x, H), (0, start), (8, Wn))


def _wroll3(v3, s: int):
    return tuple(jnp.roll(v, s, axis=1) for v in v3)


def _pw_lane_roll(A, h: int):
    return tuple(tuple(jnp.roll(x, h, axis=1) for x in r) for r in A)


def _pw_pcr_factor(Dt, Ut, Lt, K: int, eps: float):
    """_p_pcr_factor on window arrays (plain lane rolls)."""
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _p_ridge(Dt, eps)
        Dinv = _p_binv(Dt)
        alpha = _p_bmm(Lt, _pw_lane_roll(Dinv, h))
        gamma = _p_bmm(Ut, _pw_lane_roll(Dinv, -h))
        A_steps.append(alpha)
        G_steps.append(gamma)
        Dt = _p_sub(
            _p_sub(Dt, _p_bmm(alpha, _pw_lane_roll(Ut, h))),
            _p_bmm(gamma, _pw_lane_roll(Lt, -h)),
        )
        Lt = _p_neg(_p_bmm(alpha, _pw_lane_roll(Lt, h)))
        Ut = _p_neg(_p_bmm(gamma, _pw_lane_roll(Ut, -h)))
    DinvF = _p_binv(_p_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _pw_pcr_apply(A_steps, G_steps, DinvF, b):
    for k in range(len(A_steps)):
        h = 1 << k
        bm = _wroll3(b, h)
        bp = _wroll3(b, -h)
        b = tuple(
            b[a]
            - sum(A_steps[k][d][a] * bm[(a + d) % 3] for d in range(3))
            - sum(G_steps[k][d][a] * bp[(a + d) % 3] for d in range(3))
            for a in range(3)
        )
    return _p_bmv(DinvF, b)


# ---------------------------------------------------------------------------
# The per-device SPMD body
# ---------------------------------------------------------------------------


def _embed(slab, start, L):
    """Place an (R, Lc) lane slab into full-width (R, L) zeros."""
    return jax.lax.dynamic_update_slice(
        jnp.zeros((slab.shape[0], L), slab.dtype), slab, (0, start)
    )


def _make_body(
    *, N, Npad, K, D, iterations, cg_iters, tile, tiles_per_dev,
    huber_delta, hvp_splits, eps, lm, lam0, lam_factor, lam_min, lam_max,
    axis, win, slab_pcr, cg_kernel, interpret,
):
    L = Npad // 8
    Q = Npad // 128
    Lc = L // D
    # slab-PCR halo: a window value is exact when every factor and rhs it
    # depends on (reach 2^K - 1 each) lies inside the window
    Hh = 2 << K
    Wn = Lc + 2 * Hh

    def body(nt, poses_pl, cz, cR, pz, pR, eidx_l, eld_l, q0_l):
        dtype = poses_pl.dtype
        d = jax.lax.axis_index(axis)
        start = d * Lc
        nt_local = jnp.clip(nt[0, 0] - d * tiles_per_dev, 0, tiles_per_dev)

        def tile_sel(t, idx):
            if win:
                q0i = q0_l[0, t]
                q0j = q0_l[1, t]
                ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
                return ohr, qsel, q0i, q0j, 2 * win
            ohr, qsel = _tile_qr(idx, Q, dtype)
            return ohr, qsel, None, None, Q

        def tile_gather(p_parts, ohr, qsel, A, q0i, q0j, rows):
            parts = (
                _win_parts(p_parts, A, Q, win, q0i, q0j) if win else p_parts
            )
            return _gather2(parts, ohr, qsel, A, rows, dtype)

        def tile_acc(acc, contrib, R, q0i, q0j):
            if win:
                return _acc_win_add(acc, contrib, R, Q, win, q0i, q0j)
            return acc + contrib

        nidx = (
            jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
            + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        )
        padrow = (nidx >= N).astype(dtype)

        def slab(x):
            return jax.lax.dynamic_slice(x, (0, start), (x.shape[0], Lc))

        cz_s = _c3(slab(cz))
        cR_s = _c9(slab(cR))
        pz_c = _c3(pz)
        pR_c = _c9(pR)

        def chi2_of(poses):
            """Robustified cost; chain+priors replicated, tiles psum'd."""
            xi_s = tuple(slab(v) for v in poses)
            xj_s = tuple(slab(v) for v in _proll3(poses, -1))
            rw = _residual_rows(xi_s, xj_s, cz_s, cR_s)
            e_local = sum(jnp.sum(v * v) for v in rw)

            if tiles_per_dev:
                p_parts = _hi_lo(_p_tall(poses), 3)

                def tbody(t, acc):
                    idx = jax.lax.dynamic_slice(
                        eidx_l, (0, t * 2 * tile), (1, 2 * tile)
                    )
                    ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                    pg = tile_gather(p_parts, ohr, qsel, 3, q0i, q0j, rows)
                    xi_t = tuple(pg[a : a + 1, :tile] for a in range(3))
                    xj_t = tuple(pg[a : a + 1, tile:] for a in range(3))
                    eld = jax.lax.dynamic_slice(
                        eld_l, (0, t * tile), (16, tile)
                    )
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

                e_local = e_local + jax.lax.fori_loop(
                    0, nt_local, tbody, jnp.asarray(0.0, dtype)
                )
            e = jax.lax.psum(e_local, axis)

            # priors: replicated, added once (identical on every device)
            dp = _se2_between(*pz_c, *poses)
            rp = _se2_log(*dp)
            rpw = _m3_vec(pR_c, rp)
            return e + sum(jnp.sum(v * v) for v in rpw)

        def _solve_dx_kernels(poses, lam):
            """The fully-kernelized GN inner solve (parallel/cg_step.py):
            three Mosaic kernels + two psum shapes per GN iteration —
              * stage_a: chain + this device's loop tiles linearized and
                assembled in-kernel (chain weighted by w_chain = [d == 0]
                so the psum counts it once, bit-identical at any mesh
                size); ONE psum of the whole normal-equation payload;
              * gn_setup: priors, damping, plane sets, K-level PCR factor,
                packed layout out (~90 µs/GN-iter as XLA soup on m3500);
              * cg_step, once per CG iteration + one prologue pass: one
                Pallas launch + ONE psum each (the round-5 profile pinned
                the 1-device gap on the XLA CG loop's 17.7 µs/iter
                dispatch floor; the kernel's marginal cost measured
                3.8-4.0 µs)."""
            nt_sm = jnp.reshape(nt_local, (1, 1))
            w_chain = jnp.reshape((d == 0).astype(dtype), (1, 1))
            big_part, Aij_k = stage_a(
                jnp.concatenate(poses, axis=0), cz, cR, eidx_l, eld_l,
                nt_sm, w_chain, q0_l,
                Q=Q, L=L, tile=tile, tiles_per_dev=tiles_per_dev,
                huber_delta=huber_delta, win=win, interpret=interpret,
            )
            big = jax.lax.psum(big_part, axis)

            dpl_a, upl_a, lpl_a, afac, gfac, dinv, b24 = gn_setup(
                jnp.reshape(jnp.asarray(lam, dtype), (1, 1)),
                big, jnp.concatenate(poses, axis=0), pz, pR,
                N=N, K=K, Q=Q, L=L, eps=eps, interpret=interpret,
            )

            # No XLA prologue: with rz = 0 and an all-zero psum payload
            # the kernel's Krylov guards give alpha = beta = 0 exactly,
            # so the FIRST loop pass degenerates into the CG prologue
            # (x, r unchanged; z = M^-1 b; p = z; first H@p partial).
            # The loop therefore runs cg_iters + 1 times: one prologue
            # pass + cg_iters true update passes, all fused.
            zeros24 = jnp.zeros((24, L), dtype)
            carry = (
                zeros24,
                b24,
                zeros24,
                zeros24,
                jnp.zeros((8, 128), dtype),
                jnp.zeros((3 * Q + 8, 128), dtype),
            )

            def cg_body_k(_, c):
                xx, rr, pp, cc, ss, bb = c
                xx, rr, pp, cc, ss, part = cg_step(
                    xx, rr, pp, cc, ss, bb,
                    dpl_a, upl_a, lpl_a, afac, gfac, dinv,
                    eidx_l, Aij_k, nt_sm, q0_l,
                    K=K, Q=Q, L=L, tile=tile,
                    tiles_per_dev=tiles_per_dev,
                    hvp_splits=hvp_splits, win=win, interpret=interpret,
                )
                return xx, rr, pp, cc, ss, jax.lax.psum(part, axis)

            carry = jax.lax.fori_loop(0, cg_iters + 1, cg_body_k, carry)
            return _c3(carry[0])

        def solve_dx(poses, lam):
            if cg_kernel:
                return _solve_dx_kernels(poses, lam)
            # --- stage A: per-device linearize + assemble (partial) --------
            xi_s = tuple(slab(v) for v in poses)
            xj_s = tuple(slab(v) for v in _proll3(poses, -1))
            rw, Jiw, Jjw = _linearize_rows(xi_s, xj_s, cz_s, cR_s, -1.0)
            Aii, Aij, Ajj, gi, gj = _outer_blocks(Jiw, Jjw, rw)

            # node n: D[n] = Aii[n] + Ajj[n-1]; slab results embed full-width
            # and the packed roll handles slab/sublane boundaries exactly.
            Dp = [
                _embed(Aii[e], start, L)
                + _proll(_embed(Ajj[e], start, L), 1)
                for e in range(9)
            ]
            gp = [
                _embed(gi[a], start, L) + _proll(_embed(gj[a], start, L), 1)
                for a in range(3)
            ]
            Up = [_embed(Aij[e], start, L) for e in range(9)]

            if tiles_per_dev:
                p_parts = _hi_lo(_p_tall(poses), 3)

                def tbody(t, carry):
                    Dg, Aij_store = carry
                    idx = jax.lax.dynamic_slice(
                        eidx_l, (0, t * 2 * tile), (1, 2 * tile)
                    )
                    ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                    pg = tile_gather(p_parts, ohr, qsel, 3, q0i, q0j, rows)
                    xi_t = tuple(pg[a : a + 1, :tile] for a in range(3))
                    xj_t = tuple(pg[a : a + 1, tile:] for a in range(3))
                    eld = jax.lax.dynamic_slice(
                        eld_l, (0, t * tile), (16, tile)
                    )
                    z_t = tuple(eld[a : a + 1] for a in range(3))
                    R_t = tuple(eld[3 + a : 4 + a] for a in range(9))
                    rw_t, Jiw_t, Jjw_t = _linearize_rows(
                        xi_t, xj_t, z_t, R_t, huber_delta
                    )
                    Aii_t, Aij_t, Ajj_t, gi_t, gj_t = _outer_blocks(
                        Jiw_t, Jjw_t, rw_t
                    )
                    Aij_store = jax.lax.dynamic_update_slice(
                        Aij_store,
                        jnp.concatenate(Aij_t, axis=0),
                        (0, t * tile),
                    )
                    C = jnp.concatenate(
                        [jnp.concatenate([Aii_t[e], Ajj_t[e]], axis=1)
                         for e in range(9)]
                        + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1)
                           for a in range(3)],
                        axis=0,
                    )
                    return (
                        tile_acc(Dg, _scatter2(C, ohr, qsel, dtype), 12,
                                 q0i, q0j),
                        Aij_store,
                    )

                Dg0 = jnp.zeros((12 * Q, 128), dtype)
                A0 = jnp.zeros((9, tiles_per_dev * tile), dtype)
                Dg, Aij_store = jax.lax.fori_loop(
                    0, nt_local, tbody, (Dg0, A0)
                )
            else:
                Dg = jnp.zeros((12 * Q, 128), dtype)
                Aij_store = jnp.zeros((9, tile), dtype)

            # --- stage B: ONE all-reduce for the whole normal equations ----
            big = jnp.concatenate(
                Dp + Up + gp + [Dg.reshape(12 * Q * 128 // L, L)], axis=0
            )
            big = jax.lax.psum(big, axis)
            Dq = [big[8 * e : 8 * (e + 1)] for e in range(9)]
            Uq = [big[72 + 8 * e : 72 + 8 * (e + 1)] for e in range(9)]
            gq = [big[144 + 8 * a : 144 + 8 * (a + 1)] for a in range(3)]
            Dgf = _p_untall(
                big[168:].reshape(12 * Q, 128), 12, L
            )
            Dq = [Dq[e] + Dgf[e] for e in range(9)]
            gq = [gq[a] + Dgf[9 + a] for a in range(3)]

            # --- stage C (replicated): priors, damping, PCR factor ---------
            xi = poses
            dp = _se2_between(*pz_c, *xi)
            rp = _se2_log(*dp)
            Jp = _se2_jr_inv(*rp)
            rpw = _m3_vec(pR_c, rp)
            Jpw = _m3_mul(pR_c, Jp)
            Ap = _m3_mul(_m3_T(Jpw), Jpw)
            gpr = _m3_Tvec(Jpw, rpw)
            Dq = [Dq[e] + Ap[e] for e in range(9)]
            gq = [gq[a] + gpr[a] for a in range(3)]
            Dq = [
                Dq[e] + (padrow if e in (0, 4, 8) else 0.0) for e in range(9)
            ]
            Dq = [
                Dq[e] * (1.0 + lam) if e in (0, 4, 8) else Dq[e]
                for e in range(9)
            ]

            Dpl = _p_planes(Dq)
            Upl = _p_planes(Uq)
            Lpl = _p_lane_roll(_p_planes(_m3_T(Uq)), 1)

            if slab_pcr:
                # v2: factor + apply + chain H@v on THIS device's lane slab
                # (+ halo) only — the CG loop's formerly-replicated costs.
                def wsl_p(P_):
                    return tuple(
                        tuple(_wslice(x, Hh, start, Wn) for x in r)
                        for r in P_
                    )

                Dw, Uw, Lw = wsl_p(Dpl), wsl_p(Upl), wsl_p(Lpl)
                A_steps, G_steps, DinvF = _pw_pcr_factor(Dw, Uw, Lw, K, eps)

                def apply_z(r_full):
                    rw = tuple(_wslice(x, Hh, start, Wn) for x in r_full)
                    zw = _pw_pcr_apply(A_steps, G_steps, DinvF, rw)
                    z_part = jnp.concatenate([
                        _embed(x[:, Hh : Hh + Lc], start, L) for x in zw
                    ], axis=0)
                    z = jax.lax.psum(z_part, axis)
                    return tuple(z[8 * a : 8 * (a + 1)] for a in range(3))

                def chain_hvp_tall(v_full):
                    vw = tuple(_wslice(x, Hh, start, Wn) for x in v_full)
                    h1 = _p_bmv(Dw, vw)
                    h2 = _p_bmv(Uw, _wroll3(vw, -1))
                    h3 = _p_bmv(Lw, _wroll3(vw, 1))
                    out = tuple(
                        _embed((h1[a] + h2[a] + h3[a])[:, Hh : Hh + Lc],
                               start, L)
                        for a in range(3)
                    )
                    return _p_tall(out)
            else:
                A_steps, G_steps, DinvF = _p_pcr_factor(
                    Dpl, Upl, Lpl, K, eps
                )

                def apply_z(r_full):
                    return _p_pcr_apply(A_steps, G_steps, DinvF, r_full)

                chain_hvp_tall = None

            b = tuple(-gq[a] for a in range(3))

            def hvp(v):
                # chain part: slab-sharded (v2, riding the tile psum) or
                # replicated (cheap plane FMAs on full width)...
                if slab_pcr:
                    base = chain_hvp_tall(v)
                    out = None
                else:
                    h1 = _p_bmv(Dpl, v)
                    h2 = _p_bmv(Upl, _proll3(v, -1))
                    h3 = _p_bmv(Lpl, _proll3(v, 1))
                    out = tuple(h1[a] + h2[a] + h3[a] for a in range(3))
                    base = jnp.zeros((3 * Q, 128), dtype)
                # ...loop part sharded: ONE psum per CG iteration.
                if tiles_per_dev:
                    v_parts = _hi_lo(_p_tall(v), hvp_splits)

                    def tb(t, acc):
                        idx = jax.lax.dynamic_slice(
                            eidx_l, (0, t * 2 * tile), (1, 2 * tile)
                        )
                        ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                        vg = tile_gather(v_parts, ohr, qsel, 3, q0i, q0j, rows)
                        vi = tuple(vg[a : a + 1, :tile] for a in range(3))
                        vj = tuple(vg[a : a + 1, tile:] for a in range(3))
                        A = tuple(
                            jax.lax.dynamic_slice(
                                Aij_store, (a, t * tile), (1, tile)
                            )
                            for a in range(9)
                        )
                        yi = _m3_vec(A, vj)
                        yj = _m3_Tvec(A, vi)
                        ys = jnp.concatenate(
                            [jnp.concatenate([yi[a], yj[a]], axis=1)
                             for a in range(3)],
                            axis=0,
                        )
                        return tile_acc(
                            acc,
                            _scatter2(ys, ohr, qsel, dtype,
                                      n_splits=hvp_splits),
                            3, q0i, q0j,
                        )

                    acc = jax.lax.fori_loop(0, nt_local, tb, base)
                    tg = _p_untall(jax.lax.psum(acc, axis), 3, L)
                    out = tg if out is None else tuple(
                        out[a] + tg[a] for a in range(3)
                    )
                elif out is None:
                    out = _p_untall(jax.lax.psum(base, axis), 3, L)
                return out

            # --- PCG, fixed iteration count (replicated vectors) -----------
            tiny = jnp.asarray(1e-30, dtype)
            r = b
            z = apply_z(r)
            p = z
            rz = sum(jnp.sum(r[a] * z[a]) for a in range(3))
            x = tuple(jnp.zeros_like(v) for v in b)

            def cg_body(_, carry):
                x, r, p, rz = carry
                Hp = hvp(p)
                pHp = sum(jnp.sum(p[a] * Hp[a]) for a in range(3))
                # Krylov-exhaustion guard: on an (at-optimum) near-zero RHS,
                # f32 roundoff can drive pHp <= 0; clamping alone turns the
                # sign flip into a ~1e30 step (measured NaN blowup in warm-
                # started online solves, RESULTS.md round 5). Freeze the
                # update instead — the exact semantics of a converged CG.
                alpha = jnp.where(pHp > tiny, rz / jnp.maximum(pHp, tiny), 0.0)
                x = tuple(x[a] + alpha * p[a] for a in range(3))
                r = tuple(r[a] - alpha * Hp[a] for a in range(3))
                z = apply_z(r)
                rz_new = sum(jnp.sum(r[a] * z[a]) for a in range(3))
                beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
                p = tuple(z[a] + beta * p[a] for a in range(3))
                return x, r, p, rz_new

            x, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_body, (x, r, p, rz)
            )
            return x

        def retract(poses, x):
            e = _se2_exp(*x)
            return _se2_compose(*poses, *e)

        poses0 = _c3(poses_pl)
        if not lm:
            zero = jnp.asarray(0.0, dtype)

            def gn_iter(_, poses):
                return retract(poses, solve_dx(poses, zero))

            out = jax.lax.fori_loop(0, iterations, gn_iter, poses0)
            stats = jnp.zeros((4,), dtype)
        else:
            def lm_iter(_, carry):
                poses, lam, err, n_acc = carry
                x = solve_dx(poses, lam)
                cand = retract(poses, x)
                new_err = chi2_of(cand)
                accepted = new_err < err
                poses = tuple(
                    jnp.where(accepted, cand[a], poses[a]) for a in range(3)
                )
                lam = jnp.where(
                    accepted,
                    jnp.maximum(lam / lam_factor, lam_min),
                    jnp.minimum(lam * lam_factor, lam_max),
                )
                err = jnp.where(accepted, new_err, err)
                n_acc = n_acc + jnp.where(accepted, 1.0, 0.0).astype(dtype)
                return poses, lam, err, n_acc

            err0 = chi2_of(poses0)
            out, lam, err, n_acc = jax.lax.fori_loop(
                0, iterations, lm_iter,
                (poses0, jnp.asarray(lam0, dtype), err0,
                 jnp.asarray(0.0, dtype)),
            )
            stats = jnp.stack(
                [err, lam, n_acc, jnp.asarray(0.0, dtype)]
            )
        return jnp.concatenate(out, axis=0), stats

    return body


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "iterations", "cg_iters", "huber_delta",
        "pcr_levels", "edge_tile", "hvp_splits", "lm",
        "lam0", "lam_factor", "lam_min", "lam_max", "cg_kernel",
    ),
)
def _dist_fused(
    poses0, graph: FactorGraph, mesh, axis, iterations, cg_iters,
    huber_delta, pcr_levels, edge_tile, hvp_splits, lm,
    lam0, lam_factor, lam_min, lam_max, cg_kernel,
):
    N, T = poses0.shape
    if T != 3:
        raise ValueError("dist_fused supports T=3 (SE2) only")
    dtype = poses0.dtype
    D = mesh.shape[axis]
    Npad = -(-N // 1024) * 1024
    L = Npad // 8
    if L % D:
        raise ValueError(f"mesh size {D} must divide L={L}")
    K = max(1, math.ceil(math.log2(max(N, 2))))
    if pcr_levels is not None:
        K = min(K, max(1, pcr_levels))
    c = min(graph.chain_prefix, N - 1)
    tile = edge_tile

    def pack(x):
        R = x.shape[0]
        return x.reshape(R, 8, L).reshape(8 * R, L)

    poses_pl = pack(jnp.zeros((3, Npad), dtype).at[:, :N].set(poses0.T))
    cm = graph.edge_mask[:c].astype(dtype)
    cz = pack(jnp.zeros((3, Npad), dtype).at[:, :c].set(
        (graph.measurements[:c] * cm[:, None]).T
    ))
    cR = pack(jnp.zeros((9, Npad), dtype).at[:, :c].set(
        (graph.sqrt_info[:c] * cm[:, None, None]).reshape(c, 9).T
    ))
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
    # pad the tile count to a mesh multiple so shard_map splits whole tiles
    n_pad = -(-max(n_tiles, 1) // D) * D
    eidx = jnp.pad(eidx, ((0, 0), (0, (n_pad - n_tiles) * 2 * tile)))
    eld = jnp.pad(eld, ((0, 0), (0, (n_pad - n_tiles) * tile)))
    tiles_per_dev = n_pad // D

    # page-windowed bucketing metadata (ops/bucketize.py), sharded with the
    # tiles; dummy tiles get window 0 (their masked edges index node 0)
    win = graph.page_window
    if win and n_tiles:
        q0 = graph.tile_page0
        if q0.shape[1] != n_tiles:
            raise ValueError(
                f"bucketized graph has {q0.shape[1]} tiles but edge_tile="
                f"{tile} packs {n_tiles}"
            )
        q0 = jnp.pad(q0, ((0, 0), (0, n_pad - n_tiles)))
    else:
        q0 = jnp.zeros((2, n_pad), jnp.int32)

    E_loop = int(graph.edges.shape[0]) - c
    if E_loop > 0 and n_tiles > 0:
        idx_e = jnp.arange(E_loop, dtype=jnp.int32)
        live = jnp.max(jnp.where(graph.edge_mask[c:], idx_e + 1, 0))
        nt = ((live + tile - 1) // tile).astype(jnp.int32).reshape(1, 1)
        tiles_eff = tiles_per_dev
    else:
        nt = jnp.zeros((1, 1), jnp.int32)
        tiles_eff = 0

    # cg_kernel: None = auto (fused CG-step Pallas kernel on real TPU, XLA
    # CG loop elsewhere — the CPU mesh keeps the cheap-to-compile path; the
    # kernel still runs on CPU via interpret=True when explicitly asked).
    if cg_kernel is None:
        cg_kernel = jax.default_backend() in ("tpu", "axon")
    interpret = jax.default_backend() not in ("tpu", "axon")

    # slab-PCR (v2): shard the preconditioner factor/apply + chain H@v by
    # lane slab when the halo fits — needs truncated PCR (small 2^K);
    # exact-K falls back to replicated preconditioner work. Moot on the
    # cg_kernel path, whose in-kernel full-width apply replaces it.
    slab = (
        not cg_kernel
        and (L // D + 2 * (2 << K)) <= L and (2 << K) < L
    )
    body = _make_body(
        N=N, Npad=Npad, K=K, D=D, iterations=iterations, cg_iters=cg_iters,
        tile=tile, tiles_per_dev=tiles_eff, huber_delta=huber_delta,
        hvp_splits=hvp_splits, eps=3e-4, lm=lm, lam0=lam0,
        lam_factor=lam_factor, lam_min=lam_min, lam_max=lam_max, axis=axis,
        win=win, slab_pcr=slab, cg_kernel=cg_kernel, interpret=interpret,
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(),  # nt, poses, cz, cR, pz, pR
            P(None, axis),                 # eidx tiles
            P(None, axis),                 # eld tiles
            P(None, axis),                 # tile window starts
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    out, stats = fn(nt, poses_pl, cz, cR, pz, pR, eidx, eld, q0)
    return out.reshape(3, Npad)[:, :N].T, stats


def dist_fused_gn_solve(
    poses0: jnp.ndarray,
    graph: FactorGraph,
    mesh: Mesh,
    cfg: SolverConfig = SolverConfig(),
    iterations: int = 10,
    axis: str = "dev",
    cg_kernel: bool | None = None,
):
    """`iterations` full GN iterations of the fused-kernel math, SPMD over
    `mesh`: sharded loop tiles, one psum per CG iteration. cg_kernel runs
    each CG iteration as ONE fused Pallas launch (parallel/cg_step.py);
    None = auto (on for real TPU). Matches fused_gn_solve's trajectory
    (same linearization, PCR preconditioner, fixed-count CG, retraction)."""
    out, _ = _dist_fused(
        poses0, graph, mesh, axis, iterations, cfg.cg_max_iterations,
        -1.0, cfg.pcr_levels, cfg.edge_tile, cfg.hvp_splits, False,
        cfg.init_lambda, cfg.lambda_factor, cfg.min_lambda, cfg.max_lambda,
        cg_kernel,
    )
    return out


def dist_fused_lm_solve(
    poses0: jnp.ndarray,
    graph: FactorGraph,
    mesh: Mesh,
    cfg: SolverConfig = SolverConfig(),
    iterations: int = 30,
    axis: str = "dev",
    cg_kernel: bool | None = None,
):
    """Distributed LM (damped solve, psum'd candidate chi2, accept/reject +
    lambda schedule replicated). Returns (poses, (chi2, lambda,
    accepted_steps))."""
    out, stats = _dist_fused(
        poses0, graph, mesh, axis, iterations, cfg.cg_max_iterations,
        cfg.huber_delta if cfg.use_huber_on_loops else -1.0,
        cfg.pcr_levels, cfg.edge_tile, cfg.hvp_splits, True,
        cfg.init_lambda, cfg.lambda_factor, cfg.min_lambda, cfg.max_lambda,
        cg_kernel,
    )
    return out, (stats[0], stats[1], stats[2])
