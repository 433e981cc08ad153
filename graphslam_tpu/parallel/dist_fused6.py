"""Distributed SE(3) Gauss-Newton / LM at fused-kernel math.

The SE(3) companion of parallel/dist_fused.py: ops/gn6_kernel.py's
mathematics — packed 12-component pose rows, 6x6 blocks as 2x2 grids of
3x3 plane sets, trig-free SO(3) log, PCR chain preconditioner, two-level
one-hot MXU gather/scatter for loop tiles — decomposed into per-device
SPMD stages under shard_map:

  * loop-edge tiles sharded over the mesh (with optional page windows);
  * the odometry chain sharded by lane slab, embedded full-width into ONE
    psum per GN iteration (all 78 packed D/U/g row groups + the tile
    scatter accumulator in a single collective);
  * the CG loop costs ONE psum per iteration (partial loop H@p in its
    tall (6Q, 128) layout);
  * CG vectors, the PCR factor/apply, priors and retraction replicated
    (the SE(2) module's slab-PCR v2 is not ported here yet — sphere-class
    graphs need the exact-K preconditioner anyway, which is replicated in
    both modules).

Plain jnp throughout: the same code runs multi-chip on TPU and on the
virtual CPU mesh. Covers BASELINE config 5's graphs (sphere2500 /
parking-garage) with the fused-math distributed path; the partitioned
Schur alternative is parallel/dist_schur.py.

Replaces gtsam::LevenbergMarquardtOptimizer for Pose3 graphs at pod scale
(/root/reference/src/graph/src/graph.cpp:119 — GTSAM treats Pose2/Pose3
identically; SURVEY.md §2.4).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors.graph import FactorGraph
from graphslam_tpu.ops.gn_kernel import (
    _gather2,
    _hi_lo,
    _scatter2,
    _tile_qr,
    _tile_qr_win,
    _p_tall,
    _p_untall,
)
from graphslam_tpu.ops.gn6_kernel import (
    _g6_T,
    _g6_Tvec,
    _g6_add_grid,
    _g6_mul,
    _g6_outer,
    _g6_rows36,
    _g6_vec,
    _identity_rows12,
    _linearize6,
    _pack_loop_edges6,
    _pg_T,
    _pg_binv,
    _pg_bmm,
    _pg_bmv,
    _pg_neg,
    _pg_ridge,
    _pg_sub,
    _pg_to_planes,
    _pose_of,
    _renorm,
    _residual6,
    _rows_g6_off,
    _se3_between,
    _se3_compose,
    _se3_exp,
    _se3_jr_inv,
    _se3_log,
    _tuple_g6,
    _v3_add,
)
from graphslam_tpu.parallel.cg_step6 import cg_step6, gn_setup6, stage_a6
from graphslam_tpu.parallel.dist_fused import (
    _acc_win_add,  # jnp.roll twins
    _embed,
    _p_lane_roll,
    _proll,
    _win_parts,
)


# jnp twins of gn6_kernel's roll-based grid helpers (the originals reach
# pltpu.roll through gn_kernel._proll, which only exists inside Pallas)


def _pgj_lane_roll(A, h: int):
    return tuple(_p_lane_roll(q, h) for q in A)


def _pgj_pcr_factor(Dt, Ut, Lt, K: int, eps: float):
    A_steps, G_steps = [], []
    for k in range(K):
        h = 1 << k
        Dt = _pg_ridge(Dt, eps)
        Dinv = _pg_binv(Dt)
        alpha = _pg_bmm(Lt, _pgj_lane_roll(Dinv, h))
        gamma = _pg_bmm(Ut, _pgj_lane_roll(Dinv, -h))
        A_steps.append(alpha)
        G_steps.append(gamma)
        Dt = _pg_sub(
            _pg_sub(Dt, _pg_bmm(alpha, _pgj_lane_roll(Ut, h))),
            _pg_bmm(gamma, _pgj_lane_roll(Lt, -h)),
        )
        Lt = _pg_neg(_pg_bmm(alpha, _pgj_lane_roll(Lt, h)))
        Ut = _pg_neg(_pg_bmm(gamma, _pgj_lane_roll(Ut, -h)))
    DinvF = _pg_binv(_pg_ridge(Dt, eps))
    return A_steps, G_steps, DinvF


def _pgj_pcr_apply(A_steps, G_steps, DinvF, b):
    for k in range(len(A_steps)):
        h = 1 << k
        bm = tuple(_proll(x, h) for x in b)
        bp = tuple(_proll(x, -h) for x in b)
        t1 = _pg_bmv(A_steps[k], bm)
        t2 = _pg_bmv(G_steps[k], bp)
        b = tuple(b[a] - t1[a] - t2[a] for a in range(6))
    return _pg_bmv(DinvF, b)


def _c(ref, n):
    """(8n, L) packed rows -> n-tuple of (8, L) component fields."""
    return tuple(ref[8 * a : 8 * (a + 1)] for a in range(n))


def _rows_g6p(ref):
    """Packed g6 from 36 consecutive 8-row groups (6x6 row-major)."""
    def quad(r0, c0):
        return tuple(
            ref[8 * (6 * (r0 + a) + c0 + b) : 8 * (6 * (r0 + a) + c0 + b) + 8]
            for a in range(3) for b in range(3)
        )

    return (quad(0, 0), quad(0, 3), quad(3, 0), quad(3, 3))


def _make_body(
    *, N, Npad, K, D, iterations, cg_iters, tile, tiles_per_dev,
    huber_delta, hvp_splits, eps, lm, lam0, lam_factor, lam_min, lam_max,
    axis, win, cg_kernel, interpret,
):
    L = Npad // 8
    Q = Npad // 128
    Lc = L // D

    def body(nt, poses_pl, cz, cW, pz, pW, eidx_l, eld_l, q0_l):
        dtype = poses_pl.dtype
        d = jax.lax.axis_index(axis)
        start = d * Lc
        nt_local = jnp.clip(nt[0, 0] - d * tiles_per_dev, 0, tiles_per_dev)

        nidx = (
            jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
            + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        )
        padrow = (nidx >= N).astype(dtype)

        def slab(x):
            return jax.lax.dynamic_slice(x, (0, start), (x.shape[0], Lc))

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

        cz_s = _c(slab(cz), 12)
        cW_s = _rows_g6p(slab(cW))
        pz_c = _c(pz, 12)
        pW_c = _rows_g6p(pW)

        def tile_edge_parts(poses_parts, t):
            idx = jax.lax.dynamic_slice(
                eidx_l, (0, t * 2 * tile), (1, 2 * tile)
            )
            ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
            pg = tile_gather(poses_parts, ohr, qsel, 12, q0i, q0j, rows)
            xi_t = _pose_of(tuple(pg[a : a + 1, :tile] for a in range(12)))
            xj_t = _pose_of(tuple(pg[a : a + 1, tile:] for a in range(12)))
            eld = jax.lax.dynamic_slice(eld_l, (0, t * tile), (48, tile))
            z_t = _pose_of(tuple(eld[a : a + 1] for a in range(12)))
            W_t = _rows_g6_off(eld, slice(None))
            return (ohr, qsel, q0i, q0j), xi_t, xj_t, z_t, W_t

        def chi2_of(poses):
            xi_s = _pose_of(tuple(slab(v) for v in poses))
            xj_s = _pose_of(
                tuple(slab(_proll(v, -1)) for v in poses)
            )
            rw = _residual6(xi_s, xj_s, _pose_of(cz_s), cW_s)
            e_local = sum(jnp.sum(v * v) for v in rw)

            if tiles_per_dev:
                p_parts = _hi_lo(_p_tall(poses), 3)

                def tbody(t, acc):
                    _, xi_t, xj_t, z_t, W_t = tile_edge_parts(p_parts, t)
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

                e_local = e_local + jax.lax.fori_loop(
                    0, nt_local, tbody, jnp.asarray(0.0, dtype)
                )
            e = jax.lax.psum(e_local, axis)

            xi = _pose_of(poses)
            dp = _se3_between(_pose_of(pz_c), xi)
            rp = _g6_vec(pW_c, _se3_log(dp))
            return e + sum(jnp.sum(v * v) for v in rp)

        def _solve_dx_kernels(poses, lam):
            """Fully-kernelized SE(3) GN inner solve (parallel/cg_step6.py)
            — the SE(2) module's three-kernel decomposition with
            6-component state; see dist_fused._solve_dx_kernels."""
            nt_sm = jnp.reshape(nt_local, (1, 1))
            w_chain = jnp.reshape((d == 0).astype(dtype), (1, 1))
            big_part, Aij_k = stage_a6(
                jnp.concatenate(poses, axis=0), cz, cW, eidx_l, eld_l,
                nt_sm, w_chain, q0_l,
                Q=Q, L=L, tile=tile, tiles_per_dev=tiles_per_dev,
                huber_delta=huber_delta, win=win, interpret=interpret,
            )
            big = jax.lax.psum(big_part, axis)

            dpl_a, upl_a, lpl_a, afac, gfac, dinv, b48 = gn_setup6(
                jnp.reshape(jnp.asarray(lam, dtype), (1, 1)),
                big, jnp.concatenate(poses, axis=0), pz, pW,
                N=N, K=K, Q=Q, L=L, eps=eps, interpret=interpret,
            )

            # First pass = CG prologue (zeroed scalars force
            # alpha = beta = 0 exactly); cg_iters + 1 passes total.
            zeros48 = jnp.zeros((48, L), dtype)
            carry = (
                zeros48,
                b48,
                zeros48,
                zeros48,
                jnp.zeros((8, 128), dtype),
                jnp.zeros((6 * Q + 8, 128), dtype),
            )

            def cg_body_k(_, c_):
                xx, rr, pp, cc, ss, bb = c_
                xx, rr, pp, cc, ss, part = cg_step6(
                    xx, rr, pp, cc, ss, bb,
                    dpl_a, upl_a, lpl_a, afac, gfac, dinv,
                    eidx_l, Aij_k, nt_sm, q0_l,
                    K=K, Q=Q, L=L, tile=tile,
                    tiles_per_dev=tiles_per_dev,
                    hvp_splits=hvp_splits, win=win, interpret=interpret,
                )
                return xx, rr, pp, cc, ss, jax.lax.psum(part, axis)

            carry = jax.lax.fori_loop(0, cg_iters + 1, cg_body_k, carry)
            return _c(carry[0], 6)

        def solve_dx(poses, lam):
            if cg_kernel:
                return _solve_dx_kernels(poses, lam)
            # --- stage A: per-device chain slab + loop tiles ---------------
            xi_s = _pose_of(tuple(slab(v) for v in poses))
            xj_s = _pose_of(tuple(slab(_proll(v, -1)) for v in poses))
            rw, Jiw, Jjw = _linearize6(
                xi_s, xj_s, _pose_of(cz_s), cW_s, -1.0
            )
            Aii, Aij, Ajj, gi, gj = _g6_outer(Jiw, Jjw, rw)
            Aii36 = _g6_rows36(Aii)
            Aij36 = _g6_rows36(Aij)
            Ajj36 = _g6_rows36(Ajj)

            Dp = [
                _embed(Aii36[e], start, L)
                + _proll(_embed(Ajj36[e], start, L), 1)
                for e in range(36)
            ]
            gp = [
                _embed(gi[a], start, L) + _proll(_embed(gj[a], start, L), 1)
                for a in range(6)
            ]
            Up = [_embed(Aij36[e], start, L) for e in range(36)]

            if tiles_per_dev:
                p_parts = _hi_lo(_p_tall(poses), 3)

                def tbody(t, carry):
                    Dg, Aij_store = carry
                    oh, xi_t, xj_t, z_t, W_t = tile_edge_parts(p_parts, t)
                    rw_t, Jiw_t, Jjw_t = _linearize6(
                        xi_t, xj_t, z_t, W_t, huber_delta
                    )
                    Aii_t, Aij_t, Ajj_t, gi_t, gj_t = _g6_outer(
                        Jiw_t, Jjw_t, rw_t
                    )
                    r36 = _g6_rows36(Aij_t)
                    Aij_store = jax.lax.dynamic_update_slice(
                        Aij_store, jnp.concatenate(r36, axis=0),
                        (0, t * tile),
                    )
                    Ai36 = _g6_rows36(Aii_t)
                    Aj36 = _g6_rows36(Ajj_t)
                    C = jnp.concatenate(
                        [jnp.concatenate([Ai36[e], Aj36[e]], axis=1)
                         for e in range(36)]
                        + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1)
                           for a in range(6)],
                        axis=0,
                    )
                    return (
                        tile_acc(Dg, _scatter2(C, oh[0], oh[1], dtype),
                                 42, oh[2], oh[3]),
                        Aij_store,
                    )

                Dg0 = jnp.zeros((42 * Q, 128), dtype)
                A0 = jnp.zeros((36, tiles_per_dev * tile), dtype)
                Dg, Aij_store = jax.lax.fori_loop(
                    0, nt_local, tbody, (Dg0, A0)
                )
            else:
                Dg = jnp.zeros((42 * Q, 128), dtype)
                Aij_store = jnp.zeros((36, tile), dtype)

            # --- stage B: ONE all-reduce ----------------------------------
            big = jnp.concatenate(
                Dp + Up + gp + [Dg.reshape(42 * Q * 128 // L, L)], axis=0
            )
            big = jax.lax.psum(big, axis)
            Dr = [big[8 * e : 8 * (e + 1)] for e in range(36)]
            Ur = [big[288 + 8 * e : 288 + 8 * (e + 1)] for e in range(36)]
            gr = [big[576 + 8 * a : 576 + 8 * (a + 1)] for a in range(6)]
            Dgf = _p_untall(big[624:].reshape(42 * Q, 128), 42, L)
            Dq = _g6_add_grid(_tuple_g6(Dr), _tuple_g6(Dgf))
            g = tuple(gr[a] + Dgf[36 + a] for a in range(6))
            U = _tuple_g6(Ur)

            # --- stage C (replicated): priors, padding, damping, PCR ------
            xi = _pose_of(poses)
            dp = _se3_between(_pose_of(pz_c), xi)
            rp = _se3_log(dp)
            Jp = _se3_jr_inv(rp)
            rpw = _g6_vec(pW_c, rp)
            Jpw = _g6_mul(pW_c, Jp)
            Ap = _g6_mul(_g6_T(Jpw), Jpw)
            gpr = _g6_Tvec(Jpw, rpw)
            Dq = _g6_add_grid(Dq, Ap)
            g = _v3_add(g[:3], gpr[:3]) + _v3_add(g[3:], gpr[3:])
            scale = 1.0 + lam
            Dq = (
                tuple(
                    (Dq[0][e] + padrow) * scale if e in (0, 4, 8) else Dq[0][e]
                    for e in range(9)
                ),
                Dq[1], Dq[2],
                tuple(
                    (Dq[3][e] + padrow) * scale if e in (0, 4, 8) else Dq[3][e]
                    for e in range(9)
                ),
            )

            Dpl = _pg_to_planes(Dq)
            Upl = _pg_to_planes(U)
            Lpl = _pgj_lane_roll(_pg_T(Upl), 1)
            A_steps, G_steps, DinvF = _pgj_pcr_factor(Dpl, Upl, Lpl, K, eps)

            b = tuple(-g[a] for a in range(6))

            def hvp(v):
                h1 = _pg_bmv(Dpl, v)
                h2 = _pg_bmv(Upl, tuple(_proll(x, -1) for x in v))
                h3 = _pg_bmv(Lpl, tuple(_proll(x, 1) for x in v))
                out = tuple(h1[a] + h2[a] + h3[a] for a in range(6))
                if tiles_per_dev:
                    v_parts = _hi_lo(_p_tall(v), hvp_splits)

                    def tb(t, acc):
                        idx = jax.lax.dynamic_slice(
                            eidx_l, (0, t * 2 * tile), (1, 2 * tile)
                        )
                        ohr, qsel, q0i, q0j, rows = tile_sel(t, idx)
                        vg = tile_gather(v_parts, ohr, qsel, 6, q0i, q0j,
                                         rows)
                        vi = tuple(vg[a : a + 1, :tile] for a in range(6))
                        vj = tuple(vg[a : a + 1, tile:] for a in range(6))
                        A = tuple(
                            jax.lax.dynamic_slice(
                                Aij_store, (a, t * tile), (1, tile)
                            )
                            for a in range(36)
                        )
                        yi = tuple(
                            sum(A[6 * a + b_] * vj[b_] for b_ in range(6))
                            for a in range(6)
                        )
                        yj = tuple(
                            sum(A[6 * a + b_] * vi[a] for a in range(6))
                            for b_ in range(6)
                        )
                        ys = jnp.concatenate(
                            [jnp.concatenate([yi[a], yj[a]], axis=1)
                             for a in range(6)],
                            axis=0,
                        )
                        return tile_acc(
                            acc,
                            _scatter2(ys, ohr, qsel, dtype,
                                      n_splits=hvp_splits),
                            6, q0i, q0j,
                        )

                    acc0 = jnp.zeros((6 * Q, 128), dtype)
                    acc = jax.lax.fori_loop(0, nt_local, tb, acc0)
                    tg = _p_untall(jax.lax.psum(acc, axis), 6, L)
                    out = tuple(out[a] + tg[a] for a in range(6))
                return out

            tiny = jnp.asarray(1e-30, dtype)
            r = b
            z = _pgj_pcr_apply(A_steps, G_steps, DinvF, r)
            p = z
            rz = sum(jnp.sum(r[a] * z[a]) for a in range(6))
            x = tuple(jnp.zeros_like(v) for v in b)

            def cg_body(_, carry):
                x, r, p, rz = carry
                Hp = hvp(p)
                pHp = sum(jnp.sum(p[a] * Hp[a]) for a in range(6))
                # Krylov-exhaustion guard: on an (at-optimum) near-zero RHS,
                # f32 roundoff can drive pHp <= 0; clamping alone turns the
                # sign flip into a ~1e30 step (measured NaN blowup in warm-
                # started online solves, RESULTS.md round 5). Freeze the
                # update instead — the exact semantics of a converged CG.
                alpha = jnp.where(pHp > tiny, rz / jnp.maximum(pHp, tiny), 0.0)
                x = tuple(x[a] + alpha * p[a] for a in range(6))
                r = tuple(r[a] - alpha * Hp[a] for a in range(6))
                z = _pgj_pcr_apply(A_steps, G_steps, DinvF, r)
                rz_new = sum(jnp.sum(r[a] * z[a]) for a in range(6))
                beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
                p = tuple(z[a] + beta * p[a] for a in range(6))
                return x, r, p, rz_new

            x, _, _, _ = jax.lax.fori_loop(
                0, cg_iters, cg_body, (x, r, p, rz)
            )
            return x

        def retract(poses, x):
            Rm, t = _pose_of(poses)
            e = _se3_exp(x)
            Rn, tn = _se3_compose((Rm, t), e)
            Rn = _renorm(Rn)
            return tuple(Rn) + tuple(tn)

        poses0 = _c(poses_pl, 12)
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
                    jnp.where(accepted, cand[a], poses[a]) for a in range(12)
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


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "iterations", "cg_iters", "huber_delta",
        "pcr_levels", "edge_tile", "hvp_splits", "lm",
        "lam0", "lam_factor", "lam_min", "lam_max", "cg_kernel",
    ),
)
def _dist_fused6(
    poses0, graph: FactorGraph, mesh, axis, iterations, cg_iters,
    huber_delta, pcr_levels, edge_tile, hvp_splits, lm,
    lam0, lam_factor, lam_min, lam_max, cg_kernel,
):
    N, T = poses0.shape
    if T != 12:
        raise ValueError("dist_fused6 expects (N, 12) SE(3) poses")
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

    from graphslam_tpu.ops.gn6_kernel import _mask_to_identity

    poses_pl = pack(_identity_rows12(Npad, dtype).at[:, :N].set(poses0.T))
    cm = graph.edge_mask[:c]
    cz_rows = _mask_to_identity(graph.measurements[:c], cm)
    cz = pack(_identity_rows12(Npad, dtype).at[:, :c].set(cz_rows.T))
    cW = pack(jnp.zeros((36, Npad), dtype).at[:, :c].set(
        (graph.sqrt_info[:c] * cm[:, None, None].astype(dtype))
        .reshape(c, 36).T
    ))
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
    n_pad = -(-max(n_tiles, 1) // D) * D
    eidx = jnp.pad(eidx, ((0, 0), (0, (n_pad - n_tiles) * 2 * tile)))
    # SE(3) eld padding: identity poses keep the row math well-conditioned
    pad_cols = (n_pad - n_tiles) * tile
    eld_pad = jnp.zeros((48, pad_cols), dtype)
    eld_pad = eld_pad.at[0].set(1.0).at[4].set(1.0).at[8].set(1.0)
    eld = jnp.concatenate([eld, eld_pad], axis=1)
    tiles_per_dev = n_pad // D

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

    # cg_kernel: None = auto (the fused kernels on real TPU, the XLA loop
    # on CPU meshes; interpret-mode Mosaic when explicitly requested).
    if cg_kernel is None:
        cg_kernel = jax.default_backend() in ("tpu", "axon")
    interpret = jax.default_backend() not in ("tpu", "axon")

    body = _make_body(
        N=N, Npad=Npad, K=K, D=D, iterations=iterations, cg_iters=cg_iters,
        tile=tile, tiles_per_dev=tiles_eff, huber_delta=huber_delta,
        hvp_splits=hvp_splits, eps=3e-4, lm=lm, lam0=lam0,
        lam_factor=lam_factor, lam_min=lam_min, lam_max=lam_max, axis=axis,
        win=win, cg_kernel=cg_kernel, interpret=interpret,
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(),
            P(None, axis), P(None, axis), P(None, axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    out, stats = fn(nt, poses_pl, cz, cW, pz, pW, eidx, eld, q0)
    return out.reshape(12, Npad)[:, :N].T, stats


def dist_fused6_gn_solve(
    poses0: jnp.ndarray,
    graph: FactorGraph,
    mesh: Mesh,
    cfg: SolverConfig = SolverConfig(),
    iterations: int = 10,
    axis: str = "dev",
    cg_kernel: bool | None = None,
):
    """`iterations` full SE(3) GN iterations of the fused-kernel math, SPMD
    over `mesh` — matches fused_gn6_solve's trajectory. cg_kernel runs
    the solve through the fused Mosaic kernels (parallel/cg_step6.py);
    None = auto (on for real TPU)."""
    out, _ = _dist_fused6(
        poses0, graph, mesh, axis, iterations, cfg.cg_max_iterations,
        -1.0, cfg.pcr_levels, cfg.edge_tile, cfg.hvp_splits, False,
        cfg.init_lambda, cfg.lambda_factor, cfg.min_lambda, cfg.max_lambda,
        cg_kernel,
    )
    return out


def dist_fused6_lm_solve(
    poses0: jnp.ndarray,
    graph: FactorGraph,
    mesh: Mesh,
    cfg: SolverConfig = SolverConfig(),
    iterations: int = 30,
    axis: str = "dev",
    cg_kernel: bool | None = None,
):
    """Distributed SE(3) LM. Returns (poses, (chi2, lambda, accepted))."""
    out, stats = _dist_fused6(
        poses0, graph, mesh, axis, iterations, cfg.cg_max_iterations,
        cfg.huber_delta if cfg.use_huber_on_loops else -1.0,
        cfg.pcr_levels, cfg.edge_tile, cfg.hvp_splits, True,
        cfg.init_lambda, cfg.lambda_factor, cfg.min_lambda, cfg.max_lambda,
        cg_kernel,
    )
    return out, (stats[0], stats[1], stats[2])
