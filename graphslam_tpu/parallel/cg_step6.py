"""Fused per-device GN/CG kernels for the distributed SE(3) solver.

The SE(3) mirror of parallel/cg_step.py — same decomposition of
parallel/dist_fused6.py's SPMD Gauss-Newton into three Mosaic kernels with
one psum between stage A and setup and one psum per CG iteration:

  * stage_a6 — full-width chain linearization weighted by [device == 0]
    (the psum counts it once, bit-identically at any mesh size) + this
    device's loop-edge tiles, assembled into the pre-psum payload;
  * gn_setup6 — priors, padding identity, Marquardt damping, the packed
    6x6 grid plane sets and the K-level PCR factor, written in the
    row-block layout the CG kernel reads;
  * cg_step6 — one CG iteration: guarded x/r update, replicated
    full-width PCR apply, p update, chain H@p, sharded tile H@p partial,
    with the pHp/rz scalars folded into the tile psum payload.

A packed 6x6 grid ("pg6", gn6_kernel.py) is 4 quadrants of 3x3 plane
sets = 36 row blocks of 8 rows -> one (288, L) array; PCR factors are
(K*288, L). That is 4x the SE(2) streaming volume per CG iteration, so
the factor DMA — not the launch — bounds the SE(3) CG step; still ~5x
under the XLA loop's measured per-iteration cost (RESULTS.md round 5).

Replaces gtsam::LevenbergMarquardtOptimizer for Pose3 graphs at pod
scale (/root/reference/src/graph/src/graph.cpp:119, BASELINE config 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphslam_tpu.ops.gn_kernel import (
    _acc_win_add,
    _gather2,
    _hi_lo,
    _p_tall,
    _p_untall,
    _proll,
    _scatter2,
    _tile_qr,
    _tile_qr_win,
    _win_parts,
)
from graphslam_tpu.ops.gn6_kernel import (
    _g6_T,
    _g6_Tvec,
    _g6_add_grid,
    _g6_mul,
    _g6_outer,
    _g6_rows36,
    _g6_vec,
    _linearize6,
    _pg_T,
    _pg_bmv,
    _pg_lane_roll,
    _pg_pcr_apply,
    _pg_pcr_factor,
    _pg_to_planes,
    _pose_of,
    _residual6,
    _rows_g6_off,
    _se3_between,
    _se3_jr_inv,
    _se3_log,
    _tuple_g6,
    _v3_add,
)


def _c(ref, n):
    """(8n, L) packed rows -> n-tuple of (8, L) component fields."""
    return tuple(ref[8 * a : 8 * (a + 1)] for a in range(n))


def _rows_g6p(ref):
    """Packed g6 of rowmats from 36 consecutive 8-row groups (row-major)."""
    def quad(r0, c0):
        return tuple(
            ref[8 * (6 * (r0 + a) + c0 + b) : 8 * (6 * (r0 + a) + c0 + b) + 8]
            for a in range(3) for b in range(3)
        )

    return (quad(0, 0), quad(0, 3), quad(3, 0), quad(3, 3))


def _unpack_pg(ref, base: int):
    """Row-block array -> pg6 (4 quadrants of 3x3 plane sets of (8, L)).
    base counts 8-row blocks; a pg6 spans 36 blocks (288 rows)."""
    def block(q, d, a):
        i = (base + (q * 3 + d) * 3 + a) * 8
        return ref[i : i + 8]

    return tuple(
        tuple(tuple(block(q, d, a) for a in range(3)) for d in range(3))
        for q in range(4)
    )


def _write_pg(ref, G, base: int = 0):
    for q in range(4):
        for d in range(3):
            for a in range(3):
                i = (base + (q * 3 + d) * 3 + a) * 8
                ref[i : i + 8] = G[q][d][a]


def _stage_a6_kernel(
    nt_ref, wchain_ref, q0_ref,
    poses_ref, cz_ref, cW_ref, eidx_ref, eld_ref,
    big_ref, aij_ref,
    *,
    Q: int, L: int, tile: int, tiles_per_dev: int, huber_delta: float,
    win: int,
):
    """Stage A (see module docstring) — mirrors dist_fused6's XLA stage A
    with the chain full-width (w_chain-weighted) instead of slab-sharded."""
    dtype = poses_ref.dtype
    nt_local = nt_ref[0, 0]
    w_chain = wchain_ref[0, 0]

    rows12 = _c(poses_ref[:], 12)
    xi = _pose_of(rows12)
    xj = _pose_of(tuple(_proll(v, -1) for v in rows12))
    cz12 = _pose_of(_c(cz_ref[:], 12))
    cW_g = _rows_g6p(cW_ref[:])
    rw, Jiw, Jjw = _linearize6(xi, xj, cz12, cW_g, -1.0)
    Aii, Aij, Ajj, gi, gj = _g6_outer(Jiw, Jjw, rw)
    Aii36 = _g6_rows36(Aii)
    Aij36 = _g6_rows36(Aij)
    Ajj36 = _g6_rows36(Ajj)
    for e in range(36):
        big_ref[8 * e : 8 * (e + 1)] = (
            Aii36[e] + _proll(Ajj36[e], 1)
        ) * w_chain
        big_ref[288 + 8 * e : 288 + 8 * (e + 1)] = Aij36[e] * w_chain
    for a in range(6):
        big_ref[576 + 8 * a : 576 + 8 * (a + 1)] = (
            gi[a] + _proll(gj[a], 1)
        ) * w_chain

    tall_rows = 42 * Q * 128 // L
    if tiles_per_dev:
        p_src = (
            _p_tall(rows12) if win else _hi_lo(_p_tall(rows12), 3)
        )

        def tile_body(t, Dg):
            idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
            if win:
                q0i = q0_ref[0, t]
                q0j = q0_ref[1, t]
                ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
                parts = _hi_lo(_win_parts(p_src, 12, Q, win, q0i, q0j), 3)
                pg = _gather2(parts, ohr, qsel, 12, 2 * win, dtype)
            else:
                ohr, qsel = _tile_qr(idx, Q, dtype)
                pg = _gather2(p_src, ohr, qsel, 12, Q, dtype)
            xi_t = _pose_of(
                tuple(pg[a : a + 1, :tile] for a in range(12))
            )
            xj_t = _pose_of(
                tuple(pg[a : a + 1, tile:] for a in range(12))
            )
            eld = eld_ref[:, pl.ds(t * tile, tile)]
            z_t = _pose_of(tuple(eld[a : a + 1] for a in range(12)))
            W_t = _rows_g6_off(eld, slice(None))
            rw_t, Jiw_t, Jjw_t = _linearize6(
                xi_t, xj_t, z_t, W_t, huber_delta
            )
            Aii_t, Aij_t, Ajj_t, gi_t, gj_t = _g6_outer(
                Jiw_t, Jjw_t, rw_t
            )
            r36 = _g6_rows36(Aij_t)
            for a in range(36):
                aij_ref[a : a + 1, pl.ds(t * tile, tile)] = r36[a]
            Ai36 = _g6_rows36(Aii_t)
            Aj36 = _g6_rows36(Ajj_t)
            C = jnp.concatenate(
                [jnp.concatenate([Ai36[e], Aj36[e]], axis=1)
                 for e in range(36)]
                + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1)
                   for a in range(6)],
                axis=0,
            )
            contrib = _scatter2(C, ohr, qsel, dtype)
            if win:
                return _acc_win_add(Dg, contrib, 42, Q, win, q0i, q0j)
            return Dg + contrib

        Dg = jax.lax.fori_loop(
            0, nt_local, tile_body, jnp.zeros((42 * Q, 128), dtype)
        )
    else:
        Dg = jnp.zeros((42 * Q, 128), dtype)
        aij_ref[:] = jnp.zeros_like(aij_ref)
    big_ref[624 : 624 + tall_rows] = Dg.reshape(tall_rows, L)


@partial(
    jax.jit,
    static_argnames=(
        "Q", "L", "tile", "tiles_per_dev", "huber_delta", "win",
        "interpret",
    ),
)
def stage_a6(
    poses, cz, cW, eidx, eld, nt_local, w_chain, q0,
    *,
    Q: int, L: int, tile: int, tiles_per_dev: int, huber_delta: float,
    win: int, interpret: bool,
):
    dtype = poses.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tall_rows = 42 * Q * 128 // L
    aij_cols = max(tiles_per_dev, 1) * tile
    return pl.pallas_call(
        partial(
            _stage_a6_kernel, Q=Q, L=L, tile=tile,
            tiles_per_dev=tiles_per_dev, huber_delta=huber_delta, win=win,
        ),
        in_specs=[sspec, sspec, sspec] + [vspec] * 5,
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((624 + tall_rows, L), dtype),
            jax.ShapeDtypeStruct((36, aij_cols), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        name="dist6_gn_stage_a",
    )(nt_local, w_chain, q0, poses, cz, cW, eidx, eld)


def _gn_setup6_kernel(
    lam_ref,
    big_ref, poses_ref, pz_ref, pW_ref,
    dpl_ref, upl_ref, lpl_ref, afac_ref, gfac_ref, dinv_ref, b_ref,
    *,
    N: int, K: int, Q: int, L: int, eps: float,
):
    """Stage C fused (mirrors dist_fused6's XLA stage B tail + stage C)."""
    dtype = big_ref.dtype
    lam = lam_ref[0, 0]

    Dr = [big_ref[8 * e : 8 * (e + 1)] for e in range(36)]
    Ur = [big_ref[288 + 8 * e : 288 + 8 * (e + 1)] for e in range(36)]
    gr = [big_ref[576 + 8 * a : 576 + 8 * (a + 1)] for a in range(6)]
    tall_rows = 42 * Q * 128 // L
    Dgf = _p_untall(
        big_ref[624 : 624 + tall_rows].reshape(42 * Q, 128), 42, L
    )
    Dq = _g6_add_grid(_tuple_g6(Dr), _tuple_g6(Dgf))
    g = tuple(gr[a] + Dgf[36 + a] for a in range(6))
    U = _tuple_g6(Ur)

    xi = _pose_of(_c(poses_ref[:], 12))
    pz_c = _pose_of(_c(pz_ref[:], 12))
    pW_c = _rows_g6p(pW_ref[:])
    dp = _se3_between(pz_c, xi)
    rp = _se3_log(dp)
    Jp = _se3_jr_inv(rp)
    rpw = _g6_vec(pW_c, rp)
    Jpw = _g6_mul(pW_c, Jp)
    Ap = _g6_mul(_g6_T(Jpw), Jpw)
    gpr = _g6_Tvec(Jpw, rpw)
    Dq = _g6_add_grid(Dq, Ap)
    g = _v3_add(g[:3], gpr[:3]) + _v3_add(g[3:], gpr[3:])

    nidx = (
        jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    )
    padrow = (nidx >= N).astype(dtype)
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
    Lpl = _pg_lane_roll(_pg_T(Upl), 1)
    A_steps, G_steps, DinvF = _pg_pcr_factor(Dpl, Upl, Lpl, K, eps)

    _write_pg(dpl_ref, Dpl)
    _write_pg(upl_ref, Upl)
    _write_pg(lpl_ref, Lpl)
    for k in range(K):
        _write_pg(afac_ref, A_steps[k], base=k * 36)
        _write_pg(gfac_ref, G_steps[k], base=k * 36)
    _write_pg(dinv_ref, DinvF)
    for a in range(6):
        b_ref[8 * a : 8 * (a + 1)] = -g[a]


@partial(
    jax.jit,
    static_argnames=("N", "K", "Q", "L", "eps", "interpret"),
)
def gn_setup6(
    lam, big, poses, pz, pW,
    *, N: int, K: int, Q: int, L: int, eps: float, interpret: bool,
):
    dtype = big.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_gn_setup6_kernel, N=N, K=K, Q=Q, L=L, eps=eps),
        in_specs=[sspec] + [vspec] * 4,
        out_specs=(vspec,) * 7,
        out_shape=(
            jax.ShapeDtypeStruct((288, L), dtype),      # Dpl
            jax.ShapeDtypeStruct((288, L), dtype),      # Upl
            jax.ShapeDtypeStruct((288, L), dtype),      # Lpl
            jax.ShapeDtypeStruct((K * 288, L), dtype),  # A_steps
            jax.ShapeDtypeStruct((K * 288, L), dtype),  # G_steps
            jax.ShapeDtypeStruct((288, L), dtype),      # DinvF
            jax.ShapeDtypeStruct((48, L), dtype),       # b = -g
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        name="dist6_gn_setup",
    )(lam, big, poses, pz, pW)


def _cg_step6_kernel(
    nt_ref, q0_ref,
    x_ref, r_ref, p_ref, cap_ref, scal_ref, big_ref,
    dpl_ref, upl_ref, lpl_ref, afac_ref, gfac_ref, dinv_ref,
    eidx_ref, aij_ref,
    xo_ref, ro_ref, po_ref, capo_ref, scalo_ref, part_ref,
    *,
    K: int, Q: int, L: int, tile: int, tiles_per_dev: int,
    hvp_splits: int, win: int,
):
    dtype = x_ref.dtype
    tiny = jnp.asarray(1e-30, dtype)
    nt_local = nt_ref[0, 0]

    x = _c(x_ref[:], 6)
    r = _c(r_ref[:], 6)
    p = _c(p_ref[:], 6)
    cap = _c(cap_ref[:], 6)

    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    m00 = ((i0 == 0) & (i1 == 0)).astype(dtype)
    m01 = ((i0 == 0) & (i1 == 1)).astype(dtype)
    scal = scal_ref[:]
    rz = jnp.sum(scal * m00)
    s0 = jnp.sum(scal * m01)
    s1 = jnp.sum(big_ref[6 * Q : 6 * Q + 8] * m00)

    tile_ap = _p_untall(big_ref[: 6 * Q], 6, L)
    pHp = s0 + s1
    alpha = jnp.where(pHp > tiny, rz / jnp.maximum(pHp, tiny), 0.0)
    x = tuple(x[a] + alpha * p[a] for a in range(6))
    r = tuple(r[a] - alpha * (cap[a] + tile_ap[a]) for a in range(6))

    A_steps = [_unpack_pg(afac_ref, k * 36) for k in range(K)]
    G_steps = [_unpack_pg(gfac_ref, k * 36) for k in range(K)]
    DinvF = _unpack_pg(dinv_ref, 0)
    z = _pg_pcr_apply(A_steps, G_steps, DinvF, r)
    rz_new = sum(jnp.sum(r[a] * z[a]) for a in range(6))
    beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
    p = tuple(z[a] + beta * p[a] for a in range(6))

    Dpl = _unpack_pg(dpl_ref, 0)
    Upl = _unpack_pg(upl_ref, 0)
    Lpl = _unpack_pg(lpl_ref, 0)
    h1 = _pg_bmv(Dpl, p)
    h2 = _pg_bmv(Upl, tuple(_proll(v, -1) for v in p))
    h3 = _pg_bmv(Lpl, tuple(_proll(v, 1) for v in p))
    cap_new = tuple(h1[a] + h2[a] + h3[a] for a in range(6))
    s0_new = sum(jnp.sum(p[a] * cap_new[a]) for a in range(6))

    p_tall = _p_tall(p)
    if tiles_per_dev:
        v_src = p_tall if win else _hi_lo(p_tall, hvp_splits)

        def tb(t, acc):
            idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
            if win:
                q0i = q0_ref[0, t]
                q0j = q0_ref[1, t]
                ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
                parts = _hi_lo(
                    _win_parts(v_src, 6, Q, win, q0i, q0j), hvp_splits
                )
                vg = _gather2(parts, ohr, qsel, 6, 2 * win, dtype)
            else:
                ohr, qsel = _tile_qr(idx, Q, dtype)
                vg = _gather2(v_src, ohr, qsel, 6, Q, dtype)
            vi = tuple(vg[a : a + 1, :tile] for a in range(6))
            vj = tuple(vg[a : a + 1, tile:] for a in range(6))
            A = tuple(
                aij_ref[a : a + 1, pl.ds(t * tile, tile)]
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
                [jnp.concatenate([yi[a], yj[a]], axis=1) for a in range(6)],
                axis=0,
            )
            contrib = _scatter2(ys, ohr, qsel, dtype, n_splits=hvp_splits)
            if win:
                return _acc_win_add(acc, contrib, 6, Q, win, q0i, q0j)
            return acc + contrib

        acc = jax.lax.fori_loop(
            0, nt_local, tb, jnp.zeros((6 * Q, 128), dtype)
        )
    else:
        acc = jnp.zeros((6 * Q, 128), dtype)
    s1_part = jnp.sum(p_tall * acc)

    for a in range(6):
        xo_ref[8 * a : 8 * (a + 1)] = x[a]
        ro_ref[8 * a : 8 * (a + 1)] = r[a]
        po_ref[8 * a : 8 * (a + 1)] = p[a]
        capo_ref[8 * a : 8 * (a + 1)] = cap_new[a]
    scalo_ref[:] = (rz_new * m00 + s0_new * m01).astype(dtype)
    part_ref[: 6 * Q] = acc
    part_ref[6 * Q :] = (s1_part * m00).astype(dtype)


@partial(
    jax.jit,
    static_argnames=(
        "K", "Q", "L", "tile", "tiles_per_dev", "hvp_splits", "win",
        "interpret",
    ),
)
def cg_step6(
    x, r, p, cap, scal, big,
    dpl, upl, lpl, afac, gfac, dinv, eidx, aij, nt_local, q0,
    *,
    K: int, Q: int, L: int, tile: int, tiles_per_dev: int,
    hvp_splits: int, win: int, interpret: bool,
):
    """One fused distributed SE(3) CG step (see parallel/cg_step.py for
    the iteration contract — identical, with 6-component state)."""
    dtype = x.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(
            _cg_step6_kernel, K=K, Q=Q, L=L, tile=tile,
            tiles_per_dev=tiles_per_dev, hvp_splits=hvp_splits, win=win,
        ),
        in_specs=[sspec, sspec] + [vspec] * 14,
        out_specs=(vspec,) * 6,
        out_shape=(
            jax.ShapeDtypeStruct((48, L), dtype),       # x
            jax.ShapeDtypeStruct((48, L), dtype),       # r
            jax.ShapeDtypeStruct((48, L), dtype),       # p
            jax.ShapeDtypeStruct((48, L), dtype),       # chain_Ap
            jax.ShapeDtypeStruct((8, 128), dtype),      # scalars
            jax.ShapeDtypeStruct((6 * Q + 8, 128), dtype),  # psum payload
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        name="dist6_cg_step",
    )(nt_local, q0, x, r, p, cap, scal, big,
      dpl, upl, lpl, afac, gfac, dinv, eidx, aij)
