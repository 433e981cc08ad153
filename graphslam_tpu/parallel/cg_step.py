"""Fused per-device CG step for the distributed SE(2) solver.

The round-5 profile (RESULTS.md, scripts/profile_dist_fused.py) pinned
dist_fused's entire 1-device gap vs the mega-kernel on the CG loop's XLA
op-dispatch floor: 17.7 µs per CG iteration of dozens of small plane FMAs,
dynamic slices, and two psums, where Mosaic runs one fused loop body in
3.3 µs. This module collapses each distributed CG iteration to ONE Pallas
kernel launch + ONE psum:

  kernel (per device, this module):
      pHp   = s0 + s1                      (s1 arrived through the psum)
      alpha = rz / pHp                     (Krylov-exhaustion guarded)
      x    += alpha p;  r -= alpha (chain_Ap + tile_Ap)
      z     = PCR^{-1} r                   (full-width apply, REPLICATED —
                                            bit-identical on every device,
                                            so the old z-apply psum of the
                                            slab-sharded path disappears)
      beta  = rz'/rz;  p' = z + beta p
      chain_Ap' = (D + U + L) @ p'         (replicated plane FMAs)
      tile_Ap'  = this device's loop tiles @ p'   (the SHARDED part)
      s1_part'  = p'.tile_Ap'
  psum (outside — XLA collective riding ICI):
      [tile_Ap' ; s1_part']  — one (3Q+8, 128) all-reduce

Scalars ride the same collective as the matvec partials (p is replicated,
so p.psum(acc) == psum(p.acc_local)), which is what makes one psum per
iteration sufficient. The replicated work (vector updates, preconditioner,
chain matvec) is exactly the mega-kernel's per-iteration body — cheap
inside Mosaic, ruinous as XLA op soup; only the loop-edge tile sweep (the
part that grows with the graph) is sharded, which is the scaling story
the round-5 profile prescribed.

All layout/tile helpers are the mega-kernel's own (ops/gn_kernel.py) —
this kernel IS one iteration of that kernel's CG loop, minus the psum.
Replaces gtsam's LM inner solve at pod scale
(/root/reference/src/graph/src/graph.cpp:119, BASELINE config 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphslam_tpu.ops.gn_kernel import (
    _acc_win_add,
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
    _p_bmv,
    _p_lane_roll,
    _p_pcr_apply,
    _p_pcr_factor,
    _p_planes,
    _p_tall,
    _p_untall,
    _proll,
    _proll3,
    _scatter2,
    _se2_between,
    _se2_jr_inv,
    _se2_log,
    _tile_qr,
    _tile_qr_win,
    _win_parts,
)


def _unpack_planes(ref, base: int):
    """Row-block array slice -> plane-set tuple of (8, L) arrays."""
    return tuple(
        tuple(
            ref[(base + d * 3 + a) * 8 : (base + d * 3 + a) * 8 + 8]
            for a in range(3)
        )
        for d in range(3)
    )


def _cg_step_kernel(
    # scalar-prefetch / SMEM
    nt_ref, q0_ref,
    # VMEM inputs
    x_ref, r_ref, p_ref, cap_ref, scal_ref, big_ref,
    dpl_ref, upl_ref, lpl_ref, afac_ref, gfac_ref, dinv_ref,
    eidx_ref, aij_ref,
    # VMEM outputs
    xo_ref, ro_ref, po_ref, capo_ref, scalo_ref, part_ref,
    *,
    K: int, Q: int, L: int, tile: int, tiles_per_dev: int,
    hvp_splits: int, win: int,
):
    dtype = x_ref.dtype
    tiny = jnp.asarray(1e-30, dtype)
    nt_local = nt_ref[0, 0]

    x = tuple(x_ref[8 * a : 8 * (a + 1)] for a in range(3))
    r = tuple(r_ref[8 * a : 8 * (a + 1)] for a in range(3))
    p = tuple(p_ref[8 * a : 8 * (a + 1)] for a in range(3))
    cap = tuple(cap_ref[8 * a : 8 * (a + 1)] for a in range(3))

    # Scalars as masked reductions to rank-0 (Mosaic can broadcast a
    # rank-0 scalar into (8, L) but not a (1, 1) vector).
    i0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    m00 = ((i0 == 0) & (i1 == 0)).astype(dtype)
    m01 = ((i0 == 0) & (i1 == 1)).astype(dtype)
    scal = scal_ref[:]
    rz = jnp.sum(scal * m00)
    s0 = jnp.sum(scal * m01)
    s1 = jnp.sum(big_ref[3 * Q : 3 * Q + 8] * m00)

    # --- update step k: x += alpha p, r -= alpha H p ----------------------
    tile_ap = _p_untall(big_ref[: 3 * Q], 3, L)
    pHp = s0 + s1
    alpha = jnp.where(pHp > tiny, rz / jnp.maximum(pHp, tiny), 0.0)
    x = tuple(x[a] + alpha * p[a] for a in range(3))
    r = tuple(r[a] - alpha * (cap[a] + tile_ap[a]) for a in range(3))

    # --- preconditioner (replicated full-width PCR apply) -----------------
    A_steps = [_unpack_planes(afac_ref, k * 9) for k in range(K)]
    G_steps = [_unpack_planes(gfac_ref, k * 9) for k in range(K)]
    DinvF = _unpack_planes(dinv_ref, 0)
    z = _p_pcr_apply(A_steps, G_steps, DinvF, r)
    rz_new = sum(jnp.sum(r[a] * z[a]) for a in range(3))
    beta = jnp.where(rz > tiny, rz_new / jnp.maximum(rz, tiny), 0.0)
    p = tuple(z[a] + beta * p[a] for a in range(3))

    # --- H @ p' for step k+1: chain replicated, tiles sharded -------------
    Dpl = _unpack_planes(dpl_ref, 0)
    Upl = _unpack_planes(upl_ref, 0)
    Lpl = _unpack_planes(lpl_ref, 0)
    h1 = _p_bmv(Dpl, p)
    h2 = _p_bmv(Upl, _proll3(p, -1))
    h3 = _p_bmv(Lpl, _proll3(p, 1))
    cap_new = tuple(h1[a] + h2[a] + h3[a] for a in range(3))
    s0_new = sum(jnp.sum(p[a] * cap_new[a]) for a in range(3))

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
                    _win_parts(v_src, 3, Q, win, q0i, q0j), hvp_splits
                )
                vg = _gather2(parts, ohr, qsel, 3, 2 * win, dtype)
            else:
                ohr, qsel = _tile_qr(idx, Q, dtype)
                vg = _gather2(v_src, ohr, qsel, 3, Q, dtype)
            vi = tuple(vg[a : a + 1, :tile] for a in range(3))
            vj = tuple(vg[a : a + 1, tile:] for a in range(3))
            A = tuple(
                aij_ref[a : a + 1, pl.ds(t * tile, tile)] for a in range(9)
            )
            yi = _m3_vec(A, vj)
            yj = _m3_Tvec(A, vi)
            ys = jnp.concatenate(
                [jnp.concatenate([yi[a], yj[a]], axis=1) for a in range(3)],
                axis=0,
            )
            contrib = _scatter2(ys, ohr, qsel, dtype, n_splits=hvp_splits)
            if win:
                return _acc_win_add(acc, contrib, 3, Q, win, q0i, q0j)
            return acc + contrib

        acc = jax.lax.fori_loop(
            0, nt_local, tb, jnp.zeros((3 * Q, 128), dtype)
        )
    else:
        acc = jnp.zeros((3 * Q, 128), dtype)
    s1_part = jnp.sum(p_tall * acc)

    # --- write ------------------------------------------------------------
    for a in range(3):
        xo_ref[8 * a : 8 * (a + 1)] = x[a]
        ro_ref[8 * a : 8 * (a + 1)] = r[a]
        po_ref[8 * a : 8 * (a + 1)] = p[a]
        capo_ref[8 * a : 8 * (a + 1)] = cap_new[a]
    scalo_ref[:] = (rz_new * m00 + s0_new * m01).astype(dtype)
    part_ref[: 3 * Q] = acc
    part_ref[3 * Q :] = (s1_part * m00).astype(dtype)


def _stage_a_kernel(
    nt_ref, wchain_ref, q0_ref,
    poses_ref, cz_ref, cR_ref, eidx_ref, eld_ref,
    big_ref, aij_ref,
    *,
    Q: int, L: int, tile: int, tiles_per_dev: int, huber_delta: float,
    win: int,
):
    """Stage A of the distributed GN iteration, fused: linearize the
    odometry chain (full-width, weighted by w_chain — 1 on device 0, 0
    elsewhere, so the psum counts it exactly once, bit-identically for
    every mesh size) and THIS DEVICE's loop-edge tiles (the sharded,
    graph-size-scaling part), assemble the pre-psum normal-equation
    payload, and stash the per-tile off-diagonal blocks for the CG
    matvec. Mirrors ops/gn_kernel.py::_gn_kernel's linearize section."""
    dtype = poses_ref.dtype
    nt_local = nt_ref[0, 0]
    w_chain = wchain_ref[0, 0]

    xi = _c3(poses_ref[:])
    xj = _proll3(xi, -1)
    cz3 = _c3(cz_ref[:])
    cR9 = _c9(cR_ref[:])
    rw, Jiw, Jjw = _linearize_rows(xi, xj, cz3, cR9, -1.0)
    Aii, Aij, Ajj, gi, gj = _outer_blocks(Jiw, Jjw, rw)
    for e in range(9):
        big_ref[8 * e : 8 * (e + 1)] = (
            Aii[e] + _proll(Ajj[e], 1)
        ) * w_chain
        big_ref[72 + 8 * e : 72 + 8 * (e + 1)] = Aij[e] * w_chain
    for a in range(3):
        big_ref[144 + 8 * a : 144 + 8 * (a + 1)] = (
            gi[a] + _proll(gj[a], 1)
        ) * w_chain

    tall_rows = 12 * Q * 128 // L
    if tiles_per_dev:
        p_src = _p_tall(xi) if win else _hi_lo(_p_tall(xi), 3)

        def tile_body(t, Dg):
            idx = eidx_ref[0:1, pl.ds(t * 2 * tile, 2 * tile)]
            if win:
                q0i = q0_ref[0, t]
                q0j = q0_ref[1, t]
                ohr, qsel = _tile_qr_win(idx, q0i, q0j, win, tile, dtype)
                parts = _hi_lo(_win_parts(p_src, 3, Q, win, q0i, q0j), 3)
                pg = _gather2(parts, ohr, qsel, 3, 2 * win, dtype)
            else:
                ohr, qsel = _tile_qr(idx, Q, dtype)
                pg = _gather2(p_src, ohr, qsel, 3, Q, dtype)
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
            for a in range(9):
                aij_ref[a : a + 1, pl.ds(t * tile, tile)] = Aij_t[a]
            C = jnp.concatenate(
                [jnp.concatenate([Aii_t[e], Ajj_t[e]], axis=1)
                 for e in range(9)]
                + [jnp.concatenate([gi_t[a], gj_t[a]], axis=1)
                   for a in range(3)],
                axis=0,
            )
            contrib = _scatter2(C, ohr, qsel, dtype)
            if win:
                return _acc_win_add(Dg, contrib, 12, Q, win, q0i, q0j)
            return Dg + contrib

        Dg = jax.lax.fori_loop(
            0, nt_local, tile_body, jnp.zeros((12 * Q, 128), dtype)
        )
    else:
        Dg = jnp.zeros((12 * Q, 128), dtype)
        aij_ref[:] = jnp.zeros_like(aij_ref)
    big_ref[168 : 168 + tall_rows] = Dg.reshape(tall_rows, L)


@partial(
    jax.jit,
    static_argnames=(
        "Q", "L", "tile", "tiles_per_dev", "huber_delta", "win",
        "interpret",
    ),
)
def stage_a(
    poses, cz, cR, eidx, eld, nt_local, w_chain, q0,
    *,
    Q: int, L: int, tile: int, tiles_per_dev: int, huber_delta: float,
    win: int, interpret: bool,
):
    """Fused stage A (see _stage_a_kernel): poses + edge data in, the
    pre-psum normal-equation payload and the per-tile Aij store out."""
    dtype = poses.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tall_rows = 12 * Q * 128 // L
    aij_cols = max(tiles_per_dev, 1) * tile
    return pl.pallas_call(
        partial(
            _stage_a_kernel, Q=Q, L=L, tile=tile,
            tiles_per_dev=tiles_per_dev, huber_delta=huber_delta, win=win,
        ),
        in_specs=[sspec, sspec, sspec] + [vspec] * 5,
        out_specs=(vspec, vspec),
        out_shape=(
            jax.ShapeDtypeStruct((168 + tall_rows, L), dtype),
            jax.ShapeDtypeStruct((9, aij_cols), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        name="dist_gn_stage_a",
    )(nt_local, w_chain, q0, poses, cz, cR, eidx, eld)


def _gn_setup_kernel(
    lam_ref,
    big_ref, poses_ref, pz_ref, pR_ref,
    dpl_ref, upl_ref, lpl_ref, afac_ref, gfac_ref, dinv_ref, b_ref,
    *,
    N: int, K: int, Q: int, L: int, eps: float,
):
    """Stage C of the distributed GN iteration, fused: combine the psummed
    normal equations, add priors + Marquardt damping + padding identity,
    build the plane sets, PCR-factor the chain preconditioner, and write
    everything in the packed row-block layout the CG-step kernel reads.
    As XLA op soup this (chiefly the K-level PCR factor and the plane
    packing concatenations) measured ~90 µs per GN iteration on m3500 —
    2/3 of the kernel-path fixed work."""
    dtype = big_ref.dtype
    lam = lam_ref[0, 0]

    Dq = [big_ref[8 * e : 8 * (e + 1)] for e in range(9)]
    Uq = [big_ref[72 + 8 * e : 72 + 8 * (e + 1)] for e in range(9)]
    gq = [big_ref[144 + 8 * a : 144 + 8 * (a + 1)] for a in range(3)]
    tall_rows = 12 * Q * 128 // L
    Dgf = _p_untall(
        big_ref[168 : 168 + tall_rows].reshape(12 * Q, 128), 12, L
    )
    Dq = [Dq[e] + Dgf[e] for e in range(9)]
    gq = [gq[a] + Dgf[9 + a] for a in range(3)]

    # priors (replicated): r = Log(z^-1 x), J = Jr^{-1}(r)
    xi = _c3(poses_ref[:])
    pz_c = _c3(pz_ref[:])
    pR_c = _c9(pR_ref[:])
    dp = _se2_between(*pz_c, *xi)
    rp = _se2_log(*dp)
    Jp = _se2_jr_inv(*rp)
    rpw = _m3_vec(pR_c, rp)
    Jpw = _m3_mul(pR_c, Jp)
    Ap = _m3_mul(_m3_T(Jpw), Jpw)
    gpr = _m3_Tvec(Jpw, rpw)
    Dq = [Dq[e] + Ap[e] for e in range(9)]
    gq = [gq[a] + gpr[a] for a in range(3)]

    nidx = (
        jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) * L
        + jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    )
    padrow = (nidx >= N).astype(dtype)
    Dq = [Dq[e] + (padrow if e in (0, 4, 8) else 0.0) for e in range(9)]
    Dq = [
        Dq[e] * (1.0 + lam) if e in (0, 4, 8) else Dq[e] for e in range(9)
    ]

    Dpl = _p_planes(Dq)
    Upl = _p_planes(Uq)
    Lpl = _p_lane_roll(_p_planes(_m3_T(Uq)), 1)
    A_steps, G_steps, DinvF = _p_pcr_factor(Dpl, Upl, Lpl, K, eps)

    def write_planes(ref, P, base=0):
        for d in range(3):
            for a in range(3):
                i = (base + d * 3 + a) * 8
                ref[i : i + 8] = P[d][a]

    write_planes(dpl_ref, Dpl)
    write_planes(upl_ref, Upl)
    write_planes(lpl_ref, Lpl)
    for k in range(K):
        write_planes(afac_ref, A_steps[k], base=k * 9)
        write_planes(gfac_ref, G_steps[k], base=k * 9)
    write_planes(dinv_ref, DinvF)
    for a in range(3):
        b_ref[8 * a : 8 * (a + 1)] = -gq[a]


@partial(
    jax.jit,
    static_argnames=("N", "K", "Q", "L", "eps", "interpret"),
)
def gn_setup(
    lam, big, poses, pz, pR,
    *, N: int, K: int, Q: int, L: int, eps: float, interpret: bool,
):
    """Fused stage C (see _gn_setup_kernel): psummed normal equations in,
    packed plane sets + PCR factors + rhs out. lam is the Marquardt
    damping (traced — (1, 1) f32)."""
    dtype = big.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_gn_setup_kernel, N=N, K=K, Q=Q, L=L, eps=eps),
        in_specs=[sspec] + [vspec] * 4,
        out_specs=(vspec,) * 7,
        out_shape=(
            jax.ShapeDtypeStruct((72, L), dtype),       # Dpl
            jax.ShapeDtypeStruct((72, L), dtype),       # Upl
            jax.ShapeDtypeStruct((72, L), dtype),       # Lpl
            jax.ShapeDtypeStruct((K * 72, L), dtype),   # A_steps
            jax.ShapeDtypeStruct((K * 72, L), dtype),   # G_steps
            jax.ShapeDtypeStruct((72, L), dtype),       # DinvF
            jax.ShapeDtypeStruct((24, L), dtype),       # b = -g
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        name="dist_gn_setup",
    )(lam, big, poses, pz, pR)


@partial(
    jax.jit,
    static_argnames=(
        "K", "Q", "L", "tile", "tiles_per_dev", "hvp_splits", "win",
        "interpret",
    ),
)
def cg_step(
    x, r, p, cap, scal, big,
    dpl, upl, lpl, afac, gfac, dinv, eidx, aij, nt_local, q0,
    *,
    K: int, Q: int, L: int, tile: int, tiles_per_dev: int,
    hvp_splits: int, win: int, interpret: bool,
):
    """One fused distributed-CG step (see module docstring).

    State arrays x/r/p/cap are (24, L); scal is (8, 128) with rz at [0,0]
    and s0 = p.chain_Ap at [0,1]; big is the PSUMMED (3Q+8, 128) from the
    previous step ([tile_Ap ; s1]). Returns the updated state plus the new
    UN-psummed partial to all-reduce. Inputs alias outputs (donated).
    """
    dtype = x.dtype
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        partial(
            _cg_step_kernel, K=K, Q=Q, L=L, tile=tile,
            tiles_per_dev=tiles_per_dev, hvp_splits=hvp_splits, win=win,
        ),
        in_specs=[sspec, sspec] + [vspec] * 14,
        out_specs=(vspec,) * 6,
        out_shape=(
            jax.ShapeDtypeStruct((24, L), dtype),       # x
            jax.ShapeDtypeStruct((24, L), dtype),       # r
            jax.ShapeDtypeStruct((24, L), dtype),       # p
            jax.ShapeDtypeStruct((24, L), dtype),       # chain_Ap
            jax.ShapeDtypeStruct((8, 128), dtype),      # scalars
            jax.ShapeDtypeStruct((3 * Q + 8, 128), dtype),  # psum payload
        ),
        # state arrays update in place (positions shift by the 2 SMEM args);
        # the dead psummed input recycles as the new psum payload buffer
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5},
        name="dist_cg_step",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(nt_local, q0, x, r, p, cap, scal, big,
      dpl, upl, lpl, afac, gfac, dinv, eidx, aij)
    return out
