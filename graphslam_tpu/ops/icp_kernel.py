"""Fully fused GICP iteration kernel.

One Pallas pass per IRLS iteration computes, for a tile of source points:
nearest valid target (exact distances), the matched target's position AND
surfel covariance WITHOUT dynamic gathers (an exact one-hot matmul against a
packed (Q, 6) target table — MXU work), the 2x2 Mahalanobis weighting, and
the reduction of the 3-dof normal equations H (3x3), g (3) and the match
statistics — all without the (P, Q) distance matrix, the (P,) index vector,
or any per-point intermediate ever leaving VMEM.

The XLA path in frontend/icp.py does the same math in ~30 separate HLO ops
per iteration; on the op-overhead-bound TPU path this kernel collapses them
to one. Packed per-tile outputs: [H(6 upper), g(3), sum_d2_all, sum_d2_gated,
n_match, sum_mahal, 0...] (16 lanes); the caller sums tiles and solves 3x3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128
OUT_LANES = 16


def _kernel(moved_ref, jth_ref, smask_ref, tx_ref, ty_ref, tvalid_ref,
            table_ref, csr_ref, out_ref, *, G: int, max_corr2: float,
            eps: float):
    """Single program; fori_loop over ROW_TILE tiles with 13 scalar
    accumulators (mosaic requires output blocks tiled (8,128), so the packed
    result is written into row 0 of an (8,128) block)."""
    Q = tx_ref.shape[1]

    def tile(i, acc):
        sl = pl.ds(i * ROW_TILE, ROW_TILE)
        mx = moved_ref[sl, 0:1]          # (T, 1) — everything stays 2D for
        my = moved_ref[sl, 1:2]          # mosaic-friendly layouts
        dx = mx - tx_ref[:]              # (T, Q)
        dy = my - ty_ref[:]
        d2 = dx * dx + dy * dy
        big = jnp.asarray(3.4e38, d2.dtype)
        d2 = jnp.where(tvalid_ref[:] != 0, d2, big)
        min_d2 = jnp.min(d2, axis=1, keepdims=True)      # (T, 1)
        nn = jnp.argmin(d2, axis=1, keepdims=True)       # (T, 1)

        # Exact one-hot of the argmin column -> matched target row of the
        # packed table [x, y, c11, c12, c22, 0] via one MXU matmul.
        col = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, Q), 1)
        onehot = (col == nn).astype(d2.dtype)
        matched = jnp.dot(onehot, table_ref[:], preferred_element_type=d2.dtype)
        qx, qy = matched[:, 0:1], matched[:, 1:2]        # (T, 1)
        ct11, ct12, ct22 = matched[:, 2:3], matched[:, 3:4], matched[:, 4:5]

        smask = smask_ref[sl, 0:1]                        # (T, 1)
        valid_any = (min_d2 < big * 0.5) & (smask != 0)
        w = valid_any & (min_d2 <= max_corr2)
        wf = w.astype(d2.dtype)
        wall = (smask != 0).astype(d2.dtype)

        c11 = ct11 + csr_ref[sl, 0:1] + eps
        c12 = ct12 + csr_ref[sl, 1:2]
        c22 = ct22 + csr_ref[sl, 2:3] + eps
        det = c11 * c22 - c12 * c12
        det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
        m11 = c22 / det
        m12 = -c12 / det
        m22 = c11 / det

        ex = qx - mx
        ey = qy - my
        jx = jth_ref[sl, 0:1]
        jy = jth_ref[sl, 1:2]
        me1 = m11 * ex + m12 * ey
        me2 = m12 * ex + m22 * ey

        d2c = jnp.minimum(min_d2, 1e9)
        zero_col = jnp.zeros((ROW_TILE, 1), d2.dtype)
        cols = jnp.concatenate(
            [
                wf * m11,
                wf * m12,
                wf * m22,
                wf * (m11 * jx + m12 * jy),
                wf * (m12 * jx + m22 * jy),
                wf * (jx * jx * m11 + 2.0 * jx * jy * m12 + jy * jy * m22),
                wf * me1,
                wf * me2,
                wf * (jx * me1 + jy * me2),
                wall * d2c,
                wf * d2c,
                wf,
                wf * (ex * me1 + ey * me2),
                zero_col, zero_col, zero_col,
            ],
            axis=1,
        )                                                 # (T, 16)
        return acc + jnp.sum(cols, axis=0, keepdims=True)  # (1, 16)

    acc = jax.lax.fori_loop(
        0, G, tile, jnp.zeros((1, OUT_LANES), moved_ref.dtype)
    )
    # Scalars land in SMEM (VMEM cannot take scalar stores on TPU).
    for k in range(OUT_LANES):
        out_ref[k] = acc[0, k]


@partial(jax.jit, static_argnames=("max_corr2", "eps", "interpret"))
def fused_icp_iteration(
    moved: jnp.ndarray,      # (P, 2) source points in the current estimate
    jtheta: jnp.ndarray,     # (P, 2) dR/dtheta @ src
    src_mask: jnp.ndarray,   # (P,)
    tgt: jnp.ndarray,        # (Q, 2)
    tgt_valid: jnp.ndarray,  # (Q,)
    Ct: jnp.ndarray,         # (Q, 2, 2) target surfel covariances
    Csr: jnp.ndarray,        # (P, 3) rotated source covariances [c11, c12, c22]
    max_corr2: float,
    eps: float,
    interpret: bool = False,
):
    """Returns (H (3,3), g (3,), stats (4,)): the per-iteration normal
    equations and [sum_d2_all, sum_d2_gated, n_match, sum_mahal]."""
    P, Q = moved.shape[0], tgt.shape[0]
    pad = (-P) % ROW_TILE
    if pad:
        moved = jnp.pad(moved, ((0, pad), (0, 0)))
        jtheta = jnp.pad(jtheta, ((0, pad), (0, 0)))
        src_mask = jnp.pad(src_mask, (0, pad))
        Csr = jnp.pad(Csr, ((0, pad), (0, 0)))
    Pp = moved.shape[0]
    G = Pp // ROW_TILE

    table = jnp.concatenate(
        [tgt, Ct[:, 0, 0:1], Ct[:, 0, 1:2], Ct[:, 1, 1:2],
         jnp.zeros((Q, 1), tgt.dtype)],
        axis=1,
    )  # (Q, 6)
    smask2 = src_mask.astype(jnp.int32)[:, None]

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, G=G, max_corr2=max_corr2, eps=eps),
        in_specs=[vspec() for _ in range(8)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((OUT_LANES,), moved.dtype),
        interpret=interpret,
    )(
        moved, jtheta, smask2,
        tgt[:, 0].reshape(1, Q), tgt[:, 1].reshape(1, Q),
        tgt_valid.astype(jnp.int32).reshape(1, Q),
        table, Csr,
    )
    acc = out
    H = jnp.array(
        [[acc[0], acc[1], acc[3]],
         [acc[1], acc[2], acc[4]],
         [acc[3], acc[4], acc[5]]]
    )
    g = acc[6:9]
    stats = acc[9:13]
    return H, g, stats


def fused_icp_iteration_reference(
    moved, jtheta, src_mask, tgt, tgt_valid, Ct, Csr, max_corr2, eps
):
    """Pure-jnp reference with identical semantics (tests)."""
    dx = moved[:, 0:1] - tgt[None, :, 0]
    dy = moved[:, 1:2] - tgt[None, :, 1]
    d2 = dx * dx + dy * dy
    big = jnp.asarray(3.4e38, d2.dtype)
    d2 = jnp.where(tgt_valid[None, :], d2, big)
    nn = jnp.argmin(d2, axis=1)
    min_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
    q = tgt[nn]
    Ctn = Ct[nn]

    valid_any = (min_d2 < big * 0.5) & src_mask
    w = valid_any & (min_d2 <= max_corr2)
    wf = w.astype(d2.dtype)
    wall = src_mask.astype(d2.dtype)

    c11 = Ctn[:, 0, 0] + Csr[:, 0] + eps
    c12 = Ctn[:, 0, 1] + Csr[:, 1]
    c22 = Ctn[:, 1, 1] + Csr[:, 2] + eps
    det = c11 * c22 - c12 * c12
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    m11, m12, m22 = c22 / det, -c12 / det, c11 / det

    ex = q[:, 0] - moved[:, 0]
    ey = q[:, 1] - moved[:, 1]
    jx, jy = jtheta[:, 0], jtheta[:, 1]
    me1 = m11 * ex + m12 * ey
    me2 = m12 * ex + m22 * ey

    H = jnp.array(
        [
            [jnp.sum(wf * m11), jnp.sum(wf * m12),
             jnp.sum(wf * (m11 * jx + m12 * jy))],
            [jnp.sum(wf * m12), jnp.sum(wf * m22),
             jnp.sum(wf * (m12 * jx + m22 * jy))],
            [jnp.sum(wf * (m11 * jx + m12 * jy)),
             jnp.sum(wf * (m12 * jx + m22 * jy)),
             jnp.sum(wf * (jx * jx * m11 + 2 * jx * jy * m12 + jy * jy * m22))],
        ]
    )
    g = jnp.array(
        [jnp.sum(wf * me1), jnp.sum(wf * me2),
         jnp.sum(wf * (jx * me1 + jy * me2))]
    )
    d2c = jnp.minimum(min_d2, 1e9)
    stats = jnp.array(
        [jnp.sum(wall * d2c), jnp.sum(wf * d2c), jnp.sum(wf),
         jnp.sum(wf * (ex * me1 + ey * me2))]
    )
    return H, g, stats
