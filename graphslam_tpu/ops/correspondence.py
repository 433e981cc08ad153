"""Fused nearest-neighbor correspondence kernel (ICP inner loop).

The matcher needs, for every source point, the index and squared distance of
the nearest valid target point. The XLA path materializes the (P, P)
distance matrix in HBM between the compute and the argmin; this Pallas
kernel tiles source rows through VMEM and fuses distance computation, valid
masking, and the row argmin in one pass — the (P, P) matrix never leaves
the chip. P is the frontend's padded point budget (1152 = 9 sublane tiles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 128


def nearest_neighbors_reference(src, tgt, tgt_valid):
    """jnp reference: (P,2),(Q,2),(Q,) -> (nn_idx (P,), nn_d2 (P,)).

    Uses exact coordinate differences, NOT the ||a||^2+||b||^2-2ab matmul
    identity: on TPU that matmul runs at bf16 MXU precision by default and
    loses ~2 decimal digits (even producing negative distances), which is
    enough to flip nearest-neighbor decisions between close points.
    """
    dx = src[:, 0:1] - tgt[None, :, 0]
    dy = src[:, 1:2] - tgt[None, :, 1]
    d2 = dx * dx + dy * dy
    d2 = jnp.where(tgt_valid[None, :], d2, jnp.inf)
    idx = jnp.argmin(d2, axis=1)
    return idx.astype(jnp.int32), jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]


def _nn_kernel(sx_ref, sy_ref, tx_ref, ty_ref, tmask_ref, idx_ref, d2_ref):
    sx = sx_ref[:]          # (ROW_TILE, 1)
    sy = sy_ref[:]
    tx = tx_ref[:]          # (1, Q)
    ty = ty_ref[:]
    dx = sx - tx            # (ROW_TILE, Q) broadcast on VPU
    dy = sy - ty
    d2 = dx * dx + dy * dy
    big = jnp.asarray(jnp.inf, d2.dtype)
    d2 = jnp.where(tmask_ref[:] != 0, d2, big)
    idx_ref[:] = jnp.argmin(d2, axis=1, keepdims=True).astype(jnp.int32)
    d2_ref[:] = jnp.min(d2, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors(src, tgt, tgt_valid, interpret: bool = False):
    """Pallas path; same contract as nearest_neighbors_reference.

    `interpret=True` runs the kernel in interpreter mode (CPU tests).
    """
    P = src.shape[0]
    Q = tgt.shape[0]
    if P % ROW_TILE != 0:
        pad = (-P) % ROW_TILE
        src = jnp.pad(src, ((0, pad), (0, 0)))
    Pp = src.shape[0]

    sx = src[:, 0:1]
    sy = src[:, 1:2]
    tx = tgt[:, 0].reshape(1, Q)
    ty = tgt[:, 1].reshape(1, Q)
    tmask = tgt_valid.astype(jnp.int32).reshape(1, Q)

    grid = (Pp // ROW_TILE,)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Pp, 1), jnp.int32),
            jax.ShapeDtypeStruct((Pp, 1), src.dtype),
        ),
        interpret=interpret,
    )(sx, sy, tx, ty, tmask)
    return idx[:P, 0], d2[:P, 0]
