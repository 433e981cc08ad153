"""Page-windowed loop-edge bucketing for the fused SE(2) kernels.

The mega-kernels' loop-edge sweeps gather/scatter through the tall
(A*Q, 128) layout with Q = Npad/128 pages; every tile pays MXU work
proportional to Q even though its 2*tile endpoints touch only a few pages.
On city10000 (Q=80, 1.04 loops/pose) these sweeps are ~69% of a GN
iteration at ~37% of MXU peak (scripts/profile_fused.py, ROADMAP.md).

This module reorders the loop edges HOST-SIDE (concrete numpy — tracing
cannot sort by value) into (i-page-window, j-page-window) buckets of
`page_window` pages each, padding every bucket to a tile multiple with
masked dummy edges whose endpoints stay in-window. Each edge tile then
touches exactly TWO windows (one per endpoint half), and the kernels
gather/scatter over 2*page_window pages instead of Q: measured model on
the city10000 generator, Wb=8/tile=256 cuts the sweep MXU cost ~6x at
1.65x tile padding.

The window metadata rides ON the FactorGraph (tile_page0 + page_window
fields) so every solver entry point downstream picks it up without
plumbing changes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from graphslam_tpu.factors.graph import FactorGraph


def bucketize_loops(
    graph: FactorGraph,
    page_window: int = 8,
    tile: int = 256,
    n_poses: int | None = None,
) -> FactorGraph:
    """Reorder the loop edges of `graph` into page-window buckets.

    Must be called OUTSIDE jit on a concrete graph. Returns a new
    FactorGraph whose loop edges (indices >= chain_prefix) are
    bucket-ordered with per-bucket masked padding, and whose
    tile_page0/page_window fields carry the window map for the kernels.
    Masked (dead) loop edges are dropped — bucketization is for batch
    solves on fully-live graphs; the online pipeline keeps the contiguous
    live-slot layout instead.
    """
    c = graph.chain_prefix
    edges = np.asarray(graph.edges)
    meas = np.asarray(graph.measurements)
    sq = np.asarray(graph.sqrt_info)
    emask = np.asarray(graph.edge_mask)
    iloop = np.asarray(graph.is_loop)

    le = edges[c:]
    lm_ = emask[c:]
    live = np.flatnonzero(lm_)
    le = le[live]
    span = 128 * page_window
    bi = le[:, 0] // span
    bj = le[:, 1] // span
    key = bi.astype(np.int64) * (1 << 32) + bj.astype(np.int64)
    order = np.argsort(key, kind="stable")
    le_s = le[order]
    key_s = key[order]

    # per-bucket padded segments
    uniq, starts, counts = np.unique(
        key_s, return_index=True, return_counts=True
    )
    out_rows = []
    q0_list = []
    for u, s0, cnt in zip(uniq, starts, counts):
        n_t = -(-int(cnt) // tile)
        pad = n_t * tile - int(cnt)
        seg = np.arange(s0, s0 + cnt)
        out_rows.append(seg)
        if pad:
            out_rows.append(np.full(pad, -1 - int(s0), np.int64))
        q0i = int(u >> 32) * page_window
        q0j = int(u & 0xFFFFFFFF) * page_window
        q0_list += [(q0i, q0j)] * n_t
    sel = np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64)
    n_tiles = len(q0_list)

    E_new = len(sel)
    pad_mask = sel < 0
    # padding rows reference the bucket's first edge (valid in-window
    # indices) but are masked out
    src = np.where(pad_mask, -(sel + 1), sel)
    new_e = le_s[src] if E_new else np.zeros((0, 2), edges.dtype)
    new_m = meas[c:][live][order][src] if E_new else meas[:0]
    new_s = sq[c:][live][order][src] if E_new else sq[:0]
    new_mask = ~pad_mask

    return graph.replace(
        edges=jnp.asarray(np.concatenate([edges[:c], new_e], axis=0)),
        measurements=jnp.asarray(np.concatenate([meas[:c], new_m], axis=0)),
        sqrt_info=jnp.asarray(np.concatenate([sq[:c], new_s], axis=0)),
        edge_mask=jnp.asarray(
            np.concatenate([emask[:c], new_mask], axis=0)
        ),
        is_loop=jnp.asarray(np.concatenate(
            [iloop[:c], np.ones(E_new, bool)], axis=0
        )),
        tile_page0=jnp.asarray(
            np.asarray(q0_list, np.int32).T.reshape(2, max(n_tiles, 1))
            if n_tiles else np.zeros((2, 1), np.int32)
        ),
        page_window=page_window,
    )
