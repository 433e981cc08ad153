"""Stage attribution for the fused GN mega-kernel (ops/gn_kernel.py).

The kernel runs K GN iterations in one launch, so per-stage cost is probed
by differencing whole-solve times across static-knob variants:

  full            — the bench configuration (cg_iters=C, full PCR)
  cg=0            — linearize + assembly + PCR factor + retract only
  cg=0,pcr=1      — same with a 1-level (truncated) PCR factorization
  chain-only      — full config on a graph with loop edges masked off
                    (tile sweeps skipped via the live-tile SMEM count)

Differences: full-(cg=0) = CG loop (C x (hvp + pcr_apply));
(cg=0)-(cg=0,pcr=1) ~ PCR factor levels; full-(chain-only) = all tile
sweeps (linearize scatter + C gathers/scatters in hvp).
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax.numpy as jnp
import numpy as np

from graphslam_tpu.factors import from_dataset
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import _fused_solve


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


import jax  # noqa: E402  (after sync def for clarity)


def time_variant(name, poses0, graph, iters, **kw):
    out, _ = _fused_solve(poses0, graph, iterations=iters, **kw)
    sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = _fused_solve(poses0, graph, iterations=iters, **kw)
        sync(out)
        ts.append(time.perf_counter() - t0)
    per = min(ts) / iters * 1e3
    print(f"{name:18s}: {per:7.3f} ms/GN-iter", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="m3500")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--cg", type=int, default=25)
    ap.add_argument("--edge-tile", type=int, default=256)
    ap.add_argument("--hvp-splits", type=int, default=2)
    ap.add_argument("--pcr-levels", type=int, default=None)
    args = ap.parse_args()

    data = getattr(datasets, args.dataset)()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    print(f"{args.dataset}: N={poses0.shape[0]} E={int(graph.edge_mask.sum())} "
          f"chain={graph.chain_prefix}", flush=True)

    kw = dict(edge_tile=args.edge_tile, hvp_splits=args.hvp_splits,
              pcr_levels=args.pcr_levels)
    full = time_variant("full", poses0, graph, args.iters,
                        cg_iters=args.cg, **kw)
    nocg = time_variant("cg=0", poses0, graph, args.iters, cg_iters=0, **kw)
    kw1 = dict(kw, pcr_levels=1)
    nocg1 = time_variant("cg=0,pcr=1", poses0, graph, args.iters,
                         cg_iters=0, **kw1)

    # chain-only: mask off every loop edge (live tile count drops to zero)
    c = graph.chain_prefix
    mask = graph.edge_mask.at[c:].set(False)
    gchain = graph.replace(edge_mask=mask)
    chain = time_variant("chain-only full", poses0, gchain, args.iters,
                         cg_iters=args.cg, **kw)

    print(f"\nCG loop ({args.cg} iters): {full - nocg:7.3f} ms "
          f"({(full - nocg) / max(args.cg, 1) * 1e3:6.1f} us/CG-iter)")
    print(f"PCR factor extra levels:  {nocg - nocg1:7.3f} ms")
    print(f"tile sweeps (all):        {full - chain:7.3f} ms")
    print(f"chain-only everything:    {chain:7.3f} ms")


if __name__ == "__main__":
    main()
