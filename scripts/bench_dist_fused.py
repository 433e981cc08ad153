"""Benchmark the distributed fused-math solver (parallel/dist_fused.py).

On the TPU host (1 chip): steady-state chained it/s for m3500 and
city10000 at devices=1 — the single-device overhead of the SPMD
decomposition vs the single-kernel gn_fused path.

On CPU (--cpu N): the same solve on an N-virtual-device mesh — the
multi-chip functional path; wall-clock scaling there is bounded by the
PHYSICAL core count (this container has 2), so efficiency is reported
against that ceiling too.

Writes one JSON object to stdout.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="run on CPU with this many virtual devices (0=TPU)")
    ap.add_argument("--configs", default="m3500,city10000")
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--chain", type=int, default=0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)
    import jax.numpy as jnp
    import numpy as np

    from graphslam_tpu import metrics
    from graphslam_tpu.config import SolverConfig
    from graphslam_tpu.factors import from_dataset, chi2
    from graphslam_tpu.io import datasets
    from graphslam_tpu.ops.bucketize import bucketize_loops
    from graphslam_tpu.parallel.dist import make_mesh
    from graphslam_tpu.parallel.dist_fused import dist_fused_gn_solve

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    tile = 256 if not args.cpu else 128
    specs = {
        "m3500": (datasets.m3500, 50, 10,
                  SolverConfig(cg_max_iterations=25, pcr_levels=4,
                               edge_tile=tile, hvp_splits=1)),
        "city10000": (datasets.city10000, 20, 4,
                      SolverConfig(cg_max_iterations=50, pcr_levels=4,
                                   edge_tile=tile, hvp_splits=1)),
    }

    out = {"devices": [str(d) for d in jax.devices()]}
    dev_counts = sorted({1, len(jax.devices())})
    for name in args.configs.split(","):
        ds, iters, chain, cfg = specs[name]
        if args.iters:
            iters = args.iters
        if args.chain:
            chain = args.chain
        data = ds()
        graph = from_dataset(data)
        if args.cpu:
            # page windows pay ONLY on CPU XLA (measured: 3.9x there, 5x
            # slower on TPU XLA, neutral on the Pallas kernels)
            graph = bucketize_loops(graph, page_window=8, tile=tile)
        poses0 = jnp.asarray(data["poses"])
        gt = jnp.asarray(data["gt"])
        # Steady-state methodology: chaining solves in a lax.scan (bench.py
        # style) compiles pathologically slowly around shard_map on the
        # relay, so run ONE dispatch with chain*iters GN iterations inside
        # the solver's own fori_loop instead (same amortization: device time
        # >> the ~27 ms relay floor) and subtract the floor.
        long_iters = chain * iters
        row = {}
        for nd in dev_counts:
            mesh = make_mesh(num_devices=nd)
            t0 = time.perf_counter()
            res = np.asarray(
                dist_fused_gn_solve(poses0, graph, mesh, cfg,
                                    iterations=long_iters)
            )
            log(f"{name} nd={nd}: compile+run {time.perf_counter()-t0:.1f}s")
            ate = float(metrics.ate(jnp.asarray(res), gt))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(
                    dist_fused_gn_solve(poses0, graph, mesh, cfg,
                                        iterations=long_iters)
                )
                ts.append(time.perf_counter() - t0)
            floor = 0.0265 if not args.cpu else 0.0
            r = long_iters / max(min(ts) - floor, 1e-9)
            log(f"{name} nd={nd}: {r:.1f} it/s ({long_iters}-iter ATE {ate:.3f})")
            row[f"devices_{nd}"] = round(r, 2)
            row["ate"] = round(ate, 4)
            row["chi2"] = round(float(chi2(jnp.asarray(res), graph)), 1)
        if len(dev_counts) > 1:
            nd = dev_counts[-1]
            row["scaling_efficiency"] = round(
                row[f"devices_{nd}"] / (row["devices_1"] * nd), 3
            )
        out[name] = row
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
