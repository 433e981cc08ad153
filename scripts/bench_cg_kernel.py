"""TPU A/B: dist_fused CG loop — XLA op soup vs the fused CG-step kernel.

Measures dist_fused_gn_solve on m3500 at 1 device (the environment's real
chip) with cg_kernel False/True at the bench_all config, plus a cg=0 run
to difference out the GN fixed work (the round-5 per-stage methodology of
scripts/profile_dist_fused.py). One TPU process at a time (CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu import metrics
from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors import from_dataset
from graphslam_tpu.io import datasets
from graphslam_tpu.parallel import make_mesh
from graphslam_tpu.parallel.dist_fused import dist_fused_gn_solve


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def time_fn(fn, *args, reps=3, **kw):
    sync(fn(*args, **kw))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args, **kw))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    print("backend:", jax.default_backend())
    data = datasets.m3500()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    gt = jnp.asarray(data["gt"])
    mesh = make_mesh(num_devices=1)
    iters = 200
    for cg in (25, 0):
        cfg = SolverConfig(cg_max_iterations=cg, pcr_levels=4,
                           edge_tile=512, hvp_splits=1)
        for ck in (False, True):
            out = dist_fused_gn_solve(
                poses0, graph, mesh, cfg, iterations=iters, cg_kernel=ck
            )
            ate = float(metrics.ate(out, gt))
            dt = time_fn(dist_fused_gn_solve, poses0, graph, mesh, cfg,
                         iters, cg_kernel=ck)
            print(f"cg={cg} cg_kernel={ck}: {iters/dt:.1f} it/s "
                  f"({dt/iters*1e6:.1f} us/GN-iter)  ATE {ate:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
