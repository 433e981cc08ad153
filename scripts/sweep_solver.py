"""Solver config sweep on m3500: wall-clock per GN iteration and
chi2-after-20-iterations for (preconditioner, cg budget) combinations."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors import from_dataset, chi2
from graphslam_tpu.io import datasets
from graphslam_tpu.solver.lm import _gn_loop


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def main():
    data = datasets.m3500()
    graph = from_dataset(data)
    poses = jnp.asarray(data["poses"])
    combos = [
        ("jacobi", 50),
        ("jacobi", 10),
        ("tridiag", 5),
        ("tridiag", 10),
        ("tridiag", 25),
    ]
    for pre, cg in combos:
        cfg = SolverConfig(
            mode="pcg", cg_max_iterations=cg, cg_tol=1e-7, preconditioner=pre
        )
        out = _gn_loop(poses, graph, cfg, "pcg", 20)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = _gn_loop(poses, graph, cfg, "pcg", 20)
            sync(out)
            ts.append(time.perf_counter() - t0)
        e = float(chi2(out, graph))
        print(
            f"{pre:8s} cg={cg:3d}: {min(ts)/20*1e3:7.2f} ms/GN-iter  "
            f"chi2@20 {e:10.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
