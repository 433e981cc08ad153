"""On-device cost attribution for one GN iteration (m3500).

Times nested stages inside a lax.scan whose carry feeds the poses (defeating
loop-invariant hoisting) and whose output consumes every produced array
(defeating DCE). Differences between stages give honest per-stage costs.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from graphslam_tpu.factors import from_dataset
from graphslam_tpu.factors.linearize import linearize
from graphslam_tpu.io import datasets
from graphslam_tpu.solver import build_blocks
from graphslam_tpu.solver.normal_eq import _damped_diag, _block_inv, hvp
from graphslam_tpu.solver.tridiag import cr_factor, cr_solve, chain_offdiag


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def consume(tree):
    return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(tree))


def main():
    data = datasets.m3500()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    N = poses0.shape[0]

    def stage(level):
        def one(poses):
            lin = linearize(poses, graph)
            if level == 0:
                return consume(lin)
            sys = build_blocks(lin, graph, N)
            if level == 1:
                return consume(sys)
            damped = _damped_diag(sys, jnp.asarray(1e-4), True)
            if level == 2:
                return consume(damped) + consume(sys.g)
            U = chain_offdiag(sys.edges, sys.Aij, N)
            fac = cr_factor(damped, U)
            if level == 3:
                return consume(fac)
            x = cr_solve(fac, -sys.g)
            if level == 4:
                return consume(x)
            y = hvp(sys, damped, x)
            return consume(y)

        @partial(jax.jit, static_argnames=("n",))
        def rep(p, n):
            def body(c, _):
                return c + 1e-20 * one(p + c * 1e-20), None
            out, _ = jax.lax.scan(body, jnp.asarray(0.0), None, length=n)
            return out

        return rep

    names = ["linearize", "+build", "+damp", "+cr_factor", "+cr_solve", "+hvp"]
    prev = 0.0
    for lvl, name in enumerate(names):
        rep = stage(lvl)
        sync(rep(poses0, 5))
        t0 = time.perf_counter(); sync(rep(poses0, 5)); d1 = time.perf_counter() - t0
        sync(rep(poses0, 25))
        t0 = time.perf_counter(); sync(rep(poses0, 25)); d2 = time.perf_counter() - t0
        per = (d2 - d1) / 20 * 1e3
        print(f"{name:12s}: cumulative {per:7.3f} ms  (marginal {per - prev:+7.3f} ms)",
              flush=True)
        prev = per


if __name__ == "__main__":
    main()
