"""Per-stage attribution for the SPMD fused-math solver (VERDICT r4 #3).

Where does parallel/dist_fused.py's 1-device overhead vs ops/gn_kernel.py
go on m3500? Stage costs are separated by config differencing — the same
methodology profile_fused.py used for the kernel:

  * CG-loop cost/iter:     d t / d cg_iters               (cg 10 vs 50)
  * GN fixed cost/iter:    t(cg=0) / iterations           (linearize +
                           assembly + normal-eq psum + PCR factor + retract)
  * tile-matvec share:     hvp_splits 2 -> 1 (halves the gather/scatter
                           MXU work in the CG matvec)
  * preconditioner share:  pcr_levels 4 (slab) vs None (replicated exact)

Each (dataset, variant) is one jit signature; the relay charges 30-90 s
per compile, so the matrix is kept small. Run serialized with any other
TPU job (CLAUDE.md).

Usage: python scripts/profile_dist_fused.py [m3500|city10000]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def sync(x):
    return np.asarray(x).ravel()[:1]


def time_fn(fn, *args, reps=3):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from graphslam_tpu.config import SolverConfig
    from graphslam_tpu.factors import from_dataset
    from graphslam_tpu.io import datasets
    from graphslam_tpu.ops.gn_kernel import fused_gn_solve
    from graphslam_tpu.parallel import make_mesh
    from graphslam_tpu.parallel.dist_fused import dist_fused_gn_solve

    name = sys.argv[1] if len(sys.argv) > 1 else "m3500"
    data = getattr(datasets, name)()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    mesh = make_mesh(num_devices=1)
    iters = 50

    base = dict(pcr_levels=4, edge_tile=512, hvp_splits=1)

    def t_dist(cg, **over):
        kw = dict(base, **over)
        cfg = SolverConfig(cg_max_iterations=cg, **kw)
        return time_fn(
            dist_fused_gn_solve, poses0, graph, mesh, cfg, iters
        )

    def t_kern(cg, **over):
        kw = dict(base, **over)
        return time_fn(
            lambda p: fused_gn_solve(
                p, graph, iterations=iters, cg_iters=cg,
                pcr_levels=kw["pcr_levels"], edge_tile=kw["edge_tile"],
                hvp_splits=kw["hvp_splits"],
            ),
            poses0,
        )

    rows = {}
    for label, f in (("dist", t_dist), ("kernel", t_kern)):
        t50 = f(50)
        t10 = f(10)
        t0 = f(0)
        cg_per = (t50 - t10) / 40 / iters
        fixed = t0 / iters
        rows[label] = dict(t50=t50, t10=t10, t0=t0, cg_per=cg_per,
                           fixed=fixed)
        log(f"{label:7s} t(cg50)={t50*1e3:8.1f} ms t(cg10)={t10*1e3:8.1f} "
            f"t(cg0)={t0*1e3:8.1f} | CG {cg_per*1e6:7.1f} us/iter, "
            f"GN-fixed {fixed*1e6:7.1f} us/iter "
            f"-> {iters/t50:7.1f} it/s @cg50")

    # decompose the dist CG iteration: matvec width + preconditioner
    t_s2 = t_dist(50, hvp_splits=2)
    log(f"dist hvp_splits=2: t(cg50)={t_s2*1e3:8.1f} ms "
        f"(+{(t_s2-rows['dist']['t50'])*1e6/50/iters:6.1f} us/CG-iter for "
        f"the second hi/lo matvec pass)")
    t_rep = t_dist(50, pcr_levels=None)
    log(f"dist pcr exact (replicated precond): t(cg50)={t_rep*1e3:8.1f} ms "
        f"(delta {(t_rep-rows['dist']['t50'])*1e3:7.1f} ms total)")

    gap = rows["dist"]["t50"] / rows["kernel"]["t50"]
    log(f"1-device gap dist/kernel @cg50: {gap:.2f}x "
        f"(CG-iter gap {rows['dist']['cg_per']/rows['kernel']['cg_per']:.2f}x, "
        f"GN-fixed gap {rows['dist']['fixed']/rows['kernel']['fixed']:.2f}x)")


if __name__ == "__main__":
    main()
