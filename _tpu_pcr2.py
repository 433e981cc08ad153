import time
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

from graphslam_tpu.factors import from_dataset, chi2
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import fused_gn_solve
from graphslam_tpu.ops.gn6_kernel import fused_gn6_solve
from graphslam_tpu import metrics

print("devices:", jax.devices(), flush=True)

def run(tag, fn, poses0, graph, gt, iters, lv):
    t0 = time.time()
    out = fn(poses0, graph, iterations=iters, cg_iters=25, pcr_levels=lv)
    sync(out)
    print(f"{tag} K={lv}: compile+run {time.time()-t0:.1f}s", flush=True)
    c = float(chi2(out, graph)); a = float(metrics.ate(out, gt))
    ts = []
    for _ in range(3):
        t0 = time.time(); sync(fn(poses0, graph, iterations=iters, cg_iters=25, pcr_levels=lv)); ts.append(time.time()-t0)
    print(f"{tag} K={lv}: chi2={c:.1f} ate={a:.4f} {iters/min(ts):.1f} it/s", flush=True)

d = datasets.city10000()
g = from_dataset(d)
p0 = jnp.asarray(d["poses"]); gt = jnp.asarray(d["gt"])
for lv in [None, 6, 4]:
    run("city", fused_gn_solve, p0, g, gt, 20, lv)

d = datasets.sphere2500()
g = from_dataset(d)
p0 = jnp.asarray(d["poses"]); gt = jnp.asarray(d["gt"])
for lv in [None, 4]:
    run("sphere", fused_gn6_solve, p0, g, gt, 30, lv)
