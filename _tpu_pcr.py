import time
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

from graphslam_tpu.factors import from_dataset, chi2
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import fused_gn_solve
from graphslam_tpu import metrics

data = datasets.m3500()
graph = from_dataset(data)
poses0 = jnp.asarray(data["poses"])
gt = jnp.asarray(data["gt"])
print("devices:", jax.devices(), flush=True)

for lv in [12, 8, 6, 4]:
    t0 = time.time()
    out = fused_gn_solve(poses0, graph, iterations=50, cg_iters=25, pcr_levels=lv)
    sync(out)
    print(f"K={lv}: compile+run {time.time()-t0:.1f}s", flush=True)
    c = float(chi2(out, graph)); a = float(metrics.ate(out, gt))
    ts = []
    for _ in range(3):
        t0 = time.time(); sync(fused_gn_solve(poses0, graph, iterations=50, cg_iters=25, pcr_levels=lv)); ts.append(time.time()-t0)
    dt = min(ts)
    print(f"K={lv}: chi2={c:.1f} ate={a:.4f} {50/dt:.1f} it/s", flush=True)
