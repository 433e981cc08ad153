import sys, time
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

from graphslam_tpu.factors import from_dataset, chi2
from graphslam_tpu.io import datasets
from graphslam_tpu import metrics

which = sys.argv[1]
lv = int(sys.argv[2])
print("devices:", jax.devices(), flush=True)

if which == "city":
    from graphslam_tpu.ops.gn_kernel import fused_gn_solve as fn
    d = datasets.city10000(); iters = 20
else:
    from graphslam_tpu.ops.gn6_kernel import fused_gn6_solve as fn
    d = datasets.sphere2500(); iters = 30
g = from_dataset(d)
p0 = jnp.asarray(d["poses"]); gt = jnp.asarray(d["gt"])
t0 = time.time()
out = fn(p0, g, iterations=iters, cg_iters=25, pcr_levels=lv)
sync(out)
print(f"{which} K={lv}: compile+run {time.time()-t0:.1f}s", flush=True)
c = float(chi2(out, g)); a = float(metrics.ate(out, gt))
ts = []
for _ in range(3):
    t0 = time.time(); sync(fn(p0, g, iterations=iters, cg_iters=25, pcr_levels=lv)); ts.append(time.time()-t0)
print(f"{which} K={lv}: chi2={c:.1f} ate={a:.4f} {iters/min(ts):.1f} it/s", flush=True)
