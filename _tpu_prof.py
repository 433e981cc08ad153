import time
import jax, jax.numpy as jnp
import numpy as np

def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

from graphslam_tpu.factors import from_dataset
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import fused_gn_solve

data = datasets.m3500()
graph = from_dataset(data)
poses0 = jnp.asarray(data["poses"])
print("devices:", jax.devices(), flush=True)

def run(tag, g, cg):
    t0 = time.time()
    sync(fused_gn_solve(poses0, g, iterations=50, cg_iters=cg))
    print(f"{tag}: compile+run {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(4):
        t0 = time.time(); sync(fused_gn_solve(poses0, g, iterations=50, cg_iters=cg)); ts.append(time.time()-t0)
    dt = min(ts)
    print(f"{tag}: {dt*1000/50:.3f} ms/GN-iter ({50/dt:.1f} it/s)", flush=True)
    return dt

run("full cg25", graph, 25)
run("full cg1", graph, 1)
import jax.numpy as jnp2
keep = jnp.arange(graph.num_edges) < graph.chain_prefix
gc = graph.replace(edge_mask=graph.edge_mask & keep)
run("chain-only cg25", gc, 25)
