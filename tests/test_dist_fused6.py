"""SE(3) distributed fused-math solver vs the SE(3) mega-kernel."""

import jax.numpy as jnp
import numpy as np

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors import chi2, from_dataset
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn6_kernel import fused_gn6_solve, fused_lm6_solve
from graphslam_tpu.parallel.dist import make_mesh
from graphslam_tpu.parallel.dist_fused6 import (
    dist_fused6_gn_solve,
    dist_fused6_lm_solve,
)


def _problem(n_rings=8, poses_per_ring=10, seed=27):
    data = datasets.sphere(
        n_rings=n_rings, poses_per_ring=poses_per_ring, radius=5.0, seed=seed
    )
    graph = from_dataset(data)
    return graph, jnp.asarray(data["poses"])


def test_dist_fused6_gn_matches_mega_kernel_and_mesh_sizes():
    graph, poses0 = _problem()
    cfg = SolverConfig(cg_max_iterations=12)
    out8 = np.asarray(dist_fused6_gn_solve(
        poses0, graph, make_mesh(num_devices=8), cfg, iterations=3
    ))
    out1 = np.asarray(dist_fused6_gn_solve(
        poses0, graph, make_mesh(num_devices=1), cfg, iterations=3
    ))
    np.testing.assert_allclose(out8, out1, atol=1e-4)
    ref = np.asarray(fused_gn6_solve(
        poses0, graph, iterations=3, cg_iters=12, interpret=True
    ))
    np.testing.assert_allclose(out8, ref, atol=5e-3)
    c_out = float(chi2(jnp.asarray(out8), graph))
    c_ref = float(chi2(jnp.asarray(ref), graph))
    assert abs(c_out - c_ref) < 1e-2 * max(c_ref, 1.0)


def test_dist_fused6_lm_matches_mega_kernel():
    graph, poses0 = _problem(n_rings=6, poses_per_ring=8, seed=5)
    cfg = SolverConfig(
        cg_max_iterations=10, use_huber_on_loops=True, huber_delta=1.0
    )
    out, (err, lam, n_acc) = dist_fused6_lm_solve(
        poses0, graph, make_mesh(num_devices=4), cfg, iterations=3
    )
    ref, rerr, rlam, rn_acc, _ = fused_lm6_solve(
        poses0, graph, iterations=3, cg_iters=10, huber_delta=1.0,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=8e-3)
    assert abs(float(err) - float(rerr)) < 1e-2 * max(float(rerr), 1.0)
    assert int(n_acc) == int(rn_acc)
