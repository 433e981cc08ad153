"""Distributed fused-math solver vs the single-kernel mega-kernel.

The round-4 centerpiece contract (VERDICT r3 #1): the multi-chip path must
run the SAME math as ops/gn_kernel.py — on the virtual 8-device mesh the
trajectory must match gn_fused/fused_lm (chi2/ATE), and the result must be
independent of the mesh size (deterministic psum tree on identical data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors import chi2, from_dataset
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import fused_gn_solve, fused_lm_solve
from graphslam_tpu.parallel.dist import make_mesh
from graphslam_tpu.parallel.dist_fused import (
    dist_fused_gn_solve,
    dist_fused_lm_solve,
)


def _problem(n_poses=300, seed=4, loop_prob=0.3):
    data = datasets.manhattan(n_poses=n_poses, seed=seed, loop_prob=loop_prob)
    graph = from_dataset(data)
    return graph, jnp.asarray(data["poses"])


def test_dist_fused_gn_matches_mega_kernel_8dev():
    graph, poses0 = _problem()
    cfg = SolverConfig(cg_max_iterations=15)
    mesh = make_mesh(num_devices=8)
    out = np.asarray(dist_fused_gn_solve(poses0, graph, mesh, cfg, iterations=4))
    ref = np.asarray(
        fused_gn_solve(poses0, graph, iterations=4, cg_iters=15, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-3)
    c_out = float(chi2(jnp.asarray(out), graph))
    c_ref = float(chi2(jnp.asarray(ref), graph))
    assert abs(c_out - c_ref) < 1e-2 * max(c_ref, 1.0)


def test_dist_fused_gn_mesh_size_invariant():
    graph, poses0 = _problem()
    cfg = SolverConfig(cg_max_iterations=15)
    outs = []
    for nd in (1, 2, 8):
        mesh = make_mesh(num_devices=nd)
        outs.append(
            np.asarray(dist_fused_gn_solve(poses0, graph, mesh, cfg, iterations=3))
        )
    # identical data + deterministic reduction: tight match across mesh sizes
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


def test_dist_fused_lm_matches_mega_kernel():
    graph, poses0 = _problem()
    cfg = SolverConfig(
        cg_max_iterations=15, use_huber_on_loops=True, huber_delta=1.0
    )
    mesh = make_mesh(num_devices=8)
    out, (err, lam, n_acc) = dist_fused_lm_solve(
        poses0, graph, mesh, cfg, iterations=5
    )
    ref, rerr, rlam, rn_acc, _ = fused_lm_solve(
        poses0, graph, iterations=5, cg_iters=15, huber_delta=1.0,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)
    assert abs(float(err) - float(rerr)) < 1e-2 * max(float(rerr), 1.0)
    assert int(n_acc) == int(rn_acc)


def test_dist_fused_gn_truncated_pcr_and_masks():
    # masked edges + truncated PCR must behave exactly like the mega-kernel
    data = datasets.manhattan(n_poses=200, seed=7, loop_prob=0.25)
    graph = from_dataset(data)
    # mask off a third of the loop edges (online-graph style)
    c = graph.chain_prefix
    E = graph.edges.shape[0]
    mask = np.array(graph.edge_mask)
    loop_ids = np.arange(c, E)
    mask[loop_ids[:: 3]] = False
    graph = graph.replace(edge_mask=jnp.asarray(mask))
    poses0 = jnp.asarray(data["poses"])
    cfg = SolverConfig(cg_max_iterations=12, pcr_levels=3)
    mesh = make_mesh(num_devices=4)
    out = np.asarray(dist_fused_gn_solve(poses0, graph, mesh, cfg, iterations=3))
    ref = np.asarray(fused_gn_solve(
        poses0, graph, iterations=3, cg_iters=12, pcr_levels=3, interpret=True
    ))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_dist_fused_rejects_se3():
    graph, poses0 = _problem(n_poses=100, seed=1)
    bad = jnp.zeros((100, 12))
    with pytest.raises(ValueError):
        dist_fused_gn_solve(bad, graph, make_mesh(num_devices=1))


def test_dist_fused_gn_page_windowed_matches_plain():
    # bucketized graphs (page-windowed tiles, ops/bucketize.py) shard their
    # window metadata with the tiles and must match the plain path
    from graphslam_tpu.ops.bucketize import bucketize_loops

    data = datasets.manhattan(n_poses=900, seed=4, loop_prob=0.5)
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    cfg = SolverConfig(cg_max_iterations=15, edge_tile=128)
    mesh = make_mesh(num_devices=8)
    ref = np.asarray(dist_fused_gn_solve(poses0, graph, mesh, cfg, iterations=4))
    gb = bucketize_loops(graph, page_window=2, tile=128)
    out = np.asarray(dist_fused_gn_solve(poses0, gb, mesh, cfg, iterations=4))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_dist_fused_slab_pcr_mesh_invariant():
    # v2 slab-PCR: with truncated PCR the preconditioner factor/apply and
    # chain H@v run per lane slab + halo; results must agree across mesh
    # sizes AND with the mega-kernel (the halo makes the slab apply exact).
    from graphslam_tpu.parallel import dist_fused as df

    data = datasets.manhattan(n_poses=500, seed=11, loop_prob=0.3)
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    cfg = SolverConfig(cg_max_iterations=15, pcr_levels=3)
    # slab gate must engage for this shape (L=128, H=16)
    L = 1024 // 8
    assert (L // 8 + 2 * (2 << 3)) <= L
    outs = {}
    for nd in (2, 8):
        mesh = make_mesh(num_devices=nd)
        outs[nd] = np.asarray(
            dist_fused_gn_solve(poses0, graph, mesh, cfg, iterations=4)
        )
    np.testing.assert_allclose(outs[2], outs[8], atol=1e-4)
    ref = np.asarray(fused_gn_solve(
        poses0, graph, iterations=4, cg_iters=15, pcr_levels=3,
        interpret=True,
    ))
    np.testing.assert_allclose(outs[8], ref, atol=2e-3)


def test_dist_fused_cg_kernel_matches_xla_loop():
    """Round-5 fused CG-step kernel (parallel/cg_step.py): one Pallas
    launch + one psum per CG iteration must reproduce the XLA CG loop —
    same update/preconditioner/matvec math, so the trajectories agree to
    f32 roundoff. Covers the GN path and the masked/truncated-PCR combo."""
    graph, poses0 = _problem()
    # pcr_levels capped: the K-level PCR factor inside the interpret-mode
    # gn_setup kernel compiles superlinearly in K on CPU (27 s at K=3,
    # minutes at the exact K=9) — quality-irrelevant for this equivalence
    # check, both paths run the same K.
    cfg = SolverConfig(cg_max_iterations=12, pcr_levels=3)
    mesh = make_mesh(num_devices=8)
    ref = np.asarray(
        dist_fused_gn_solve(
            poses0, graph, mesh, cfg, iterations=3, cg_kernel=False
        )
    )
    out = np.asarray(
        dist_fused_gn_solve(
            poses0, graph, mesh, cfg, iterations=3, cg_kernel=True
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_dist_fused_cg_kernel_lm_and_mesh_invariance():
    graph, poses0 = _problem(n_poses=200, seed=9)
    cfg = SolverConfig(
        cg_max_iterations=10, use_huber_on_loops=True, huber_delta=1.0,
        pcr_levels=3,
    )
    outs = []
    for nd in (1, 4):
        mesh = make_mesh(num_devices=nd)
        out, (err, lam, n_acc) = dist_fused_lm_solve(
            poses0, graph, mesh, cfg, iterations=3, cg_kernel=True
        )
        outs.append((np.asarray(out), float(err), int(n_acc)))
    # replicated CG state is bit-identical across mesh sizes; only the
    # tile psum order varies
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    mesh = make_mesh(num_devices=4)
    ref, (rerr, _, rn_acc) = dist_fused_lm_solve(
        poses0, graph, mesh, cfg, iterations=3, cg_kernel=False
    )
    np.testing.assert_allclose(outs[1][0], np.asarray(ref), atol=1e-3)
    assert outs[1][2] == int(rn_acc)
