"""Fused GN kernel (interpret mode) vs the XLA linearize+PCG+retract path."""

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu.config import SolverConfig
from graphslam_tpu.factors import from_dataset
from graphslam_tpu.factors.linearize import chi2, linearize
from graphslam_tpu.geometry import se2
from graphslam_tpu.io import datasets
from graphslam_tpu.ops.gn_kernel import fused_gn_solve
from graphslam_tpu.ops.pcg_kernel import fused_pcg_solve
from graphslam_tpu.solver.lm import _gn_loop
from graphslam_tpu.solver.normal_eq import build_blocks


def _graph(n_poses=260, seed=0, loop_prob=0.25):
    data = datasets.manhattan(n_poses=n_poses, loop_prob=loop_prob, seed=seed)
    graph = from_dataset(data)
    return graph, jnp.asarray(data["poses"])


def test_fused_gn_matches_xla_gn_trajectory():
    graph, poses0 = _graph()
    cfg = SolverConfig(mode="pcg", cg_max_iterations=25)
    ref = _gn_loop(poses0, graph, cfg, "pcg_fused", 5)
    out = fused_gn_solve(poses0, graph, iterations=5, cg_iters=25)
    assert np.isfinite(np.asarray(out)).all()
    c_ref = float(chi2(ref, graph))
    c_out = float(chi2(out, graph))
    assert abs(c_ref - c_out) < 1e-2 * max(c_ref, 1.0), (c_ref, c_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_gn_chain_only():
    # no loop edges at all: n_tiles == 0 path
    graph, poses0 = _graph(n_poses=150, loop_prob=0.0)
    assert graph.num_edges == graph.chain_prefix
    cfg = SolverConfig(mode="pcg", cg_max_iterations=25)
    ref = _gn_loop(poses0, graph, cfg, "pcg_fused", 3)
    out = fused_gn_solve(poses0, graph, iterations=3, cg_iters=25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_gn_masked_edges():
    # masking edges must remove their influence entirely
    graph, poses0 = _graph(n_poses=140, seed=2)
    E = graph.num_edges
    c = graph.chain_prefix
    # mask the last loop edge and one chain edge near the end
    mask = graph.edge_mask.at[E - 1].set(False).at[c - 2].set(False)
    gm = graph.replace(edge_mask=mask)
    cfg = SolverConfig(mode="pcg", cg_max_iterations=25)
    ref = _gn_loop(poses0, gm, cfg, "pcg_fused", 3)
    out = fused_gn_solve(poses0, gm, iterations=3, cg_iters=25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_gn_huber_matches_xla_irls():
    graph, poses0 = _graph(n_poses=180, seed=4)
    delta = 1.0

    def xla_step(poses):
        lin = linearize(poses, graph, huber_delta=delta, use_huber=True)
        sys = build_blocks(lin, graph, poses.shape[0])
        dx = fused_pcg_solve(
            sys, jnp.asarray(0.0, poses.dtype), max_iters=25,
            lm_diag_scaling=True, chain_prefix=graph.chain_prefix,
        )
        return se2.retract(poses, dx)

    ref = poses0
    for _ in range(3):
        ref = xla_step(ref)
    out = fused_gn_solve(
        poses0, graph, iterations=3, cg_iters=25, huber_delta=delta
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)


def test_gn_fused_mode_via_gn_loop():
    graph, poses0 = _graph(n_poses=130, seed=6)
    cfg = SolverConfig(mode="gn_fused", cg_max_iterations=25)
    out = _gn_loop(poses0, graph, cfg, "gn_fused", 4)
    ref = _gn_loop(poses0, graph, cfg, "pcg_fused", 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_lm_matches_xla_lm():
    from graphslam_tpu.ops.gn_kernel import fused_lm_solve
    from graphslam_tpu.solver.lm import _lm_loop

    graph, poses0 = _graph(n_poses=150, seed=8)
    # disable convergence early-exit so both run exactly `iters` steps
    cfg = SolverConfig(
        mode="pcg_fused", cg_max_iterations=25, max_iterations=5,
        rel_decrease_tol=0.0, abs_decrease_tol=0.0,
        use_huber_on_loops=True, huber_delta=1.0,
    )
    ref = _lm_loop(poses0, graph, cfg, "pcg_fused")
    out, err, lam, n_acc, conv = fused_lm_solve(
        poses0, graph, iterations=5, cg_iters=25, huber_delta=1.0,
        lam0=cfg.init_lambda, lam_factor=cfg.lambda_factor,
        lam_min=cfg.min_lambda, lam_max=cfg.max_lambda,
        abs_tol=0.0, rel_tol=0.0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref.poses), atol=3e-3)
    c_ref = float(ref.error)
    assert abs(float(err) - c_ref) < 1e-2 * max(c_ref, 1.0), (float(err), c_ref)
    # a healthy LM run accepts steps; with zero tolerances nothing can
    # latch the small-decrease convergence test
    assert 1 <= int(n_acc) <= 5
    assert float(conv) == 0.0


def test_fused_gn_page_windowed_matches_plain():
    # Page-windowed loop-edge bucketing (ops/bucketize.py): the bucketized
    # graph must produce the same trajectory as the plain tile path — the
    # windows only narrow the gather/scatter contractions, never the math.
    from graphslam_tpu.ops.bucketize import bucketize_loops

    data = datasets.manhattan(n_poses=900, seed=4, loop_prob=0.5)
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    ref = fused_gn_solve(poses0, graph, iterations=4, cg_iters=15,
                         interpret=True)
    gb = bucketize_loops(graph, page_window=2, tile=128)
    assert gb.page_window == 2
    # every tile's endpoints fall inside its declared windows
    c = gb.chain_prefix
    le = np.asarray(gb.edges[c:])
    q0 = np.asarray(gb.tile_page0)
    for t in range(q0.shape[1]):
        blk = le[t * 128:(t + 1) * 128]
        assert ((blk[:, 0] // 128 - q0[0, t]) < 2).all()
        assert ((blk[:, 0] // 128 - q0[0, t]) >= 0).all()
        assert ((blk[:, 1] // 128 - q0[1, t]) < 2).all()
        assert ((blk[:, 1] // 128 - q0[1, t]) >= 0).all()
    out = fused_gn_solve(poses0, gb, iterations=4, cg_iters=15,
                         edge_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    c_out = float(chi2(out, graph))
    c_ref = float(chi2(ref, graph))
    assert abs(c_out - c_ref) < 1e-2 * max(c_ref, 1.0)


def test_fused_lm_page_windowed_matches_plain():
    from graphslam_tpu.ops.bucketize import bucketize_loops
    from graphslam_tpu.ops.gn_kernel import fused_lm_solve

    data = datasets.manhattan(n_poses=600, seed=9, loop_prob=0.4)
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    ref, rerr, *_ = fused_lm_solve(
        poses0, graph, iterations=3, cg_iters=12, huber_delta=1.0,
        interpret=True,
    )
    gb = bucketize_loops(graph, page_window=2, tile=128)
    out, err, *_ = fused_lm_solve(
        poses0, gb, iterations=3, cg_iters=12, huber_delta=1.0,
        edge_tile=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)
    assert abs(float(err) - float(rerr)) < 1e-2 * max(float(rerr), 1.0)


def test_bucketize_edge_cases():
    from graphslam_tpu.ops.bucketize import bucketize_loops

    # chain-only graph: no loop tiles, metadata still well-formed
    graph, poses0 = _graph(n_poses=150, loop_prob=0.0)
    gb = bucketize_loops(graph, page_window=2, tile=128)
    assert int(gb.edges.shape[0]) == gb.chain_prefix
    out = fused_gn_solve(poses0, gb, iterations=2, cg_iters=10,
                         edge_tile=128, interpret=True)
    ref = fused_gn_solve(poses0, graph, iterations=2, cg_iters=10,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    # masked loops are dropped by bucketization (batch-solve semantics)
    graph2, poses2 = _graph(n_poses=200, seed=3)
    E = graph2.num_edges
    c = graph2.chain_prefix
    mask = graph2.edge_mask.at[c].set(False)
    gm = graph2.replace(edge_mask=mask)
    gb2 = bucketize_loops(gm, page_window=2, tile=128)
    live = int(np.asarray(gb2.edge_mask)[gb2.chain_prefix:].sum())
    assert live == E - c - 1
    out2 = fused_gn_solve(poses2, gb2, iterations=2, cg_iters=10,
                          edge_tile=128, interpret=True)
    ref2 = fused_gn_solve(poses2, gm, iterations=2, cg_iters=10,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-3)


def test_fused_gn_warm_start_and_ramp():
    # Warm-started CG (x0 = previous GN step's dx) and phased CG budgets
    # must preserve convergence on a well-conditioned graph (their city-
    # scale behavior — refinement gains, cold-start losses — is measured
    # in RESULTS.md).
    graph, poses0 = _graph(n_poses=300, seed=4)
    flat = fused_gn_solve(poses0, graph, iterations=4, cg_iters=12,
                          interpret=True)
    warm = fused_gn_solve(poses0, graph, iterations=4, cg_iters=12,
                          warm_start=True, interpret=True)
    ramp = fused_gn_solve(poses0, graph, iterations=4, cg_iters=12,
                          warm_start=True, cg_ramp=((2, 12), (2, 8)),
                          interpret=True)
    c_flat = float(chi2(flat, graph))
    for out in (warm, ramp):
        c = float(chi2(out, graph))
        assert abs(c - c_flat) < 5e-2 * max(c_flat, 1.0), (c, c_flat)


def test_warm_start_at_optimum_stays_finite():
    # Krylov-exhaustion guard regression (round 5): on a graph ALREADY at
    # its optimum (b ~ 0) the CG loop runs on pure roundoff noise; f32 can
    # drive pAp <= 0 and the old rz / max(pAp, tiny) clamp turned the sign
    # flip into a ~1e30 step — warm-started online solves NaN'd on TPU
    # after ~5 GN iterations (deterministic Mosaic repro; RESULTS.md).
    # The guard freezes the update instead. Exact-zero residuals exercise
    # the same degenerate path in interpret mode.
    graph, poses0 = _graph(n_poses=200, seed=11)
    opt = fused_gn_solve(poses0, graph, iterations=6, cg_iters=20,
                         interpret=True)
    c_opt = float(chi2(opt, graph))
    again = fused_gn_solve(opt, graph, iterations=8, cg_iters=25,
                           warm_start=True, interpret=True)
    a = np.asarray(again)
    assert np.isfinite(a).all()
    c_again = float(chi2(again, graph))
    assert c_again <= c_opt * (1 + 1e-3) + 1e-6, (c_again, c_opt)
