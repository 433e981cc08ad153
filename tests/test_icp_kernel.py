"""Fused ICP-iteration kernel (interpret mode) vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu.ops.icp_kernel import (
    fused_icp_iteration,
    fused_icp_iteration_reference,
)


def make_inputs(P=256, Q=384, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 6)
    moved = jax.random.normal(k[0], (P, 2))
    jtheta = jax.random.normal(k[1], (P, 2))
    src_mask = jax.random.bernoulli(k[2], 0.9, (P,))
    tgt = jax.random.normal(k[3], (Q, 2))
    tgt_valid = jax.random.bernoulli(k[4], 0.85, (Q,))
    A = jax.random.normal(k[5], (Q, 2, 2)) * 0.3
    Ct = jnp.einsum("qij,qkj->qik", A, A) + 0.1 * jnp.eye(2)
    Csr = jnp.abs(jax.random.normal(k[5], (P, 3))) * jnp.array([1.0, 0.1, 1.0])
    return moved, jtheta, src_mask, tgt, tgt_valid, Ct, Csr


def test_fused_matches_reference():
    args = make_inputs()
    H1, g1, s1 = fused_icp_iteration(*args, max_corr2=1.5, eps=1e-6, interpret=True)
    H2, g2, s2 = fused_icp_iteration_reference(*args, max_corr2=1.5, eps=1e-6)
    assert np.allclose(H1, H2, rtol=1e-4, atol=1e-3), np.abs(H1 - H2).max()
    assert np.allclose(g1, g2, rtol=1e-4, atol=1e-3)
    assert np.allclose(s1, s2, rtol=1e-4, atol=1e-2)


def test_fused_unaligned_P():
    args = make_inputs(P=200, Q=256, seed=1)
    H1, g1, s1 = fused_icp_iteration(*args, max_corr2=1.0, eps=1e-6, interpret=True)
    H2, g2, s2 = fused_icp_iteration_reference(*args, max_corr2=1.0, eps=1e-6)
    assert np.allclose(H1, H2, rtol=1e-4, atol=1e-3)
    assert np.allclose(s1, s2, rtol=1e-4, atol=1e-2)


def test_gicp_match_fused_vs_xla():
    # End-to-end: gicp_match with the fused kernel (interpret mode on CPU)
    # must recover the same delta as the XLA path on real scan geometry.
    from graphslam_tpu.config import FrontendConfig
    from graphslam_tpu.frontend import gicp_match, scan_to_points
    from graphslam_tpu.frontend.projection import beam_angles
    from graphslam_tpu.geometry import se2
    from graphslam_tpu.sim import default_world, raycast

    cfg = FrontendConfig(num_beams=181, max_points=256)
    angles = beam_angles(cfg.num_beams, cfg.fov_rad)
    world = default_world()

    def scan_at(pose):
        r = raycast(world, jnp.asarray(pose), angles, cfg.max_range)
        return scan_to_points(r, angles, cfg.min_range, cfg.max_range, cfg.max_points)

    tgt_pose = jnp.array([-7.0, -5.0, 0.2])
    src_pose = jnp.array([-6.85, -4.9, 0.27])
    tp, tm = scan_at(tgt_pose)
    sp, sm = scan_at(src_pose)
    expected = se2.between(tgt_pose, src_pose)

    init = expected + jnp.array([0.03, -0.03, 0.02])
    res_xla = gicp_match(
        sp, sm, tp, tm, init_delta=init, iterations=16, use_pallas=False
    )
    res_fused = gicp_match(
        sp, sm, tp, tm, init_delta=init, iterations=16, use_pallas=True
    )
    assert np.allclose(res_xla.delta, expected, atol=0.04)
    assert np.allclose(res_fused.delta, res_xla.delta, atol=5e-3), (
        res_fused.delta, res_xla.delta,
    )
    assert np.allclose(res_fused.fitness, res_xla.fitness, rtol=0.05)
    assert bool(res_fused.converged) == bool(res_xla.converged)


def test_no_valid_targets():
    moved, jtheta, src_mask, tgt, _, Ct, Csr = make_inputs(seed=2)
    tgt_valid = jnp.zeros(tgt.shape[0], bool)
    H, g, s = fused_icp_iteration(
        moved, jtheta, src_mask, tgt, tgt_valid, Ct, Csr,
        max_corr2=1.0, eps=1e-6, interpret=True,
    )
    assert float(s[2]) == 0.0  # no matches
    assert np.allclose(H, 0.0)


def test_fused_explicit_tunables_regression():
    # Regression: max_corr_dist/gicp_eps passed EXPLICITLY (as the pipeline
    # does from FrontendConfig) must reach the fused kernel as Python floats.
    # Before they were made static in gicp_match's jit, explicit passing
    # traced them and float(max_corr_dist) raised ConcretizationTypeError.
    from graphslam_tpu.frontend import gicp_match

    moved, jtheta, src_mask, tgt, tgt_valid, Ct, Csr = make_inputs(seed=3)
    res = gicp_match(
        moved, src_mask, tgt, tgt_valid,
        iterations=4, max_corr_dist=1.25, gicp_eps=1e-3, use_pallas=True,
    )
    res2 = gicp_match(
        moved, src_mask, tgt, tgt_valid,
        iterations=4, max_corr_dist=1.25, gicp_eps=1e-3, use_pallas=False,
    )
    assert np.allclose(res.delta, res2.delta, atol=1e-3)
