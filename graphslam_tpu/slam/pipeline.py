"""The jitted SLAM step: scan in, updated map out.

One call covers the whole reference dataflow for a scan (SURVEY.md §3.1-3.2):
scanner_callback (projection + GICP vs last keyframe + loop probe) and
registration_callback (prior/new/loop factor creation) fused in-process, plus
the solve() the reference disabled (graph.cpp:195). Branches are masked
writes, not Python control flow — the step compiles once and never
recompiles as the map grows.

Of the reference's two GICP registrations (scanner.cpp:115,141), the
odometry match runs every step and the loop probe runs under lax.cond only
when a spatial candidate is plausible — most steps skip it entirely.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu.config import SLAMConfig
from graphslam_tpu.factors.graph import FactorGraph
from graphslam_tpu.frontend.icp import MatchResult, gicp_match
from graphslam_tpu.frontend.keyframes import motion_covariance
from graphslam_tpu.frontend.projection import beam_angles, scan_to_points
from graphslam_tpu.geometry import se2
from graphslam_tpu.slam.state import SLAMState, init_state
from graphslam_tpu.solver.lm import _gn_loop


class StepInfo(NamedTuple):
    is_keyframe: jnp.ndarray
    added_loop: jnp.ndarray
    fitness: jnp.ndarray
    delta: jnp.ndarray
    num_kf: jnp.ndarray
    num_factors: jnp.ndarray
    # Capacity exhaustion (preallocated arrays full): keyframe/factor commits
    # stop rather than silently corrupting slots; the caller should
    # checkpoint and restart with larger capacities (SLAMConfig).
    at_capacity: jnp.ndarray


def graph_view(state: SLAMState, cfg: SLAMConfig) -> FactorGraph:
    """A FactorGraph view over the state arrays (no copies).

    Inactive poses (index >= num_kf) get identity priors anchored at their
    current values — zero residual, but keeps the masked normal equations
    nonsingular so one solver compilation serves every map size.
    """
    K = state.kf_poses.shape[0]
    idx = jnp.arange(K)
    inactive = idx >= state.num_kf
    prior_mask = (idx == 0) | inactive
    anchor_info_sqrt = jnp.eye(3, dtype=state.kf_poses.dtype) / cfg.prior_sigma_xy
    eye = jnp.broadcast_to(jnp.eye(3, dtype=state.kf_poses.dtype), (K, 3, 3))
    prior_sqrt = jnp.where((idx == 0)[:, None, None], anchor_info_sqrt, eye)
    prior_meas = jnp.where((idx == 0)[:, None], state.anchor, state.kf_poses)
    return FactorGraph(
        edges=state.edges,
        measurements=state.meas,
        sqrt_info=state.sqrt_info,
        edge_mask=state.edge_mask,
        is_loop=state.is_loop,
        prior_idx=idx.astype(jnp.int32),
        prior_meas=prior_meas,
        prior_sqrt_info=prior_sqrt,
        prior_mask=prior_mask,
    )


def _sqrt_info_from_cov(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper sqrt-information from a covariance: info = cov^-1 = U^T U."""
    L = jnp.linalg.cholesky(cov)
    eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    # info = Linv^T Linv, so U = Linv works: U^T U = info, U lower->no; take
    # Linv itself (triangularity is irrelevant to the solver, only U^T U).
    return Linv


def make_slam_step(cfg: SLAMConfig):
    """Build the jitted step: (state, ranges, odom_delta) -> (state, info)."""
    fcfg = cfg.frontend
    angles = beam_angles(fcfg.num_beams, fcfg.fov_rad)
    scfg = cfg.solver

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: SLAMState, ranges: jnp.ndarray, odom_delta: jnp.ndarray):
        pts, mask = scan_to_points(
            ranges, angles, fcfg.min_range, fcfg.max_range, fcfg.max_points
        )
        first = state.num_kf == 0
        last_idx = jnp.maximum(state.num_kf - 1, 0)
        last_pose = state.kf_poses[last_idx]
        last_pts = state.kf_points[last_idx]
        last_mask = state.kf_masks[last_idx]

        # Odometry accumulated since the last keyframe — the ICP prior and
        # the fallback factor measurement.
        odom_acc = se2.compose(state.odom_accum, odom_delta)

        # --- loop candidate (graph.cpp:146-178's O(n) scan as one argmin) ---
        pose_guess = se2.compose(last_pose, odom_acc)
        kidx = jnp.arange(state.kf_poses.shape[0])
        eligible = kidx < (state.num_kf - cfg.loop_closure_skip)
        d2 = jnp.sum((state.kf_poses[:, :2] - pose_guess[:2]) ** 2, axis=-1)
        d2 = jnp.where(eligible, d2, jnp.inf)
        cand_idx = jnp.argmin(d2)
        cand_dist = jnp.sqrt(d2[cand_idx])
        cand_pose = state.kf_poses[cand_idx]
        cand_pts = state.kf_points[cand_idx]
        cand_mask = state.kf_masks[cand_idx]

        # --- GICP vs last keyframe (every step) -----------------------------
        def match(s, sm, t, tm, i):
            return gicp_match(
                s, sm, t, tm,
                init_delta=i,
                iterations=fcfg.icp_iterations,
                max_corr_dist=fcfg.max_correspondence_distance,
                half_window=fcfg.normal_half_window,
                gicp_eps=fcfg.gicp_epsilon,
            )

        # Scan-to-map: widen the target to the last L keyframes' points
        # expressed in the last keyframe's optimized frame (L=1 reduces to
        # the reference's scan-to-keyframe).
        L = cfg.scan_to_map_keyframes
        if L > 1:
            offs = jnp.arange(L)
            src_idx = jnp.clip(state.num_kf - 1 - offs, 0, state.kf_poses.shape[0] - 1)
            kf_sel_pose = state.kf_poses[src_idx]            # (L, 3)
            rel = se2.between(
                jnp.broadcast_to(last_pose, kf_sel_pose.shape), kf_sel_pose
            )
            moved = se2.transform(rel, state.kf_points[src_idx])
            seg_valid = (offs < state.num_kf)[:, None]
            tgt_pts_all = moved.reshape(-1, 2)
            tgt_mask_all = (state.kf_masks[src_idx] & seg_valid).reshape(-1)
        else:
            tgt_pts_all = last_pts
            tgt_mask_all = last_mask

        res_odo = match(pts, mask, tgt_pts_all, tgt_mask_all, odom_acc)
        odo_delta = res_odo.delta
        odo_fitness = res_odo.fitness
        odo_ok = (
            res_odo.converged
            & (res_odo.matched_frac > 0.5)
            & (res_odo.inlier_rms < fcfg.max_match_rmse)
            & ~res_odo.degenerate
        )

        # --- loop-probe GICP, only when a candidate is plausible ------------
        # (the reference also gated its probe on the keyframe branch,
        # scanner.cpp:130-155; lax.cond skips the work at runtime on the
        # majority of steps with no nearby candidate)
        loop_init = se2.between(cand_pose, pose_guess)
        loop_plausible = jnp.isfinite(cand_dist) & (
            cand_dist < cfg.loop_closure_max_distance
        )

        def do_probe(_):
            return match(pts, mask, cand_pts, cand_mask, loop_init)

        def skip_probe(_):
            zero3 = jnp.zeros(3, pts.dtype)
            f = jnp.asarray(0.0, pts.dtype)
            return MatchResult(
                delta=zero3, fitness=f, inlier_rms=f + 1e9,
                matched_frac=f, converged=jnp.bool_(False),
                mahal_rmse=f + 1e9, degenerate=jnp.bool_(True),
            )

        res_loop = jax.lax.cond(loop_plausible, do_probe, skip_probe, None)
        loop_delta = res_loop.delta
        loop_ok = (
            res_loop.converged
            & (res_loop.matched_frac > 0.5)
            & (res_loop.inlier_rms < fcfg.max_match_rmse)
            & ~res_loop.degenerate
        )

        # --- keyframe decision (reference motion gate + our quality gate) ---
        moved_enough = (
            (odo_fitness > fcfg.keyframe_fitness_threshold)
            | (jnp.linalg.norm(res_odo.delta[:2]) > fcfg.keyframe_trans_threshold)
            | (jnp.abs(res_odo.delta[2]) > fcfg.keyframe_rot_threshold)
        )
        # Capacity guard: stop committing when arrays are full (2 factor
        # slots may be needed per keyframe: odometry + loop).
        at_capacity = (state.num_kf >= state.kf_poses.shape[0]) | (
            state.num_factors >= state.edges.shape[0] - 2
        )
        is_kf = (first | (moved_enough & odo_ok)) & ~at_capacity

        # When the match is unreliable, fall back to raw odometry for the
        # factor (the reference trusted a poor alignment — SURVEY.md §3.6.3).
        delta = jnp.where(odo_ok, odo_delta, odom_acc)
        new_pose = jnp.where(first, jnp.zeros(3, pts.dtype), se2.compose(last_pose, delta))

        do_loop = (
            is_kf
            & ~first
            & (cand_dist < cfg.loop_closure_max_distance)
            & loop_ok
        )

        # --- commit keyframe (masked writes) --------------------------------
        ki = jnp.minimum(state.num_kf, state.kf_poses.shape[0] - 1)
        kf_poses = state.kf_poses.at[ki].set(
            jnp.where(is_kf, new_pose, state.kf_poses[ki])
        )
        kf_points = state.kf_points.at[ki].set(
            jnp.where(is_kf, pts, state.kf_points[ki])
        )
        kf_masks = state.kf_masks.at[ki].set(
            jnp.where(is_kf, mask, state.kf_masks[ki])
        )
        num_kf = state.num_kf + jnp.where(is_kf, 1, 0).astype(jnp.int32)

        # --- factors --------------------------------------------------------
        F = state.edges.shape[0]
        add_odo = is_kf & ~first
        cov = motion_covariance(delta, fcfg)
        si = _sqrt_info_from_cov(cov)
        f0 = jnp.minimum(state.num_factors, F - 1)
        edges = state.edges.at[f0].set(
            jnp.where(add_odo, jnp.stack([last_idx, ki]).astype(jnp.int32), state.edges[f0])
        )
        meas = state.meas.at[f0].set(jnp.where(add_odo, delta, state.meas[f0]))
        sqrt_info = state.sqrt_info.at[f0].set(
            jnp.where(add_odo, si, state.sqrt_info[f0])
        )
        edge_mask = state.edge_mask.at[f0].set(
            jnp.where(add_odo, True, state.edge_mask[f0])
        )
        is_loop_arr = state.is_loop.at[f0].set(
            jnp.where(add_odo, False, state.is_loop[f0])
        )
        nf = state.num_factors + jnp.where(add_odo, 1, 0).astype(jnp.int32)

        loop_cov = motion_covariance(loop_delta, fcfg)
        loop_si = _sqrt_info_from_cov(loop_cov)
        f1 = jnp.minimum(nf, F - 1)
        edges = edges.at[f1].set(
            jnp.where(do_loop, jnp.stack([cand_idx, ki]).astype(jnp.int32), edges[f1])
        )
        meas = meas.at[f1].set(jnp.where(do_loop, loop_delta, meas[f1]))
        sqrt_info = sqrt_info.at[f1].set(jnp.where(do_loop, loop_si, sqrt_info[f1]))
        edge_mask = edge_mask.at[f1].set(jnp.where(do_loop, True, edge_mask[f1]))
        is_loop_arr = is_loop_arr.at[f1].set(jnp.where(do_loop, True, is_loop_arr[f1]))
        nf = nf + jnp.where(do_loop, 1, 0).astype(jnp.int32)

        state = state.replace(
            kf_poses=kf_poses,
            kf_points=kf_points,
            kf_masks=kf_masks,
            num_kf=num_kf,
            edges=edges,
            meas=meas,
            sqrt_info=sqrt_info,
            edge_mask=edge_mask,
            is_loop=is_loop_arr,
            num_factors=nf,
            odom_accum=jnp.where(is_kf, jnp.zeros(3, pts.dtype), odom_acc),
        )

        # --- periodic solve (the graph.cpp:195 solve, enabled) --------------
        do_solve = is_kf & (num_kf % cfg.solve_every == 0) & (num_kf > 1)

        def solve(s: SLAMState):
            graph = graph_view(s, cfg)
            poses = _gn_loop(s.kf_poses, graph, scfg, "pcg", cfg.solve_iterations)
            return s.replace(kf_poses=poses)

        state = jax.lax.cond(do_solve, solve, lambda s: s, state)

        info = StepInfo(
            is_keyframe=is_kf,
            added_loop=do_loop,
            fitness=odo_fitness,
            delta=delta,
            num_kf=num_kf,
            num_factors=nf,
            at_capacity=at_capacity,
        )
        return state, info

    return step


def state_to_dataset(state: SLAMState) -> dict:
    """Export the online map as the standard dataset dict (interoperable with
    io.g2o.save_g2o) — keyframe poses + committed factors only."""
    n = int(state.num_kf)
    f = int(state.num_factors)
    sqrt_info = np.asarray(state.sqrt_info[:f])
    info = np.einsum("eba,ebc->eac", sqrt_info, sqrt_info)
    return {
        "dim": 2,
        "poses": np.asarray(state.kf_poses[:n]),
        "edges": np.asarray(state.edges[:f]),
        "measurements": np.asarray(state.meas[:f]),
        "information": info,
        "is_loop": np.asarray(state.is_loop[:f]),
    }


def make_slam_replay(cfg: SLAMConfig, num_steps: int):
    """Whole-replay version: one jitted lax.scan over all scans.

    A single device dispatch for the full run — this is the honest frames/s
    measurement path (the per-step driver pays a host round-trip per scan).
    """
    step = make_slam_step(cfg)
    # Reuse the step's traced logic inside a scan; donate the state.

    @partial(jax.jit, donate_argnums=(0,))
    def replay(state: SLAMState, scans: jnp.ndarray, odom: jnp.ndarray):
        def body(s, inp):
            ranges, od = inp
            s, info = step.__wrapped__(s, ranges, od)
            return s, info

        return jax.lax.scan(body, state, (scans, odom), length=num_steps)

    return replay


def run_slam_scan(scans: np.ndarray, odom_deltas: Optional[np.ndarray], cfg: SLAMConfig):
    """Replay the whole run in one on-device scan; returns (state, stacked infos)."""
    T = scans.shape[0]
    odom = np.zeros((T, 3), np.float32)
    if odom_deltas is not None:
        odom[1:] = odom_deltas[: T - 1]
    replay = make_slam_replay(cfg, T)
    state = init_state(cfg)
    state, infos = replay(state, jnp.asarray(scans), jnp.asarray(odom))
    return state, infos


def run_slam_from_twists(
    scans: np.ndarray,
    twists: np.ndarray,
    dt: float,
    cfg: SLAMConfig,
):
    """Replay driver fed by body twists (the /cmd_vel path): integrates each
    twist through the odometry motion model (slam/odometry.py — the dead
    odometry node's intended role, SURVEY.md §3.4) and feeds the resulting
    deltas to the SLAM step."""
    from graphslam_tpu.slam.odometry import init_buffer, integrate_twist

    buf = init_buffer()
    deltas = []
    prev = buf.pose
    for t in range(1, scans.shape[0]):
        buf = integrate_twist(
            buf, jnp.asarray(twists[t - 1]), jnp.float32(dt), jnp.float32(t * dt),
            cfg.frontend,
        )
        deltas.append(np.asarray(se2.between(prev, buf.pose)))
        prev = buf.pose
    return run_slam(scans, np.asarray(deltas), cfg)


def run_slam(
    scans: np.ndarray,
    odom_deltas: Optional[np.ndarray],
    cfg: SLAMConfig,
):
    """Replay driver: feed every scan through the jitted step.

    Returns (final_state, list[StepInfo]). The reference's equivalent is the
    whole roslaunch closed loop (SURVEY.md §4) — here it's a deterministic
    array program.
    """
    step = make_slam_step(cfg)
    state = init_state(cfg)
    infos = []
    T = scans.shape[0]
    zeros = jnp.zeros(3, state.kf_poses.dtype)
    for t in range(T):
        od = zeros if odom_deltas is None or t == 0 else jnp.asarray(odom_deltas[t - 1])
        state, info = step(state, jnp.asarray(scans[t]), od)
        infos.append(jax.tree_util.tree_map(np.asarray, info))
    return state, infos
