"""Per-stage attribution for the online SLAM step (frontend fps).

The closed-loop replay is ONE dispatch for all scans, so per-stage cost is
probed by differencing whole-replay wall times across config variants that
disable one stage each:

  full          — the bench configuration (bench_all.py::bench_frontend)
  no-cov        — cov_every=0 (no marginal-covariance refreshes)
  no-solve      — solve_every huge (skips the periodic bucketed solves)
  no-loop       — loop_closure_max_distance=0 (loop probe cond never taken)
  icp-half      — icp_iterations halved (GICP share scales ~linearly)

Differences: full - no-cov = covariance recovery; no-cov - no-solve =
periodic solves; no-solve - no-loop = loop probes; 2*(no-loop - icp-half)
~ the odometry GICP match; the remainder is projection + bookkeeping.

Writes a JSON line per variant to stderr and a summary table to stdout.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--variants",
        default="full,cov-periodic,cold-solves,no-cov,no-solve,no-loop,icp-half",
    )
    args = ap.parse_args()

    from graphslam_tpu.config import SLAMConfig, SolverConfig
    from graphslam_tpu.sim import simulate_trajectory
    from graphslam_tpu.slam import init_state
    from graphslam_tpu.slam.pipeline import make_slam_replay

    base = SLAMConfig(
        max_keyframes=1024,
        max_factors=1024,
        solve_iterations=4,
        solver=SolverConfig(mode="gn_fused", cg_max_iterations=12),
    )
    sim = simulate_trajectory(base.frontend, step_len=0.25, seed=1)
    scans = sim["scans"]
    odom = sim["odom_deltas"]
    n = min(args.scans, len(scans))
    scans_d = jnp.asarray(scans[:n])
    odom_d = jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.asarray(odom[: n - 1])], axis=0
    )

    def variant_cfg(name):
        if name == "full":
            return base
        if name == "cov-periodic":
            # the pre-round-5 policy: full recovery every cov_every-th
            # keyframe regardless of loop commits (vs the default
            # cov_on_loop_only refresh)
            return dataclasses.replace(base, cov_on_loop_only=False)
        if name == "cold-solves":
            return dataclasses.replace(base, warm_start_solves=False)
        if name == "no-cov":
            return dataclasses.replace(base, cov_every=0)
        if name == "no-solve":
            return dataclasses.replace(base, cov_every=0, solve_every=10**6)
        if name == "no-loop":
            return dataclasses.replace(
                base, cov_every=0, solve_every=10**6,
                loop_closure_max_distance=0.0,
            )
        if name == "icp-half":
            f = dataclasses.replace(
                base.frontend,
                icp_iterations=base.frontend.icp_iterations // 2,
            )
            return dataclasses.replace(
                base, cov_every=0, solve_every=10**6,
                loop_closure_max_distance=0.0, frontend=f,
            )
        raise ValueError(name)

    results = {}
    for name in args.variants.split(","):
        cfg = variant_cfg(name)
        replay = make_slam_replay(cfg, n)
        t0 = time.perf_counter()
        state, infos = replay(init_state(cfg), scans_d, odom_d)
        np.asarray(state.kf_poses)
        log(f"{name}: compile+run {time.perf_counter()-t0:.1f}s "
            f"({int(state.num_kf)} kf, {int(state.num_loops)} loops)")
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state, infos = replay(init_state(cfg), scans_d, odom_d)
            np.asarray(state.kf_poses)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[name] = dt
        log(f"{name}: {n/dt:.1f} fps ({dt*1e3/n:.3f} ms/scan)")

    print("\nstage attribution (ms/scan over", n, "scans):")
    ms = {k: v * 1e3 / n for k, v in results.items()}
    for k, v in ms.items():
        print(f"  {k:10s} {v:7.3f} ms/scan  ({n/results[k]:.1f} fps)")
    pairs = [
        ("covariance recovery", "full", "no-cov"),
        ("periodic-cov penalty", "cov-periodic", "full"),
        ("cold-solve penalty", "cold-solves", "full"),
        ("periodic solves", "no-cov", "no-solve"),
        ("loop probes", "no-solve", "no-loop"),
    ]
    for label, a, b in pairs:
        if a in ms and b in ms:
            print(f"  {label:22s} {ms[a]-ms[b]:7.3f} ms/scan")
    if "no-loop" in ms and "icp-half" in ms:
        icp_full = 2 * (ms["no-loop"] - ms["icp-half"])
        print(f"  {'odometry GICP (est)':22s} {icp_full:7.3f} ms/scan")
        print(f"  {'projection+rest (est)':22s} "
              f"{ms['no-loop']-icp_full:7.3f} ms/scan")


if __name__ == "__main__":
    main()
