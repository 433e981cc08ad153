"""Headline benchmark: pose-graph optimizer iterations/s on M3500 (TPU).

Prints EXACTLY ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.

Baseline note: the reference publishes no numbers (BASELINE.md) — its backend
is gtsam::LevenbergMarquardtOptimizer, which on an M3500-class 2D pose graph
sustains roughly 10 LM iterations/s on a desktop CPU (each iteration:
sparse linearize + variable-ordered Cholesky). vs_baseline is measured
against that 10 it/s anchor; ATE parity is checked as a gate before timing.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    """Force completion: on the remote-TPU (axon) platform block_until_ready
    can return before the computation lands, so fetch to host."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def main():
    from graphslam_tpu import metrics
    from graphslam_tpu.config import SolverConfig
    from graphslam_tpu.factors import from_dataset, chi2
    from graphslam_tpu.io import datasets
    from graphslam_tpu.solver.lm import _gn_loop

    log("devices:", jax.devices())
    data = datasets.m3500()
    graph = from_dataset(data)
    poses0 = jnp.asarray(data["poses"])
    gt = jnp.asarray(data["gt"])

    # One jit signature serves both the correctness gate and the timed
    # section — remote compiles are expensive on this platform.
    # cg=25 + the chain preconditioner reaches better per-iteration chi2
    # than jacobi/cg=50 at ~equal cost (RESULTS.md sweep). gn_fused runs
    # the ENTIRE GN loop — linearize, assembly, PCR preconditioner, CG,
    # retract, all 50 iterations — in one Pallas kernel (ops/gn_kernel.py).
    iters = 50
    mode = "gn_fused"
    # pcr_levels=4: truncated chain preconditioner — on loop-dense Manhattan
    # graphs convergence is identical to the exact solve (RESULTS.md sweep:
    # chi2 6180 vs 6192, ATE 0.302 vs 0.316 at the same iteration count) and
    # the factorization is 8 levels cheaper. The ATE gate below re-validates
    # this on every run.
    # edge_tile=512 / hvp_splits=1: round-3 sweep winners (wider loop-edge
    # tiles cut per-tile fixed cost; the bf16 CG matvec halves MXU work in
    # the CG loop at equal chi2/ATE — both re-validated by this gate).
    tcfg = SolverConfig(
        mode=mode, cg_max_iterations=25, cg_tol=1e-7, pcr_levels=4,
        edge_tile=512, hvp_splits=1,
    )

    # --- correctness gate: GN must reach the optimum basin ------------------
    out = _gn_loop(poses0, graph, tcfg, mode, iters)
    ate = float(metrics.ate(out, gt))
    ate0 = float(metrics.ate(poses0, gt))
    log(f"m3500: chi2 {float(chi2(poses0, graph)):.1f} -> "
        f"{float(chi2(out, graph)):.1f} in {iters} GN iters; "
        f"ATE {ate0:.3f} -> {ate:.3f}")
    # HARD absolute gate: the converged ATE on this generator is stable at
    # ~0.31 m (RESULTS.md rounds 2-3), so gate at 0.35 m. A relative-only
    # gate (ate < 0.5*ate0) would let a 14x regression (ATE 4.2) still post
    # 8000+ it/s — the absolute bound is what makes the number meaningful.
    ATE_GATE_M = 0.35
    valid = ate < ATE_GATE_M and ate < 0.5 * ate0
    if not valid:
        # HARD gate: a broken solver must not post a throughput number.
        log("ERROR: optimizer did not improve ATE enough; benchmark invalid")
        print(
            json.dumps(
                {
                    "metric": "m3500_gn_iterations_per_s",
                    "value": 0.0,
                    "unit": "iterations/s",
                    "vs_baseline": 0.0,
                    "valid": False,
                    "ate_init": round(ate0, 4),
                    "ate_final": round(ate, 4),
                }
            )
        )
        sys.exit(1)

    # --- timed section: steady-state GN iteration throughput ----------------
    # Each iteration = full linearize (4.6k factors) + block normal equations
    # + PCG solve (<=25 inner CG iterations) + retract, inside one Pallas
    # kernel. The TPU here sits behind a network relay with ~27 ms of RPC
    # latency per dispatch+fetch roundtrip (measured on a trivial jitted op)
    # — 3x the device time of a whole 50-iteration solve — so a one-solve-
    # per-fetch measurement times the tunnel, not the TPU. Standard
    # steady-state methodology instead: scan R back-to-back solves inside
    # one jit (each feeding its output poses to the next solve — a real
    # data dependency, so nothing elides), fetch once. Single-solve latency
    # including the roundtrip is reported to stderr alongside.
    R = 20

    @jax.jit
    def solve_chain(p):
        def body(p, _):
            return _gn_loop(p, graph, tcfg, mode, iters), None
        out, _ = jax.lax.scan(body, p, None, length=R)
        return out

    sync(solve_chain(poses0))  # compile + settle

    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        sync(solve_chain(poses0))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    its_per_s = R * iters / dt

    t0 = time.perf_counter()
    sync(_gn_loop(poses0, graph, tcfg, mode, iters))
    t_single = time.perf_counter() - t0
    log(f"timing reps (s, {R} solves x {iters} iters): "
        f"{[f'{t:.3f}' for t in times]} -> {its_per_s:.1f} it/s steady-state; "
        f"single {iters}-iter solve + roundtrip: {t_single*1e3:.1f} ms")

    baseline_its_per_s = 10.0  # GTSAM LM on M3500, desktop CPU (see header)
    print(
        json.dumps(
            {
                "metric": "m3500_gn_iterations_per_s",
                "value": round(its_per_s, 2),
                "unit": "iterations/s",
                "vs_baseline": round(its_per_s / baseline_its_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
