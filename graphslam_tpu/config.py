"""Typed configuration for the whole framework.

The reference hard-codes every tunable as a C++ global annotated "TODO
migrate to rosparams" (graph.cpp:12-16, scanner.cpp:9-11, odometry.cpp:22-23).
This module is the real config system it lacked; defaults reproduce the
reference constants exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Pose-graph optimizer settings (replaces gtsam LM defaults, graph.cpp:119).

    `mode` selects the normal-equation solve:
      * "dense"  — dense Cholesky of the full (D*N, D*N) Hessian; right for
                   small graphs (Intel ~1.7k poses) where the dense matrix is
                   tiny by TPU standards and the MXU eats it whole.
      * "pcg"    — matrix-free block-sparse preconditioned conjugate gradient;
                   right for large graphs (city10000+) and the multi-device path.
      * "pcg_fused" — the same PCG, but the entire CG loop runs inside ONE
                   Pallas kernel with a parallel-cyclic-reduction chain
                   preconditioner (ops/pcg_kernel.py). SE(2) (T=3) only;
                   fixed cg_max_iterations (no tol early-exit). The fast
                   single-chip path on TPU.
      * "auto"   — dense below `dense_threshold` poses, else pcg.
    """

    mode: str = "auto"
    # PCG beats dense well below this on TPU (dense pays serial triangular
    # solves + full-Hessian assembly); dense remains for tiny graphs/tests.
    dense_threshold: int = 512

    # Levenberg-Marquardt schedule (mirrors GTSAM's defaults closely enough to
    # hit the same optima: lambda up/down factors, initial lambda).
    max_iterations: int = 100
    init_lambda: float = 1e-5
    lambda_factor: float = 10.0
    min_lambda: float = 1e-10
    max_lambda: float = 1e7
    # Relative decrease in chi2 below which we declare convergence.
    rel_decrease_tol: float = 1e-6
    abs_decrease_tol: float = 1e-9

    # PCG settings. preconditioner: "tridiag" (cyclic-reduction solve of the
    # odometry-chain block-tridiagonal part — solver/tridiag.py) or "jacobi".
    cg_max_iterations: int = 250
    cg_tol: float = 1e-8
    preconditioner: str = "tridiag"

    # Robust kernel on loop-closure edges (BASELINE config 2). delta is the
    # Huber transition point in units of whitened residual norm.
    huber_delta: float = 1.0
    use_huber_on_loops: bool = False

    # Truncated PCR in the fused (gn_fused) kernels: eliminate chain
    # couplings only up to distance 2^pcr_levels instead of the full
    # ceil(log2 N) levels. The chain preconditioner becomes inexact (CG
    # absorbs the difference); factorization cost drops linearly in levels.
    # Measured on loop-dense graphs (RESULTS.md): identical convergence at
    # 4 levels with ~11% (m3500) higher throughput — long-range chain
    # elimination buys nothing when loops dominate the spectrum. None =
    # exact (matches the XLA "tridiag" preconditioner trajectory).
    pcr_levels: int | None = None

    # Loop-edge tile width in the fused (gn_fused) kernels. Must be a
    # 128-multiple (Mosaic lane-offset rule). Wider tiles cut fori-loop
    # overhead and feed the MXU wider matmuls: city10000 measured 255 ->
    # 334 it/s going 128 -> 256 (RESULTS.md round-3 sweep). 256 is the
    # sweet spot for batch solves; the online pipeline keeps cost bounded
    # via the live-tile count either way.
    edge_tile: int = 256

    # Warm-start CG inside the fused GN kernels: each GN iteration's CG
    # starts from the previous iteration's dx (one extra H@v). Helps in the
    # REFINEMENT regime (near-converged trajectories: measured m3500
    # 8.2k -> 11.7k it/s at cg 12 with better chained ATE) and HURTS cold
    # starts (the early dx is a bad guess across large linearization
    # changes — city single-solve ATE 2.7 vs 0.26; RESULTS.md). Off by
    # default; the online pipeline's periodic re-solves are the intended
    # consumer.
    cg_warm_start: bool = False

    # bf16 hi/lo splits for the CG matvec gather/scatter inside the fused
    # kernels. 2 (default) reproduces ~f32-exact products; 1 runs the
    # matvec in plain bf16 — HALF the MXU work in the CG loop. CG treats
    # the (tiny, ~2^-9 relative) matvec error as extra preconditioner
    # slack: measured equal chi2/ATE on every BASELINE graph (RESULTS.md),
    # but it is a per-config opt-in, not the default. The linearization
    # and Hessian-assembly scatters always stay at hi/lo exactness.
    hvp_splits: int = 2

    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Scan-matching frontend settings (replaces scanner.cpp:9-11 globals)."""

    # Laser model — the reference Stage world (willow.world:8-14).
    num_beams: int = 1081
    fov_rad: float = 4.71716  # 270.25 deg
    max_range: float = 30.0
    min_range: float = 0.02

    # Padded point budget: 1081 beams pad to the next lane-friendly size.
    max_points: int = 1152

    # ICP / GICP iterations (PCL GICP default is up to 200 outer iters; on TPU
    # we run a fixed unrolled/scanned count — static shapes, no early exit).
    icp_iterations: int = 32
    # Correspondence gating distance (m).
    max_correspondence_distance: float = 1.0
    # GICP surfel regularization: covariance eigenvalues (1, epsilon) along
    # (tangent, normal) of the locally fitted line.
    gicp_epsilon: float = 1e-3
    # Neighborhood half-width (beams) for local line fit.
    normal_half_window: int = 4

    # Keyframe gating. The reference creates a keyframe when GICP fitness
    # EXCEEDS 0.1 (scanner.cpp:57) — a motion/novelty gate (quirk §3.6.3 in
    # SURVEY.md). We keep that motion gate and add the quality gate the
    # reference conflated with it.
    keyframe_fitness_threshold: float = 0.1
    # Standard distance/rotation keyframe gates (environment-independent
    # backstop the reference lacked — its fitness gate alone can starve in
    # feature-poor corridors or fire constantly in clutter).
    keyframe_trans_threshold: float = 0.5
    keyframe_rot_threshold: float = 0.3
    # Quality gate: RMS gated-correspondence error must be below this for the
    # delta to be trusted as a factor.
    max_match_rmse: float = 0.5

    # Motion-scaled diagonal covariance model constants (scanner.cpp:11,
    # odometry.cpp:23 — intended semantics per SURVEY.md §3.6.5).
    k_disp_disp: float = 0.1
    k_rot_disp: float = 0.1
    k_rot_rot: float = 0.1

    # Match-informed factor covariance: when a registration is trusted, the
    # factor noise is the scaled inverse of the GICP IRLS Hessian (the match
    # Fisher information) instead of the motion-magnitude model alone —
    # anisotropic, so weakly-observed directions (corridors) carry inflated
    # variance rather than the reference's binary accept/reject
    # (scanner.hpp:64-80). The motion model contributes a floor scaled by
    # match_cov_motion_floor.
    use_match_covariance: bool = True
    match_cov_motion_floor: float = 0.01

    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SLAMConfig:
    """Online pipeline settings (replaces graph.cpp:12-16 globals)."""

    # Preallocated capacities (the reference used unbounded std::vector and
    # int8 ids that overflow at 127 keyframes — SURVEY.md §2.3).
    max_keyframes: int = 1024
    max_factors: int = 4096

    # Prior noise sigma on x, y, theta (graph.cpp:13-14).
    prior_sigma_xy: float = 0.1
    prior_sigma_theta: float = 0.1

    # Loop closure: exclude this many most-recent keyframes from candidate
    # search (graph.cpp:15) and gate candidates by distance (the reference had
    # no gate — SURVEY.md §3.6.6; we add one).
    loop_closure_skip: int = 10
    loop_closure_max_distance: float = 3.0

    # Run the optimizer every K accepted keyframes (the reference's solve()
    # was disabled entirely, graph.cpp:195; we enable it).
    solve_every: int = 1
    solve_iterations: int = 8
    # Occupancy bucketing: periodic solves run over the smallest power-of-two
    # pose window >= num_kf (and >= this floor), so solve cost tracks the
    # live map instead of max_keyframes. Each bucket is one extra solver
    # compilation.
    solve_bucket_min: int = 128

    # Per-keyframe covariance recovery — the Keyframe.msg pose_opti
    # covariance contract (/root/reference/src/common/msg/Keyframe.msg:4,
    # Pose2DWithCovariance.msg:2) and the Marginals::marginalCovariance the
    # reference sketched but never ran (graph.cpp:120,126-127). Every
    # cov_every-th accepted keyframe (after its periodic solve), recover the
    # marginal covariance of EVERY live pose via the block-tridiagonal
    # selected inverse + Woodbury loop correction
    # (solver/marginals.py::marginal_covariances_all) into SLAMState.kf_covs.
    # 0 disables. The Woodbury capacitance is dense over the live loop
    # closures, so recovery runs only while num_loops <= cov_loop_window
    # (a static compile-time width); beyond it, covariances keep their last
    # refreshed values. Window 64 costs ~6% of frontend fps at cov_every=8
    # (measured; 256 cost 29% — the (3W, 3W) Cholesky dominates); raise it
    # for loop-dense missions.
    cov_every: int = 8
    cov_loop_window: int = 64
    # Refresh marginals only on steps that COMMIT a loop closure (instead
    # of every cov_every-th keyframe). Loop closures are the only events
    # that shrink uncertainty; between them every fresh keyframe already
    # gets the dead-reckoning-grade transported covariance at commit time
    # (pipeline.py), which only grows — so the periodic cadence was paying
    # the full selected-inverse recovery to reproduce what the transport
    # already tracks. With solve_every == 1 (default) every loop commit is
    # followed by its solve, so no refresh is missed; at solve_every > 1 a
    # loop's refresh lands on the next periodic solve.
    cov_on_loop_only: bool = True

    # Warm-start CG inside the periodic solves (forces cg_warm_start on the
    # bucketed fused-GN solver). The online regime is refinement BY
    # CONSTRUCTION — each periodic solve re-optimizes a graph whose poses
    # were optimized one keyframe ago (the reference's own warm-start
    # design: graph.cpp:130 `initial = poses_opti` carries over because
    # poses persist in SLAMState). Within a solve, each GN iteration's CG
    # then seeds from the previous iteration's dx. Only the fused kernels
    # consume it; other modes ignore the flag.
    warm_start_solves: bool = True

    # Scan-to-map matching: the odometry match's target is the union of the
    # last K keyframes' points expressed in the last keyframe's (optimized)
    # frame. 1 = plain scan-to-keyframe (the reference's behavior,
    # scanner.cpp:115); >1 = local-map matching per the north star.
    scan_to_map_keyframes: int = 1

    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the distributed solver."""

    # Axis names; factors are sharded over 'dev'. State (poses) is replicated
    # — a 100k-pose SE(3) state is <6 MB, while factor work dominates.
    axis: str = "dev"
    num_devices: Optional[int] = None  # None → all visible devices
