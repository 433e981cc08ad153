"""Pose-graph optimizer: Gauss-Newton / Levenberg-Marquardt over the
linearized factor blocks — the TPU rebuild of
gtsam::LevenbergMarquardtOptimizer (graph.cpp:115-132, SURVEY.md §3.3).

Two normal-equation backends:
  dense — full (N*T, N*T) Hessian + Cholesky; the MXU path for small graphs.
  pcg   — matrix-free block-sparse preconditioned CG; gather/einsum/
          segment-sum products for large graphs and the sharded solver.
"""

from graphslam_tpu.solver.lm import lm_solve, gn_solve, LMState  # noqa: F401
from graphslam_tpu.solver.normal_eq import (  # noqa: F401
    build_blocks,
    dense_solve,
    pcg_solve,
    BlockSystem,
)
