"""SLAMState: the entire map/graph as preallocated device arrays.

Replaces the graph node's process globals (std::vector<Keyframe>,
gtsam::NonlinearFactorGraph, Values — graph.cpp:5-10) with fixed-capacity
arrays + counts, donated across steps. Growth = bumping a count and flipping
a mask bit; the step function never recompiles. int32 ids (the reference's
int8 overflowed at 127 keyframes — SURVEY.md §2.3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from graphslam_tpu.config import SLAMConfig


@struct.dataclass
class SLAMState:
    # Keyframe store (the Keyframe.msg contract: id is the array index,
    # pose_opti is kf_poses; raw scans are kept as projected point buffers).
    kf_poses: jnp.ndarray   # (K, 3) optimized SE(2) poses
    kf_points: jnp.ndarray  # (K, P, 2) projected scan points (sensor frame)
    kf_masks: jnp.ndarray   # (K, P) point validity
    num_kf: jnp.ndarray     # () int32

    # Factor store (the Factor.msg contract, struct-of-arrays).
    edges: jnp.ndarray      # (F, 2) int32
    meas: jnp.ndarray       # (F, 3)
    sqrt_info: jnp.ndarray  # (F, 3, 3)
    edge_mask: jnp.ndarray  # (F,)
    is_loop: jnp.ndarray    # (F,)
    num_factors: jnp.ndarray  # () int32

    # Anchor (prior) for keyframe 0 — graph.cpp:38-42 semantics.
    anchor: jnp.ndarray     # (3,)

    # Accumulated odometry since the last committed keyframe (the in-state
    # replacement for the odometry node's time-interval buffer queries,
    # odometry.cpp:84-116).
    odom_accum: jnp.ndarray  # (3,)


def init_state(cfg: SLAMConfig, dtype=jnp.float32) -> SLAMState:
    K = cfg.max_keyframes
    F = cfg.max_factors
    P = cfg.frontend.max_points
    return SLAMState(
        kf_poses=jnp.zeros((K, 3), dtype),
        kf_points=jnp.zeros((K, P, 2), dtype),
        kf_masks=jnp.zeros((K, P), bool),
        num_kf=jnp.int32(0),
        edges=jnp.zeros((F, 2), jnp.int32),
        meas=jnp.zeros((F, 3), dtype),
        sqrt_info=jnp.zeros((F, 3, 3), dtype),
        edge_mask=jnp.zeros((F,), bool),
        is_loop=jnp.zeros((F,), bool),
        num_factors=jnp.int32(0),
        anchor=jnp.zeros((3,), dtype),
        odom_accum=jnp.zeros((3,), dtype),
    )
