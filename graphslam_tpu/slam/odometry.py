"""Odometry motion model: twist integration + time-indexed ring buffer.

The reference's odometry node was dead code — its integration body was
commented out and the executable never built (odometry.cpp:139-206,
CMakeLists.txt:21-23; SURVEY.md §3.4). This implements the *intended*
semantics: integrate /cmd_vel twists into a pose with a motion-scaled
covariance (k_disp_disp/k_rot_disp/k_rot_rot model, odometry.cpp:23), keep a
fixed-depth ring buffer of stamped poses (odometry.cpp:74's 1000-deep deque),
and serve relative-pose deltas over a time interval (odometry.cpp:84-116's
OdometryBuffer service — with nearest-timestamp lookup instead of the
reference's whole-second integer matching bug).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from graphslam_tpu.config import FrontendConfig
from graphslam_tpu.frontend.keyframes import motion_covariance
from graphslam_tpu.geometry import se2

BUFFER_DEPTH = 1000  # odometry.cpp:74


@struct.dataclass
class OdometryBuffer:
    times: jnp.ndarray   # (B,)
    poses: jnp.ndarray   # (B, 3)
    valid: jnp.ndarray   # (B,)
    head: jnp.ndarray    # () int32 next write slot
    pose: jnp.ndarray    # (3,) current integrated pose
    cov: jnp.ndarray     # (3, 3) accumulated covariance


def init_buffer(depth: int = BUFFER_DEPTH, dtype=jnp.float32) -> OdometryBuffer:
    return OdometryBuffer(
        times=jnp.full((depth,), -jnp.inf, dtype),
        poses=jnp.zeros((depth, 3), dtype),
        valid=jnp.zeros((depth,), bool),
        head=jnp.int32(0),
        pose=jnp.zeros((3,), dtype),
        cov=jnp.zeros((3, 3), dtype),
    )


def integrate_twist(
    buf: OdometryBuffer,
    twist: jnp.ndarray,  # (3,) [vx, vy, omega] body frame
    dt: jnp.ndarray,
    t: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
) -> OdometryBuffer:
    """One integration tick (the odometry.cpp:139-206 loop body, enabled)."""
    delta = twist * dt
    new_pose = se2.compose(buf.pose, delta)
    # Covariance transported through the motion and grown by the step model.
    Ad = se2.adjoint(se2.exp(delta))
    Ad_inv = jnp.linalg.inv(Ad)
    grown = Ad_inv @ buf.cov @ Ad_inv.T + motion_covariance(delta, cfg)
    depth = buf.times.shape[0]
    h = buf.head % depth
    return buf.replace(
        times=buf.times.at[h].set(t),
        poses=buf.poses.at[h].set(new_pose),
        valid=buf.valid.at[h].set(True),
        head=buf.head + 1,
        pose=new_pose,
        cov=grown,
    )


def _pose_at(buf: OdometryBuffer, t: jnp.ndarray) -> jnp.ndarray:
    """Pose at the buffered timestamp nearest to t."""
    dt = jnp.where(buf.valid, jnp.abs(buf.times - t), jnp.inf)
    return buf.poses[jnp.argmin(dt)]


def query_interval(
    buf: OdometryBuffer,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    cfg: FrontendConfig = FrontendConfig(),
):
    """Relative pose (and motion-scaled covariance) between the buffered
    poses nearest to t_start and t_end — the OdometryBuffer.srv contract."""
    a = _pose_at(buf, t_start)
    b = _pose_at(buf, t_end)
    delta = se2.between(a, b)
    return delta, motion_covariance(delta, cfg)
