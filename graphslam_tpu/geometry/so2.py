"""SO(2): planar rotations, stored as the angle theta (radians).

Batched: every function broadcasts over leading dims of its inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def wrap(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]. Branch-free (jit/vmap safe)."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def rotmat(theta: jnp.ndarray) -> jnp.ndarray:
    """(..., ) angle -> (..., 2, 2) rotation matrix."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotate(theta: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2-vectors v (..., 2) by angles theta (...,)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def unrotate(theta: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by -theta."""
    return rotate(-theta, v)
