"""Polar LaserScan -> Cartesian point buffer.

Replaces laser_geometry::LaserProjection::projectLaser (scanner.cpp:15-17):
one fused elementwise kernel (r cos, r sin) with range masking, padded to a
lane-friendly fixed budget so every downstream shape is static.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def beam_angles(num_beams: int, fov_rad: float, dtype=jnp.float32) -> jnp.ndarray:
    """Beam angles centered on the sensor x-axis (willow.world:8-14 model)."""
    half = fov_rad / 2.0
    return jnp.linspace(-half, half, num_beams, dtype=dtype)


def scan_to_points(
    ranges: jnp.ndarray,
    angles: jnp.ndarray,
    min_range: float,
    max_range: float,
    max_points: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B,) ranges -> ((P, 2) points, (P,) validity mask), P = max_points.

    Invalid beams (out of [min_range, max_range], inf, nan) are masked, not
    dropped — static shapes are what keep the whole frontend jittable.
    """
    B = ranges.shape[0]
    assert max_points >= B, "max_points must cover the beam count"
    valid = jnp.isfinite(ranges) & (ranges >= min_range) & (ranges <= max_range)
    r = jnp.where(valid, ranges, 0.0)
    pts = jnp.stack([r * jnp.cos(angles), r * jnp.sin(angles)], axis=-1)
    pad = max_points - B
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    valid = jnp.pad(valid, (0, pad))
    return pts, valid
