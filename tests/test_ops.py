"""Pallas kernel tests (interpreter mode on CPU) vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np

from graphslam_tpu.ops.correspondence import (
    nearest_neighbors,
    nearest_neighbors_reference,
)


class TestNearestNeighbors:
    def test_matches_reference(self):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        src = jax.random.normal(k1, (256, 2))
        tgt = jax.random.normal(k2, (384, 2))
        valid = jax.random.bernoulli(k3, 0.8, (384,))
        idx_ref, d2_ref = nearest_neighbors_reference(src, tgt, valid)
        idx, d2 = nearest_neighbors(src, tgt, valid, interpret=True)
        assert np.array_equal(idx, idx_ref)
        assert np.allclose(d2, d2_ref, rtol=1e-5, atol=1e-6)

    def test_unaligned_rows(self):
        key = jax.random.PRNGKey(1)
        src = jax.random.normal(key, (100, 2))  # not a multiple of 128
        tgt = jax.random.normal(key, (128, 2))
        valid = jnp.ones(128, bool)
        idx_ref, d2_ref = nearest_neighbors_reference(src, tgt, valid)
        idx, d2 = nearest_neighbors(src, tgt, valid, interpret=True)
        assert np.array_equal(idx, idx_ref)
        assert np.allclose(d2, d2_ref, rtol=1e-5, atol=1e-6)
