"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing pod-style sharding/collectives
without TPU hardware (SURVEY.md §4). Must set the env BEFORE jax imports.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container boot hooks force the 'axon' TPU platform regardless of
# JAX_PLATFORMS in the environment; override programmatically (before any
# backend is initialized) unless the user explicitly asks for TPU tests.
if os.environ.get("GRAPHSLAM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
