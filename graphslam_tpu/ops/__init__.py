"""Pallas TPU kernels for the hot ops.

Kernels keep their full-precision jnp reference implementations next to them;
tests assert bit-level agreement and the callers pick the kernel on TPU /
the reference elsewhere (interpret mode covers CPU testing).
"""

from graphslam_tpu.ops.correspondence import nearest_neighbors  # noqa: F401
