"""Multi-chip / multi-host scaling of the pose-graph optimizer.

The reference's 'distributed backend' was three single-threaded ROS processes
on one machine (SURVEY.md §2.4). The TPU-native replacement: a
`jax.sharding.Mesh` over all chips, factors sharded across devices, poses
replicated (a 100k-pose SE(3) state is <6 MB — factor work dominates), and
the separator systems of SURVEY.md §2.4 combined with `psum` over ICI/DCN
inside `shard_map`.
"""

from graphslam_tpu.parallel.dist import (  # noqa: F401
    make_mesh,
    shard_graph,
    dist_gn_solve,
    dist_lm_solve,
)
from graphslam_tpu.parallel.dist_fused import (  # noqa: F401
    dist_fused_gn_solve,
    dist_fused_lm_solve,
)
from graphslam_tpu.parallel.dist_fused6 import (  # noqa: F401
    dist_fused6_gn_solve,
    dist_fused6_lm_solve,
)
