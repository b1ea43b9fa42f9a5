"""Data-parallel scale-out over TPU meshes (SURVEY §2.8).

The reference is strictly single-process/single-GPU; the TPU-native scale-out is
data-parallel pjit over a 1-D ``data`` mesh axis: parameters replicated, batches sharded,
gradient all-reduce inserted by XLA as ICI collectives.  TP/PP/EP/SP have no reference
analog (no transformer, ~30M-param CNN) and are intentionally N/A.
"""

from tf_depth_estimation_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    make_dp_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "make_dp_step",
]
