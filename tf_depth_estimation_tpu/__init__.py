"""tf_depth_estimation_tpu — a TPU-native monocular depth / pose / optical-flow framework.

A ground-up JAX/XLA/Flax/Pallas rebuild of the capabilities of the TF1 research stack
``wrlife/tf_depth_estimation`` (see SURVEY.md for the component inventory).  Layers:

- ``geometry``  — differentiable projective geometry (rotations, poses, warps, sampling)
- ``ops``       — TPU-first primitive ops (TF1-parity resizes as MXU matmuls, scale-invariant
                  gradients, non-finite guards, schedules, Pallas kernels)
- ``losses``    — multi-scale supervised / self-supervised loss pipelines
- ``models``    — Flax DispNet / DepthPose / PoseExp / Upconv families
- ``data``      — host-side streaming loaders (colon JPEG+bin, DeMoN-style HDF5) + prefetch
- ``train``     — jit train steps, experiment configs, orbax checkpoints, loops
- ``infer``     — batched TPU inference, test-time refinement
- ``parallel``  — mesh construction and data-parallel sharding (pjit/shard_map)
- ``colmap``    — COLMAP scene parsing and 3D I/O tooling
"""

__version__ = "0.1.0"
