"""Differentiable projective geometry, pure jnp — jit/vmap/grad-able throughout."""

from tf_depth_estimation_tpu.geometry.rotations import (
    euler_to_matrix,
    axis_angle_to_matrix,
)
from tf_depth_estimation_tpu.geometry.pose import pose_vec_to_mat, invert_transform
from tf_depth_estimation_tpu.geometry.camera import (
    make_intrinsics_matrix,
    scale_intrinsics_pyramid,
    pixel_grid,
    pixel_to_cam,
    cam_to_pixel,
    pad_intrinsics_4x4,
)
from tf_depth_estimation_tpu.geometry.sampling import bilinear_sample
from tf_depth_estimation_tpu.geometry.warp import (
    projective_inverse_warp,
    flow_warp,
    flow_from_coords,
    resample_depth,
    consistent_depth_error,
)

__all__ = [
    "euler_to_matrix",
    "axis_angle_to_matrix",
    "pose_vec_to_mat",
    "invert_transform",
    "make_intrinsics_matrix",
    "scale_intrinsics_pyramid",
    "pixel_grid",
    "pixel_to_cam",
    "cam_to_pixel",
    "pad_intrinsics_4x4",
    "bilinear_sample",
    "projective_inverse_warp",
    "flow_warp",
    "flow_from_coords",
    "resample_depth",
    "consistent_depth_error",
]
