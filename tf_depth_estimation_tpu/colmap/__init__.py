"""COLMAP scene tooling + 3D / flow I/O (SURVEY §2.7) — host-side NumPy, Python 3."""

from tf_depth_estimation_tpu.colmap.scene_manager import Camera, SceneManager
from tf_depth_estimation_tpu.colmap.io import (
    quaternion_to_matrix,
    axis_angle_to_matrix_np,
    matrix_to_axis_angle_np,
    read_flow,
    bilinear_interpolate,
    write_ply_points,
    write_ply_surface,
    write_xyz,
    normals_from_depth,
    shading_from_normals,
)

__all__ = [
    "Camera",
    "SceneManager",
    "quaternion_to_matrix",
    "axis_angle_to_matrix_np",
    "matrix_to_axis_angle_np",
    "read_flow",
    "bilinear_interpolate",
    "write_ply_points",
    "write_ply_surface",
    "write_xyz",
    "normals_from_depth",
    "shading_from_normals",
]
