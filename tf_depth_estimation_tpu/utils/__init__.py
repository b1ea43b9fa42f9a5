"""Misc host utilities: visualization, timing."""

from tf_depth_estimation_tpu.utils.viz import gray2rgb, normalize_depth_for_display

__all__ = ["gray2rgb", "normalize_depth_for_display"]
