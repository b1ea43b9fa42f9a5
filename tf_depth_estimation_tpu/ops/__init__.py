"""TPU-first primitive ops: TF1-parity resizes (as MXU matmuls), non-finite guards,
scale-invariant gradients, schedules, and Pallas kernels."""

from tf_depth_estimation_tpu.ops.resize import (
    resize_bilinear,
    resize_area,
    resize_nearest,
    resize_like,
)
from tf_depth_estimation_tpu.ops.nonfinite import replace_nonfinite
from tf_depth_estimation_tpu.ops.sig import scale_invariant_gradient, pointwise_l2_loss
from tf_depth_estimation_tpu.ops.schedules import ease_out_quad
from tf_depth_estimation_tpu.ops.pallas_losses import sig_l2_fused, smoothness_fused
from tf_depth_estimation_tpu.ops.pallas_warp import bilinear_sample_fused

__all__ = [
    "resize_bilinear",
    "resize_area",
    "resize_nearest",
    "resize_like",
    "replace_nonfinite",
    "scale_invariant_gradient",
    "pointwise_l2_loss",
    "ease_out_quad",
    "sig_l2_fused",
    "smoothness_fused",
    "bilinear_sample_fused",
]
