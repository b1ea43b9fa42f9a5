"""Multi-scale supervised / self-supervised loss pipelines (SURVEY §2.3).

``basic``      — second-order smoothness, explainability CE, si-log-RMSE metric
``config``     — per-experiment weight tables (the reference's post-parse FLAGS blocks)
``pipelines``  — the per-entry-point loss graphs, one jit-able function each
"""

from tf_depth_estimation_tpu.losses.basic import (
    second_order_smoothness,
    reference_explain_mask,
    explain_reg_loss,
    si_log_rmse,
)
from tf_depth_estimation_tpu.losses.config import LossWeights
from tf_depth_estimation_tpu.losses.pipelines import (
    single_depth_loss,
    depth_only_loss,
    depth_only_val_loss,
    pairwise_depth_loss,
    depth_then_cam_loss,
    optflow_combine_loss,
    on_demon_loss,
    lr_full_loss,
    lr_gt_pose_loss,
    dim11_joint_loss,
    only_image_loss,
    optflow_only_loss,
    optflow3_loss,
)

__all__ = [
    "second_order_smoothness",
    "reference_explain_mask",
    "explain_reg_loss",
    "si_log_rmse",
    "LossWeights",
    "single_depth_loss",
    "depth_only_loss",
    "depth_only_val_loss",
    "pairwise_depth_loss",
    "depth_then_cam_loss",
    "optflow_combine_loss",
    "on_demon_loss",
    "lr_full_loss",
    "lr_gt_pose_loss",
    "dim11_joint_loss",
    "only_image_loss",
    "optflow_only_loss",
    "optflow3_loss",
]
