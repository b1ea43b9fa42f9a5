"""Composite model for the symmetric L/R experiments.

``train_depth_then_cam_lr.py:120-154`` builds a shared-weight single-view disp_net applied
to each view plus a pairwise depth_net applied in both stack orders; here that is one Flax
module so the whole ensemble lives in one parameter tree / train state (named submodules
``single`` and ``pair`` give the checkpoint the same two-group structure as the
reference's variable scopes ``model_singledepth`` / ``model_pairdepth``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tf_depth_estimation_tpu.models.depth_pose import DepthPoseNet
from tf_depth_estimation_tpu.models.dispnet import DispNet, DispNetVariant


class LRNet(nn.Module):
    """Single-view net on L and R (shared weights) + pair net on (L‖R) and (R‖L)."""

    dtype: jnp.dtype = jnp.float32
    with_single: bool = True

    @nn.compact
    def __call__(self, image_left, image_right, train: bool = True):
        out = {}
        if self.with_single:
            single = DispNet(DispNetVariant.depth4(), dtype=self.dtype, name="single")
            out["single_left"] = single(image_left, train)
            out["single_right"] = single(image_right, train)
        pair = DepthPoseNet(full_resolution=True, dtype=self.dtype, name="pair")
        d_l, pose_r, exp_l = pair(jnp.concatenate([image_left, image_right], axis=-1), train)
        d_r, pose_l, exp_r = pair(jnp.concatenate([image_right, image_left], axis=-1), train)
        out.update(pair_left=d_l, pair_right=d_r, pose_right=pose_r, pose_left=pose_l,
                   exp_left=exp_l, exp_right=exp_r)
        return out
