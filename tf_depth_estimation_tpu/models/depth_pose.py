"""Joint depth + camera-pose + explainability networks.

``DepthPoseNet`` rebuilds the reference's ``depth_net`` — the workhorse of the pairwise
experiments (``nets_optflow_depth.py:151-276`` truncated-decoder variant and
``nets_optflow_depth_pairtest.py:151-276`` full-resolution variant) — as one module with a
``full_resolution`` switch.

``PoseExpNet`` rebuilds the SfMLearner-style ``pose_exp_net`` (``nets.py:18-74``; verbatim
copies in the other net files).  No reference entry point calls it (SURVEY §2.1), but it is
part of the API surface.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tf_depth_estimation_tpu.models.layers import SlimConv, concat
from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like


class DepthPoseNet(nn.Module):
    """Shared-encoder depth decoder + pose head + explainability decoder.

    Input: ``[B, H, W, 6]`` concatenated image pair (target ‖ source).
    Returns ``(disps, pose, masks)``:
      - truncated (default, ref ``nets_optflow_depth.py:276``): ``disps=[disp3, disp4]``
        (1/4 and 1/8 resolution), ``masks=[mask3, mask4]``;
      - full_resolution (ref ``nets_optflow_depth_pairtest.py:276``):
        ``disps=[disp1..disp4]``, ``masks=[mask1..mask4]``.
    Pose: ``[B, num_source, 6]`` — UNSCALED mean of a 1x1-conv head over a stride-2 conv
    from cnv6b (ref ``nets_optflow_depth.py:178-186``; contrast PoseExpNet's 0.01 scale).
    """

    full_resolution: bool = False
    num_source: int = 1
    disp_scaling: float = 4.0
    min_disp: float = 0.0
    bn_momentum: float = 0.99  # nets_optflow_depth.py:152 decay 0.99; pairtest uses 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_pair, train: bool = True):
        H, W = image_pair.shape[1:3]
        x = image_pair.astype(self.dtype)
        bn = dict(use_bn=True, bn_momentum=self.bn_momentum, dtype=self.dtype)

        def conv(x, feat, k, s, name):
            return SlimConv(feat, (k, k), stride=s, **bn, name=name)(x, train)

        def deconv(x, feat, k, name):
            return SlimConv(feat, (k, k), stride=2, transpose=True, **bn, name=name)(x, train)

        def linear_head(x, feat, k, name):
            return SlimConv(feat, (k, k), stride=1, use_bn=False, activation=None,
                            dtype=self.dtype, name=name)(x, train).astype(jnp.float32)

        # encoder: cnv1..cnv6b shared by depth/pose/exp branches
        cnv1b = conv(conv(x, 32, 7, 2, "cnv1"), 32, 7, 1, "cnv1b")
        cnv2b = conv(conv(cnv1b, 64, 5, 2, "cnv2"), 64, 5, 1, "cnv2b")
        cnv3b = conv(conv(cnv2b, 128, 3, 2, "cnv3"), 128, 3, 1, "cnv3b")
        cnv4b = conv(conv(cnv3b, 256, 3, 2, "cnv4"), 256, 3, 1, "cnv4b")
        cnv5b = conv(conv(cnv4b, 512, 3, 2, "cnv5"), 512, 3, 1, "cnv5b")
        cnv6b = conv(conv(cnv5b, 512, 3, 2, "cnv6"), 512, 3, 1, "cnv6b")

        # pose branch (unscaled 6-DoF per source)
        cam = conv(cnv6b, 256, 3, 2, "pose_cam_cnv7")
        pose_pred = linear_head(cam, 6 * self.num_source, 1, "pose_pred")
        pose = jnp.mean(pose_pred, axis=(1, 2)).reshape(-1, self.num_source, 6)

        # explainability branch from cnv5b
        e5 = deconv(cnv5b, 256, 3, "exp_upcnv5")
        e4 = deconv(e5, 128, 3, "exp_upcnv4")
        mask4 = linear_head(e4, self.num_source * 2, 3, "mask4")
        e3 = deconv(e4, 64, 3, "exp_upcnv3")
        mask3 = linear_head(e3, self.num_source * 2, 3, "mask3")
        masks = [mask3, mask4]
        if self.full_resolution:
            e2 = deconv(e3, 32, 5, "exp_upcnv2")
            mask2 = linear_head(e2, self.num_source * 2, 5, "mask2")
            e1 = deconv(e2, 16, 7, "exp_upcnv1")
            mask1 = linear_head(e1, self.num_source * 2, 7, "mask1")
            masks = [mask1, mask2, mask3, mask4]

        # depth branch tail of the encoder
        cnv7b = conv(conv(cnv6b, 512, 3, 2, "cnv7"), 512, 3, 1, "cnv7b")

        def disp_head(x, name):
            y = linear_head(x, 1, 3, name)
            return self.disp_scaling * nn.sigmoid(y) + self.min_disp

        up7 = resize_like(deconv(cnv7b, 512, 3, "upcnv7"), cnv6b)
        i7 = conv(concat([up7, cnv6b]), 512, 3, 1, "icnv7")
        up6 = resize_like(deconv(i7, 512, 3, "upcnv6"), cnv5b)
        i6 = conv(concat([up6, cnv5b]), 512, 3, 1, "icnv6")
        up5 = resize_like(deconv(i6, 256, 3, "upcnv5"), cnv4b)
        i5 = conv(concat([up5, cnv4b]), 256, 3, 1, "icnv5")
        up4 = resize_like(deconv(i5, 128, 3, "upcnv4"), cnv3b)
        i4 = conv(concat([up4, cnv3b]), 128, 3, 1, "icnv4")
        disp4 = disp_head(i4, "disp4")
        disp4_up = resize_bilinear(disp4, (H // 4, W // 4))

        up3 = resize_like(deconv(i4, 64, 3, "upcnv3"), cnv2b)
        i3 = conv(concat([up3, cnv2b, disp4_up.astype(self.dtype)]), 64, 3, 1, "icnv3")
        disp3 = disp_head(i3, "disp3")

        if not self.full_resolution:
            return [disp3, disp4], pose, masks

        disp3_up = resize_bilinear(disp3, (H // 2, W // 2))
        up2 = resize_like(deconv(i3, 32, 3, "upcnv2"), cnv1b)
        i2 = conv(concat([up2, cnv1b, disp3_up.astype(self.dtype)]), 32, 3, 1, "icnv2")
        disp2 = disp_head(i2, "disp2")
        disp2_up = resize_bilinear(disp2, (H, W))

        up1 = deconv(i2, 16, 3, "upcnv1")
        if up1.shape[1:3] != (H, W):
            up1 = resize_like(up1, disp2_up)
        i1 = conv(concat([up1, disp2_up.astype(self.dtype)]), 16, 3, 1, "icnv1")
        disp1 = disp_head(i1, "disp1")

        return [disp1, disp2, disp3, disp4], pose, masks


class PoseExpNet(nn.Module):
    """SfMLearner pose + explainability net (ref ``nets.py:18-74``).

    Input: target image and source stack concatenated on channels
    ``[B, H, W, 3*(1+num_source)]``.  Returns ``(pose, masks)`` with pose scaled by 0.01
    (ref ``nets.py:47``) and 4 mask scales (or None) of ``num_source*2`` channels.
    """

    num_source: int = 1
    do_exp: bool = True
    bn_momentum: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        bn = dict(use_bn=True, bn_momentum=self.bn_momentum, dtype=self.dtype)
        x = inputs.astype(self.dtype)

        def conv(x, feat, k, s, name):
            return SlimConv(feat, (k, k), stride=s, **bn, name=name)(x, train)

        def deconv(x, feat, k, name):
            return SlimConv(feat, (k, k), stride=2, transpose=True, **bn, name=name)(x, train)

        def linear_head(x, feat, k, name):
            return SlimConv(feat, (k, k), stride=1, use_bn=False, activation=None,
                            dtype=self.dtype, name=name)(x, train).astype(jnp.float32)

        cnv1 = conv(x, 16, 7, 2, "cnv1")
        cnv2 = conv(cnv1, 32, 5, 2, "cnv2")
        cnv3 = conv(cnv2, 64, 3, 2, "cnv3")
        cnv4 = conv(cnv3, 128, 3, 2, "cnv4")
        cnv5 = conv(cnv4, 256, 3, 2, "cnv5")

        cnv6 = conv(cnv5, 256, 3, 2, "pose_cnv6")
        cnv7 = conv(cnv6, 256, 3, 2, "pose_cnv7")
        pred = linear_head(cnv7, 6 * self.num_source, 1, "pose_pred")
        pose = 0.01 * jnp.mean(pred, axis=(1, 2)).reshape(-1, self.num_source, 6)

        if not self.do_exp:
            return pose, [None, None, None, None]

        up5 = deconv(cnv5, 256, 3, "exp_upcnv5")
        up4 = deconv(up5, 128, 3, "exp_upcnv4")
        mask4 = linear_head(up4, self.num_source * 2, 3, "mask4")
        up3 = deconv(up4, 64, 3, "exp_upcnv3")
        mask3 = linear_head(up3, self.num_source * 2, 3, "mask3")
        up2 = deconv(up3, 32, 5, "exp_upcnv2")
        mask2 = linear_head(up2, self.num_source * 2, 5, "mask2")
        up1 = deconv(up2, 16, 7, "exp_upcnv1")
        mask1 = linear_head(up1, self.num_source * 2, 7, "mask1")
        return pose, [mask1, mask2, mask3, mask4]
