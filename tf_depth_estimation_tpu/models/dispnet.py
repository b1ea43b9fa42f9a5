"""DispNet encoder–decoder family.

One parameterized Flax module covering all four ``disp_net`` variants of the reference
(SURVEY §2.1):

  - ``nets.py:76-147``                 3-channel linear heads (SfMLearner legacy)
  - ``nets_depth.py:76-199``           1-ch sigmoid*10 + 0.001 heads **plus** a parallel
                                       optical-flow decoder with 2-ch linear heads
  - ``nets_optflow_depth.py:76-147``   1-ch sigmoid*4 heads, bn decay 0.99
  - ``nets_optflow_depth_pairtest.py:76-147``  same, batch-norm disabled

Architecture (identical across variants): 7 stride-2 encoder stages (each with a stride-1
'b' refinement conv), kernel sizes 7/7, 5/5, then 3x3; skip-connected deconv decoder whose
multi-scale disparity heads feed back into the next decoder stage through a TF1-bilinear
upsample + concat.

TPU-first: NHWC, optional bfloat16 compute dtype (params stay f32), static shapes, all
resizes are the MXU-matmul TF1-parity ops from ``ops/resize.py``.  ``resize_like`` patches
are applied at every decoder level (the reference only needs them at levels 7-5 —
``nets_optflow_depth.py:105,110,115`` — but a no-op patch is free and makes odd input
sizes work at every level).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tf_depth_estimation_tpu.models.layers import SlimConv, concat
from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like


@dataclasses.dataclass(frozen=True)
class DispNetVariant:
    """Static configuration selecting one of the reference disp_net flavors."""

    name: str
    head_channels: int = 1
    head_activation: Optional[str] = "sigmoid"  # 'sigmoid' | None
    disp_scaling: float = 4.0
    min_disp: float = 0.0
    use_bn: bool = True
    bn_momentum: float = 0.99
    flow_decoder: bool = False

    @staticmethod
    def sfm() -> "DispNetVariant":
        """nets.py: 3-channel linear heads, default slim bn decay, scaling unused."""
        return DispNetVariant(
            "sfm", head_channels=3, head_activation=None, disp_scaling=1.0,
            min_disp=0.0, bn_momentum=0.999,
        )

    @staticmethod
    def depth10_flow() -> "DispNetVariant":
        """nets_depth.py: sigmoid*10 + 0.001 depth heads + parallel flow decoder."""
        return DispNetVariant(
            "depth10_flow", disp_scaling=10.0, min_disp=0.001, bn_momentum=0.999,
            flow_decoder=True,
        )

    @staticmethod
    def depth4() -> "DispNetVariant":
        """nets_optflow_depth.py: sigmoid*4 heads, bn decay 0.99 (BASELINE configs 1/2)."""
        return DispNetVariant("depth4", disp_scaling=4.0, bn_momentum=0.99)

    @staticmethod
    def depth4_nobn() -> "DispNetVariant":
        """nets_optflow_depth_pairtest.py: sigmoid*4 heads, batch-norm disabled."""
        return DispNetVariant("depth4_nobn", disp_scaling=4.0, use_bn=False)


_ENC = (  # (features, kernel) per encoder stage; each stage = stride-2 conv + stride-1 'b'
    (32, 7), (64, 5), (128, 3), (256, 3), (512, 3), (512, 3), (512, 3),
)


class _Encoder(nn.Module):
    variant: DispNetVariant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        v = self.variant
        skips = []
        for i, (feat, k) in enumerate(_ENC):
            x = SlimConv(feat, (k, k), stride=2, use_bn=v.use_bn, bn_momentum=v.bn_momentum,
                         dtype=self.dtype, name=f"cnv{i+1}")(x, train)
            x = SlimConv(feat, (k, k), stride=1, use_bn=v.use_bn, bn_momentum=v.bn_momentum,
                         dtype=self.dtype, name=f"cnv{i+1}b")(x, train)
            skips.append(x)
        return skips  # [cnv1b .. cnv7b]


class _Decoder(nn.Module):
    """Skip-connected deconv decoder with multi-scale heads and head feedback.

    ``head_cfg=None`` disables heads for the upper levels’ outputs only (not used by any
    reference variant; kept simple).  ``suffix`` namespaces the flow decoder ('_opt').
    """

    variant: DispNetVariant
    head_channels: int
    head_activation: Optional[str]
    head_scale: float
    head_offset: float
    suffix: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, skips, full_hw, train: bool):
        v = self.variant
        H, W = full_hw
        cnv1b, cnv2b, cnv3b, cnv4b, cnv5b, cnv6b, cnv7b = skips
        sfx = self.suffix

        def deconv(x, feat, name):
            return SlimConv(feat, (3, 3), stride=2, use_bn=v.use_bn,
                            bn_momentum=v.bn_momentum, transpose=True,
                            dtype=self.dtype, name=name)(x, train)

        def iconv(x, feat, name):
            return SlimConv(feat, (3, 3), stride=1, use_bn=v.use_bn,
                            bn_momentum=v.bn_momentum, dtype=self.dtype, name=name)(x, train)

        def head(x, name):
            y = SlimConv(self.head_channels, (3, 3), stride=1, use_bn=False,
                         activation=None, dtype=self.dtype, name=name)(x, train)
            if self.head_activation == "sigmoid":
                y = nn.sigmoid(y)
            return (self.head_scale * y + self.head_offset).astype(jnp.float32)

        x = deconv(cnv7b, 512, f"upcnv7{sfx}")
        x = resize_like(x, cnv6b)
        x = iconv(concat([x, cnv6b]), 512, f"icnv7{sfx}")

        x = deconv(x, 512, f"upcnv6{sfx}")
        x = resize_like(x, cnv5b)
        x = iconv(concat([x, cnv5b]), 512, f"icnv6{sfx}")

        x = deconv(x, 256, f"upcnv5{sfx}")
        x = resize_like(x, cnv4b)
        x = iconv(concat([x, cnv4b]), 256, f"icnv5{sfx}")

        x = deconv(x, 128, f"upcnv4{sfx}")
        x = resize_like(x, cnv3b)
        x = iconv(concat([x, cnv3b]), 128, f"icnv4{sfx}")
        d4 = head(x, f"disp4{sfx}")
        d4_up = resize_bilinear(d4, (H // 4, W // 4))

        x = deconv(x, 64, f"upcnv3{sfx}")
        x = resize_like(x, cnv2b)
        x = iconv(concat([x, cnv2b, d4_up.astype(self.dtype)]), 64, f"icnv3{sfx}")
        d3 = head(x, f"disp3{sfx}")
        d3_up = resize_bilinear(d3, (H // 2, W // 2))

        x = deconv(x, 32, f"upcnv2{sfx}")
        x = resize_like(x, cnv1b)
        x = iconv(concat([x, cnv1b, d3_up.astype(self.dtype)]), 32, f"icnv2{sfx}")
        d2 = head(x, f"disp2{sfx}")
        d2_up = resize_bilinear(d2, (H, W))

        x = deconv(x, 16, f"upcnv1{sfx}")
        if x.shape[1:3] != (H, W):
            x = resize_like(x, d2_up)
        x = iconv(concat([x, d2_up.astype(self.dtype)]), 16, f"icnv1{sfx}")
        d1 = head(x, f"disp1{sfx}")

        return [d1, d2, d3, d4]


class DispNet(nn.Module):
    """Single-image (or stacked-pair) multi-scale disparity network.

    Returns ``disps`` — 4 scales, full->1/8 resolution — and, when the variant has a flow
    decoder, ``flows`` (4 scales, 2 channels).  Heads are always float32 even under
    bfloat16 compute.
    """

    variant: DispNetVariant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = True):
        v = self.variant
        H, W = image.shape[1:3]
        x = image.astype(self.dtype)
        skips = _Encoder(v, dtype=self.dtype, name="encoder")(x, train)
        disps = _Decoder(
            v, v.head_channels, v.head_activation, v.disp_scaling, v.min_disp,
            dtype=self.dtype, name="decoder",
        )(skips, (H, W), train)
        if not v.flow_decoder:
            return disps
        flows = _Decoder(
            v, 2, None, 1.0, 0.0, suffix="_opt", dtype=self.dtype, name="flow_decoder"
        )(skips, (H, W), train)
        return disps + flows
