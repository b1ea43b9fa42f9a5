"""FPN-style upconvolution decoder over external backbone endpoints.

Rebuilds ``upconvolution_net`` (``nets_optflow_depth.py:279-333``): 1x1 lateral convs +
add + nearest resize over a list of five backbone feature maps (deepest first — the
reference feeds ResNet-v2-50 endpoints), with 4 linear disparity heads.  Only referenced
from commented-out ResNet experiments in the reference, but part of the API surface.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tf_depth_estimation_tpu.models.layers import SlimConv
from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like


class UpconvNet(nn.Module):
    bn_momentum: float = 0.999
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, endpoints: Sequence[jnp.ndarray], train: bool = True):
        if len(endpoints) != 5:
            raise ValueError("UpconvNet expects 5 backbone endpoints, deepest first")
        bn = dict(use_bn=True, bn_momentum=self.bn_momentum, dtype=self.dtype)

        def lateral(x, feat, name):
            return SlimConv(feat, (1, 1), stride=1, **bn, name=name)(x, train)

        def head(x, name):
            return SlimConv(1, (3, 3), stride=1, use_bn=False, activation=None,
                            dtype=self.dtype, name=name)(x, train).astype(jnp.float32)

        r0, r1, r2, r3, r4 = [e.astype(self.dtype) for e in endpoints]

        i5 = resize_like(lateral(r0, 512, "upcnv5"), r1) + r1
        i4 = resize_like(lateral(i5, 256, "upcnv4"), r2) + r2
        disp4 = head(i4, "disp4")

        i3 = resize_like(lateral(i4, 64, "upcnv3"), r3) + r3
        # ref nets_optflow_depth.py:313: odd +1-pixel bilinear grow before the disp3 head
        i3 = resize_bilinear(i3, (i3.shape[1] + 1, i3.shape[2] + 1)).astype(self.dtype)
        disp3 = head(i3, "disp3")

        i2 = resize_like(lateral(i3, 64, "upcnv2"), r4) + r4
        disp2 = head(i2, "disp2")

        u1 = lateral(i2, 32, "upcnv1")
        u1 = resize_bilinear(u1, (disp2.shape[1] * 2, disp2.shape[2] * 2)).astype(self.dtype)
        disp1 = head(u1, "disp1")

        return [disp1, disp2, disp3, disp4]
