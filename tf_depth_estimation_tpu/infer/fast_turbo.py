"""Serving-folded eval forward for ``TurboDepthNet`` (the turbo track's fast path).

Same motivation as ``infer/fast.py`` for the parity DispNet: with realistic
(non-splat) BN running stats, XLA:TPU stops fusing some conv epilogue adds and a
real checkpoint serves slower than an init-stats bench suggests — measured 4.5%
on turbo-small (12.81 -> 13.38 ms/batch at 576x384 b128, ``tools/probe_turbo_bn.py``).
This module re-expresses the eval forward with the BN affine folded away:

  * the BN scale folds into each kernel's output channels (exact);
  * the BN shift (and the head's bias) rides an appended ones-input-channel at
    the SAME-padding top-left tap — ``infer.fast._bias_fold_kernel`` — so the
    epilogue add does not exist in the graph at all (exact: the tap always reads
    a real input cell when H, W divide by the stride, which the turbo grid
    guarantees).

``fold`` selects which convs carry their shift in-conv (the rest use a plain
epilogue add on the scale-folded kernel):

  * ``"none"``  — epilogue adds everywhere (isolates the pure-fold graph);
  * ``"base"``  — in-conv shifts for the base-grid convs only (stem/stemb/
    lat1/fuse1 + head), where most pixels live;
  * ``"all"``   — in-conv shifts everywhere.

All three are exact rewrites of ``TurboDepthNet.apply(..., train=False,
full_only=True)`` (tests/test_turbo.py).  Measured whole-graph on the v5e
(turbo-small 576x384 b128, warmed stats, ``tools/ab_turbo.py``): module 13.39,
fast/none 13.16, fast/base 14.05, fast/all 13.57 ms/batch — unlike the parity
stem, the ones-channel fold does NOT pay here (every turbo conv is >=1/4-grid
with a >=432-wide contraction; the K+1 concat costs more than the epilogue add),
so the serving default is ``fold="none"``: scale-folded kernels, plain shifts.

Not a reference component: the turbo track is the documented architecture-change
route past the parity graph's bf16 roofline (ROADMAP "Remaining candidates");
the serving contract it accelerates is ``batch_prediction.py:57-77``'s.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.infer.fast import _affine, _bias_fold_kernel
from tf_depth_estimation_tpu.models.turbo import TurboVariant
from tf_depth_estimation_tpu.ops.phase import depth_to_space_n, space_to_depth_n

_BASE_FOLD = ("stem", "stemb", "lat1", "fuse1", "disp1")


def fast_turbo_forward(
    variables: Dict[str, Any],
    image: jnp.ndarray,
    variant: TurboVariant,
    *,
    dtype=jnp.bfloat16,
    fold: str = "none",
) -> jnp.ndarray:
    """Eval-mode turbo forward; returns the full-resolution disparity [B, H, W, 1]
    (float32), matching ``TurboDepthNet(variant, dtype).apply(variables, image,
    train=False, full_only=True)[0]`` exactly in f32.
    """
    assert fold in ("none", "base", "all"), fold
    v = variant
    p = v.patch
    H, W = image.shape[1:3]
    m = v.min_hw_multiple()
    assert H % m == 0 and W % m == 0, (
        f"turbo-{v.name} needs H, W divisible by {m}, got {H}x{W}")
    params = variables["params"]
    stats = variables["batch_stats"]

    def fold_here(name):
        return fold == "all" or (fold == "base" and name in _BASE_FOLD)

    def conv(x, name, *, stride=1, relu=True, bn=True):
        if bn:
            s, t = _affine(params, stats, name)
            w = params[name]["Conv_0"]["kernel"] * s
        else:  # linear head: bias, no BN (the disp-head idiom of the parity nets)
            w = params[name]["Conv_0"]["kernel"]
            t = params[name]["Conv_0"]["bias"]
        if fold_here(name):
            w = _bias_fold_kernel(w, t, x.shape[1:3], stride)
            x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)
            y = jax.lax.conv_general_dilated(
                x, w.astype(dtype), (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = jax.lax.conv_general_dilated(
                x, w.astype(dtype), (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y + t.astype(dtype)
        return jax.nn.relu(y) if relu else y

    x = space_to_depth_n(image.astype(dtype), p)
    feats = []
    x = conv(x, "stem")
    if v.stem_convs == 2:
        x = conv(x, "stemb")
    feats.append(x)
    for i in range(2, len(v.widths) + 1):
        x = conv(x, f"enc{i}", stride=2)
        if v.enc_convs == 2:
            x = conv(x, f"enc{i}b")
        feats.append(x)

    y = conv(feats[-1], "lat%d" % len(feats), relu=False)
    for lvl in range(len(feats) - 1, 0, -1):
        y = conv(y, f"up{lvl}", relu=False)
        y = depth_to_space_n(y, 2)
        y = y + conv(feats[lvl - 1], f"lat{lvl}", relu=False)
        y = conv(y, f"fuse{lvl}")

    logits = depth_to_space_n(conv(y, "disp1", relu=False, bn=False), p)
    return (v.head_scale * jax.nn.sigmoid(logits) + v.head_offset).astype(
        jnp.float32)
