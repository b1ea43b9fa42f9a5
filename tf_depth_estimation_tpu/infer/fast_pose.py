"""Serving-mode eval forward for DepthPoseNet (depth + pose + explainability).

``fast_depth_pose_forward`` evaluates the reference ``depth_net``
(``nets_optflow_depth.py:151-276`` truncated / ``nets_optflow_depth_pairtest.py``
full-resolution) from a standard ``DepthPoseNet.init/apply`` variables tree, with
the eval-mode batch-norm affine folded the way ``infer/fast.py`` does for DispNet:

  * the multiplicative part multiplies each conv/deconv kernel's output channels
    at trace time (constant math — XLA folds it at compile time);
  * the stem conv's shift rides an appended ones-input-channel kernel tap
    (``fast.py`` ``conv_bias_folded``) because XLA:TPU compiles a non-splat
    epilogue-add constant ~25% slower for low-channel-count stem convs — the
    penalty every REAL checkpoint pays on the plain module forward (measured,
    ROADMAP round-3 campaign);
  * all other shifts stay fused bias-adds (measured free for deep layers).

Exact up to float reassociation — locked against ``DepthPoseNet.apply`` by
``tests/test_fast_infer.py``.  Used by ``PairPredictor`` / ``FlowAugmentedPredictor``
(ref ``batch_prediction_cam_est.py`` / ``batch_prediction_optflow.py``).

Measured A/B at the reference operating point (192x256 b16, warmed stats, v5e):
module 3.08 vs fast_pose 3.09 ms/batch — NEUTRAL there; the non-splat penalty
that costs DispNet 30% at 576x384 b128 does not materialize at this 9x-smaller
activation footprint.  The folded path ships anyway: it is exact, keeps the two
predict families on one convention, and inoculates larger serving shapes where
the penalty provably bites.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.infer.fast import _affine, conv_bias_folded_op
from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like


def fast_depth_pose_forward(
    variables: Dict[str, Any],
    image_pair: jnp.ndarray,
    *,
    full_resolution: bool = False,
    num_source: int = 1,
    disp_scaling: float = 4.0,
    min_disp: float = 0.0,
    dtype=jnp.bfloat16,
) -> Tuple[List[jnp.ndarray], jnp.ndarray, List[jnp.ndarray]]:
    """Eval forward: [B, H, W, C] pair -> (disps, pose [B, num_source, 6], masks).

    Matches ``DepthPoseNet(full_resolution, num_source, ...).apply(..., train=False)``
    for any input channel count (6-ch pair, 11-ch flow-augmented).
    """
    p = variables["params"]
    st = variables["batch_stats"]
    H, W = image_pair.shape[1:3]
    # %4: the bias tap needs stride-divisible H, W (see _bias_fold_kernel) AND the
    # decoder needs disp4_up at H//4 to match the twice-ceil-halved cnv2b skip —
    # even-but-not-%4 sizes (e.g. 190) pass a %2 check then crash in a concat.
    # Every reference operating point (192x256, 240x720, 224x224/480) qualifies.
    assert H % 4 == 0 and W % 4 == 0, (
        f"fast_depth_pose_forward requires H, W divisible by 4, got {H}x{W}")
    dt = dtype

    def conv_raw(x, w, stride=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv(x, name, stride=1):
        # BN scale folded into the kernel; shift as a fused bias-add + relu
        s, t = _affine(p, st, name)
        w = (p[name]["Conv_0"]["kernel"] * s).astype(dt)
        return jax.nn.relu(conv_raw(x, w, stride) + t.astype(dt))

    def conv_stem(x, name, stride):
        # low-channel stem: shift INSIDE the conv via the ones-channel tap
        # (one shared implementation: fast.conv_bias_folded_op, see its docstring)
        s, t = _affine(p, st, name)
        return conv_bias_folded_op(x, p[name]["Conv_0"]["kernel"], s, t, stride, dt)

    def deconv(x, name):
        s, t = _affine(p, st, name)
        w = (p[name]["TFConvTranspose_0"]["kernel"] * s[:, None]).astype(dt)
        y = jax.lax.conv_transpose(
            x, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
        return jax.nn.relu(y + t.astype(dt))

    def linear_head(x, name):
        w = p[name]["Conv_0"]["kernel"].astype(dt)
        b = p[name]["Conv_0"]["bias"].astype(dt)
        return (conv_raw(x, w) + b).astype(jnp.float32)

    def disp_head(x, name):
        return disp_scaling * jax.nn.sigmoid(linear_head(x, name)) + min_disp

    cat = lambda xs: jnp.concatenate(xs, -1)
    x = image_pair.astype(dt)

    # encoder (shared); cnv1 carries its shift in-kernel (low-C input: 6 or 11)
    cnv1b = conv(conv_stem(x, "cnv1", 2), "cnv1b")
    cnv2b = conv(conv(cnv1b, "cnv2", 2), "cnv2b")
    cnv3b = conv(conv(cnv2b, "cnv3", 2), "cnv3b")
    cnv4b = conv(conv(cnv3b, "cnv4", 2), "cnv4b")
    cnv5b = conv(conv(cnv4b, "cnv5", 2), "cnv5b")
    cnv6b = conv(conv(cnv5b, "cnv6", 2), "cnv6b")

    # pose branch
    cam = conv(cnv6b, "pose_cam_cnv7", 2)
    pose_pred = linear_head(cam, "pose_pred")
    pose = jnp.mean(pose_pred, axis=(1, 2)).reshape(-1, num_source, 6)

    # explainability branch
    e5 = deconv(cnv5b, "exp_upcnv5")
    e4 = deconv(e5, "exp_upcnv4")
    mask4 = linear_head(e4, "mask4")
    e3 = deconv(e4, "exp_upcnv3")
    mask3 = linear_head(e3, "mask3")
    masks = [mask3, mask4]
    if full_resolution:
        e2 = deconv(e3, "exp_upcnv2")
        mask2 = linear_head(e2, "mask2")
        e1 = deconv(e2, "exp_upcnv1")
        mask1 = linear_head(e1, "mask1")
        masks = [mask1, mask2, mask3, mask4]

    # depth branch
    cnv7b = conv(conv(cnv6b, "cnv7", 2), "cnv7b")
    up7 = resize_like(deconv(cnv7b, "upcnv7"), cnv6b)
    i7 = conv(cat([up7, cnv6b]), "icnv7")
    up6 = resize_like(deconv(i7, "upcnv6"), cnv5b)
    i6 = conv(cat([up6, cnv5b]), "icnv6")
    up5 = resize_like(deconv(i6, "upcnv5"), cnv4b)
    i5 = conv(cat([up5, cnv4b]), "icnv5")
    up4 = resize_like(deconv(i5, "upcnv4"), cnv3b)
    i4 = conv(cat([up4, cnv3b]), "icnv4")
    disp4 = disp_head(i4, "disp4")
    disp4_up = resize_bilinear(disp4, (H // 4, W // 4))

    up3 = resize_like(deconv(i4, "upcnv3"), cnv2b)
    i3 = conv(cat([up3, cnv2b, disp4_up.astype(dt)]), "icnv3")
    disp3 = disp_head(i3, "disp3")

    if not full_resolution:
        return [disp3, disp4], pose, masks

    disp3_up = resize_bilinear(disp3, (H // 2, W // 2))
    up2 = resize_like(deconv(i3, "upcnv2"), cnv1b)
    i2 = conv(cat([up2, cnv1b, disp3_up.astype(dt)]), "icnv2")
    disp2 = disp_head(i2, "disp2")
    disp2_up = resize_bilinear(disp2, (H, W))

    up1 = deconv(i2, "upcnv1")
    if up1.shape[1:3] != (H, W):
        up1 = resize_like(up1, disp2_up)
    i1 = conv(cat([up1, disp2_up.astype(dt)]), "icnv1")
    disp1 = disp_head(i1, "disp1")

    return [disp1, disp2, disp3, disp4], pose, masks
