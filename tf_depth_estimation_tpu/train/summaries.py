"""Rich training observability: per-scale image summaries, depth histograms, and the
fixed-fixture smoke inference.

TPU-native equivalent of the reference's summary graph
(``split_training.py:275-325``: scalar losses + per-scale left/right/projected/error
images + depth histograms guarded by ``replace_nonfinite`` + the sculpture-pair
validation inference at ``split_training.py:380-393``; same pattern in
``train_optflow_combine.py:318-368``).  Summary tensors are produced by a single jitted
forward at summary cadence — not inside the train step — so the hot loop pays nothing
when summaries are off and one extra compiled call when on.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.geometry import projective_inverse_warp
from tf_depth_estimation_tpu.ops.resize import resize_area


def tf1_image_norm(x: np.ndarray) -> np.ndarray:
    """TF1 ``tf.summary.image`` float rescaling, per image (summary_op docs):
    all-non-negative inputs scale so the max is 255; otherwise 0 maps to 127 and the
    extreme value to 0/255."""
    x = np.asarray(x, np.float32)
    flat = x.reshape(x.shape[0], -1)
    out = np.empty_like(x, dtype=np.uint8)
    for i in range(x.shape[0]):
        v = x[i]
        mn, mx = float(flat[i].min()), float(flat[i].max())
        if mn >= 0.0:
            scaled = v * (255.0 / mx) if mx > 0 else v
        else:
            scale = 127.0 / max(mx, -mn) if max(mx, -mn) > 0 else 1.0
            scaled = v * scale + 127.0
        out[i] = np.clip(scaled, 0, 255).astype(np.uint8)
    return out


def _finite(x):
    """Histogram guard — the reference wraps labels in ``sops.replace_nonfinite``
    (``split_training.py:283``) because TF histograms reject NaN/Inf."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def make_pairwise_summary_fn(w, fixture_pair: Optional[np.ndarray] = None,
                             max_images: int = 2) -> Callable:
    """Summary producer for the pairwise/split-training family.

    Returns ``fn(state, batch) -> (images, histograms)`` where ``images`` maps summary
    names to uint8 [N,H,W,C] arrays and ``histograms`` to float arrays.  Covers the
    reference set (``split_training.py:283-325``): per-scale left/right images, predicted
    depths (both views), projected left image and projection error, plus depth/image
    histograms; ``fixture_pair`` ([1,H,W,6], the sculpture-pair analog of
    ``split_training.py:380-393``) adds the fixed-fixture smoke inference ('val depth',
    'val depth inv', 'val image').
    """

    @jax.jit
    def _summarize(st, pair, intrinsics):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        left, right = pair[..., :3], pair[..., 3:]
        rev = jnp.concatenate([right, left], axis=-1)
        d_l, pose_r, _ = st.apply_fn(variables, pair, train=False)
        d_r, _pose_l, _ = st.apply_fn(variables, rev, train=False)
        images, hists = {}, {}
        n = max(w.num_scales - 2, 1)
        # the truncated DepthPoseNet's first prediction sits at pyramid scale 2;
        # summaries follow the predictions (the reference's summary lists are built
        # from the loss-loop scales, split_training.py:304-325)
        offset = int(np.log2(pair.shape[1] // d_l[0].shape[1]))
        for s in range(min(n, len(d_l))):
            hw = (d_l[s].shape[1], d_l[s].shape[2])
            sc = min(offset + s, intrinsics.shape[1] - 1)
            cl = resize_area(left, hw)
            cr = resize_area(right, hw)
            depth_l = 1.0 / d_l[s]
            # the pairwise family's poses are axis-angle (pipelines.py:135-136)
            warp = projective_inverse_warp(
                cr, depth_l[..., 0], pose_r[:, 0, :], intrinsics[:, sc],
                fmt="angleaxis")
            images[f"scale{s}_left_image"] = cl
            images[f"scale{s}_right_image"] = cr
            images[f"scale{s}_pred_depth_left"] = depth_l
            images[f"scale{s}_pred_depth_right"] = 1.0 / d_r[s]
            images[f"scale{s}_projected_image_left"] = warp.image
            images[f"scale{s}_project_error_left"] = jnp.abs(warp.image - cl)
        hists["scale0_pred_depth_single_left"] = _finite(1.0 / d_l[0])
        hists["scale0_pred_depth_single_right"] = _finite(1.0 / d_r[0])
        hists["image_value_range"] = left
        return images, hists

    @jax.jit
    def _fixture(st, pair):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        disps, _pose, _ = st.apply_fn(variables, pair, train=False)
        return disps[0]

    fixture = None if fixture_pair is None else jnp.asarray(fixture_pair)

    def fn(st, batch):
        pair = batch["image_pair"][:max_images]
        images, hists = _summarize(st, pair, batch["intrinsics"][:max_images])
        if "depth0" in batch:
            hists["scale_depth"] = _finite(batch["depth0"][:max_images])
        images = {k: tf1_image_norm(np.asarray(v)) for k, v in images.items()}
        if fixture is not None:
            vd = np.asarray(_fixture(st, fixture))
            images["val_depth"] = tf1_image_norm(1.0 / vd)
            images["val_depth_inv"] = tf1_image_norm(vd)
            images["val_image"] = tf1_image_norm(
                np.asarray(fixture[..., 3:]) + 0.5)
        return images, {k: np.asarray(v) for k, v in hists.items()}

    return fn


def make_depth_summary_fn(w, max_images: int = 2) -> Callable:
    """Summary producer for the single-image families (depth_only / optflow_combine —
    ref ``train_optflow_combine.py:318-368``): target image, per-scale predicted
    depth, and label/pred histograms guarded like ``sops.replace_nonfinite``."""

    @jax.jit
    def _summarize(st, image):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        outs = st.apply_fn(variables, image, train=False)
        images = {"target_image": image}
        hists = {"image_value_range": image}
        for s in range(min(w.num_scales, len(outs))):
            images[f"scale{s}_pred_depth"] = 1.0 / outs[s][..., :1]
        hists["scale0_pred_depth"] = _finite(1.0 / outs[0][..., :1])
        return images, hists

    def fn(st, batch):
        image = batch.get("tgt_image", batch.get("image"))[:max_images]
        images, hists = _summarize(st, image)
        if "label" in batch:
            hists["scale_depth"] = _finite(batch["label"][:max_images])
        images = {k: tf1_image_norm(np.asarray(v)) for k, v in images.items()}
        return images, {k: np.asarray(v) for k, v in hists.items()}

    return fn
