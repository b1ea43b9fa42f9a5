"""jit-compiled train/eval step factories — one per experiment family.

Each factory closes over the model + loss config and returns a function
``(state, batch, ...) -> (state, metrics)`` ready for ``jax.jit`` with the state donated
(buffers update in place in HBM).  The reference equivalents are ``sess.run(train_op)``
loops driven by ``slim.learning.create_train_op`` (e.g. ``train_depth_only.py:345-377``,
``split_training.py:330-413``).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.losses.config import LossWeights
from tf_depth_estimation_tpu.losses.pipelines import (
    depth_only_loss,
    depth_only_val_loss,
    depth_then_cam_loss,
    dim11_joint_loss,
    lr_full_loss,
    lr_gt_pose_loss,
    multi_source_loss,
    on_demon_loss,
    only_image_loss,
    optflow3_loss,
    optflow_combine_loss,
    optflow_only_loss,
    pairwise_depth_loss,
    single_depth_loss,
)


def _forward(state, params, inputs, train: bool, extra=()):
    """Model apply handling presence/absence of batch stats (bn-free variants)."""
    if state.batch_stats:
        variables = {"params": params, "batch_stats": state.batch_stats}
        if train:
            outs, mut = state.apply_fn(variables, inputs, *extra, train=True,
                                       mutable=["batch_stats"])
            return outs, mut["batch_stats"]
        return state.apply_fn(variables, inputs, *extra, train=False), state.batch_stats
    outs = state.apply_fn({"params": params}, inputs, *extra, train=train)
    return outs, state.batch_stats


def _make_step(loss_of_params, remat: bool = False):
    """Common glue: value_and_grad over params, apply updates, return metrics.

    ``remat`` wraps the loss in ``jax.checkpoint`` — the backward pass recomputes the
    forward instead of keeping all activations in HBM, trading ~1/3 more FLOPs for the
    memory headroom needed by large batches / high resolutions on a single chip.
    """

    def step(state, *args):
        fn = functools.partial(loss_of_params, state, *args)
        if remat:
            fn = jax.checkpoint(fn)
        (total, (metrics, new_stats)), grads = jax.value_and_grad(
            fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, metrics

    return step


def make_depth_only_step(w: LossWeights, *, remat: bool = False):
    """BASELINE config 2 (``train_depth_only.py``): disp_net on the left image, L1+smooth."""

    def loss_of_params(state, batch, params):
        preds, new_stats = _forward(state, params, batch["tgt_image"], train=True)
        total, comps = depth_only_loss(preds, batch["label"], w)
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_depth_only_val_step(w: LossWeights):
    def val_step(state, batch):
        preds, _ = _forward(state, state.params, batch["tgt_image"], train=False)
        _, comps = depth_only_val_loss(preds, batch["label"], w)
        return comps

    return val_step


def make_single_depth_step(w: LossWeights, *, remat: bool = False):
    """split_training phase 2 (``split_training.py:110-147``): single disp_net over
    [upsampled pair-depth ‖ image]; ``compute_loss_single_depth``.  The sig-weight ramp
    reads the step counter carried in the train state."""

    def loss_of_params(state, batch, params):
        preds, new_stats = _forward(state, params, batch["input"], train=True)
        total, comps = single_depth_loss(preds, batch["label"], state.step, w)
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_pairwise_step(w: LossWeights, full_scales: bool = False, *, remat: bool = False):
    """split_training phase 1 (``split_training.py:209-417``): DepthPoseNet forward on
    (L‖R) and (R‖L), ``compute_loss_pairwise_depth``."""

    def loss_of_params(state, batch, params):
        step = state.step
        pair = batch["image_pair"]  # [B, H, W, 6] = left ‖ right
        left, right = pair[..., :3], pair[..., 3:]
        rev = jnp.concatenate([right, left], axis=-1)
        (d_l, pose_r, exp_l), stats1 = _forward(state, params, pair, train=True)
        # second forward shares params (reference reuse_variables, split_training.py:234);
        # batch stats from the second pass win, mirroring TF1 update-op ordering
        state2 = state.replace(batch_stats=stats1)
        (d_r, pose_l, exp_r), stats2 = _forward(state2, params, rev, train=True)
        # gt_right_cam = [translation | rotation] (split_training.py:451)
        gt_cam = jnp.concatenate([batch["translation"], batch["rotation"]], axis=-1)
        # phase-1 label is the quarter-res GT depth2 (split_training.py:453,456);
        # the full-scale pairtest variant takes depth0
        label = batch["depth0"] if full_scales else batch["depth2"]
        total, comps = pairwise_depth_loss(
            left, right, d_l, pose_r, exp_l, d_r, pose_l, exp_r,
            gt_cam, batch["intrinsics"], label, step, w,
            full_scales=full_scales,
        )
        return total, (comps, stats2)

    return _make_step(loss_of_params, remat=remat)


def make_depth_then_cam_step(w: LossWeights, *, remat: bool = False):
    """BASELINE config 3 (``train_depth_then_cam.py``): DepthPoseNet(full-res) on the
    pair; exp-weighted photometric with predicted pose."""

    def loss_of_params(state, batch, params):
        pair = batch["image_pair"]
        left, right = pair[..., :3], pair[..., 3:]
        (disps, poses, exps), new_stats = _forward(state, params, pair, train=True)
        total, comps = depth_then_cam_loss(
            left, right, disps, poses, exps, batch["intrinsics"], w
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_optflow_combine_step(w: LossWeights, *, remat: bool = False):
    """BASELINE config 4 (``train_optflow_combine.py``): 8-output DispNet (depth + flow
    decoders) on the left image; joint depth/flow/photometric losses."""

    def loss_of_params(state, batch, params):
        outs, new_stats = _forward(state, params, batch["tgt_image"], train=True)
        n = w.num_scales
        depths = outs[:n]
        flow_x = [f[..., 0:1] for f in outs[n:]]
        flow_y = [f[..., 1:2] for f in outs[n:]]
        total, comps = optflow_combine_loss(
            batch["tgt_image"], batch["src_image"], depths, flow_x, flow_y,
            batch["label"], batch["tgt2src_projs"][:, 0], batch["intrinsics"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_on_demon_step(w: LossWeights, smooth_only: bool = True, *, remat: bool = False):
    """BASELINE config 5 (``train_depth_only_onDemon.py``): DepthPoseNet (truncated) on
    the DeMoN pair; smoothness(+depth) on the inverse-depth predictions."""

    def loss_of_params(state, batch, params):
        (disps, _pose, _exp), new_stats = _forward(
            state, params, batch["image_pair"], train=True
        )
        total, comps = on_demon_loss(disps, batch["depth0"], w, scale_offset=2,
                                     smooth_only=smooth_only)
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_lr_full_step(w: LossWeights, *, remat: bool = False):
    """``train_depth_then_cam_lr.py``: LRNet (single disp net on each view + pair net in
    both orders) under the full symmetric loss.  Batch: DeMoN dict."""

    def loss_of_params(state, batch, params):
        pair = batch["image_pair"]
        left, right = pair[..., :3], pair[..., 3:]
        out, new_stats = _forward(state, params, left, train=True, extra=(right,))
        gt_cam = jnp.concatenate([batch["translation"], batch["rotation"]], axis=-1)
        total, comps = lr_full_loss(
            left, right, out["single_left"], out["single_right"],
            out["pair_left"], out["pair_right"], out["pose_right"], out["pose_left"],
            out["exp_left"], out["exp_right"], gt_cam, batch["intrinsics"],
            batch["depth0"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_lr_gt_step(w: LossWeights, *, remat: bool = False):
    """``train_depth_then_cam_lr_gtdepth_gtcam.py``: pair nets both directions under the
    GT-pose symmetric loss."""

    def loss_of_params(state, batch, params):
        pair = batch["image_pair"]
        left, right = pair[..., :3], pair[..., 3:]
        out, new_stats = _forward(state, params, left, train=True, extra=(right,))
        gt_cam = jnp.concatenate([batch["translation"], batch["rotation"]], axis=-1)
        total, comps = lr_gt_pose_loss(
            left, right, out["pair_left"], out["pair_right"],
            out["pose_right"], out["pose_left"], out["exp_left"], out["exp_right"],
            gt_cam, batch["intrinsics"], batch["depth0"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_dim11_step(w: LossWeights, *, remat: bool = False):
    """``train_depth_only_dim11.py``: DepthPoseNet (full-res) on the colon pair with the
    joint depth+pose loss."""

    def loss_of_params(state, batch, params):
        pair = jnp.concatenate([batch["tgt_image"], batch["src_image"]], axis=-1)
        (disps, poses, exps), new_stats = _forward(state, params, pair, train=True)
        total, comps = dim11_joint_loss(
            batch["tgt_image"], batch["src_image"], disps, poses, exps,
            batch["intrinsics"], batch["label"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_only_image_step(w: LossWeights, *, remat: bool = False):
    """``train_onlyimage.py``: disp net on the stacked pair; GT-proj photometric only."""

    def loss_of_params(state, batch, params):
        pair = jnp.concatenate([batch["tgt_image"], batch["src_image"]], axis=-1)
        preds, new_stats = _forward(state, params, pair, train=True)
        total, comps = only_image_loss(
            batch["tgt_image"], batch["src_image"], preds,
            batch["tgt2src_projs"][:, 0], batch["intrinsics"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_optflow_only_step(w: LossWeights, *, remat: bool = False):
    """``train_optflow_only.py``: 3-channel disp net; channels 0/1 are flow x/y."""

    def loss_of_params(state, batch, params):
        preds, new_stats = _forward(state, params, batch["tgt_image"], train=True)
        fx = [p[..., 0:1] for p in preds]
        fy = [p[..., 1:2] for p in preds]
        total, comps = optflow_only_loss(
            batch["tgt_image"], batch["src_image"], fx, fy, batch["label"],
            batch["tgt2src_projs"][:, 0], batch["intrinsics"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_sfm_multi_step(w: LossWeights, *, remat: bool = False):
    """``train.py``: 3-channel disp net on the target image; SfMLearner-style loss with
    per-source GT-projection warps."""

    def loss_of_params(state, batch, params):
        preds, new_stats = _forward(state, params, batch["tgt_image"], train=True)
        total, comps = multi_source_loss(
            batch["tgt_image"], [batch["src_image"]], preds, batch["label"],
            batch["tgt2src_projs"], batch["intrinsics"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def make_optflow3_step(w: LossWeights, *, remat: bool = False):
    """``train_optflow.py``: 3-channel disp net on the stacked pair; broadcast L1."""

    def loss_of_params(state, batch, params):
        pair = jnp.concatenate([batch["tgt_image"], batch["src_image"]], axis=-1)
        preds, new_stats = _forward(state, params, pair, train=True)
        total, comps = optflow3_loss(
            batch["tgt_image"], batch["src_image"], preds, batch["label"],
            batch["tgt2src_projs"][:, 0], batch["intrinsics"], w,
        )
        return total, (comps, new_stats)

    return _make_step(loss_of_params, remat=remat)


def jit_step(step_fn, donate_state: bool = True):
    """jit with the conventional donation of the state argument."""
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
