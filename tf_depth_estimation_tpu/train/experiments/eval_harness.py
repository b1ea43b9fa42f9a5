"""Eval harnesses — ref ``split_training_test_singlenet.py`` / ``split_training_test_pairnet.py``.

Runs a trained checkpoint in inference mode (``is_training=False``) over the DeMoN stream
and reports the same loss values the training graphs optimize — the reference's notion of
"testing" (SURVEY §4): re-running the loss graph without weight updates.

``--net pair``   — full-resolution DepthPoseNet under the full-scale pairtest losses
                   (``my_losses_pairtest.compute_loss_pairwise_depth``).
``--net single`` — DispNet over [nearest-upsampled pair depth ‖ image] under
                   ``compute_loss_single_depth`` (needs both checkpoints, as the
                   reference's notebook cascade does).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.losses.pipelines import pairwise_depth_loss, single_depth_loss
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
from tf_depth_estimation_tpu.ops.resize import resize_nearest
from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
from tf_depth_estimation_tpu.train.experiments.common import base_parser, compute_dtype, demon_loader
from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state
from tf_depth_estimation_tpu.train.state import create_train_state


def main(argv=None):
    p = base_parser(__doc__, batch_size=16)
    p.add_argument("--net", choices=["pair", "single"], default="pair")
    p.add_argument("--image_height", type=int, default=192)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--eval_batches", type=int, default=10)
    p.add_argument("--checkpoint_dir_single", default="./checkpoints_single")
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    w = dataclasses.replace(LossWeights.split_training(), height=H, width=W)
    dtype = compute_dtype(args)

    pair_model = DepthPoseNet(full_resolution=True, dtype=dtype)
    pair_state = create_train_state(pair_model, jnp.zeros((args.batch_size, H, W, 6)))
    mgr = CheckpointManager(args.checkpoint_dir)
    if mgr.latest_step() is not None:
        try:
            tree = mgr.restore_group("model_pairdepth", like=_save_tree(pair_state))
            pair_state = load_into_state(pair_state, tree)
        except Exception as e:  # shape-mismatched (truncated) checkpoints: report clearly
            print(f"warning: could not restore pair checkpoint: {e}")

    pair_vars = {"params": pair_state.params}
    if pair_state.batch_stats:
        pair_vars["batch_stats"] = pair_state.batch_stats

    if args.net == "single":
        single_model = DispNet(DispNetVariant.depth4(), dtype=dtype)
        single_state = create_train_state(single_model, jnp.zeros((args.batch_size, H, W, 4)))
        mgr_s = CheckpointManager(args.checkpoint_dir_single)
        if mgr_s.latest_step() is not None:
            tree = mgr_s.restore_group("model_singledepth", like=_save_tree(single_state))
            single_state = load_into_state(single_state, tree)
        single_vars = {"params": single_state.params}
        if single_state.batch_stats:
            single_vars["batch_stats"] = single_state.batch_stats

        @jax.jit
        def eval_batch(batch):
            disps, _pose, _m = pair_model.apply(pair_vars, batch["image_pair"], train=False)
            coarse = resize_nearest(disps[0], (H, W))
            left = batch["image_pair"][..., :3]
            preds = single_model.apply(
                single_vars, jnp.concatenate([coarse, left], axis=-1), train=False
            )
            _, comps = single_depth_loss(preds, batch["depth0"], w.max_steps, w)
            return comps
    else:

        @jax.jit
        def eval_batch(batch):
            pair = batch["image_pair"]
            left, right = pair[..., :3], pair[..., 3:]
            rev = jnp.concatenate([right, left], axis=-1)
            d_l, pose_r, exp_l = pair_model.apply(pair_vars, pair, train=False)
            d_r, pose_l, exp_r = pair_model.apply(pair_vars, rev, train=False)
            gt_cam = jnp.concatenate([batch["translation"], batch["rotation"]], axis=-1)
            _, comps = pairwise_depth_loss(
                left, right, d_l, pose_r, exp_l, d_r, pose_l, exp_r, gt_cam,
                batch["intrinsics"], batch["depth0"], w.max_steps, w, full_scales=True,
            )
            return comps

    batches = demon_loader(args, H, W, test_phase=True)
    sums, n = {}, 0
    for _ in range(args.eval_batches):
        comps = eval_batch(next(batches))
        for k, v in comps.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    means = {k: v / max(n, 1) for k, v in sums.items()}
    print(" ".join(f"{k}={v:.5g}" for k, v in sorted(means.items())))
    return means


if __name__ == "__main__":
    main()
