"""Two-phase curriculum — ref ``split_training.py``.

Phase 1 ("pairwise"): DepthPoseNet (truncated) on (L‖R) and (R‖L) with
``compute_loss_pairwise_depth`` — depth L1 + camera loss + ramped sig loss; Adam on an
exponentially-decayed LR (10000 steps, 0.96, staircase — ``split_training.py:330-334``);
checkpoints under the ``model_pairdepth`` group.

Phase 2 ("single"): frozen phase-1 net produces a coarse pair depth; a DispNet consumes
[nearest-upsampled coarse depth ‖ image] (``split_training.py:110-113``) and trains alone
against ``compute_loss_single_depth`` (the reference defines the LR decay here but passes
the constant LR to Adam — reproduced); checkpoints under ``model_singledepth``.

The reference ships with the phase-2 call commented out at HEAD
(``split_training.py:474``); both phases are runnable here via ``--phase``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tf_depth_estimation_tpu.losses import LossWeights
from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
from tf_depth_estimation_tpu.ops.resize import resize_nearest
from tf_depth_estimation_tpu.ops.schedules import exponential_decay
from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
from tf_depth_estimation_tpu.train.experiments.common import (
    base_parser,
    compute_dtype,
    demon_loader,
    setup_run,
)
from tf_depth_estimation_tpu.train.loop import MetricLogger, load_into_state, run_training, _save_tree
from tf_depth_estimation_tpu.train.state import adam, create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step, make_pairwise_step, make_single_depth_step


def main(argv=None):
    p = base_parser(__doc__, batch_size=1, max_steps=600001, save_latest_freq=5000)
    p.add_argument("--checkpoint_dir_single", default="./checkpoints_single")
    p.add_argument("--max_steps_single", type=int, default=150001)
    p.add_argument("--image_height", type=int, default=192)
    p.add_argument("--image_width", type=int, default=256)
    p.add_argument("--phase", choices=["pair", "single", "both"], default="both")
    p.add_argument("--continue_train_single", action="store_true")
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    w = dataclasses.replace(LossWeights.split_training(), height=H, width=W,
                            max_steps=args.max_steps)
    dtype = compute_dtype(args)

    pair_model = DepthPoseNet(full_resolution=False, dtype=dtype)
    pair_tx = adam(exponential_decay(args.learning_rate, 10000, 0.96), args.beta1)
    pair_state = create_train_state(pair_model, jnp.zeros((args.batch_size, H, W, 6)),
                                    tx=pair_tx)

    if args.phase in ("pair", "both"):
        batches = demon_loader(args, H, W)
        mgr, logger, pair_state = setup_run(args, pair_state, group="model_pairdepth")
        summary_fn = None
        if args.rich_summaries:
            from tf_depth_estimation_tpu.train.experiments.common import fixture_pair
            from tf_depth_estimation_tpu.train.summaries import make_pairwise_summary_fn

            summary_fn = make_pairwise_summary_fn(w, fixture_pair(args, H, W))
        pair_state, _ = run_training(
            state=pair_state, train_step=jit_step(make_pairwise_step(w)), batches=batches,
            max_steps=args.max_steps, logger=logger, checkpoint=mgr,
            checkpoint_group="model_pairdepth", save_latest_freq=args.save_latest_freq,
            summary_freq=args.summary_freq,
            image_summary_fn=summary_fn, image_summary_freq=args.image_summary_freq,
        )

    if args.phase in ("single", "both"):
        # restore pair net (cross-phase restore, split_training.py:174)
        pair_mgr = CheckpointManager(args.checkpoint_dir)
        if pair_mgr.latest_step() is not None:
            tree = pair_mgr.restore_group("model_pairdepth", like=_save_tree(pair_state))
            pair_state = load_into_state(pair_state, tree)

        single_model = DispNet(DispNetVariant.depth4(), dtype=dtype)
        single_state = create_train_state(
            single_model, jnp.zeros((args.batch_size, H, W, 4)),
            learning_rate=args.learning_rate, beta1=args.beta1,
        )

        pair_variables = {"params": pair_state.params}
        if pair_state.batch_stats:
            pair_variables["batch_stats"] = pair_state.batch_stats

        @jax.jit
        def coarse_depth(pair):
            disps, _pose, _mask = pair_model.apply(pair_variables, pair, train=False)
            return resize_nearest(disps[0], (H, W))  # disp3 -> full res (nearest)

        def single_batches():
            for b in demon_loader(args, H, W):
                left = b["image_pair"][..., :3]
                inp = jnp.concatenate([coarse_depth(b["image_pair"]), left], axis=-1)
                yield {"input": inp, "label": b["depth0"]}

        mgr_s = CheckpointManager(args.checkpoint_dir_single)
        logger_s = MetricLogger(args.checkpoint_dir_single)
        if args.continue_train_single and mgr_s.latest_step() is not None:
            tree = mgr_s.restore_group("model_singledepth", like=_save_tree(single_state))
            single_state = load_into_state(single_state, tree)
        single_state, _ = run_training(
            state=single_state, train_step=jit_step(make_single_depth_step(w)),
            batches=single_batches(), max_steps=args.max_steps_single, logger=logger_s,
            checkpoint=mgr_s, checkpoint_group="model_singledepth",
            save_latest_freq=args.save_latest_freq, summary_freq=args.summary_freq,
           
        )
        return pair_state, single_state
    return pair_state, None


if __name__ == "__main__":
    main()
