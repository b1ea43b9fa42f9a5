"""Score any depth checkpoint on the distill holdout — one comparable JSON row.

The round-4 campaign produces models through three routes (task-trained depth4
teacher, task-trained turbo, teacher-distilled turbo) whose quality numbers come
from two different harnesses (``train_colon_chip.py`` val si-log-RMSE on its own
val split; ``distill_chip.py`` abs-rel on its holdout).  This tool puts them on
ONE ruler: the distill holdout (``distill_chip.make_corpus(seed+2000)``), scoring
abs-rel / MAE vs the synthetic scenes' GT depth plus the reference's validation
metric (si-log-RMSE, ``train_depth_only.py:141-156`` — via ``losses/basic.py``).

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/eval_depth_chip.py \
        --checkpoint_dir /tmp/ckpt_turbo_direct_nano --model turbo:nano \
        [--group model] [--weights weights/turbo_nano_distilled_576x384.npz]
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", default="")
    p.add_argument("--group", default="model",
                   help="orbax group ('model' for train_colon_chip runs, "
                        "'turbo' for distill_chip students)")
    p.add_argument("--weights", default="", help=".npz serving weights instead")
    p.add_argument("--model", required=True,
                   help="'depth4' or 'turbo:<preset>' (must match the checkpoint)")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--holdout_frames", type=int, default=48)
    p.add_argument("--seed", type=int, default=0,
                   help="distill_chip seed; holdout uses seed+2000")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--label", default="", help="extra 'label' field for the row")
    p.add_argument("--scene_family", default="v1", choices=["v1", "rich"],
                   help="synthetic scene family of the holdout")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if bool(args.checkpoint_dir) == bool(args.weights):
        p.error("pass exactly one of --checkpoint_dir / --weights")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_depth_estimation_tpu.models import (
        DispNet,
        DispNetVariant,
        TurboDepthNet,
        TurboVariant,
    )
    from tools.distill_chip import make_corpus

    H, W = args.height, args.width
    if args.model == "depth4":
        model = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)[0][..., 0])
    elif args.model.startswith("turbo:"):
        variant = TurboVariant.by_name(args.model.split(":", 1)[1])
        model = TurboDepthNet(variant, dtype=jnp.float32)
        fwd = jax.jit(lambda v, x: model.apply(
            v, x, train=False, full_only=True)[0][..., 0])
    else:
        raise SystemExit(f"unknown --model {args.model}")

    if args.weights:
        from tf_depth_estimation_tpu.train.checkpoint import load_variables_npz

        tree, _meta = load_variables_npz(args.weights)
    else:
        from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager

        tree = CheckpointManager(args.checkpoint_dir).restore_group(args.group)
    variables = {"params": tree["params"], "batch_stats": tree["batch_stats"]}

    holdout, gt_depth = make_corpus(args.holdout_frames, H, W,
                                    seed=args.seed + 2000, keep_depth=True,
                                    family=args.scene_family)
    x = jnp.asarray(holdout, jnp.float32)
    preds = np.concatenate(
        [np.asarray(fwd(variables, x[i : i + args.batch_size]))
         for i in range(0, x.shape[0], args.batch_size)], 0)
    gt = gt_depth[..., 0]

    # The colon-pair pipeline supervises the sigmoid*4 head against RAW depth
    # (PairDepthDataset keeps _z.bin as-is; the synthetic scenes live in
    # [0.4, 3.75] — inside [0,4]).  Score predictions directly against GT depth,
    # exactly like tools/distill_chip.py's vs-GT rows.
    #
    # si-log-RMSE is the REFERENCE's form — sqrt(mean(d^2) + mean(d)^2), the '+'
    # quirk of ``train_depth_only.py:248-249`` via ``losses/basic.py:si_log_rmse``
    # — so this row is directly comparable with train_colon_chip's val metric.
    # The standard Eigen-et-al variance form ('-') is reported separately as
    # ``eigen_si_log_rmse_vs_gt`` (scale-invariant; flatters scale-biased models).
    from tf_depth_estimation_tpu.losses.basic import si_log_rmse

    err = np.abs(preds - gt)
    si = np.log(np.maximum(preds, 1e-6)) - np.log(np.maximum(gt, 1e-6))
    per_frame = np.mean(err / np.maximum(gt, 1e-3), axis=(1, 2))
    rng = np.random.RandomState(0)
    boots = per_frame[rng.randint(0, len(per_frame),
                                  size=(2000, len(per_frame)))].mean(axis=1)
    row = {
        "model": args.model,
        "source": args.weights or args.checkpoint_dir,
        "label": args.label,
        "holdout_absrel_vs_gt": round(float(per_frame.mean()), 5),
        "holdout_absrel_vs_gt_ci95": [
            round(float(np.percentile(boots, 2.5)), 5),
            round(float(np.percentile(boots, 97.5)), 5)],
        "holdout_mae_vs_gt": round(float(np.mean(err)), 5),
        "holdout_si_log_rmse_vs_gt": round(float(si_log_rmse(
            jnp.maximum(jnp.asarray(gt), 1e-6),
            jnp.maximum(jnp.asarray(preds), 1e-6))), 5),
        "eigen_si_log_rmse_vs_gt": round(float(np.sqrt(
            np.mean(si ** 2) - np.mean(si) ** 2)), 5),
        "resolution": f"{W}x{H}",
        "holdout_frames": args.holdout_frames,
        "scene_family": args.scene_family,
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    main()
