"""Distillation capacity probe: how closely can a turbo student match a teacher?

Distills a TurboDepthNet against a warmed random-init depth4 teacher on synthetic
texture frames and reports train AND HELD-OUT mean-abs / abs-rel error of the
student's full-res disparity vs the teacher's (the BASELINE accuracy metric with
the teacher as reference).  A random teacher is a *capacity* probe — it bounds the
function-matching ability of the architecture, not real-data accuracy (no real
datasets ship in this image); rerun with ``--teacher_checkpoint_dir`` for a real
deployment number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/distill_quality.py \
         [--variant base] [--height 64] [--width 96] [--steps 400] — one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", default="base")
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--train_frames", type=int, default=64)
    p.add_argument("--holdout_frames", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--teacher_checkpoint_dir", default="")
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_depth_estimation_tpu.data.synthetic import _texture
    from tf_depth_estimation_tpu.models import (
        DispNet,
        DispNetVariant,
        TurboDepthNet,
        TurboVariant,
    )
    from tf_depth_estimation_tpu.train.distill import make_distill_eval, make_distill_step
    from tf_depth_estimation_tpu.train.state import adam, create_train_state
    from tf_depth_estimation_tpu.train.steps import jit_step

    H, W = args.height, args.width
    rng = np.random.RandomState(args.seed)
    # serving input range (raw 0..255) — see distill_turbo._frame_batches
    frames = np.stack([_texture(rng, H, W)
                       for _ in range(args.train_frames + args.holdout_frames)]
                      ).astype(np.float32)
    train_frames, holdout = frames[: args.train_frames], frames[args.train_frames:]

    teacher = DispNet(DispNetVariant.depth4())
    x0 = jnp.asarray(train_frames[: max(args.batch_size, 2)])
    t_vars = jax.jit(lambda k, x: teacher.init(k, x, train=False))(
        jax.random.PRNGKey(1), x0)
    if args.teacher_checkpoint_dir:
        from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
        from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state

        t_state = create_train_state(teacher, x0)
        mgr = CheckpointManager(args.teacher_checkpoint_dir)
        t_state = load_into_state(
            t_state, mgr.restore_group("model", like=_save_tree(t_state)))
        t_vars = {"params": t_state.params, "batch_stats": t_state.batch_stats}
    else:
        # warm the teacher's BN stats on the input range so its served function is
        # checkpoint-scale-like (same discipline as bench.py)
        @jax.jit
        def t_warm(v, x):
            _, upd = teacher.apply(v, x, train=True, mutable=["batch_stats"])
            return upd["batch_stats"]

        for _ in range(2):
            t_vars = {**t_vars, "batch_stats": t_warm(t_vars, jnp.asarray(train_frames))}

    student = TurboDepthNet(TurboVariant.by_name(args.variant))
    state = create_train_state(student, jnp.zeros((args.batch_size, H, W, 3)),
                               tx=adam(args.learning_rate))
    step = jit_step(make_distill_step(teacher.apply))
    evaluate = jax.jit(make_distill_eval(teacher.apply))

    def aug(batch):
        # mirror-x / rot180, free under distillation (teacher labels any input)
        flip = rng.rand(len(batch)) < 0.5
        rot = rng.rand(len(batch)) < 0.5
        batch = np.where(flip[:, None, None, None], batch[:, :, ::-1], batch)
        return np.where(rot[:, None, None, None], batch[:, ::-1, ::-1], batch)

    first = last = None
    for i in range(args.steps):
        idx = rng.randint(0, len(train_frames), size=args.batch_size)
        state, metrics = step(state, t_vars, jnp.asarray(aug(train_frames[idx])))
        if first is None:
            first = float(metrics["total_loss"])
        if (i + 1) % max(1, args.steps // 10) == 0:
            print(f"# step {i+1}: distill loss {float(metrics['total_loss']):.4f}",
                  file=sys.stderr, flush=True)
    last = float(metrics["total_loss"])

    tr = {k: float(v) for k, v in
          evaluate(state, t_vars, jnp.asarray(train_frames[: args.batch_size])).items()}
    ho = {k: float(v) for k, v in
          evaluate(state, t_vars, jnp.asarray(holdout[: args.batch_size])).items()}
    result = {
        "metric": f"turbo_{args.variant}_distill_quality_{W}x{H}_{args.steps}steps",
        "distill_loss_first": round(first, 4), "distill_loss_last": round(last, 4),
        "train_mae_vs_teacher": round(tr["mae_vs_teacher"], 4),
        "holdout_mae_vs_teacher": round(ho["mae_vs_teacher"], 4),
        "train_absrel_vs_teacher": round(tr["absrel_vs_teacher"], 4),
        "holdout_absrel_vs_teacher": round(ho["absrel_vs_teacher"], 4),
        "teacher": "checkpoint" if args.teacher_checkpoint_dir else "warmed-random",
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
