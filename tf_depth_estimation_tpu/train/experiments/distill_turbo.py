"""Distill a trained depth4 DispNet into the TurboDepthNet serving architecture.

TPU-specific extension (no reference counterpart): the parity DispNet graph is
roofline-bound near ~5.2k frames/s on a v5e; the turbo student (``models/turbo.py``)
is the documented architecture route past it.  The closest reference idiom is the
two-phase curriculum of ``split_training.py:110-174`` (a trained net supervising a
second one); here the teacher is a depth4 checkpoint (e.g. from
``experiments/depth_only.py``) and the student learns its full 4-scale disparity
pyramid on unlabeled frames.

Usage::

    python -m tf_depth_estimation_tpu.train.experiments.distill_turbo \
        --teacher_checkpoint_dir ./checkpoints_depth_only \
        --frames_glob '/data/frames/*.jpg' --image_height 384 --image_width 576 \
        --turbo_variant base --checkpoint_dir ./checkpoints_turbo

Without ``--frames_glob`` it distills on deterministic synthetic textures (smoke /
CI); without ``--teacher_checkpoint_dir`` the teacher is randomly initialized with
warmed BN stats (pipeline validation only — a real run needs a trained teacher).
"""
from __future__ import annotations

import glob

import jax
import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.models import (
    DispNet,
    DispNetVariant,
    TurboDepthNet,
    TurboVariant,
)
from tf_depth_estimation_tpu.train.distill import make_distill_eval, make_distill_step
from tf_depth_estimation_tpu.train.experiments.common import (
    base_parser,
    compute_dtype,
    setup_run,
)
from tf_depth_estimation_tpu.train.loop import run_training
from tf_depth_estimation_tpu.train.state import adam, create_train_state
from tf_depth_estimation_tpu.train.steps import jit_step


_CACHE_FRAMES = 1024  # ~2.5 MB/frame at 384x576 — caps host RAM at ~2.5 GB


def _frame_batches(args, H, W):
    """Infinite [B,H,W,3] float32 batches in the SERVING input range (raw 0..255).

    The depth4 serving surface feeds unnormalized frames — the reference quirk of
    ``batch_prediction.py:59-69`` (training normalized /255, inference did not),
    reproduced by ``DepthPredictor._load_frame``.  The student must mimic the
    teacher on the distribution it will be *served* on, so distillation runs on
    raw 0..255 for both nets.  Frames are decoded lazily per batch (a whole-glob
    eager decode would OOM the host on a realistic corpus) with a capped cache.

    Mirror-x / rot180 augmentation (each p=0.5, the DeMoN reader's augmentations —
    ``data/demon.py``) is FREE under distillation: the teacher labels whatever
    input it sees, so any input transform just enriches the distribution (disable
    with ``--no_aug``).
    """

    def aug(batch, rng):
        if not getattr(args, "aug", True):
            return batch
        flip = rng.rand(len(batch)) < 0.5
        rot = rng.rand(len(batch)) < 0.5
        batch = np.where(flip[:, None, None, None], batch[:, :, ::-1], batch)
        return np.where(rot[:, None, None, None], batch[:, ::-1, ::-1], batch)

    rng = np.random.RandomState(args.seed)
    if args.frames_glob:
        paths = sorted(glob.glob(args.frames_glob))
        if not paths:
            raise FileNotFoundError(
                f"--frames_glob {args.frames_glob!r} matched no files")
        from PIL import Image

        cache = {}

        def load(p):
            got = cache.get(p)
            if got is None:
                im = Image.open(p).convert("RGB").resize((W, H), Image.BILINEAR)
                got = np.asarray(im, np.float32)
                if len(cache) < _CACHE_FRAMES:
                    cache[p] = got
            return got

        while True:
            idx = rng.randint(0, len(paths), size=args.batch_size)
            batch = np.stack([load(paths[i]) for i in idx])
            yield {"image": jnp.asarray(aug(batch, rng))}
    else:
        from tf_depth_estimation_tpu.data.synthetic import _texture

        frames = np.stack(  # _texture is already 0..255
            [_texture(rng, H, W) for _ in range(16)]).astype(np.float32)
        while True:
            idx = rng.randint(0, len(frames), size=args.batch_size)
            yield {"image": jnp.asarray(aug(frames[idx], rng))}


def _load_teacher(args, H, W):
    """depth4 teacher variables; restored from ``--teacher_checkpoint_dir`` if given."""
    teacher = DispNet(DispNetVariant.depth4(), dtype=compute_dtype(args))
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = teacher.init(jax.random.PRNGKey(1), x0, train=False)
    if args.teacher_checkpoint_dir:
        from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
        from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state

        t_state = create_train_state(teacher, x0)
        mgr = CheckpointManager(args.teacher_checkpoint_dir)
        if mgr.latest_step() is None:
            raise FileNotFoundError(
                f"no checkpoint under {args.teacher_checkpoint_dir}")
        t_state = load_into_state(
            t_state, mgr.restore_group("model", like=_save_tree(t_state)))
        variables = {"params": t_state.params, "batch_stats": t_state.batch_stats}
        print(f"teacher restored from step {int(t_state.step)}")
    return teacher, variables


def main(argv=None):
    p = base_parser(__doc__, batch_size=8, max_steps=5000, save_latest_freq=500)
    p.add_argument("--teacher_checkpoint_dir", default="",
                   help="depth4 checkpoint dir (e.g. a depth_only.py run)")
    p.add_argument("--frames_glob", default="",
                   help="unlabeled training frames; default: synthetic textures")
    p.add_argument("--turbo_variant", default="base",
                   choices=list(TurboVariant.PRESETS))
    p.add_argument("--image_height", type=int, default=384)
    p.add_argument("--image_width", type=int, default=576)
    p.add_argument("--no_aug", dest="aug", action="store_false",
                   help="disable the mirror-x/rot180 input augmentation")
    args = p.parse_args(argv)

    H, W = args.image_height, args.image_width
    teacher, t_vars = _load_teacher(args, H, W)

    variant = TurboVariant.by_name(args.turbo_variant)
    student = TurboDepthNet(variant, dtype=compute_dtype(args))
    state = create_train_state(student, jnp.zeros((args.batch_size, H, W, 3)),
                               tx=adam(args.learning_rate, args.beta1))
    mgr, logger, state = setup_run(args, state, group="turbo")

    step = jit_step(make_distill_step(teacher.apply))
    evaluate = jax.jit(make_distill_eval(teacher.apply))
    batches = _frame_batches(args, H, W)

    def val_fn(st):
        return evaluate(st, t_vars, next(batches)["image"])

    state, last = run_training(
        state=state,
        train_step=lambda st, batch: step(st, t_vars, batch["image"]),
        batches=batches, max_steps=args.max_steps, logger=logger, checkpoint=mgr,
        checkpoint_group="turbo", save_latest_freq=args.save_latest_freq,
        validation_check=args.validation_check, val_fn=val_fn,
        summary_freq=args.summary_freq,
    )
    return state, last


if __name__ == "__main__":
    main()
