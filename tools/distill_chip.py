"""On-chip turbo distillation from a TRAINED depth4 teacher at the serving point.

Closes the turbo accuracy loop (VERDICT r3 next-round item 1): every turbo preset's
throughput was measured at 576x384, but its accuracy evidence was a 64x96 CPU probe
against a *random* teacher.  This tool distills students from a real checkpoint
(``tools/train_colon_chip.py --model depth4``) at the serving resolution on a large
augmented synthetic-colon frame corpus, entirely device-resident
(``data/device_cache.py``), then measures the accuracy side of the frontier per
preset on held-out frames:

  * ``holdout_absrel_vs_teacher``  — f32 student vs f32 teacher (function match; the
    BASELINE abs-rel metric with the teacher as reference, BASELINE.json:5)
  * ``serving_absrel_vs_teacher``  — bf16 ``fast_turbo_forward`` student (the graph
    the fps ladder measures) vs f32 teacher — the honest serving-mode number
  * ``absrel_vs_gt`` for both student and teacher — distance to the synthetic
    scenes' true depth, so distillation loss is separable from teacher error

The reference analog of the whole construction is the two-phase curriculum of
``split_training.py:110-174`` (a trained net supervising a second one).

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/distill_chip.py \
        --teacher_checkpoint_dir /root/ckpt_teacher_576x384 \
        --variants small,nano,pico --steps 12000 --out DISTILL_r04_chip.json

Prints one JSON line per variant; writes the full row list to ``--out``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def make_corpus(num_frames: int, H: int, W: int, seed: int, keep_depth: bool = False,
                family: str = "v1"):
    """Frames drawn from the synthetic-colon scene distribution (JPEG-roundtripped
    like the real loader's inputs), raw 0..255 -> uint8.  ``keep_depth`` also
    returns the scenes' GT depth (for the vs-GT eval)."""
    import cv2
    import numpy as np

    from tf_depth_estimation_tpu.data.synthetic import make_pair_scene

    rng = np.random.RandomState(seed)
    frames = np.zeros((num_frames, H, W, 3), np.uint8)
    depths = np.zeros((num_frames, H, W, 1), np.float32) if keep_depth else None
    for i in range(num_frames):
        tgt, _src, depth, _K, _pose = make_pair_scene(rng, H, W, family=family)
        ok, buf = cv2.imencode(".jpg", tgt[..., ::-1].astype(np.uint8),
                               [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        frames[i] = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
        if keep_depth:
            depths[i] = depth[..., None]
    return (frames, depths) if keep_depth else frames


def cached_corpus(cache_dir: str, num_frames: int, H: int, W: int, seed: int,
                  keep_depth: bool = False, family: str = "v1"):
    """``make_corpus`` behind an on-disk .npz cache keyed by every generation
    parameter.  Scene synthesis runs at ~6 frames/s on this image's single host
    core, so multi-invocation campaigns (ladder re-distills, scaling probes) pay
    minutes per run regenerating identical corpora; the cache makes that one-time."""
    import numpy as np

    if not cache_dir:
        return make_corpus(num_frames, H, W, seed, keep_depth=keep_depth,
                           family=family)
    os.makedirs(cache_dir, exist_ok=True)
    tag = f"{family}_{num_frames}x{H}x{W}_s{seed}{'_d' if keep_depth else ''}.npz"
    path = os.path.join(cache_dir, tag)
    if os.path.exists(path):
        z = np.load(path)
        print(f"# corpus cache hit: {path}", file=sys.stderr, flush=True)
        return (z["frames"], z["depths"]) if keep_depth else z["frames"]
    out = make_corpus(num_frames, H, W, seed, keep_depth=keep_depth, family=family)
    np.savez(path, **({"frames": out[0], "depths": out[1]} if keep_depth
                      else {"frames": out}))
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--teacher_checkpoint_dir", default="")
    p.add_argument("--teacher_weights", default="",
                   help=".npz serving weights as the teacher instead (e.g. the "
                        "val-early-stopped best.npz from train_colon_chip)")
    p.add_argument("--variants", default="small,nano,pico")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--corpus_frames", type=int, default=384)
    p.add_argument("--holdout_frames", type=int, default=48)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_aug", dest="aug", action="store_false",
                   help="disable device-side mirror/rot180 augmentation")
    p.add_argument("--photo_jitter", type=float, default=0.0,
                   help="per-sample photometric gain jitter J: each batch frame is "
                        "scaled by g ~ U[1-J, 1+J] (clipped back to [0,255]) BEFORE "
                        "both the teacher and student forwards, so the teacher "
                        "labels the jittered frame exactly — distillation on an "
                        "enlarged input distribution (a distill-generalization "
                        "lever; 0 disables)")
    p.add_argument("--corpus_cache", default="",
                   help="directory for on-disk .npz corpus caching (keyed by "
                        "family/size/resolution/seed; saves ~6 frames/s of host "
                        "synthesis per repeated invocation)")
    p.add_argument("--checkpoint_root", default="",
                   help="save each student under <root>/<variant> (group 'turbo', "
                        "loadable by infer.cli --mode turbo)")
    p.add_argument("--out", default="", help="write the row list (JSON) here")
    p.add_argument("--summary_freq", type=int, default=500)
    p.add_argument("--scene_family", default="v1", choices=["v1", "rich"],
                   help="synthetic scene family for corpus AND holdout")
    p.add_argument("--train_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="compute dtype of the DISTILLATION graph (teacher labels + "
                        "student forward).  bfloat16 teacher labels carry the bf16 "
                        "rounding of the teacher function itself (~1e-3 relative), "
                        "which bounds how closely any student can match the f32 "
                        "teacher; float32 removes that bound at ~2-3x the step cost "
                        "(the 1e-3 parity-budget probe, BASELINE.json:5)")
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = p.parse_args(argv)
    if bool(args.teacher_checkpoint_dir) == bool(args.teacher_weights):
        p.error("pass exactly one of --teacher_checkpoint_dir / --teacher_weights")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tf_depth_estimation_tpu.data.device_cache import DeviceCache
    from tf_depth_estimation_tpu.infer.fast_turbo import fast_turbo_forward
    from tf_depth_estimation_tpu.models import (
        DispNet,
        DispNetVariant,
        TurboDepthNet,
        TurboVariant,
    )
    from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
    from tf_depth_estimation_tpu.train.distill import make_distill_step
    from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state
    from tf_depth_estimation_tpu.train.state import adam, create_train_state
    from tf_depth_estimation_tpu.train.steps import jit_step

    H, W, B = args.height, args.width, args.batch_size
    train_dtype = jnp.bfloat16 if args.train_dtype == "bfloat16" else jnp.float32

    # ---- teacher (params restored once; train_dtype apply for training labels,
    #      f32 for eval)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    teacher_train = DispNet(DispNetVariant.depth4(), dtype=train_dtype)
    teacher_f32 = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
    if args.teacher_weights:
        from tf_depth_estimation_tpu.train.checkpoint import load_variables_npz

        npz_vars, npz_meta = load_variables_npz(args.teacher_weights)
        t_vars = {"params": jax.tree_util.tree_map(jnp.asarray, npz_vars["params"]),
                  "batch_stats": jax.tree_util.tree_map(
                      jnp.asarray, npz_vars["batch_stats"])}
        teacher_step = int(npz_meta.get("step", -1))
        print(f"# teacher loaded from {args.teacher_weights} "
              f"(step {teacher_step}, meta {npz_meta})", file=sys.stderr, flush=True)
    else:
        t_state = create_train_state(teacher_f32, x0)
        mgr = CheckpointManager(args.teacher_checkpoint_dir)
        if mgr.latest_step() is None:
            raise FileNotFoundError(
                f"no checkpoint under {args.teacher_checkpoint_dir}")
        t_state = load_into_state(t_state, mgr.restore_group("model",
                                                             like=_save_tree(t_state)))
        t_vars = {"params": t_state.params, "batch_stats": t_state.batch_stats}
        teacher_step = int(t_state.step)
        print(f"# teacher restored from step {teacher_step}", file=sys.stderr,
              flush=True)

    # ---- corpus (disjoint seeds from the teacher's training data)
    t0 = time.time()
    frames = cached_corpus(args.corpus_cache, args.corpus_frames, H, W,
                           seed=args.seed + 1000, family=args.scene_family)
    holdout, gt_depth = cached_corpus(args.corpus_cache, args.holdout_frames, H, W,
                                      seed=args.seed + 2000, keep_depth=True,
                                      family=args.scene_family)
    cache = DeviceCache({"image": frames}, float_keys=("image",),
                        aug_keys=("image",))
    holdout_d = jnp.asarray(holdout, jnp.float32)
    print(f"# corpus {args.corpus_frames}+{args.holdout_frames} frames at {W}x{H} "
          f"({cache.nbytes()/1e6:.0f} MB) in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    def chunked(x, n=None):
        n = n or B
        for i in range(0, x.shape[0], n):
            yield x[i : i + n]

    # ---- teacher f32 holdout predictions + teacher-vs-GT (computed once)
    t_fwd32 = jax.jit(lambda v, x: teacher_f32.apply(v, x, train=False)[0][..., 0])
    t_pred = np.concatenate([np.asarray(t_fwd32(t_vars, c)) for c in
                             chunked(holdout_d)], 0)
    gt = gt_depth[..., 0]

    def absrel_per_frame(a, b):
        """Per-frame mean abs-rel ([N]); the scalar metric is its frame mean."""
        return np.mean(np.abs(a - b) / np.maximum(b, 1e-3), axis=(1, 2))

    def absrel(a, b):
        return float(absrel_per_frame(a, b).mean())

    def boot_ci95(per_frame, n_boot=2000, seed=0):
        """Bootstrap 95% CI of the frame-mean (resampling frames) — the spread
        estimate VERDICT r4 asked for before quoting fourth-decimal ladder
        orderings from a finite holdout."""
        rng = np.random.RandomState(seed)
        idx = rng.randint(0, len(per_frame), size=(n_boot, len(per_frame)))
        means = per_frame[idx].mean(axis=1)
        return [round(float(np.percentile(means, 2.5)), 5),
                round(float(np.percentile(means, 97.5)), 5)]

    rows = [{
        "variant": "teacher_depth4", "teacher_step": teacher_step,
        "scene_family": args.scene_family,
        "holdout_frames": int(args.holdout_frames),
        "holdout_absrel_vs_gt": round(absrel(t_pred, gt), 5),
        "holdout_absrel_vs_gt_ci95": boot_ci95(absrel_per_frame(t_pred, gt)),
        "holdout_mae_vs_gt": round(float(np.mean(np.abs(t_pred - gt))), 5),
    }]
    print(json.dumps(rows[0]), flush=True)

    for name in args.variants.split(","):
        name = name.strip()
        if name == "depth4":
            # Self-distillation floor probe: the parity architecture itself as the
            # student.  Whatever abs-rel-vs-teacher a fresh depth4 converges to is
            # the floor of the distillation PROCEDURE (corpus size, steps, teacher
            # sampling) rather than of any student's capacity — the number that
            # says whether a student could ever approach the 1e-3 parity budget.
            variant = None
            student_train = DispNet(DispNetVariant.depth4(), dtype=train_dtype)
            student_f32 = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
        else:
            variant = TurboVariant.by_name(name)
            student_train = TurboDepthNet(variant, dtype=train_dtype)
            student_f32 = TurboDepthNet(variant, dtype=jnp.float32)
        # cosine decay to a clean finish (distillation has no reference schedule)
        sched = optax.cosine_decay_schedule(args.learning_rate, args.steps, 0.05)
        state = create_train_state(student_train, jnp.zeros((B, H, W, 3)),
                                   tx=adam(sched))

        base_step = make_distill_step(teacher_train.apply)

        def step_fn(st, tv, data, idx, flip, rot, gain):
            img = cache.gather(data, idx, flip=flip, rot=rot)["image"]
            img = jnp.clip(img * gain[:, None, None, None], 0.0, 255.0)
            return base_step(st, tv, img)

        step = jit_step(step_fn)

        t1 = time.time()
        first = last = None
        jit_rng = np.random.RandomState(args.seed + 13)
        ones = np.ones(B, np.float32)
        stream = cache.index_stream(B, seed=args.seed + 7, augment=args.aug,
                                    num_steps=args.steps)
        for i, (idx, flip, rot) in enumerate(stream):
            gain = (1.0 + args.photo_jitter * (2.0 * jit_rng.rand(B) - 1.0)
                    ).astype(np.float32) if args.photo_jitter else ones
            state, metrics = step(state, t_vars, cache.data, idx, flip, rot, gain)
            if i == 0:
                first = float(metrics["total_loss"])  # also forces compile timing
                t1 = time.time()
            elif (i + 1) % args.summary_freq == 0:
                last = float(metrics["total_loss"])
                rate = (i + 1) / (time.time() - t1)
                print(f"# {name} step {i+1}/{args.steps}: distill {last:.4f} "
                      f"({rate:.1f} steps/s)", file=sys.stderr, flush=True)
        wall = time.time() - t1

        # ---- eval: f32 function match + bf16 serving mode, on held-out frames
        s_vars = {"params": state.params, "batch_stats": state.batch_stats}
        if variant is None:
            from tf_depth_estimation_tpu.infer.fast import fast_depth_forward

            s_fwd32 = jax.jit(lambda v, x: student_f32.apply(
                v, x, train=False)[0][..., 0])
            s_fwd_serving = jax.jit(lambda v, x: fast_depth_forward(
                v, x.astype(jnp.bfloat16), dtype=jnp.bfloat16)[0][..., 0])
        else:
            s_fwd32 = jax.jit(lambda v, x: student_f32.apply(
                v, x, train=False, full_only=True)[0][..., 0])
            s_fwd_serving = jax.jit(lambda v, x: fast_turbo_forward(
                v, x.astype(jnp.bfloat16), variant, dtype=jnp.bfloat16)[..., 0])
        s32 = np.concatenate([np.asarray(s_fwd32(s_vars, c))
                              for c in chunked(holdout_d)], 0)
        sbf = np.concatenate([np.asarray(s_fwd_serving(s_vars, c), np.float32)
                              for c in chunked(holdout_d)], 0)

        row = {
            "variant": name, "steps": args.steps, "wall_s": round(wall, 1),
            "steps_per_sec": round(args.steps / max(wall, 1e-9), 2),
            "distill_loss_first": round(first, 4), "distill_loss_last": round(last, 4),
            "holdout_frames": int(args.holdout_frames),
            "holdout_absrel_vs_teacher": round(absrel(s32, t_pred), 5),
            "holdout_absrel_vs_teacher_ci95": boot_ci95(
                absrel_per_frame(s32, t_pred)),
            "holdout_mae_vs_teacher": round(float(np.mean(np.abs(s32 - t_pred))), 5),
            "serving_absrel_vs_teacher": round(absrel(sbf, t_pred), 5),
            "holdout_absrel_vs_gt": round(absrel(s32, gt), 5),
            "holdout_absrel_vs_gt_ci95": boot_ci95(absrel_per_frame(s32, gt)),
            "resolution": f"{W}x{H}", "teacher_step": teacher_step,
            "augmented": bool(args.aug), "scene_family": args.scene_family,
            "train_dtype": args.train_dtype,
            "corpus_frames": int(args.corpus_frames),
            "photo_jitter": float(args.photo_jitter),
        }
        if args.checkpoint_root:
            cdir = os.path.join(args.checkpoint_root, name)
            CheckpointManager(cdir).save(int(state.step),
                                         {"turbo": _save_tree(state)}, force=True)
            row["checkpoint_dir"] = cdir
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
