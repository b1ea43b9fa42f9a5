"""On-chip config-2 training from a device-resident synthetic colon corpus.

Runs the supervised depth pipeline of ``train_depth_only.py`` (ref
``train_depth_only.py:162-219``; L1 + 2nd-order smoothness, si-log-RMSE validation)
at an arbitrary operating point with the whole corpus cached in HBM
(``data/device_cache.py``) — the training harness for this image, where the axon
tunnel's ~40 MB/s would otherwise bound host-streamed training to ~1.5 steps/s.

Two jobs (VERDICT r3 next-round items 1 and 3):

  * ``--model depth4``        — train the parity DispNet teacher to a plateaued val
                                si-log-RMSE; the checkpoint feeds
                                ``tools/distill_chip.py`` / ``experiments/distill_turbo.py``.
  * ``--model turbo:<preset>`` — train a TurboDepthNet directly on the task (same
                                loss pyramid), the architecture-capacity arm of the
                                turbo story (vs distillation).

Data: synthetic colon pair scenes written in the reference's exact on-disk formats
(``data/synthetic.py``) and loaded back through ``PairDepthDataset`` — the real
config-2 decode path (JPEG + TF1-kernel resizes), then uploaded once.  Input frames
follow the loader's raw-0..255 convention (``imageselect_Dataloader_optflow.py:129``
— no /255), which is also the serving input range, so a teacher trained here is
served in-distribution (the reference's train/serve quirk cancels for config 2).

Usage::

    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_colon_chip.py \
        --model depth4 --height 384 --width 576 --steps 8000 \
        --checkpoint_dir /root/ckpt_teacher_576x384

Prints one JSON summary line; metrics stream to <checkpoint_dir>/metrics.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_corpus(dataset_dir: str, num_frames: int, H: int, W: int, seed: int,
                 family: str = "v1"):
    """Synthetic colon scenes on disk (reference formats) -> host arrays.

    Returns (frames_u8 [N,H,W,3], labels_f32 [N,H,W,1]).  Frames survive the
    JPEG encode/decode + identity resize of the real loader, so they are integral
    0..255 — uint8-exact for the HBM cache.
    """
    import numpy as np

    from tf_depth_estimation_tpu.data import PairDepthDataset
    from tf_depth_estimation_tpu.data.synthetic import write_colon_pair_dataset

    manifest = os.path.join(dataset_dir, "train.txt")
    if not os.path.exists(manifest):
        write_colon_pair_dataset(dataset_dir, num_frames=num_frames, H=H, W=W,
                                 splits=("train",), seed=seed, family=family)
    ds = PairDepthDataset(dataset_dir, split="train", image_height=H, image_width=W,
                          resized_height=H, resized_width=W)
    frames = np.zeros((len(ds), H, W, 3), np.uint8)
    labels = np.zeros((len(ds), H, W, 1), np.float32)
    for i in range(len(ds)):
        s = ds[i]
        f = s["tgt_image"]
        assert float(np.abs(f - np.round(f)).max()) < 1e-3, "frames must be integral"
        frames[i] = np.round(f).astype(np.uint8)
        labels[i] = s["label"]
    return frames, labels


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="depth4",
                   help="'depth4' (parity DispNet) or 'turbo:<preset>'")
    p.add_argument("--height", type=int, default=384)
    p.add_argument("--width", type=int, default=576)
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--train_frames", type=int, default=176)
    p.add_argument("--val_frames", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--dataset_dir", default="",
                   help="corpus location (reused if the manifest exists); "
                        "default <checkpoint_dir>/data")
    p.add_argument("--summary_freq", type=int, default=200)
    p.add_argument("--validation_check", type=int, default=500)
    p.add_argument("--save_latest_freq", type=int, default=2000)
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--no_aug", dest="aug", action="store_false",
                   help="disable device-side mirror/rot180 of (frame, label). "
                        "Augmentation is ON by default from round 5 — the gen-1/2 "
                        "teachers trained without it and were diagnosed 15x "
                        "overfit (artifacts/r04/DISTILL_floor_diag.json); the "
                        "distill students always trained WITH it, so aug-off "
                        "teachers are also evaluated out-of-protocol.")
    p.add_argument("--early_stop_patience", type=int, default=0,
                   help="stop after N validation checks without a new best val "
                        "si-log-RMSE (0 = off); the best serving variables are "
                        "written to <checkpoint_dir>/best.npz either way")
    p.add_argument("--scene_family", default="v1", choices=["v1", "rich"],
                   help="synthetic scene family (data/synthetic.py); 'rich' has "
                        "depth-coupled illumination so depth is learnable from "
                        "the image")
    p.add_argument("--cpu", action="store_true", help="force the CPU platform")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_depth_estimation_tpu.data.device_cache import DeviceCache
    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
    from tf_depth_estimation_tpu.train.loop import (
        MetricLogger,
        _save_tree,
        load_into_state,
        run_training,
    )
    from tf_depth_estimation_tpu.train.state import adam, create_train_state
    from tf_depth_estimation_tpu.train.steps import (
        jit_step,
        make_depth_only_step,
        make_depth_only_val_step,
    )

    H, W = args.height, args.width
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dataset_dir = args.dataset_dir or os.path.join(args.checkpoint_dir, "data")
    os.makedirs(dataset_dir, exist_ok=True)

    t0 = time.time()
    frames, labels = build_corpus(dataset_dir, args.train_frames + args.val_frames,
                                  H, W, args.seed, family=args.scene_family)
    n_train = len(frames) - args.val_frames
    cache = DeviceCache(
        {"tgt_image": frames[:n_train], "label": labels[:n_train]},
        float_keys=("tgt_image",),
        aug_keys=("tgt_image", "label") if args.aug else ())
    val_batch = {"tgt_image": jnp.asarray(frames[n_train:], jnp.float32),
                 "label": jnp.asarray(labels[n_train:])}
    print(f"# corpus: {n_train} train + {args.val_frames} val frames at {W}x{H} "
          f"({cache.nbytes()/1e6:.0f} MB in HBM) in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    if args.model == "depth4":
        model = DispNet(DispNetVariant.depth4(), dtype=dtype)
    elif args.model.startswith("turbo:"):
        from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

        model = TurboDepthNet(TurboVariant.by_name(args.model[6:]), dtype=dtype)
    else:
        raise ValueError(f"unknown --model {args.model!r}")

    w = dataclasses.replace(LossWeights.depth_only(), height=H, width=W,
                            max_steps=args.steps)
    state = create_train_state(model, jnp.zeros((args.batch_size, H, W, 3)),
                               tx=adam(args.learning_rate, args.beta1))

    mgr = CheckpointManager(args.checkpoint_dir)
    logger = MetricLogger(args.checkpoint_dir)
    if args.continue_train and mgr.latest_step() is not None:
        state = load_into_state(state, mgr.restore_group("model",
                                                         like=_save_tree(state)))
        print(f"# resumed from step {int(state.step)}", file=sys.stderr)

    base_step = make_depth_only_step(w)
    step = jit_step(lambda st, data, idx, flip, rot: base_step(
        st, cache.gather(data, idx, flip=flip, rot=rot)))
    val_step = jit_step(make_depth_only_val_step(w), donate_state=False)

    stop = {"flag": False}

    def batches():
        stream = cache.index_stream(args.batch_size, seed=args.seed + 1,
                                    augment=args.aug)
        for idx, flip, rot in stream:
            if stop["flag"]:
                return
            yield {"idx": idx, "flip": flip, "rot": rot}

    val_hist = []
    best = {"val": float("inf"), "step": -1, "vars": None}

    def val_fn(st):
        m = val_step(st, val_batch)
        v = float(m["si_log_rmse"])
        val_hist.append(v)
        if v < best["val"]:
            best.update(val=v, step=int(st.step), vars=jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float32),
                {"params": st.params, "batch_stats": st.batch_stats}))
        elif (args.early_stop_patience
              and len(val_hist) - 1 - int(np.argmin(val_hist))
              >= args.early_stop_patience):
            stop["flag"] = True
            print(f"# early stop: no val improvement in "
                  f"{args.early_stop_patience} checks (best "
                  f"{best['val']:.5f} @ step {best['step']})",
                  file=sys.stderr, flush=True)
        return m

    t1 = time.time()
    state, last = run_training(
        state=state,
        train_step=lambda st, b: step(st, cache.data, b["idx"], b["flip"], b["rot"]),
        batches=batches(), max_steps=args.steps, logger=logger, checkpoint=mgr,
        save_latest_freq=args.save_latest_freq,
        validation_check=args.validation_check, val_fn=val_fn,
        summary_freq=args.summary_freq,
    )
    dt = time.time() - t1
    final_val = {k: float(v) for k, v in val_step(state, val_batch).items()}
    if best["vars"] is not None:
        from tf_depth_estimation_tpu.train.checkpoint import save_variables_npz

        best_npz = os.path.join(args.checkpoint_dir, "best.npz")
        save_variables_npz(best_npz, best["vars"], step=str(best["step"]),
                           model=args.model,
                           val_si_log_rmse=f"{best['val']:.5f}")
    else:
        best_npz = None
    print(json.dumps({
        "metric": f"train_colon_chip_{args.model}_{W}x{H}_b{args.batch_size}",
        "steps": int(state.step), "wall_s": round(dt, 1),
        "steps_per_sec": round((int(state.step)) / max(dt, 1e-9), 2),
        "final_train_total": round(float(last["total"]), 5) if last else None,
        "val_si_log_rmse": round(final_val["si_log_rmse"], 5),
        "val_total": round(final_val["total"], 5),
        "best_val_si_log_rmse": round(best["val"], 5) if best_npz else None,
        "best_step": best["step"] if best_npz else None,
        "best_weights": best_npz,
        "early_stopped": bool(stop["flag"]), "augmented": bool(args.aug),
        "val_history": [round(v, 5) for v in val_hist],
        "checkpoint_dir": args.checkpoint_dir, "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
