"""Directory-watching depth service — a minimal production serving loop.

Watches ``--watch_dir`` for new ``*.jpg`` frames, batches them through
``DepthPredictor`` (the compiled fast forward; one jit graph per bucket size), and
writes ``<name>_z.bin`` float32 dumps to ``--output_dir``.  This is the serving-shaped
counterpart of the reference's offline ``batch_prediction.py`` loop: frames arrive
continuously, the device stays hot, and host decode overlaps device compute only
through batch accumulation (multi-threaded decode needs a multi-core host — see
ROADMAP "Input-side throughput").

    python examples/serve.py --watch_dir ./incoming --output_dir ./out \
        --checkpoint_dir ./ck [--poll_s 0.5] [--max_batches N]

Pre-decoded array mode (``--array_mode``): the watcher consumes ``*.npy`` frame
*blocks* (uint8 or float32 ``[N, H, W, 3]``, written atomically: ``name.npy.tmp``
then rename) instead of JPEGs, mmap-reads them (no decode, no copy until the device
transfer), and writes one ``<name>_z.npy`` float32 ``[N, H, W]`` depth block each.
This is the input path that can feed the device rate on a 1-core host: an external
producer (camera ingest, a decode fleet, a previous pipeline stage) owns decoding,
and this process only moves bytes to HBM.  JPEG decode caps a single core at ~10^2
frames/s; the array path is bounded by HBM transfer instead (measured numbers in
ROADMAP "Input-side throughput").  Replaces the reference's per-frame feed_dict
loop (``batch_prediction.py:57-77``) at serving scale.
"""
from __future__ import annotations

import argparse
import os
import time
from glob import glob


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--watch_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint_group", default=None,
                   help="orbax group to restore (default: 'model', or 'turbo' "
                        "with --turbo — distill_turbo.py's group; pass 'model' "
                        "explicitly to serve a `depth_only --turbo` checkpoint)")
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--out_height", type=int, default=240)
    p.add_argument("--out_width", type=int, default=720)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--poll_s", type=float, default=0.5)
    p.add_argument("--max_batches", type=int, default=0,
                   help="stop after N non-empty batches (0 = run forever)")
    p.add_argument("--no_bilateral", action="store_true")
    p.add_argument("--turbo", default="",
                   help="serve a distilled TurboDepthNet instead of the parity "
                        "DispNet: pass a TurboVariant.PRESETS name; "
                        "--checkpoint_group then defaults to 'turbo' "
                        "(train/experiments/distill_turbo.py's group)")
    p.add_argument("--array_mode", action="store_true",
                   help="consume pre-decoded *.npy frame blocks [N, H, W, 3] "
                        "(uint8 0..255 or float32) instead of *.jpg; write "
                        "<name>_z.npy float32 [N, H, W] depth blocks (no cv2 "
                        "post-process — the consumer owns resolution)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tf_depth_estimation_tpu.infer.predictor import (
        DepthPredictor,
        _load_frame,
        _postprocess,
    )
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.checkpoint import CheckpointManager
    from tf_depth_estimation_tpu.train.state import create_train_state

    if args.turbo:
        from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

        variant = TurboVariant.by_name(args.turbo)
        model = TurboDepthNet(variant)
    else:
        model = DispNet(DispNetVariant.depth4())
    if args.checkpoint_group is None:
        args.checkpoint_group = "turbo" if args.turbo else "model"
    state = create_train_state(model, jnp.zeros((1, args.height, args.width, 3)))
    params, stats = state.params, state.batch_stats
    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        mgr = CheckpointManager(args.checkpoint_dir)
        if mgr.latest_step() is not None:
            from tf_depth_estimation_tpu.train.loop import _save_tree, load_into_state

            state = load_into_state(
                state, mgr.restore_group(args.checkpoint_group, like=_save_tree(state)))
            params, stats = state.params, state.batch_stats
            print(f"restored step {int(state.step)} from {args.checkpoint_dir}")

    if args.turbo:
        from tf_depth_estimation_tpu.infer import TurboPredictor

        pred = TurboPredictor(params, stats, variant=variant, height=args.height,
                              width=args.width, batch_size=args.batch_size)
    else:
        pred = DepthPredictor(params, stats, height=args.height, width=args.width,
                              batch_size=args.batch_size)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.array_mode:
        return _serve_arrays(args, pred, np)

    done = set()
    retries = {}  # path -> failed decode attempts (partially-written frames)
    batches = frames_served = 0
    print(f"watching {args.watch_dir} (poll {args.poll_s}s)", flush=True)
    while True:
        present = sorted(glob(os.path.join(args.watch_dir, "*.jpg")))
        done &= set(present)  # forget deleted frames: bounded by directory size
        fresh = [f for f in present if f not in done]
        if not fresh:
            if args.max_batches and batches >= args.max_batches:
                break
            time.sleep(args.poll_s)
            continue
        t0 = time.time()
        frames, served, failed = [], [], False
        for f in fresh:
            try:
                frames.append(_load_frame(f, args.height, args.width))
                served.append(f)
                retries.pop(f, None)  # decoded now — don't leak old retry marks
            except Exception as e:
                # A partially-written or corrupt frame must not kill the batch or
                # the service loop: retry it next poll (the writer may still be
                # flushing), then blacklist it.
                failed = True
                retries[f] = retries.get(f, 0) + 1
                if retries[f] >= 2:
                    done.add(f)
                    retries.pop(f, None)
                    print(f"skipping unreadable frame {f}: {e}", flush=True)
        if failed:
            # a real poll interval must elapse before the failed frame's second
            # (and final) attempt — otherwise a writer still flushing gets
            # blacklisted microseconds after the first failure
            time.sleep(args.poll_s)
        if not served:
            continue
        frames = np.stack(frames)
        zs = pred.predict_array(frames)
        for path, z in zip(served, zs):
            z = _postprocess(z, args.out_height, args.out_width,
                             bilateral=not args.no_bilateral)
            z.tofile(os.path.join(
                args.output_dir, os.path.basename(path) + "_z.bin"))
            done.add(path)
        dt = time.time() - t0
        batches += 1
        frames_served += len(served)
        print(f"served {len(served)} frames in {dt:.3f}s "
              f"({len(served)/dt:.1f} fps end-to-end)", flush=True)
        if args.max_batches and batches >= args.max_batches:
            break
    return frames_served  # served only — blacklisted frames are not counted


def _serve_arrays(args, pred, np):
    """Pre-decoded block loop: mmap *.npy in, depth *.npy out (atomic rename).

    No decode, no per-frame cv2 — host cost is one dtype cast per block (uint8
    blocks are fed as raw 0..255 float, matching ``_load_frame``'s no-/255
    contract), so throughput is bounded by the host->HBM transfer and the device
    forward instead of a single-core JPEG decoder.
    """
    import time
    from glob import glob

    done, retries = set(), {}
    frames_served = batches = 0
    print(f"watching {args.watch_dir} for *.npy blocks (poll {args.poll_s}s)",
          flush=True)
    while True:
        present = sorted(glob(os.path.join(args.watch_dir, "*.npy")))
        done &= set(present)  # forget deleted blocks: bounded by directory size
        fresh = [f for f in present
                 if f not in done and not f.endswith("_z.npy")]
        if not fresh:
            if args.max_batches and batches >= args.max_batches:
                break
            time.sleep(args.poll_s)
            continue
        failed = False
        for f in fresh:
            t0 = time.time()
            try:
                block = np.load(f, mmap_mode="r")
                if block.ndim != 4 or block.shape[1:] != (args.height, args.width, 3):
                    raise ValueError(f"expected [N, {args.height}, {args.width}, 3], "
                                     f"got {block.shape}")
                # uint8 blocks go to the device as-is (4x less transfer, converted
                # on-chip); the mmap pages feed jnp.asarray without a host copy
                frames = block if block.dtype == np.uint8 \
                    else np.asarray(block, dtype=np.float32)
            except Exception as e:
                # a block mid-write or with the wrong shape must not kill the
                # service: retry once next poll, then blacklist
                failed = True
                retries[f] = retries.get(f, 0) + 1
                if retries[f] >= 2:
                    done.add(f)
                    retries.pop(f, None)
                    print(f"skipping unreadable block {f}: {e}", flush=True)
                continue
            retries.pop(f, None)  # readable now — don't leak old retry marks
            if frames.shape[0] == 0:
                # a zero-frame block is valid on disk but has nothing to serve;
                # predict_array would raise on an empty concatenation
                done.add(f)
                print(f"skipping empty block {f}", flush=True)
                continue
            zs = pred.predict_array(frames)
            out = os.path.join(
                args.output_dir,
                os.path.basename(f)[: -len(".npy")] + "_z.npy")
            # tmp name must not end in .npy (it would match the input glob when
            # watch_dir == output_dir); an open handle stops np.save suffixing it
            with open(out + ".tmp", "wb") as fh:
                np.save(fh, zs.astype(np.float32))
            os.replace(out + ".tmp", out)
            done.add(f)
            frames_served += len(frames)
            batches += 1
            dt = time.time() - t0
            print(f"served block {os.path.basename(f)}: {len(frames)} frames in "
                  f"{dt:.3f}s ({len(frames)/dt:.1f} fps end-to-end)", flush=True)
            if args.max_batches and batches >= args.max_batches:
                return frames_served
        if failed:
            # real poll delay before a failed block's final attempt (see the
            # JPEG loop: a writer mid-flush must not be blacklisted instantly)
            time.sleep(args.poll_s)
        if args.max_batches and batches >= args.max_batches:
            break
    return frames_served


if __name__ == "__main__":
    main()
