"""Per-config sampler A/B: xla gather vs the Pallas banded sampler, whole train step.

Completes the `LossWeights.sampler` decision table (ROADMAP round-2 campaign item 6):
config 4 (optflow_combine 224x480) measured -24% with pallas and defaults to it;
depth_then_cam, dim11, only_image, refine measured xla-better in r2.  This tool runs
the remaining warp configs at their reference operating points so every config's
default is a measured choice, not an assumption.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_sampler.py [names...]
Names: pairwise lr_full lr_gt optflow_only sfm_multi (default: all).
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.geometry import (
        make_intrinsics_matrix,
        scale_intrinsics_pyramid,
    )
    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DepthPoseNet, DispNet, DispNetVariant, LRNet
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.steps import (
        jit_step,
        make_lr_full_step,
        make_lr_gt_step,
        make_optflow_only_step,
        make_pairwise_step,
        make_sfm_multi_step,
    )

    rng = np.random.RandomState(0)

    def intrinsics_pyr(B, H, W):
        K = make_intrinsics_matrix(jnp.full((B,), 200.0), jnp.full((B,), 200.0),
                                   jnp.full((B,), W / 2), jnp.full((B,), H / 2))
        return jnp.asarray(np.asarray(scale_intrinsics_pyramid(K, 4)))

    def demon_batch(B, H, W):
        return {
            "image_pair": jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32) - 0.5),
            "depth0": jnp.asarray(rng.uniform(0.5, 2, (B, H, W, 1)).astype(np.float32)),
            "depth2": jnp.asarray(
                rng.uniform(0.5, 2, (B, H // 4, W // 4, 1)).astype(np.float32)),
            "rotation": jnp.asarray((rng.randn(B, 3) * 0.05).astype(np.float32)),
            "translation": jnp.asarray((rng.randn(B, 3) * 0.1).astype(np.float32)),
            "intrinsics": intrinsics_pyr(B, H, W),
        }

    def colon_batch(B, H, W, num_src=1):
        proj = np.tile(np.eye(4, dtype=np.float32), (B, max(num_src, 2), 1, 1))
        proj[:, :, :3, 3] = rng.randn(B, max(num_src, 2), 3) * 0.05
        return {
            "tgt_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
            "src_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
            "label": jnp.asarray(rng.uniform(0.5, 2.5, (B, H, W, 1)).astype(np.float32)),
            "tgt2src_projs": jnp.asarray(proj),
            "intrinsics": intrinsics_pyr(B, H, W),
        }

    # name -> (weights_factory, make_step, model_factory, batch, init_input)
    H, W, B = 192, 256, 16
    db = demon_batch(B, H, W)
    l = db["image_pair"][..., :3]
    cb_of = colon_batch(10, 224, 224)
    cb_sfm = colon_batch(30, 224, 224)
    configs = {
        "pairwise": (
            LossWeights.split_training, make_pairwise_step,
            lambda dt: DepthPoseNet(full_resolution=False, dtype=dt),
            db, db["image_pair"]),
        "lr_full": (
            LossWeights.depth_then_cam_lr, make_lr_full_step,
            lambda dt: LRNet(with_single=True, dtype=dt), db, (l, l)),
        "lr_gt": (
            LossWeights.gtdepth_gtcam, make_lr_gt_step,
            lambda dt: LRNet(with_single=False, dtype=dt), db, (l, l)),
        "optflow_only": (
            LossWeights.optflow_only, make_optflow_only_step,
            lambda dt: DispNet(DispNetVariant.sfm(), dtype=dt),
            cb_of, cb_of["tgt_image"]),
        "sfm_multi": (
            LossWeights.sfm_multi, make_sfm_multi_step,
            lambda dt: DispNet(DispNetVariant.sfm(), dtype=dt),
            cb_sfm, cb_sfm["tgt_image"]),
    }

    which = sys.argv[1:] or list(configs)
    for name in which:
        wf, mk, mf, batch, init_in = configs[name]
        img = batch.get("image_pair", batch.get("tgt_image"))
        row = {}
        for sampler in ("xla", "pallas"):
            w = dataclasses.replace(wf(), height=img.shape[1], width=img.shape[2],
                                    sampler=sampler)
            model = mf(jnp.bfloat16)
            state = create_train_state(model, init_in)
            step = jit_step(mk(w))
            state, m = step(state, batch)
            t0 = float(m["total"])
            best = 1e30
            for _t in range(4):
                ts = time.time()
                for _ in range(10):
                    state, m = step(state, batch)
                _ = float(m["total"])
                best = min(best, (time.time() - ts) / 10)
            row[sampler] = (best * 1e3, t0)
            print(f"{name:14s} [{sampler:6s}]: {best*1e3:8.2f} ms/step  "
                  f"total={t0:.4f}", flush=True)
        faster = min(row, key=lambda k: row[k][0])
        print(f"{name:14s} -> {faster} wins "
              f"({row['xla'][0]:.1f} vs {row['pallas'][0]:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
