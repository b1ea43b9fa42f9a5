"""Micro-benchmark: the projective warp / bilinear sampler on the real TPU.

Times (a) the 4-gather ``bilinear_sample`` alone, (b) the full
``projective_inverse_warp``, and (c) a full pairwise train step, at the DeMoN
operating point (192x256 b16) — to size how much of the warp-heavy configs'
step time the gather path actually costs (decides whether a Pallas warp kernel
is worth building on this toolchain).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/micro_warp.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(f, *args, n=30, trials=4):
    out = f(*args)
    _ = float(np.asarray(out if not isinstance(out, tuple) else out[0]).sum())
    best = 1e30
    for _t in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        _ = float(np.asarray(out if not isinstance(out, tuple) else out[0]).sum())
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.geometry import (
        bilinear_sample,
        make_intrinsics_matrix,
        projective_inverse_warp,
    )

    B, H, W, C = 16, 192, 256, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    # coords clustered near identity + jitter (training-typical small motion)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords = coords + rng.randn(B, H, W, 2).astype(np.float32) * 3.0
    coords = jnp.asarray(coords)
    depth = jnp.asarray(rng.uniform(0.5, 2.0, (B, H, W)).astype(np.float32))
    pose = jnp.asarray((rng.randn(B, 6) * 0.05).astype(np.float32))
    K = make_intrinsics_matrix(jnp.full((B,), 200.0), jnp.full((B,), 200.0),
                               jnp.full((B,), W / 2), jnp.full((B,), H / 2))

    samp = jax.jit(lambda i, c: bilinear_sample(i, c)[0])
    warp = jax.jit(lambda i, d, p, k: projective_inverse_warp(i, d, p, k).image)

    t_samp = bench(samp, img, coords)
    t_warp = bench(warp, img, depth, pose, K)
    print(f"bilinear_sample  {B}x{H}x{W}x{C}: {t_samp:8.3f} ms  "
          f"({B / t_samp * 1e3:7.0f} img/s)")
    print(f"projective_warp  {B}x{H}x{W}x{C}: {t_warp:8.3f} ms")
    # 4 scales x 2 directions per pairwise step -> rough per-step warp budget
    print(f"approx warp budget/step (8 warps over pyramid ~ 2.66x scale-0): "
          f"{t_warp * 2 * 1.33:8.3f} ms")


if __name__ == "__main__":
    main()
