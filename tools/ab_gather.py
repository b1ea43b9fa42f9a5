"""A/B of gather formulations for the bilinear sampler on the real TPU.

XLA:TPU gather lowering is the bottleneck of every warp-heavy config (32.7 ms for one
16x192x256x3 sample — tools/micro_warp.py).  This probes alternative exact
formulations before committing to a Pallas kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_gather.py
"""
from __future__ import annotations

import time

import numpy as np


def bench(f, *args, n=20, trials=3):
    out = f(*args)
    ref = np.asarray(out)
    best = 1e30
    for _t in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        _ = float(np.asarray(out).sum())
        best = min(best, (time.time() - t0) / n)
    return best * 1e3, ref


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, H, W, C = 16, 192, 256, 3
    P = H * W
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, H * W, (B, P)).astype(np.int32))
    iy = idx // W
    ix = idx % W

    @jax.jit
    def v1_take_along_mid(img, idx):  # current: axis=1 of (B, HW, C)
        flat = img.reshape(B, H * W, C)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    @jax.jit
    def v2_take_along_minor(img, idx):  # gather on the minor-most dim
        flat = img.reshape(B, H * W, C).transpose(0, 2, 1)  # (B, C, HW)
        out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        return out.transpose(0, 2, 1)

    @jax.jit
    def v3_global_flat(img, idx):  # one 1-D table for everything
        flat = img.reshape(B * H * W, C)
        base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
        return jnp.take(flat, idx + base, axis=0)

    @jax.jit
    def v4_two_stage(img, iy, ix):  # row gather (full rows), then column gather
        rows = jnp.take_along_axis(
            img.reshape(B, H, W * C), iy[..., None], axis=1)  # (B, P, W*C) -- big!
        rows = rows.reshape(B, P, W, C)
        return jnp.take_along_axis(rows, ix[..., None, None], axis=2)[:, :, 0]

    t1, r1 = bench(v1_take_along_mid, img, idx)
    print(f"v1 take_along axis=1 (current): {t1:9.3f} ms")
    t2, r2 = bench(v2_take_along_minor, img, idx)
    print(f"v2 take_along minor dim:        {t2:9.3f} ms   match={np.allclose(r1, r2)}")
    t3, r3 = bench(v3_global_flat, img, idx)
    print(f"v3 global flat take:            {t3:9.3f} ms   match={np.allclose(r1, r3)}")
    try:
        t4, r4 = bench(v4_two_stage, img, iy, ix)
        print(f"v4 two-stage row+col:           {t4:9.3f} ms   match={np.allclose(r1, r4)}")
    except Exception as e:
        print(f"v4 two-stage row+col: FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
