"""Per-layer conv cost profile of DispNet(depth4) at the bench operating point.

Times every conv/deconv of the 576x384 b128 bf16 inference graph in isolation on the
real TPU (best-of-N windows, host-readback timing per CLAUDE.md — block_until_ready does
not block over the axon tunnel).  Subgraph profiles are untrustworthy here, so this is
the ablation-style cost table that targets the round-2 perf work (VERDICT item 1).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_layers.py [B]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H, W = 384, 576
    dt = jnp.bfloat16

    # (name, Hin, Win, Cin, Cout, k, stride, transpose)
    # Shapes of the depth4 graph at 384x576 (encoder halves 7x, decoder mirrors).
    def enc_hw(s):  # spatial after s stride-2 stages (ceil division, SAME)
        h, w = H, W
        for _ in range(s):
            h, w = -(-h // 2), -(-w // 2)
        return h, w

    layers = []
    chans = [(32, 7), (64, 5), (128, 3), (256, 3), (512, 3), (512, 3), (512, 3)]
    cin = 3
    for i, (c, k) in enumerate(chans):
        h, w = enc_hw(i)
        layers.append((f"cnv{i+1}", h, w, cin, c, k, 2, False))
        h2, w2 = enc_hw(i + 1)
        layers.append((f"cnv{i+1}b", h2, w2, c, c, k, 1, False))
        cin = c
    # decoder: (name, input spatial, cin, cout, transpose)
    dec = [
        ("upcnv7", *enc_hw(7), 512, 512, 3, 2, True),
        ("icnv7", *enc_hw(6), 1024, 512, 3, 1, False),
        ("upcnv6", *enc_hw(6), 512, 512, 3, 2, True),
        ("icnv6", *enc_hw(5), 1024, 512, 3, 1, False),
        ("upcnv5", *enc_hw(5), 512, 256, 3, 2, True),
        ("icnv5", *enc_hw(4), 512, 256, 3, 1, False),
        ("upcnv4", *enc_hw(4), 256, 128, 3, 2, True),
        ("icnv4", *enc_hw(3), 256, 128, 3, 1, False),
        ("disp4", *enc_hw(3), 128, 1, 3, 1, False),
        ("upcnv3", *enc_hw(3), 128, 64, 3, 2, True),
        ("icnv3", *enc_hw(2), 129, 64, 3, 1, False),
        ("disp3", *enc_hw(2), 64, 1, 3, 1, False),
        ("upcnv2", *enc_hw(2), 64, 32, 3, 2, True),
        ("icnv2", *enc_hw(1), 65, 32, 3, 1, False),
        ("disp2", *enc_hw(1), 32, 1, 3, 1, False),
        ("upcnv1", *enc_hw(1), 32, 16, 3, 2, True),
        ("icnv1", H, W, 17, 16, 3, 1, False),
        ("disp1", H, W, 16, 1, 3, 1, False),
    ]
    layers += dec

    rng = np.random.RandomState(0)
    results = []
    total = 0.0
    for (name, h, w, ci, co, k, s, tr) in layers:
        x = jnp.asarray(rng.rand(B, h, w, ci).astype(np.float32)).astype(dt)
        if tr:
            kern = jnp.asarray(rng.rand(k, k, co, ci).astype(np.float32) * 0.01).astype(dt)

            def f(x, kern=kern, s=s):
                y = jax.lax.conv_transpose(
                    x, kern, (s, s), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
                return jnp.sum(y.astype(jnp.float32))
            flops = 2 * B * h * w * k * k * ci * co  # every input px hits k*k outputs
        else:
            kern = jnp.asarray(rng.rand(k, k, ci, co).astype(np.float32) * 0.01).astype(dt)

            def f(x, kern=kern, s=s):
                y = jax.lax.conv_general_dilated(
                    x, kern, (s, s), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.sum(y.astype(jnp.float32))
            oh, ow = -(-h // s), -(-w // s)
            flops = 2 * B * oh * ow * k * k * ci * co
        jf = jax.jit(f)
        sv = float(jf(x))  # compile + warm
        assert np.isfinite(sv), name
        best = 1e30
        n = 10
        for _ in range(3):
            t0 = time.time()
            for _ in range(n):
                out = jf(x)
            _ = float(out)
            el = (time.time() - t0) / n
            best = min(best, el)
        eff = flops / best / 1e12
        total += best
        results.append((name, best * 1e3, flops / 1e9, eff))
        print(f"{name:8s} {h:4d}x{w:<4d} {ci:4d}->{co:<4d} k{k} s{s} "
              f"{'T' if tr else ' '}  {best*1e3:8.3f} ms  {flops/1e9:7.1f} GF  "
              f"{eff:6.1f} TF/s", flush=True)

    print(f"\nsum of layers: {total*1e3:.1f} ms/batch  ({B/total:.0f} frames/s)")
    print("top 8 by time:")
    for name, ms, gf, eff in sorted(results, key=lambda r: -r[1])[:8]:
        print(f"  {name:8s} {ms:8.3f} ms  {eff:6.1f} TF/s")


if __name__ == "__main__":
    main()
