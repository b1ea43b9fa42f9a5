"""Probe: can int8 im2col + dot_general beat XLA's bf16 convs at TURBO shapes?

Round-3 closed the MXU double-rate question for the *parity* graph: XLA int8
``dot_general`` reaches ~275 TOP/s, but (a) int8 *convs* run at exactly bf16 speed,
and (b) im2col loses on bandwidth for the parity stem (16x read-amp, ~3.6 GB of
patches at b128).  VERDICT r3 missing #3 / next-round item 4: that im2col analysis
was computed for the PARITY stem's shapes — turbo's 3x3 convs live at <=1/4
resolution with 9x amplification on much smaller tensors, feeding a double-rate
dot.  This probe measures, per turbo conv shape at b128:

  * ``xla_bf16_conv``   — the production lowering (what the fps ladder runs)
  * ``xla_int8_conv``   — the standing per-libtpu re-probe (ROADMAP item: int8
                          convs ran at exactly bf16 speed on libtpu r2/r3)
  * ``im2col_int8``     — materialize 3x3 patches (int8), one [BHW, 9C]x[9C, N]
                          int8->int32 dot
  * ``shifted_int8``    — 9 shifted [BHW, C]x[C, N] int8 dots accumulated in int32
                          (no patch tensor; trades materialization for 9 reads)

Whole-graph readback timing, best-of-N windows (tunnel discipline).  If the best
int8 formulation beats ``xla_bf16_conv`` for the shapes that dominate the turbo
ladder (stem/fuse at the 96x144 base grid), the last throughput door is open;
otherwise int8 is closed for BOTH graphs on this toolchain.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_im2col.py
"""
from __future__ import annotations

import json
import time

import numpy as np


B = 128
# (name, H, W, Cin, Cout, stride) — turbo-small/nano serving-graph 3x3 convs at
# 576x384 b128 (models/turbo.py): the base-grid stem/fuse convs dominate the
# ladder's wall clock (ROADMAP round-3 nano/pico analysis); enc2/enc3b cover the
# deeper stride-2 stages.  reprobe_128 repeats the round-2 parity-shape int8-conv
# probe verbatim (standing item: re-run per libtpu update).
SHAPES = [
    ("stem_96x144_48to64", 96, 144, 48, 64, 1),
    ("fuse1_96x144_96to96", 96, 144, 96, 96, 1),
    ("enc2_96x144_64to128_s2", 96, 144, 64, 128, 2),
    ("enc3b_24x36_256to256", 24, 36, 256, 256, 1),
    ("reprobe_128ch_96x144", 96, 144, 128, 128, 1),
]


def _time(f, *args, n=10, trials=4):
    out = f(*args)
    s = float(out)
    assert np.isfinite(s), "non-finite output"
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = f(*args)
        _ = float(out)  # host readback forces completion over the tunnel
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    results = []

    for name, H, W, C, N, stride in SHAPES:
        Ho, Wo = H // stride, W // stride
        x_f = rng.rand(B, H, W, C).astype(np.float32) - 0.5
        k_f = (rng.rand(3, 3, C, N).astype(np.float32) - 0.5) * 0.1
        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        k_bf = jnp.asarray(k_f, jnp.bfloat16)
        x_i8 = jnp.asarray(rng.randint(-127, 128, (B, H, W, C), dtype=np.int8))
        k_i8 = jnp.asarray(rng.randint(-127, 128, (3, 3, C, N), dtype=np.int8))
        k_mat = k_i8.reshape(9 * C, N)

        @jax.jit
        def conv_bf16(x, k):
            y = jax.lax.conv_general_dilated(x, k, (stride, stride), "SAME",
                                             dimension_numbers=dn)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def conv_i8(x, k):
            y = jax.lax.conv_general_dilated(
                x, k, (stride, stride), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return jnp.sum(y.astype(jnp.float32))

        def shifted_slices(xp):
            # SAME 3x3: output (i, j) reads padded rows stride*i+dy, dy in 0..2
            for dy in range(3):
                for dx in range(3):
                    yield xp[:, dy : dy + stride * (Ho - 1) + 1 : stride,
                             dx : dx + stride * (Wo - 1) + 1 : stride, :]

        @jax.jit
        def im2col_i8(x, km):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            patches = jnp.concatenate(list(shifted_slices(xp)), axis=-1)
            y = jax.lax.dot_general(
                patches.reshape(B * Ho * Wo, 9 * C), km,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def shifted_i8(x, k):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc = jnp.zeros((B * Ho * Wo, N), jnp.int32)
            for t, sl in enumerate(shifted_slices(xp)):
                acc = acc + jax.lax.dot_general(
                    sl.reshape(B * Ho * Wo, C), k[t // 3, t % 3],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return jnp.sum(acc.astype(jnp.float32))

        gflop = 2.0 * B * Ho * Wo * 9 * C * N / 1e9
        row = {"shape": name, "gflop_per_call": round(gflop, 1)}
        for pname, f, a, b in [("xla_bf16_conv", conv_bf16, x_bf, k_bf),
                               ("xla_int8_conv", conv_i8, x_i8, k_i8),
                               ("im2col_int8", im2col_i8, x_i8, k_mat),
                               ("shifted_int8", shifted_i8, x_i8, k_i8)]:
            try:
                dt = _time(f, a, b)
                row[pname + "_ms"] = round(dt * 1e3, 3)
                row[pname + "_tops"] = round(gflop / dt / 1e3, 1)
            except Exception as e:  # a compile failure is itself a probe answer
                row[pname + "_ms"] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"
            print(f"# {name} {pname}: {row[pname + '_ms']}", flush=True)
        results.append(row)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
