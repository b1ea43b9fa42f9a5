"""Probe: does Mosaic's int8 dot reach the double-rate MXU path on this toolchain?

Round-2 finding (ROADMAP): XLA int8 convs (`preferred_element_type=int32`) compile but
run at exactly bf16 speed — XLA:TPU does not map them to the 394-TOPS int8 MXU path.
This probe answers the remaining question: is the double-rate path reachable from
*Mosaic* (Pallas `lax.dot_general` on int8 operands)? It is the only known route past
the ~5.2k fps bf16 roofline toward the 10k north star (BASELINE.json:5).

Design: a single-block Pallas kernel holding A[1024,1024] and B[1024,1024] in VMEM and
running R accumulated dots in a `fori_loop` — zero HBM traffic inside the loop, so the
timing is a pure MXU-rate measurement, not a bandwidth one (tpu-measurement-discipline:
whole-graph readback timing, best-of-N windows). The int32 accumulate adds ~10% VPU
overhead, identical in both variants.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_int8_dot.py
"""
from __future__ import annotations

import functools
import time

import numpy as np


M = K = N = 1024
R = 64  # dots per kernel invocation; FLOPs = R * 2 * M*K*N = 137.4 GFLOP


def _dot_loop_kernel(a_ref, b_ref, o_ref, *, acc_dtype):
    import jax
    import jax.numpy as jnp

    dims = (((1,), (0,)), ((), ()))

    def body(i, acc):
        return acc + jax.lax.dot_general(
            a_ref[:], b_ref[:], dims, preferred_element_type=acc_dtype)

    o_ref[:] = jax.lax.fori_loop(
        0, R, body, jnp.zeros((M, N), acc_dtype), unroll=False)


def make_pallas(in_dtype, acc_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_dot_loop_kernel, acc_dtype=acc_dtype)

    @jax.jit
    def f(a, b):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                      pl.BlockSpec((K, N), lambda: (0, 0))],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)
        return jnp.sum(out.astype(jnp.float32))

    return f


def make_xla(in_dtype, acc_dtype):
    import jax
    import jax.numpy as jnp

    dims = (((1,), (0,)), ((), ()))

    @jax.jit
    def f(a, b):
        def body(i, acc):
            return acc + jax.lax.dot_general(
                a, b, dims, preferred_element_type=acc_dtype)
        out = jax.lax.fori_loop(0, R, body, jnp.zeros((M, N), acc_dtype))
        return jnp.sum(out.astype(jnp.float32))

    return f


def time_2arg(jf, a, b, n=8, trials=5):
    s = float(jf(a, b))
    assert np.isfinite(s), "non-finite output"
    best = 1e30
    for _ in range(trials):
        t0 = time.time()
        for _ in range(n):
            out = jf(a, b)
        _ = float(out)  # host readback forces completion over the tunnel
        best = min(best, (time.time() - t0) / n)
    return best


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    a8 = jnp.asarray(rng.randint(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.randint(-127, 128, (K, N), dtype=np.int8))
    abf = jnp.asarray(rng.rand(M, K).astype(np.float32), jnp.bfloat16)
    bbf = jnp.asarray(rng.rand(K, N).astype(np.float32), jnp.bfloat16)

    gflop = R * 2.0 * M * K * N / 1e9
    results = {}
    cases = [
        ("pallas_bf16", make_pallas, abf, bbf, jnp.float32),
        ("pallas_int8", make_pallas, a8, b8, jnp.int32),
        ("xla_bf16", make_xla, abf, bbf, jnp.float32),
        ("xla_int8", make_xla, a8, b8, jnp.int32),
    ]
    for name, maker, a, b, acc in cases:
        try:
            f = maker(a.dtype, acc)
            dt = time_2arg(f, a, b)
            tflops = gflop / dt / 1e3
            results[name] = dt
            print(f"{name:12s}: {dt*1e3:8.3f} ms  {tflops:8.1f} TFLOP(int-OP)/s")
        except Exception as e:  # compile failure is itself a probe answer
            print(f"{name:12s}: FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "pallas_bf16" in results and "pallas_int8" in results:
        r = results["pallas_bf16"] / results["pallas_int8"]
        print(f"\nmosaic int8 speedup vs bf16: {r:.2f}x "
              f"({'DOUBLE-RATE PATH REACHED' if r >= 1.5 else 'no double-rate'})")
    if "xla_bf16" in results and "xla_int8" in results:
        r = results["xla_bf16"] / results["xla_int8"]
        print(f"xla    int8 speedup vs bf16: {r:.2f}x")


if __name__ == "__main__":
    main()
