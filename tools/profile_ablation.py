"""In-graph ablation timing: full DispNet(depth4) vs surgically-skipped variants.

Isolated layer timing (tools/profile_layers.py) carries ~3ms dispatch overhead per call
over the axon tunnel and may trigger different XLA lowerings than the full graph, so the
authoritative per-layer cost is the delta between the full model and a variant with the
layer skipped (shape-compatible skips only).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_ablation.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


try:
    from tools._bench import time_fn
except ImportError:  # run as `python tools/x.py`
    from _bench import time_fn


def main():
    from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.models.layers import SlimConv, concat
    from tf_depth_estimation_tpu.ops.resize import resize_bilinear, resize_like

    B, H, W = 128, 384, 576
    dt = jnp.bfloat16

    class Ablated(nn.Module):
        """depth4 DispNet with shape-compatible skip switches."""
        skip: tuple = ()
        dtype: jnp.dtype = dt

        @nn.compact
        def __call__(self, x, train: bool = False):
            v = dict(use_bn=True, bn_momentum=0.99, dtype=self.dtype)

            def conv(x, f, k, s, name):
                if name in self.skip:
                    return x
                return SlimConv(f, (k, k), stride=s, **v, name=name)(x, train)

            def deconv(x, f, name):
                return SlimConv(f, (3, 3), stride=2, transpose=True, **v, name=name)(x, train)

            def head(x, name):
                if name in self.skip:
                    return jnp.zeros(x.shape[:3] + (1,), jnp.float32)
                y = SlimConv(1, (3, 3), stride=1, use_bn=False, activation=None,
                             dtype=self.dtype, name=name)(x, train)
                return (4.0 * nn.sigmoid(y)).astype(jnp.float32)

            x = x.astype(self.dtype)
            chans = [(32, 7), (64, 5), (128, 3), (256, 3), (512, 3), (512, 3), (512, 3)]
            skips = []
            for i, (f, k) in enumerate(chans):
                x = conv(x, f, k, 2, f"cnv{i+1}")
                x = conv(x, f, k, 1, f"cnv{i+1}b")
                skips.append(x)
            c1, c2, c3, c4, c5, c6, c7 = skips
            x = deconv(c7, 512, "upcnv7"); x = resize_like(x, c6)
            x = conv(concat([x, c6]), 512, 3, 1, "icnv7")
            x = deconv(x, 512, "upcnv6"); x = resize_like(x, c5)
            x = conv(concat([x, c5]), 512, 3, 1, "icnv6")
            x = deconv(x, 256, "upcnv5"); x = resize_like(x, c4)
            x = conv(concat([x, c4]), 256, 3, 1, "icnv5")
            x = deconv(x, 128, "upcnv4"); x = resize_like(x, c3)
            x = conv(concat([x, c3]), 128, 3, 1, "icnv4")
            d4 = head(x, "disp4")
            d4u = resize_bilinear(d4, (H // 4, W // 4))
            x = deconv(x, 64, "upcnv3"); x = resize_like(x, c2)
            x = conv(concat([x, c2, d4u.astype(self.dtype)]), 64, 3, 1, "icnv3")
            d3 = head(x, "disp3")
            d3u = resize_bilinear(d3, (H // 2, W // 2))
            x = deconv(x, 32, "upcnv2"); x = resize_like(x, c1)
            x = conv(concat([x, c1, d3u.astype(self.dtype)]), 32, 3, 1, "icnv2")
            d2 = head(x, "disp2")
            if "tail" in self.skip:
                return d2
            d2u = resize_bilinear(d2, (H, W))
            x = deconv(x, 16, "upcnv1")
            if x.shape[1:3] != (H, W):
                x = resize_like(x, d2u)
            x = conv(concat([x, d2u.astype(self.dtype)]), 16, 3, 1, "icnv1")
            d1 = head(x, "disp1")
            return d1

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))

    variants = [
        ("full", ()),
        ("no_cnv1b", ("cnv1b",)),
        ("no_cnv2b", ("cnv2b",)),
        ("no_tail", ("tail",)),          # drop upcnv1/icnv1/disp1 (stop at d2)
        ("no_disp1", ("disp1",)),
        ("no_icnv2_disp2", ()),           # placeholder, computed below if needed
    ]
    base = None
    for name, skip in variants:
        if name == "no_icnv2_disp2":
            continue
        model = Ablated(skip=skip)
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)

        @jax.jit
        def f(x, variables=variables, model=model):
            return jnp.sum(model.apply(variables, x, train=False).astype(jnp.float32))

        ms = time_fn(f, x) * 1e3
        fps = B / ms * 1e3
        delta = "" if base is None else f"  delta={base - ms:+.2f} ms"
        if base is None:
            base = ms
        print(f"{name:12s} {ms:8.2f} ms/batch  {fps:7.0f} fps{delta}", flush=True)


if __name__ == "__main__":
    main()
