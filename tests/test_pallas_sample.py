"""Parity + gradient tests for the Pallas banded bilinear sampler (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_depth_estimation_tpu.geometry.sampling import bilinear_sample
from tf_depth_estimation_tpu.ops.pallas_sample import _sample_banded, bilinear_sample_tpu


def _mk(B=2, Hs=32, Ws=128, C=3, jitter=3.0, seed=0):
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.rand(B, Hs, Ws, C).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(Hs), np.arange(Ws), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords = coords + rng.randn(B, Hs, Ws, 2).astype(np.float32) * jitter
    return imgs, jnp.asarray(coords)


def test_banded_forward_exact_vs_jnp():
    imgs, coords = _mk()
    ref_out, ref_mask = bilinear_sample(imgs, coords)
    out, mask, corners = _sample_banded(imgs, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_banded_forward_wild_coords_falls_back_exact():
    # coords scattered across the whole image: y-span blows the band, cond takes
    # the exact XLA fallback
    rng = np.random.RandomState(1)
    B, Hs, Ws, C = 2, 32, 128, 2
    imgs = jnp.asarray(rng.rand(B, Hs, Ws, C).astype(np.float32))
    coords = jnp.asarray(
        rng.rand(B, Hs, Ws, 2).astype(np.float32)
        * np.array([Ws * 1.2, Hs * 1.2], np.float32) - 4.0)
    ref_out, ref_mask = bilinear_sample(imgs, coords)
    out, mask, _ = _sample_banded(imgs, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_banded_forward_border_semantics():
    # coords straddling every border: zero-weight-outside + clamped taps
    rng = np.random.RandomState(2)
    B, Hs, Ws, C = 1, 16, 128, 1
    imgs = jnp.asarray(rng.rand(B, Hs, Ws, C).astype(np.float32))
    gy, gx = np.meshgrid(np.arange(Hs), np.arange(Ws), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    coords[..., 0] -= 2.5   # push off the left edge
    coords[..., 1] += 2.5   # and off the bottom
    out, mask, _ = _sample_banded(imgs, jnp.asarray(coords), interpret=True)
    ref_out, ref_mask = bilinear_sample(imgs, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_banded_forward_height_8mod16_exact():
    # Hs = 24 (divisible by 8 but not 16): the kernel must drop to TR=8, not crash
    # (the eligibility gate admits any H % 8 == 0)
    imgs, coords = _mk(B=2, Hs=24, Ws=128, C=2, jitter=2.0, seed=5)
    ref_out, ref_mask = bilinear_sample(imgs, coords)
    out, mask, _ = _sample_banded(imgs, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_banded_forward_nonaligned_width_pads_exact():
    # W=160 (not a 128-multiple): the wrapper pads to 256 and slices back
    imgs, coords = _mk(B=2, Hs=16, Ws=160, C=2, jitter=2.0, seed=4)
    ref_out, ref_mask = bilinear_sample(imgs, coords)
    out, mask, _ = _sample_banded(imgs, coords, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))


def test_custom_vjp_matches_xla_autodiff():
    imgs, coords = _mk(B=1, Hs=16, Ws=128, C=2, jitter=2.0, seed=3)

    def loss_ref(imgs, coords):
        out, mask = bilinear_sample(imgs, coords)
        return jnp.sum(out * out) + 0.5 * jnp.sum(mask * mask)

    def loss_tpu(imgs, coords):
        out, mask = bilinear_sample_tpu(imgs, coords)
        return jnp.sum(out * out) + 0.5 * jnp.sum(mask * mask)

    gi_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(imgs, coords)
    with pltpu_interpret():
        gi, gc = jax.grad(loss_tpu, argnums=(0, 1))(imgs, coords)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), rtol=1e-5, atol=1e-5)


class pltpu_interpret:
    """Force interpret mode for the kernel inside (CPU test run)."""

    def __enter__(self):
        import tf_depth_estimation_tpu.ops.pallas_sample as m

        self._orig = m._run_kernel
        m._run_kernel = lambda imgs, ints, interpret=False: self._orig(
            imgs, ints, interpret=True)
        return self

    def __exit__(self, *a):
        import tf_depth_estimation_tpu.ops.pallas_sample as m

        m._run_kernel = self._orig
