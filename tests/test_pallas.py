"""Pallas kernel parity tests (interpret mode — exact semantics vs the jnp references).

The compiled-TPU behavior/limitations are documented in the kernel modules; these tests
lock the kernel math itself.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.geometry.sampling import bilinear_sample
from tf_depth_estimation_tpu.losses.basic import second_order_smoothness
from tf_depth_estimation_tpu.ops.pallas_losses import (
    _sig_jnp_ref,
    sig_l2_fused,
    smoothness_fused,
)
from tf_depth_estimation_tpu.ops.pallas_warp import bilinear_sample_fused

rng = np.random.RandomState(21)


def test_fused_warp_matches_sampler():
    imgs = jnp.asarray(rng.rand(8, 16, 24, 3).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-3, 27, (8, 16, 24, 2)).astype(np.float32))
    a, am = bilinear_sample_fused(imgs, coords, True)
    b, bm = bilinear_sample(imgs, coords)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)
    np.testing.assert_allclose(np.array(am), np.array(bm), atol=1e-6)


def test_fused_warp_gradients_match():
    imgs = jnp.asarray(rng.rand(8, 8, 16, 1).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 14, (8, 8, 16, 2)).astype(np.float32))
    ga = jax.grad(lambda i, c: jnp.sum(bilinear_sample_fused(i, c, True)[0] ** 2),
                  argnums=(0, 1))(imgs, coords)
    gb = jax.grad(lambda i, c: jnp.sum(bilinear_sample(i, c)[0] ** 2),
                  argnums=(0, 1))(imgs, coords)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.array(x), np.array(y), atol=1e-5)


def test_fused_warp_falls_back_on_unsupported_shapes():
    # batch not divisible by 8 -> jnp fallback, still correct
    imgs = jnp.asarray(rng.rand(3, 8, 8, 1).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 7, (3, 8, 8, 2)).astype(np.float32))
    a, _ = bilinear_sample_fused(imgs, coords, True)
    b, _ = bilinear_sample(imgs, coords)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


@pytest.mark.parametrize("deltas", [(2,), (1, 2, 4, 8, 16)])
def test_sig_l2_fused_parity(deltas):
    p = jnp.asarray(rng.uniform(0.5, 2, (2, 24, 32, 1)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 2, (2, 24, 32, 1)).astype(np.float32))
    a = float(sig_l2_fused(p, g, deltas, 0.001, 1e-6, True))
    b = float(_sig_jnp_ref(p, g, deltas, 0.001, 1e-6))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_sig_l2_fused_gradient_matches_reference():
    p = jnp.asarray(rng.uniform(0.5, 2, (2, 16, 16, 1)).astype(np.float32))
    g = jnp.asarray(rng.uniform(0.5, 2, (2, 16, 16, 1)).astype(np.float32))
    ga = jax.grad(lambda x: sig_l2_fused(x, g, (1, 2), 0.001, 1e-6, True))(p)
    gb = jax.grad(lambda x: _sig_jnp_ref(x, g, (1, 2), 0.001, 1e-6))(p)
    np.testing.assert_allclose(np.array(ga), np.array(gb), atol=1e-6)


def test_smoothness_fused_parity_and_grad():
    p = jnp.asarray(rng.uniform(0.5, 2, (3, 24, 32, 1)).astype(np.float32))
    a = float(smoothness_fused(p, True))
    b = float(second_order_smoothness(p))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    ga = jax.grad(lambda x: smoothness_fused(x, True))(p)
    gb = jax.grad(lambda x: second_order_smoothness(x))(p)
    np.testing.assert_allclose(np.array(ga), np.array(gb), atol=1e-6)
