"""Parity tests for primitive ops — TF1-legacy resize semantics are checked against the
real TensorFlow (CPU) implementation via tf.compat.v1, the exact functions the reference
calls (SURVEY §7 'hard parts': legacy align_corners=False behavior)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.ops import (
    ease_out_quad,
    pointwise_l2_loss,
    replace_nonfinite,
    resize_area,
    resize_bilinear,
    resize_like,
    resize_nearest,
    scale_invariant_gradient,
)

tf = pytest.importorskip("tensorflow")
rng = np.random.RandomState(1)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((8, 12), (4, 6)),     # exact /2
        ((240, 720), (30, 90)),  # reference colon pyramid scale 3
        ((7, 9), (13, 5)),     # odd up+down mix
        ((6, 6), (12, 12)),    # exact x2 (decoder disp_up path)
        ((5, 7), (6, 8)),      # the resize_like odd-dim patch case
    ],
)
def test_resize_bilinear_matches_tf1(in_hw, out_hw):
    x = rng.rand(2, *in_hw, 3).astype(np.float32)
    expected = tf.compat.v1.image.resize_bilinear(
        tf.constant(x), out_hw, align_corners=False
    ).numpy()
    got = np.array(resize_bilinear(jnp.array(x), out_hw))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (4, 6)), ((240, 720), (60, 180)), ((7, 9), (3, 4)), ((192, 256), (24, 32))],
)
def test_resize_area_matches_tf1(in_hw, out_hw):
    x = rng.rand(2, *in_hw, 1).astype(np.float32)
    expected = tf.compat.v1.image.resize_area(tf.constant(x), out_hw).numpy()
    got = np.array(resize_area(jnp.array(x), out_hw))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 12), (4, 6)), ((5, 7), (6, 8)), ((6, 9), (12, 18))])
def test_resize_nearest_matches_tf1(in_hw, out_hw):
    x = rng.rand(1, *in_hw, 2).astype(np.float32)
    expected = tf.compat.v1.image.resize_nearest_neighbor(
        tf.constant(x), out_hw, align_corners=False
    ).numpy()
    got = np.array(resize_nearest(jnp.array(x), out_hw))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_resize_like_noop_and_patch():
    a = jnp.ones((1, 6, 8, 4))
    assert resize_like(a, jnp.zeros((1, 6, 8, 9))) is a
    patched = resize_like(a, jnp.zeros((1, 7, 9, 1)))
    assert patched.shape == (1, 7, 9, 4)


def test_replace_nonfinite_value_and_grad():
    x = jnp.array([1.0, jnp.nan, -jnp.inf, 2.0])
    y = replace_nonfinite(x)
    np.testing.assert_allclose(np.array(y), [1.0, 0.0, 0.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(replace_nonfinite(v) ** 2))(x)
    np.testing.assert_allclose(np.array(g), [2.0, 0.0, 0.0, 4.0])


def np_sig(f, deltas, weights, eps):
    """NumPy oracle of the DeMoN scale-invariant gradient (NHWC)."""
    B, H, W, C = f.shape
    outs = []
    for d, w in zip(deltas, weights):
        gx = np.zeros_like(f)
        gy = np.zeros_like(f)
        if d < W:
            num = f[:, :, d:] - f[:, :, :-d]
            den = np.abs(f[:, :, d:]) + np.abs(f[:, :, :-d]) + eps
            gx[:, :, :-d] = num / den
        if d < H:
            num = f[:, d:] - f[:, :-d]
            den = np.abs(f[:, d:]) + np.abs(f[:, :-d]) + eps
            gy[:, :-d] = num / den
        outs += [w * gx, w * gy]
    return np.concatenate(outs, axis=-1)


@pytest.mark.parametrize("deltas", [(2,), (1, 2, 4, 8, 16)])
def test_scale_invariant_gradient_against_oracle(deltas):
    f = rng.rand(2, 12, 20, 1).astype(np.float32) * 4 - 1
    weights = tuple(1.0 for _ in deltas)
    got = np.array(scale_invariant_gradient(jnp.array(f), deltas, weights, 0.001))
    exp = np_sig(f, deltas, weights, 0.001)
    assert got.shape == exp.shape == (2, 12, 20, 2 * len(deltas))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_pointwise_l2_loss():
    a = rng.rand(2, 4, 5, 3).astype(np.float32)
    b = rng.rand(2, 4, 5, 3).astype(np.float32)
    got = float(pointwise_l2_loss(jnp.array(a), jnp.array(b), 1e-6))
    exp = np.mean(np.sqrt(np.sum((a - b) ** 2, axis=-1) + 1e-6))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_ease_out_quad():
    # b + c*(1-(1-t/d)^2), clamped at t>=d
    assert float(ease_out_quad(0, 0.0, 10.0, 100.0)) == 0.0
    np.testing.assert_allclose(float(ease_out_quad(50, 0.0, 10.0, 100.0)), 7.5)
    np.testing.assert_allclose(float(ease_out_quad(100, 0.0, 10.0, 100.0)), 10.0)
    np.testing.assert_allclose(float(ease_out_quad(500, 0.0, 10.0, 100.0)), 10.0)
