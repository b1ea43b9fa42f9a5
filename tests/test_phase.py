"""Exactness tests for the phase-space conv rewrites (ops/phase.py).

Every transform must reproduce the reference lowering (lax conv / conv_transpose with
the TF-parity settings models/layers.py uses) to float32 reassociation tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_depth_estimation_tpu.ops.phase import (
    bilinear_up2_phase,
    conv_s1_phase,
    conv_s2_from_phase,
    deconv3x3_s2_phase,
    depth_to_space,
    space_to_depth,
    stem_conv_s2_phase,
)
from tf_depth_estimation_tpu.ops.resize import resize_bilinear


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_s2d_d2s_roundtrip():
    x = _rand(2, 8, 12, 5)
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)
    # channel order is (p, q, c)
    s = space_to_depth(x)
    np.testing.assert_array_equal(np.asarray(s[0, 1, 2, 5:10]),
                                  np.asarray(x[0, 2, 5, :]))  # p=0,q=1 -> (2*1, 2*2+1)


@pytest.mark.parametrize("hw", [(6, 10), (3, 5), (12, 18)])
@pytest.mark.parametrize("ci,co", [(32, 16), (7, 5)])
def test_deconv_phase_exact(hw, ci, co):
    H, W = hw
    x = _rand(2, H, W, ci, seed=1)
    w_tf = _rand(3, 3, co, ci, seed=2) * 0.1  # TF layout (k,k,out,in)
    ref = jax.lax.conv_transpose(
        x, w_tf, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    got = deconv3x3_s2_phase(x, w_tf)
    assert got.shape == ref.shape == (2, 2 * H, 2 * W, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_conv_s1_phase_exact(k):
    H, W = 12, 16  # full resolution (even)
    ci, co = 10, 6
    x = _rand(2, H, W, ci, seed=3)
    w = _rand(k, k, ci, co, seed=4) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(conv_s1_phase(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_conv_s1_phase_groups():
    """Phase conv over a concat of separately-packed tensors == conv over the concat."""
    H, W = 8, 12
    a = _rand(2, H, W, 5, seed=5)
    b = _rand(2, H, W, 3, seed=6)
    c = _rand(2, H, W, 1, seed=7)
    w = _rand(3, 3, 9, 4, seed=8) * 0.1
    ref = jax.lax.conv_general_dilated(
        jnp.concatenate([a, b, c], -1), w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    packed = jnp.concatenate(
        [space_to_depth(a), space_to_depth(b), space_to_depth(c)], -1)
    got = depth_to_space(conv_s1_phase(packed, w, group_sizes=(5, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("hw", [(12, 16), (24, 36)])
def test_conv_s2_from_phase_exact(k, hw):
    H, W = hw
    ci, co = 8, 6
    x = _rand(2, H, W, ci, seed=9)
    w = _rand(k, k, ci, co, seed=10) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv_s2_from_phase(space_to_depth(x), w, (H, W))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(16, 24), (48, 72)])
def test_stem_conv_phase_exact(hw):
    H, W = hw  # divisible by 4
    ci, co = 3, 32
    x = _rand(2, H, W, ci, seed=11)
    w = _rand(7, 7, ci, co, seed=12) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(stem_conv_s2_phase(x, w))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_bilinear_up2_phase_exact():
    img = _rand(2, 6, 9, 1, seed=13)
    ref = resize_bilinear(img, (12, 18))
    got = depth_to_space(bilinear_up2_phase(img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k", [3, 5, 7])
def test_conv_s1_overlapped_exact(k):
    from tf_depth_estimation_tpu.ops.phase import conv_s1_overlapped
    H, W = 12, 16
    ci, co = 9, 7
    x = _rand(2, H, W, ci, seed=14)
    w = _rand(k, k, ci, co, seed=15) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(conv_s1_overlapped(x, w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [5, 7])
@pytest.mark.parametrize("hw", [(16, 24), (48, 72)])
def test_conv_s2_overlapped_exact(k, hw):
    from tf_depth_estimation_tpu.ops.phase import conv_s2_overlapped
    H, W = hw
    ci, co = 3, 8
    x = _rand(2, H, W, ci, seed=16)
    w = _rand(k, k, ci, co, seed=17) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = depth_to_space(conv_s2_overlapped(x, w))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("hw", [(12, 16), (24, 36)])
def test_conv_s2_from_phase_bias_exact(k, hw):
    """bias= adds the vector to every output INSIDE the conv (ones-channel tap) —
    exact vs conv + add, including at the borders where SAME padding is live."""
    H, W = hw
    ci, co = 8, 6
    x = _rand(2, H, W, ci, seed=11)
    w = _rand(k, k, ci, co, seed=12) * 0.1
    b = _rand(co, seed=13)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv_s2_from_phase(space_to_depth(x), w, (H, W), bias=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
