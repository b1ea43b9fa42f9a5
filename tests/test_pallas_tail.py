"""Parity: the fused Pallas tail kernel == the reference tail graph (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_depth_estimation_tpu.ops.pallas_tail import fused_tail, prepare_tail_params
from tf_depth_estimation_tpu.ops.phase import depth_to_space
from tf_depth_estimation_tpu.ops.resize import resize_bilinear


def _reference_tail(x2, d2, w_up1_tf, bn_up1, w_icnv1, bn_icnv1, w_disp1, b_disp1,
                    disp_scaling=4.0, min_disp=0.0):
    """The XLA tail exactly as models/dispnet.py builds it (eval mode, folded BN)."""
    H, W = x2.shape[1] * 2, x2.shape[2] * 2
    up = jax.lax.conv_transpose(
        x2, w_up1_tf, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    su, tu = bn_up1
    up = jax.nn.relu(up * su + tu)
    d2u = resize_bilinear(d2, (H, W))
    cat = jnp.concatenate([up, d2u.astype(up.dtype)], -1)
    y = jax.lax.conv_general_dilated(
        cat, w_icnv1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    si, ti = bn_icnv1
    y = jax.nn.relu(y * si + ti)
    d1 = jax.lax.conv_general_dilated(
        y, w_disp1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return disp_scaling * jax.nn.sigmoid(d1 + b_disp1) + min_disp


@pytest.mark.parametrize("hw,tr", [((16, 32), 8), ((32, 48), 16)])
def test_fused_tail_interpret_exact(hw, tr):
    H, W = hw
    rng = np.random.RandomState(0)
    x2 = jnp.asarray(rng.randn(2, H, W, 32).astype(np.float32) * 0.5)
    d2 = jnp.asarray(rng.rand(2, H, W, 1).astype(np.float32) * 4.0)
    w_up1 = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
    w_ic = jnp.asarray(rng.randn(3, 3, 17, 16).astype(np.float32) * 0.1)
    w_d1 = jnp.asarray(rng.randn(3, 3, 16, 1).astype(np.float32) * 0.1)
    b_d1 = jnp.float32(0.13)
    bn_up = (jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
             jnp.asarray(rng.randn(16).astype(np.float32) * 0.1))
    bn_ic = (jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
             jnp.asarray(rng.randn(16).astype(np.float32) * 0.1))

    ref = _reference_tail(x2, d2, w_up1, bn_up, w_ic, bn_ic, w_d1, b_d1)
    params = prepare_tail_params(w_up1, bn_up, w_ic, bn_ic, w_d1, b_d1, jnp.float32)
    got = depth_to_space(fused_tail(x2, d2, params, tile_rows=tr, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
