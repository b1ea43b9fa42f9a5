"""Numerical parity of the model building blocks against real TensorFlow ops.

The BASELINE abs-rel requirement hinges on layer semantics matching TF1/slim exactly
(SURVEY §7 'hard parts').  These tests load identical weights into both frameworks and
compare forward activations: conv SAME arithmetic, transposed-conv SAME output placement
(the classic mismatch between frameworks), and batch-norm train/eval semantics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

tf = pytest.importorskip("tensorflow")
rng = np.random.RandomState(17)


@pytest.mark.parametrize("k,s,hw", [(3, 1, (10, 14)), (3, 2, (10, 14)), (5, 2, (11, 13)),
                                    (7, 2, (15, 9))])
def test_conv_same_matches_tf(k, s, hw):
    import flax.linen as nn

    H, W = hw
    x = rng.rand(2, H, W, 4).astype(np.float32)
    wgt = rng.randn(k, k, 4, 8).astype(np.float32) * 0.1

    conv = nn.Conv(8, (k, k), strides=(s, s), padding="SAME", use_bias=False)
    out_jax = conv.apply({"params": {"kernel": jnp.asarray(wgt)}}, jnp.asarray(x))

    out_tf = tf.nn.conv2d(x, wgt, strides=[1, s, s, 1], padding="SAME").numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_tf, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,hw", [(3, (8, 12)), (3, (7, 9)), (5, (8, 12)), (7, (5, 7))])
def test_conv_transpose_same_stride2_matches_tf(k, hw):
    """slim.conv2d_transpose == tf.nn.conv2d_transpose(SAME, stride 2, out 2H x 2W).
    flax ConvTranspose must place taps identically (weights transposed accordingly:
    TF stores [k, k, out, in], flax [k, k, in, out])."""
    from tf_depth_estimation_tpu.models.layers import TFConvTranspose

    H, W = hw
    x = rng.rand(2, H, W, 4).astype(np.float32)
    wgt_tf = rng.randn(k, k, 6, 4).astype(np.float32) * 0.1  # TF layout [k,k,out,in]

    deconv = TFConvTranspose(6, (k, k), stride=2)
    out_jax = deconv.apply({"params": {"kernel": jnp.asarray(wgt_tf)}}, jnp.asarray(x))
    out_tf = tf.nn.conv2d_transpose(
        x, wgt_tf, output_shape=[2, 2 * H, 2 * W, 6], strides=[1, 2, 2, 1],
        padding="SAME",
    ).numpy()
    assert out_jax.shape == out_tf.shape
    np.testing.assert_allclose(np.asarray(out_jax), out_tf, rtol=1e-4, atol=1e-5)


def test_batchnorm_eval_matches_tf():
    """flax BatchNorm(eval) with given moving stats == slim/keras BN inference
    (epsilon 1e-3, center only)."""
    import flax.linen as nn

    C = 8
    x = rng.rand(2, 6, 6, C).astype(np.float32) * 3
    mean = rng.rand(C).astype(np.float32)
    var = rng.rand(C).astype(np.float32) + 0.5
    beta = rng.randn(C).astype(np.float32) * 0.1

    bn = nn.BatchNorm(use_running_average=True, momentum=0.99, epsilon=1e-3,
                      use_scale=False, use_bias=True)
    variables = {
        "params": {"bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    out_jax = bn.apply(variables, jnp.asarray(x))

    out_tf = tf.nn.batch_normalization(x, mean, var, offset=beta, scale=None,
                                       variance_epsilon=1e-3).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_tf, rtol=1e-5, atol=1e-6)


def test_batchnorm_train_statistics_match_tf():
    """train-mode normalization uses biased batch statistics in both frameworks."""
    import flax.linen as nn

    C = 4
    x = rng.rand(3, 5, 7, C).astype(np.float32) * 2

    bn = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=1e-3,
                      use_scale=False, use_bias=True)
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_jax, _ = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))  # biased, like tf.nn.moments
    out_ref = (x - mean) / np.sqrt(var + 1e-3)
    np.testing.assert_allclose(np.asarray(out_jax), out_ref, rtol=1e-4, atol=1e-5)


def test_sigmoid_head_formula():
    """DISP_SCALING * sigmoid(conv) + MIN_DISP ranges (nets_depth.py:122-123)."""
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant

    model = DispNet(DispNetVariant.depth10_flow())
    x = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    outs = model.apply(variables, x, train=False)
    d = np.asarray(outs[0])
    assert d.min() >= 0.001 and d.max() <= 10.001
