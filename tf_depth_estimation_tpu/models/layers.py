"""slim-semantics conv building blocks as Flax modules.

The reference's layers are ``slim.conv2d`` / ``slim.conv2d_transpose`` under an arg_scope
(``nets_optflow_depth.py:82-87``): SAME padding, ReLU activation, batch-norm normalizer
(momentum = slim 'decay', epsilon 1e-3, center-only — slim's ``scale=False`` default),
xavier/glorot-uniform weight init, no conv bias when batch-norm follows.

TPU-first notes: NHWC layout (XLA:TPU native), parameters float32 with an optional
bfloat16 compute dtype for MXU throughput; convs are ``nn.Conv`` (lax.conv_general_dilated
on the MXU) and ``TFConvTranspose`` — a custom transposed conv with exact
``tf.nn.conv2d_transpose`` SAME semantics (flax's ``nn.ConvTranspose`` places taps
differently; see that class's docstring and ``tests/test_tf_parity.py``).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class TFConvTranspose(nn.Module):
    """Transposed conv with exact ``tf.nn.conv2d_transpose`` SAME semantics.

    flax's ``nn.ConvTranspose`` (fractionally-strided conv, unflipped kernel) places taps
    differently from TF's gradient-of-conv definition — verified numerically in
    ``tests/test_tf_parity.py``.  ``lax.conv_transpose(transpose_kernel=True)`` with the
    TF weight layout ``[k, k, out, in]`` reproduces slim.conv2d_transpose exactly
    (including slim's xavier fan computation on that same variable shape).
    """

    features: int
    kernel: Sequence[int]
    stride: int = 2
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.glorot_uniform(),
            (*self.kernel, self.features, in_ch), jnp.float32,
        )
        y = jax.lax.conv_transpose(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class SlimConv(nn.Module):
    """conv -> (batchnorm) -> activation, slim defaults."""

    features: int
    kernel: Sequence[int]
    stride: int = 1
    use_bn: bool = True
    bn_momentum: float = 0.999  # slim batch_norm 'decay' default
    activation: Optional[Callable] = nn.relu
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.transpose:
            x = TFConvTranspose(
                features=self.features, kernel=tuple(self.kernel), stride=self.stride,
                use_bias=not self.use_bn, dtype=self.dtype,
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=tuple(self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                use_bias=not self.use_bn,
                kernel_init=nn.initializers.glorot_uniform(),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
                use_scale=False,  # slim batch_norm default scale=False
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def concat(xs):
    return jnp.concatenate(xs, axis=-1)
