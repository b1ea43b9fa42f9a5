"""Test-time depth refinement against a COLMAP reconstruction.

Rebuild of ``refine_depth.py``: per-sequence gradient descent over the DispNet weights on
ONE image pair, with (a) a median-ratio scale alignment between predicted depth and the
sparse COLMAP points3D visible in the frame (the reference computes this inside a
``tf.while_loop`` gather, ``refine_depth.py:91-137`` — here a vectorized gather), and
(b) a loss of per-scale smoothness + photometric warp (pose·scale) + |GT − s·pred| prior
(``refine_depth.py:185-215``).

TPU-first: the whole optimization step (forward, scale-align, warp, loss, Adam update) is
ONE jitted function; the Python loop just pumps it.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.geometry.warp import projective_inverse_warp
from tf_depth_estimation_tpu.losses.basic import second_order_smoothness
from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
from tf_depth_estimation_tpu.ops.resize import resize_area
from tf_depth_estimation_tpu.train.state import adam, create_train_state


def sparse_scale_factor(pred_depth: jnp.ndarray, sparse_xy: jnp.ndarray,
                        sparse_z: jnp.ndarray) -> jnp.ndarray:
    """median(sparse z) / median(pred depth at sparse pixels) — ``refine_depth.py:91-137``.

    ``pred_depth``: [H, W]; ``sparse_xy``: [N, 2] pixel coords; ``sparse_z``: [N].
    """
    xi = jnp.clip(sparse_xy[:, 0].astype(jnp.int32), 0, pred_depth.shape[1] - 1)
    yi = jnp.clip(sparse_xy[:, 1].astype(jnp.int32), 0, pred_depth.shape[0] - 1)
    pred_z = pred_depth[yi, xi]
    return jnp.median(sparse_z) / (jnp.median(pred_z) + 1e-12)


def refine_depth(
    image1: np.ndarray,
    image2: np.ndarray,
    relative_pose: np.ndarray,
    intrinsics: np.ndarray,
    sparse_xy: np.ndarray,
    sparse_z: np.ndarray,
    *,
    gt_depth: Optional[np.ndarray] = None,
    steps: int = 500,
    learning_rate: float = 1e-4,
    smooth_weight: float = 1.0,
    photo_weight: float = 1.0,
    prior_weight: float = 1.0,
    num_scales: int = 4,
    seed: int = 0,
    init_params=None,
    sampler: str = "xla",
) -> Tuple[np.ndarray, dict]:
    """Optimize DispNet weights on one pair; returns (refined depth [H, W], history)."""
    H, W = image1.shape[:2]
    x1 = jnp.asarray(image1)[None]
    x2 = jnp.asarray(image2)[None]
    pose = jnp.asarray(relative_pose)[None]            # [1, 4, 4]
    K = jnp.asarray(intrinsics)[None]                   # [1, 3, 3]
    sxy = jnp.asarray(sparse_xy)
    sz = jnp.asarray(sparse_z)
    gt = None if gt_depth is None else jnp.asarray(gt_depth)[None, ..., None]

    model = DispNet(DispNetVariant.depth4())
    state = create_train_state(model, x1, learning_rate=learning_rate,
                               rng=jax.random.PRNGKey(seed))
    if init_params is not None:
        state = state.replace(params=init_params)

    def K_scale(s):
        f = 1.0 / 2**s
        return K.at[:, :2].multiply(f)

    def loss_fn(params, batch_stats):
        variables = {"params": params, "batch_stats": batch_stats}
        disps, mut = model.apply(variables, x1, train=True, mutable=["batch_stats"])
        depth_full = 1.0 / disps[0][0, :, :, 0]
        scale = sparse_scale_factor(depth_full, sxy, sz)
        total = 0.0
        for s in range(num_scales):
            hw = (int(H / 2**s), int(W / 2**s))
            total += smooth_weight / 2**s * second_order_smoothness(disps[s])
            curr1 = resize_area(x1, hw)
            curr2 = resize_area(x2, hw)
            depth_s = scale / disps[s][..., 0]
            warp = projective_inverse_warp(curr2, depth_s, pose, K_scale(s),
                                           fmt="matrix", sampler=sampler)
            total += photo_weight / 2**s * jnp.mean(jnp.abs(warp.image - curr1) * warp.mask)
            if gt is not None:
                curr_gt = resize_area(gt, hw)
                total += prior_weight / 2**s * jnp.mean(
                    jnp.abs(curr_gt - scale / disps[s])
                )
        return total, (mut["batch_stats"], scale)

    @jax.jit
    def step_fn(state):
        (total, (new_stats, scale)), grads = jax.value_and_grad(
            lambda p: loss_fn(p, state.batch_stats), has_aux=True
        )(state.params)
        return state.apply_gradients(grads, new_stats), total, scale

    history = {"loss": [], "scale": []}
    for i in range(steps):
        state, total, scale = step_fn(state)
        if (i + 1) % 100 == 0 or i == 0:
            history["loss"].append(float(total))
            history["scale"].append(float(scale))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    disps = model.apply(variables, x1, train=False)
    depth = 1.0 / np.asarray(disps[0][0, :, :, 0])
    scale = float(sparse_scale_factor(jnp.asarray(depth), sxy, sz))
    return depth * scale, history
