"""Rich-summary producers: shapes, TF1 image normalization, TB event emission
(the reference's summary graph, ``split_training.py:275-325,380-393``)."""
import dataclasses
import glob
import os

import numpy as np
import pytest

from tf_depth_estimation_tpu.train.summaries import tf1_image_norm


def test_tf1_image_norm_positive_scales_max_to_255():
    x = np.stack([np.linspace(0, 2.0, 12).reshape(3, 4)[..., None]])
    out = tf1_image_norm(x)
    assert out.dtype == np.uint8
    assert out.max() == 255 and out.min() == 0


def test_tf1_image_norm_signed_centers_zero_at_127():
    x = np.zeros((1, 2, 2, 1), np.float32)
    x[0, 0, 0, 0] = -1.0
    x[0, 1, 1, 0] = 0.5
    out = tf1_image_norm(x)
    assert out[0, 0, 1, 0] == 127          # zero pixel
    assert out[0, 0, 0, 0] == 0            # the -1 extreme


def test_pairwise_summary_fn_shapes():
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DepthPoseNet
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.summaries import make_pairwise_summary_fn
    from tf_depth_estimation_tpu.geometry import make_intrinsics_matrix, scale_intrinsics_pyramid

    H, W, B = 32, 64, 2
    w = dataclasses.replace(LossWeights.split_training(), height=H, width=W)
    model = DepthPoseNet(full_resolution=False, dtype=jnp.float32)
    state = create_train_state(model, jnp.zeros((B, H, W, 6)))
    rng = np.random.RandomState(0)
    K = make_intrinsics_matrix(jnp.full((B,), 50.0), jnp.full((B,), 50.0),
                               jnp.full((B,), W / 2), jnp.full((B,), H / 2))
    batch = {
        "image_pair": jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32) - 0.5),
        "depth0": jnp.asarray(rng.uniform(0.5, 2, (B, H, W, 1)).astype(np.float32)),
        "intrinsics": jnp.asarray(np.asarray(scale_intrinsics_pyramid(K, 4))),
    }
    fixture = rng.rand(1, H, W, 6).astype(np.float32) - 0.5
    fn = make_pairwise_summary_fn(w, fixture)
    images, hists = fn(state, batch)

    # the truncated net's first scale is pyramid scale 2 -> summary scale 0 covers it
    assert "scale0_left_image" in images and "scale0_pred_depth_left" in images
    assert "scale0_projected_image_left" in images
    assert "scale0_project_error_left" in images
    for v in images.values():
        assert v.dtype == np.uint8 and v.ndim == 4
    # fixed-fixture smoke inference present (ref split_training.py:380-393)
    assert {"val_depth", "val_depth_inv", "val_image"} <= set(images)
    assert {"scale0_pred_depth_single_left", "scale_depth",
            "image_value_range"} <= set(hists)
    for v in hists.values():
        assert np.isfinite(v).all()


def test_depth_summary_fn_and_tb_writer(tmp_path):
    import jax.numpy as jnp

    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.loop import MetricLogger
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.summaries import make_depth_summary_fn

    H, W, B = 32, 64, 2
    w = dataclasses.replace(LossWeights.depth_only(), height=H, width=W)
    model = DispNet(DispNetVariant.depth4(), dtype=jnp.float32)
    state = create_train_state(model, jnp.zeros((B, H, W, 3)))
    rng = np.random.RandomState(0)
    batch = {
        "tgt_image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "label": jnp.asarray(rng.uniform(0.5, 2, (B, H, W, 1)).astype(np.float32)),
    }
    images, hists = make_depth_summary_fn(w)(state, batch)
    assert "target_image" in images and "scale0_pred_depth" in images
    assert "scale_depth" in hists

    tf = pytest.importorskip("tensorflow")
    logger = MetricLogger(str(tmp_path), quiet=True, tensorboard=True)
    logger.log_images(1, images)
    logger.log_histograms(1, hists)
    logger.close()
    assert glob.glob(os.path.join(str(tmp_path), "sum", "events.*"))
