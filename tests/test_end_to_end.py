"""End-to-end integration: train -> checkpoint -> batched inference round trip, and a
one-scene overfit quality check (SURVEY §4: single-batch overfit integration tests)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tf_depth_estimation_tpu.data.synthetic import write_colon_pair_dataset

H, W = 48, 96


@pytest.fixture(scope="module")
def colon_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("colon_e2e")
    return write_colon_pair_dataset(str(root), num_frames=4, H=H, W=W,
                                    splits=("train",))


def test_train_checkpoint_infer_roundtrip(colon_root, tmp_path):
    """depth_only CLI -> checkpoint -> infer CLI -> valid .bin depth dumps."""
    from tf_depth_estimation_tpu.infer import cli as infer_cli
    from tf_depth_estimation_tpu.train.experiments import depth_only

    ck = str(tmp_path / "ck")
    state, _ = depth_only.main([
        "--dataset_dir", colon_root, "--checkpoint_dir", ck,
        "--image_height", str(H), "--image_width", str(W), "--batch_size", "2",
        "--max_steps", "3", "--summary_freq", "2", "--validation_check", "0",
        "--save_latest_freq", "3", "--dtype", "float32", "--num_epochs", "8",
    ])

    frames_dir = os.path.join(colon_root, "seq0")
    out_dir = str(tmp_path / "out")
    written = infer_cli.main([
        "--dataset_dir", frames_dir, "--output_dir", out_dir,
        "--checkpoint_dir", ck, "--image_height", str(H), "--image_width", str(W),
        "--out_height", "24", "--out_width", "48", "--batch_size", "2",
        "--dtype", "float32", "--no_bilateral",
    ])
    assert len(written) == 4  # one per packed-pair jpg
    z = np.fromfile(written[0], np.float32)
    assert z.size == 24 * 48 and np.isfinite(z).all() and (z > 0).all()


def test_overfit_improves_abs_rel():
    """Training on one batch must drive abs-rel strongly down (learning sanity)."""
    import jax

    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.steps import jit_step, make_depth_only_step

    rng = np.random.RandomState(0)
    batch = {
        "tgt_image": jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32)),
        "label": jnp.asarray(rng.uniform(1.0, 2.0, (2, H, W, 1)).astype(np.float32)),
    }
    w = LossWeights(height=H, width=W, smooth_weight=0.0)
    model = DispNet(DispNetVariant.depth4())
    state = create_train_state(model, batch["tgt_image"], learning_rate=3e-3)
    step = jit_step(make_depth_only_step(w))

    def abs_rel(state):
        # train-mode forward: with slim BN momentum 0.99, eval-mode running stats lag
        # the params by hundreds of steps — train-mode output is the learning signal
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        pred, _ = model.apply(variables, batch["tgt_image"], train=True,
                              mutable=["batch_stats"])
        return float(jnp.mean(jnp.abs(pred[0] - batch["label"]) / batch["label"]))

    before = abs_rel(state)
    for _ in range(40):
        state, m = step(state, batch)
    after = abs_rel(state)
    assert after < before * 0.35, (before, after)


def test_distill_checkpoint_infer_turbo_roundtrip(tmp_path):
    """distill_turbo CLI -> 'turbo' checkpoint group -> infer CLI turbo mode."""
    from PIL import Image

    from tf_depth_estimation_tpu.infer import cli as infer_cli
    from tf_depth_estimation_tpu.train.experiments import distill_turbo

    ck = str(tmp_path / "ck")
    state, _ = distill_turbo.main([
        "--checkpoint_dir", ck, "--turbo_variant", "small",
        "--image_height", "64", "--image_width", "96", "--batch_size", "2",
        "--max_steps", "2", "--summary_freq", "2", "--validation_check", "0",
        "--save_latest_freq", "2", "--dtype", "float32",
    ])
    assert int(state.step) == 2

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng2 = np.random.RandomState(3)
    for i in range(3):
        Image.fromarray((rng2.rand(64, 96, 3) * 255).astype(np.uint8)).save(
            str(frames_dir / f"f{i}.jpg"))

    out_dir = str(tmp_path / "out")
    written = infer_cli.main([
        "--dataset_dir", str(frames_dir), "--output_dir", out_dir,
        "--checkpoint_dir", ck, "--mode", "turbo", "--turbo_variant", "small",
        "--image_height", "64", "--image_width", "96",
        "--out_height", "24", "--out_width", "48", "--batch_size", "2",
        "--dtype", "float32", "--no_bilateral",
    ])
    assert len(written) == 3
    z = np.fromfile(written[0], np.float32)
    # INTER_CUBIC postprocess (ref batch_prediction.py:72) can overshoot below 0
    # near zero-valued sigmoid outputs, so only the mean is sign-checked
    assert z.size == 24 * 48 and np.isfinite(z).all() and z.mean() > 0
