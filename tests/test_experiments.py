"""End-to-end smoke tests of the experiment CLIs on synthetic data (CPU, tiny shapes)."""
import os

import numpy as np
import pytest

from tf_depth_estimation_tpu.data.synthetic import write_colon_pair_dataset, write_demon_h5


@pytest.fixture(scope="module")
def colon_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("colon_exp")
    return write_colon_pair_dataset(str(root), num_frames=6, H=48, W=144)


@pytest.fixture(scope="module")
def demon_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("demon_exp")
    write_demon_h5(os.path.join(str(root), "scenes.h5"), num_scenes=4, H=32, W=64)
    return str(root)


def test_depth_only_cli(colon_root, tmp_path):
    from tf_depth_estimation_tpu.train.experiments import depth_only

    state, last = depth_only.main([
        "--dataset_dir", colon_root, "--checkpoint_dir", str(tmp_path / "ck"),
        "--image_height", "48", "--image_width", "144", "--batch_size", "2",
        "--max_steps", "4", "--summary_freq", "2", "--validation_check", "2",
        "--save_latest_freq", "4", "--dtype", "float32", "--num_epochs", "8",
    ])
    assert int(state.step) == 4
    assert last is not None and np.isfinite(last["total"])
    assert os.path.exists(tmp_path / "ck" / "metrics.jsonl")


def test_on_demon_cli(demon_root, tmp_path):
    from tf_depth_estimation_tpu.train.experiments import on_demon

    state, last = on_demon.main([
        "--dataset_dir", demon_root, "--checkpoint_dir", str(tmp_path / "ck"),
        "--image_height", "32", "--image_width", "64", "--batch_size", "2",
        "--max_steps", "3", "--summary_freq", "1", "--save_latest_freq", "3",
        "--dtype", "float32",
    ])
    assert int(state.step) == 3
    assert np.isfinite(last["total"])


def test_on_demon_cli_streams_v1_archives(tmp_path):
    """--demon_v1 trains directly off a classic-layout archive (no conversion pass)."""
    from tf_depth_estimation_tpu.data.demon_v1 import write_demon_v1_h5
    from tf_depth_estimation_tpu.train.experiments import on_demon

    root = tmp_path / "v1data"
    root.mkdir()
    write_demon_v1_h5(str(root / "scenes11_train.h5"), num_scenes=4, H=32, W=64)
    state, last = on_demon.main([
        "--dataset_dir", str(root), "--checkpoint_dir", str(tmp_path / "ck"),
        "--image_height", "32", "--image_width", "64", "--batch_size", "2",
        "--max_steps", "2", "--summary_freq", "1", "--save_latest_freq", "2",
        "--dtype", "float32", "--demon_v1",
    ])
    assert int(state.step) == 2
    assert np.isfinite(last["total"])


def test_split_training_cli_both_phases(demon_root, tmp_path):
    from tf_depth_estimation_tpu.train.experiments import split_training

    pair_state, single_state = split_training.main([
        "--dataset_dir", demon_root, "--checkpoint_dir", str(tmp_path / "pair"),
        "--checkpoint_dir_single", str(tmp_path / "single"),
        "--image_height", "32", "--image_width", "64", "--batch_size", "2",
        "--max_steps", "3", "--max_steps_single", "3", "--summary_freq", "1",
        "--save_latest_freq", "3", "--dtype", "float32",
    ])
    assert int(pair_state.step) == 3
    assert single_state is not None and int(single_state.step) == 3
    # both checkpoint groups on disk
    assert os.path.isdir(tmp_path / "pair")
    assert os.path.isdir(tmp_path / "single")


def test_depth_only_cli_resume(colon_root, tmp_path):
    from tf_depth_estimation_tpu.train.experiments import depth_only

    common = [
        "--dataset_dir", colon_root, "--checkpoint_dir", str(tmp_path / "ck"),
        "--image_height", "48", "--image_width", "144", "--batch_size", "2",
        "--summary_freq", "2", "--validation_check", "0", "--save_latest_freq", "2",
        "--dtype", "float32", "--num_epochs", "16",
    ]
    state, _ = depth_only.main(common + ["--max_steps", "2"])
    assert int(state.step) == 2
    state, _ = depth_only.main(common + ["--max_steps", "4", "--continue_train"])
    assert int(state.step) == 4


def test_distill_turbo_cli(tmp_path):
    """Turbo distillation CLI: synthetic frames, random teacher, resume via group."""
    from tf_depth_estimation_tpu.train.experiments import distill_turbo

    common = [
        "--checkpoint_dir", str(tmp_path / "ck"), "--turbo_variant", "small",
        "--image_height", "64", "--image_width", "96", "--batch_size", "2",
        "--summary_freq", "2", "--validation_check", "2", "--save_latest_freq", "2",
        "--dtype", "float32",
    ]
    state, last = distill_turbo.main(common + ["--max_steps", "2"])
    assert int(state.step) == 2
    assert np.isfinite(last["total_loss"])
    state, _ = distill_turbo.main(common + ["--max_steps", "4", "--continue_train"])
    assert int(state.step) == 4


def test_depth_only_cli_turbo(colon_root, tmp_path):
    """--turbo trains the MXU-shaped student directly on the supervised pipeline
    (same 4-scale loss pyramid contract as the parity DispNet)."""
    from tf_depth_estimation_tpu.train.experiments import depth_only

    state, last = depth_only.main([
        "--dataset_dir", colon_root, "--checkpoint_dir", str(tmp_path / "ck"),
        "--image_height", "48", "--image_width", "144", "--batch_size", "2",
        "--max_steps", "3", "--summary_freq", "3", "--validation_check", "0",
        "--save_latest_freq", "3", "--dtype", "float32", "--num_epochs", "8",
        "--turbo", "colon",
    ])
    assert int(state.step) == 3
    assert np.isfinite(last["total"])
