"""Data pipeline tests: loader formats, batching/prefetch, DeMoN semantics."""
import os

import numpy as np
import pytest

from tf_depth_estimation_tpu.data import (
    BatchLoader,
    DemonDataset,
    DemonReaderParams,
    PairDepthDataset,
    SimpleDepthDataset,
    device_prefetch,
)
from tf_depth_estimation_tpu.data.synthetic import (
    write_colon_pair_dataset,
    write_demon_h5,
    write_simple_depth_dataset,
)

H, W = 48, 144  # small colon-format frames (keep 3:1-ish aspect like 240x720)


@pytest.fixture(scope="module")
def colon_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("colon")
    return write_colon_pair_dataset(str(root), num_frames=6, H=H, W=W)


@pytest.fixture(scope="module")
def simple_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("simple")
    return write_simple_depth_dataset(str(root), num_frames=4, H=32, W=32)


@pytest.fixture(scope="module")
def demon_h5(tmp_path_factory):
    root = tmp_path_factory.mktemp("demon")
    return write_demon_h5(os.path.join(str(root), "train.h5"), num_scenes=6, H=48, W=64)


def test_pair_dataset_fields(colon_root):
    ds = PairDepthDataset(colon_root, split="train", image_height=H, image_width=W,
                          resized_height=H, resized_width=W)
    assert len(ds) >= 2
    s = ds[0]
    assert s["tgt_image"].shape == (H, W, 3)
    assert s["src_image"].shape == (H, W, 3)
    assert s["label"].shape == (H, W, 1)
    assert s["intrinsics"].shape == (4, 3, 3)
    assert s["tgt2src_projs"].shape == (2, 4, 4)
    # the two stored 4x4s are mutual inverses
    np.testing.assert_allclose(
        s["tgt2src_projs"][0] @ s["tgt2src_projs"][1], np.eye(4), atol=1e-4
    )
    # image range is 0..255 in this loader (reference does not /255 here)
    assert s["tgt_image"].max() > 2.0
    # intrinsics pyramid halves per scale
    np.testing.assert_allclose(s["intrinsics"][1, 0, 0], s["intrinsics"][0, 0, 0] / 2,
                               rtol=1e-6)


def test_simple_dataset_inverts_depth(simple_root):
    ds = SimpleDepthDataset(simple_root, split="train", resized_height=32, resized_width=32)
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["image"].max() <= 1.0 + 1e-6  # /255 in this loader
    assert s["label"].shape == (32, 32, 1)
    # labels are inverse depth of a ~[0.4, 3.75] surface
    assert 0.2 < s["label"].mean() < 3.0


def test_batch_loader_shapes_and_epochs(colon_root):
    ds = PairDepthDataset(colon_root, split="train", image_height=H, image_width=W,
                          resized_height=H, resized_width=W)
    loader = BatchLoader(ds, batch_size=2, num_epochs=2, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) >= 2  # 2 epochs of len>=2 with batch 2, remainder dropped
    b = batches[0]
    assert b["tgt_image"].shape == (2, H, W, 3)
    assert b["intrinsics"].shape == (2, 4, 3, 3)


def test_device_prefetch(colon_root):
    import jax

    ds = PairDepthDataset(colon_root, split="train", image_height=H, image_width=W,
                          resized_height=H, resized_width=W)
    loader = BatchLoader(ds, batch_size=2, num_epochs=1, num_workers=1)
    out = list(device_prefetch(iter(loader), size=2))
    assert len(out) >= 1
    assert isinstance(out[0]["tgt_image"], jax.Array)


def test_multihost_sharding_disjoint(colon_root):
    ds = PairDepthDataset(colon_root, split="train", image_height=H, image_width=W,
                          resized_height=H, resized_width=W)
    a = BatchLoader(ds, batch_size=1, num_epochs=1, shuffle=False, host_index=0, host_count=2,
                    num_workers=1)
    b = BatchLoader(ds, batch_size=1, num_epochs=1, shuffle=False, host_index=1, host_count=2,
                    num_workers=1)
    na, nb = len(list(a)), len(list(b))
    assert na + nb == len(ds)


def test_demon_dataset_contract(demon_h5):
    params = DemonReaderParams(scaled_height=48, scaled_width=64, scene_pool_size=4,
                               augment_rot180=0.0, augment_mirror_x=0.0)
    ds = DemonDataset([(demon_h5, 1.0)], params)
    s = ds[0]
    assert s["image_pair"].shape == (48, 64, 6)
    assert -0.51 <= s["image_pair"].min() and s["image_pair"].max() <= 0.51  # [-0.5, 0.5]
    assert s["depth0"].shape == (48, 64, 1)
    assert s["depth2"].shape == (12, 16, 1)
    assert s["rotation"].shape == (3,) and s["translation"].shape == (3,)
    # norm_trans_scale_depth: unit-length translation
    np.testing.assert_allclose(np.linalg.norm(s["translation"]), 1.0, rtol=1e-5)
    assert s["intrinsics"].shape == (4, 3, 3)
    ds.close()


def test_demon_augmentation_consistency(demon_h5):
    """rot180/mirror fixups must keep R proper and t unit-length."""
    params = DemonReaderParams(scaled_height=48, scaled_width=64,
                               augment_rot180=1.0, augment_mirror_x=1.0)
    ds = DemonDataset([(demon_h5, 1.0)], params)
    from tf_depth_estimation_tpu.data.demon import _rotvec_to_matrix_np

    for i in range(3):
        s = ds[i]
        R = _rotvec_to_matrix_np(s["rotation"].astype(np.float64))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(s["translation"]), 1.0, rtol=1e-5)
    ds.close()


def test_demon_weighted_sources(tmp_path):
    """sample() draws from the weighted scene pool across sources."""
    a = write_demon_h5(os.path.join(str(tmp_path), "a.h5"), num_scenes=4, H=32, W=32, seed=1)
    b = write_demon_h5(os.path.join(str(tmp_path), "b.h5"), num_scenes=4, H=32, W=32, seed=2)
    params = DemonReaderParams(scaled_height=32, scaled_width=32, scene_pool_size=8,
                               augment_rot180=0.0, augment_mirror_x=0.0)
    ds = DemonDataset([(a, 0.9), (b, 0.1)], params, seed=0)
    rng = np.random.RandomState(0)
    for _ in range(5):
        s = ds.sample(rng)
        assert s["image_pair"].shape == (32, 32, 6)
    ds.close()
