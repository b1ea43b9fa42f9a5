"""Tests for the HBM-resident corpus cache (data/device_cache.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from tf_depth_estimation_tpu.data.device_cache import DeviceCache, gather_batch


def _cache(n=6, H=8, W=12):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, size=(n, H, W, 3)).astype(np.uint8)
    labels = rng.uniform(0.5, 2.5, size=(n, H, W, 1)).astype(np.float32)
    return frames, labels, DeviceCache(
        {"tgt_image": frames, "label": labels},
        float_keys=("tgt_image",), aug_keys=("tgt_image", "label"))


def test_gather_matches_numpy_and_casts():
    frames, labels, cache = _cache()
    idx = np.array([3, 0, 5], np.int32)
    batch = cache.gather(cache.data, jnp.asarray(idx))
    assert batch["tgt_image"].dtype == jnp.float32  # uint8 cast at gather time
    np.testing.assert_array_equal(np.asarray(batch["tgt_image"]),
                                  frames[idx].astype(np.float32))
    np.testing.assert_array_equal(np.asarray(batch["label"]), labels[idx])


def test_augmentation_semantics():
    frames, labels, cache = _cache(n=4)
    idx = np.arange(4, dtype=np.int32)
    flip = np.array([True, False, True, False])
    rot = np.array([False, False, True, True])
    batch = cache.gather(cache.data, jnp.asarray(idx), flip=jnp.asarray(flip),
                         rot=jnp.asarray(rot))
    f = frames.astype(np.float32)
    want = f.copy()
    want[flip] = want[flip][:, :, ::-1]
    want[rot] = want[rot][:, ::-1, ::-1]
    np.testing.assert_array_equal(np.asarray(batch["tgt_image"]), want)
    # label gets the identical spatial transform (supervised pairs stay aligned)
    wl = labels.copy()
    wl[flip] = wl[flip][:, :, ::-1]
    wl[rot] = wl[rot][:, ::-1, ::-1]
    np.testing.assert_array_equal(np.asarray(batch["label"]), wl)


def test_index_stream_deterministic_and_bounded():
    _f, _l, cache = _cache()
    a = list(cache.index_stream(4, seed=3, augment=True, num_steps=5))
    b = list(cache.index_stream(4, seed=3, augment=True, num_steps=5))
    assert len(a) == 5
    for (ia, fa, ra), (ib, fb, rb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(ra, rb)
        assert ia.min() >= 0 and ia.max() < cache.num_samples
    # without augment the bits are all off
    for idx, flip, rot in cache.index_stream(4, seed=0, num_steps=3):
        assert not flip.any() and not rot.any()


def test_cached_depth_only_training_reduces_loss():
    """End-to-end: the device-resident gather path trains (jit + donate)."""
    import dataclasses

    from tf_depth_estimation_tpu.losses import LossWeights
    from tf_depth_estimation_tpu.models import DispNet, DispNetVariant
    from tf_depth_estimation_tpu.train.state import create_train_state
    from tf_depth_estimation_tpu.train.steps import jit_step, make_depth_only_step

    H, W, B = 32, 48, 2
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 255, size=(4, H, W, 3)).astype(np.uint8)
    labels = rng.uniform(0.5, 2.5, size=(4, H, W, 1)).astype(np.float32)
    cache = DeviceCache({"tgt_image": frames, "label": labels},
                        float_keys=("tgt_image",))
    w = dataclasses.replace(LossWeights.depth_only(), height=H, width=W)
    model = DispNet(DispNetVariant.depth4())
    state = create_train_state(model, jnp.zeros((B, H, W, 3)))
    base = make_depth_only_step(w)
    step = jit_step(lambda st, data, idx, flip, rot: base(
        st, cache.gather(data, idx, flip=flip, rot=rot)))
    losses = []
    for idx, flip, rot in cache.index_stream(B, seed=0, num_steps=12):
        state, m = step(state, cache.data, idx, flip, rot)
        losses.append(float(m["total"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
