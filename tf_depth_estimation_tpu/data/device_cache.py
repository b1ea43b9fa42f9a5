"""Device-resident dataset cache: upload a small corpus to HBM once, gather per step.

TPU-specific extension (no reference counterpart): the reference streams every batch
from host queue-runner threads (``imageselect_Dataloader_optflow.py:41-56``), which is
also what ``data/pipeline.py`` does for production corpora.  When the whole corpus
fits in HBM (synthetic scenes, distillation frame sets, overfit experiments), the
TPU-idiomatic input pipeline is *no* pipeline: upload the arrays once, and let each
jitted train step gather its batch on device from a tiny host-sent index vector.
Per-step host->device traffic drops from O(batch bytes) to O(batch) int32s — on this
image's 40 MB/s tunnel that is the difference between ~1.5 and wire-speed steps/s,
and on a production PCIe host it removes the input thread entirely.

Augmentation (mirror-x / rot180, the DeMoN reader's pair — ``data/demon.py``) is done
on device from host-sent per-sample bits, so augmented batches cost no extra
transfer.  uint8 image arrays stay uint8 in HBM (4x smaller) and are cast to float32
at gather time inside the step's fusion.

Usage::

    cache = DeviceCache({"tgt_image": frames_u8, "label": depths}, float_keys=("tgt_image",))
    step = jit_step(lambda state, data, idx, flip, rot: base_step(
        state, cache.gather(data, idx, flip=flip, rot=rot)))
    for idx, flip, rot in cache.index_stream(batch_size=16, seed=0, augment=True):
        state, metrics = step(state, cache.data, idx, flip, rot)

``cache.data`` is passed as an explicit jit argument (NOT closed over) so the arrays
live as device buffers rather than baked-in executable constants.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def gather_batch(data: Dict[str, jnp.ndarray], idx: jnp.ndarray, *,
                 float_keys: Sequence[str] = (),
                 aug_keys: Sequence[str] = (),
                 flip: Optional[jnp.ndarray] = None,
                 rot: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """On-device batch assembly: gather rows ``idx`` from each array, cast integer
    ``float_keys`` to float32, and apply per-sample mirror-x (``flip``) / rot180
    (``rot``) to the spatial ``aug_keys`` ([B, H, W, C] layouts).

    Pure jnp on static shapes — call inside the jitted step.  ``flip``/``rot`` are
    bool [B] vectors; both transforms act on image AND label identically (supervised
    targets are spatial maps here), which is why they are keyed, not global.
    """
    batch = {}
    for k, v in data.items():
        b = v[idx]
        if k in float_keys and jnp.issubdtype(b.dtype, jnp.integer):
            b = b.astype(jnp.float32)
        if k in aug_keys:
            if flip is not None:
                b = jnp.where(flip[:, None, None, None], b[:, :, ::-1], b)
            if rot is not None:
                b = jnp.where(rot[:, None, None, None], b[:, ::-1, ::-1], b)
        batch[k] = b
    return batch


class DeviceCache:
    """Holds the uploaded corpus + the host-side index/augmentation stream."""

    def __init__(self, arrays: Dict[str, np.ndarray],
                 float_keys: Sequence[str] = (),
                 aug_keys: Sequence[str] = ()):
        sizes = {k: len(v) for k, v in arrays.items()}
        assert len(set(sizes.values())) == 1, f"ragged corpus: {sizes}"
        self.num_samples = next(iter(sizes.values()))
        # one upload; uint8 stays uint8 (cast happens on device at gather time)
        self.data = {k: jnp.asarray(v) for k, v in arrays.items()}
        self.float_keys = tuple(float_keys)
        self.aug_keys = tuple(aug_keys)

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in self.data.values())

    def gather(self, data, idx, flip=None, rot=None):
        """``gather_batch`` bound to this cache's key sets (use inside jit; pass
        ``self.data`` through the jit boundary as ``data``)."""
        return gather_batch(data, idx, float_keys=self.float_keys,
                            aug_keys=self.aug_keys, flip=flip, rot=rot)

    def index_stream(self, batch_size: int, seed: int = 0, augment: bool = False,
                     num_steps: Optional[int] = None
                     ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Host-side (idx, flip, rot) stream: uniform with-replacement sampling (the
        shuffle-queue regime of the reference's slice_input_producer at these corpus
        sizes), p=0.5 mirror/rot180 when ``augment``."""
        rng = np.random.RandomState(seed)
        step = 0
        while num_steps is None or step < num_steps:
            idx = rng.randint(0, self.num_samples, size=batch_size).astype(np.int32)
            if augment:
                flip = rng.rand(batch_size) < 0.5
                rot = rng.rand(batch_size) < 0.5
            else:
                flip = np.zeros(batch_size, bool)
                rot = np.zeros(batch_size, bool)
            yield idx, flip, rot
            step += 1
