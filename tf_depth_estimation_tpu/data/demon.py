"""DeMoN-style HDF5 streaming dataset.

TPU-native replacement for the C++ ``depthmotionnet.datareader.multi_vi_h5_data_reader``
op the reference configures in ``Demon_Data_loader.py:43-142`` (SURVEY §2.5).  Reproduced
semantics (reader_params, ``Demon_Data_loader.py:52-66``):

- weighted sampling across multiple HDF5 sources (``add_sources`` weights,
  ``Demon_Data_loader.py:69-74``);
- a scene pool (default 650) that decorrelates draw order;
- augmentation: rot180 and mirror-x, each p=0.5, with consistent motion/intrinsics fixups;
- ``motion_format='ANGLEAXIS6'`` — [rotation rotvec(3) | translation(3)], camera 1 -> 2;
- ``inverse_depth=True`` and ``norm_trans_scale_depth=True`` — translation normalized to
  unit length with depth scaled by the same factor;
- ground-truth pyramid ``depth0`` (full res) / ``depth2`` (1/4 res) + per-scale pixel
  intrinsics (the ``prepare_ground_truth_tensors`` + pyramid port,
  ``Demon_Data_loader.py:101-138``).

On-disk schema: this reader consumes a flat group schema — each HDF5 group holds
``image_pair`` (uint8 [H, W, 6]), ``depth`` (float32 [H, W], metric), ``motion``
(float32 [6]), ``intrinsics`` (float32 [4], normalized fx fy cx cy).
``tf_depth_estimation_tpu.data.synthetic.write_demon_h5`` emits it.  The *classic*
DeMoN v1 archives (sun3d/rgbd/mvs/scenes11 as released) are consumable two ways:
streamed in place by ``data.demon_v1.DemonV1Dataset`` (a drop-in subclass — the
reference streams v1 natively, ``Demon_Data_loader.py:69-79``), or rewritten once to
the flat schema with the offline converter ``python -m
tf_depth_estimation_tpu.data.demon_v1 SRC.h5 -o OUT.h5``.
"""
from __future__ import annotations

import dataclasses
import threading
from typing import List, Sequence, Tuple

import numpy as np

from tf_depth_estimation_tpu.data.colon import _resize_area_np, _resize_bilinear_np
from tf_depth_estimation_tpu.geometry.rotations import matrix_to_axis_angle  # noqa: F401 (jnp twin)


def _rotvec_to_matrix_np(v: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(v)
    if angle < 1e-12:
        return np.eye(3, dtype=np.float64)
    a = v / angle
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


def _matrix_to_rotvec_np(R: np.ndarray) -> np.ndarray:
    angle = np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))
    if angle < 1e-12:
        return np.zeros(3)
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return v / (2 * np.sin(angle)) * angle


@dataclasses.dataclass
class DemonReaderParams:
    """Mirror of the reference reader_params dict (``Demon_Data_loader.py:52-66``)."""

    batch_size: int = 16
    scaled_height: int = 192
    scaled_width: int = 256
    inverse_depth: bool = True
    norm_trans_scale_depth: bool = True
    scene_pool_size: int = 650
    augment_rot180: float = 0.5
    augment_mirror_x: float = 0.5
    test_phase: bool = False
    num_scales: int = 4


class DemonDataset:
    """Indexable view over weighted HDF5 sources with DeMoN preprocessing.

    ``sources``: list of (h5_path, weight).  Iteration order/augmentation is driven by the
    ``BatchLoader`` on top; this class exposes ``sample(rng)`` for the pool-based stream
    and ``__getitem__`` for deterministic access (tests).
    """

    def __init__(self, sources: Sequence[Tuple[str, float]], params: DemonReaderParams | None = None,
                 seed: int = 0):
        import h5py

        self.params = params or DemonReaderParams()
        self.rng = np.random.RandomState(seed)
        self._files = []
        self._keys: List[Tuple[int, str]] = []
        weights = []
        for path, weight in sources:
            f = h5py.File(path, "r")
            fi = len(self._files)
            self._files.append(f)
            keys = self._enumerate_keys(f)
            if not keys:
                continue
            self._keys.extend((fi, k) for k in keys)
            weights.extend([weight / len(keys)] * len(keys))
        if not self._keys:
            raise ValueError("no samples found in sources")
        w = np.asarray(weights, np.float64)
        self._probs = w / w.sum()
        # scene pool: pre-drawn weighted sample indices, refilled as consumed
        self._pool = list(
            self.rng.choice(len(self._keys), size=min(self.params.scene_pool_size,
                                                      max(1, len(self._keys))),
                            p=self._probs)
        )
        # pool draws mutate shared state; StreamLoader workers call sample()
        # concurrently (single-writer-per-slot via this lock)
        self._pool_lock = threading.Lock()

    @staticmethod
    def _enumerate_keys(h5file) -> List[str]:
        """Sample group names in one archive (hook for layout subclasses)."""
        return sorted(h5file.keys())

    def __len__(self):
        return len(self._keys)

    def close(self):
        for f in self._files:
            f.close()

    # -- raw record --------------------------------------------------------------
    def _load(self, index: int):
        fi, key = self._keys[index]
        g = self._files[fi][key]
        pair = np.asarray(g["image_pair"], dtype=np.uint8)
        depth = np.asarray(g["depth"], dtype=np.float32)
        motion = np.asarray(g["motion"], dtype=np.float32)
        intr = np.asarray(g["intrinsics"], dtype=np.float32)
        return pair, depth, motion, intr

    # -- preprocessing mirroring the C++ reader ------------------------------------
    def _augment(self, pair, depth, motion, intr, rng):
        p = self.params
        H, W = depth.shape
        R = _rotvec_to_matrix_np(motion[:3].astype(np.float64))
        t = motion[3:].astype(np.float64)
        fx, fy, cx, cy = intr  # normalized

        if rng.rand() < p.augment_rot180:
            pair = pair[::-1, ::-1].copy()
            depth = depth[::-1, ::-1].copy()
            # rotating both image planes 180deg conjugates the relative motion with
            # D = diag(-1,-1,1) and reflects the principal point
            D = np.diag([-1.0, -1.0, 1.0])
            R = D @ R @ D
            t = D @ t
            cx, cy = 1.0 - cx, 1.0 - cy
        if rng.rand() < p.augment_mirror_x:
            pair = pair[:, ::-1].copy()
            depth = depth[:, ::-1].copy()
            # mirror about x: conjugate with M = diag(-1,1,1) (improper; R stays proper
            # because conjugation applies it twice)
            M = np.diag([-1.0, 1.0, 1.0])
            R = M @ R @ M
            t = M @ t
            cx = 1.0 - cx
        motion = np.concatenate(
            [_matrix_to_rotvec_np(R), t]
        ).astype(np.float32)
        return pair, depth, motion, np.array([fx, fy, cx, cy], np.float32)

    def _preprocess(self, pair, depth, motion, intr):
        p = self.params
        Hs, Ws = p.scaled_height, p.scaled_width
        img = pair.astype(np.float32)
        if img.shape[:2] != (Hs, Ws):
            img = _resize_bilinear_np(img, (Hs, Ws))
            depth = _resize_area_np(depth[..., None], (Hs, Ws))[..., 0]
        img = img / 255.0 - 0.5  # DeMoN image range [-0.5, 0.5]

        if p.norm_trans_scale_depth:
            s = float(np.linalg.norm(motion[3:]))
            if s > 1e-12:
                motion = motion.copy()
                motion[3:] /= s
                depth = depth / s

        depth0 = depth[..., None]
        if p.inverse_depth:
            with np.errstate(divide="ignore"):
                depth0 = 1.0 / depth0
        depth2 = _resize_area_np(depth0, (Hs // 4, Ws // 4))

        fx, fy, cx, cy = intr
        K = np.array(
            [[fx * Ws, 0, cx * Ws], [0, fy * Hs, cy * Hs], [0, 0, 1]], np.float32
        )
        pyr = np.zeros((p.num_scales, 3, 3), np.float32)
        for s_ in range(p.num_scales):
            f = 1 / 2**s_
            pyr[s_] = [[K[0, 0] * f, 0, K[0, 2] * f], [0, K[1, 1] * f, K[1, 2] * f], [0, 0, 1]]

        return {
            "image_pair": img.astype(np.float32),        # [H, W, 6]
            "depth0": depth0.astype(np.float32),         # [H, W, 1] (inverse) depth
            "depth2": depth2.astype(np.float32),         # [H/4, W/4, 1]
            "rotation": motion[:3].astype(np.float32),
            "translation": motion[3:].astype(np.float32),
            "intrinsics": pyr,                           # [S, 3, 3] pixel units
        }

    # -- public access -------------------------------------------------------------
    def __getitem__(self, index: int):
        pair, depth, motion, intr = self._load(index % len(self._keys))
        if not self.params.test_phase:
            # per-sample rng keyed by index keeps BatchLoader workers deterministic
            rng = np.random.RandomState((index * 2654435761) & 0x7FFFFFFF)
            pair, depth, motion, intr = self._augment(pair, depth, motion, intr, rng)
        return self._preprocess(pair, depth, motion, intr)

    def source_of(self, index: int) -> int:
        """Source-file ordinal a flat sample index belongs to (tests/diagnostics)."""
        return self._keys[index][0]

    def sample(self, rng: np.random.RandomState):
        """Scene-pool draw (pool refilled from the weighted source stream).

        Thread-safe: the pool swap is locked so ``StreamLoader`` workers can draw
        concurrently, mirroring the reference reader's N builder threads sharing one
        scene pool (``Demon_Data_loader.py:65``).
        """
        with self._pool_lock:
            slot = rng.randint(len(self._pool))
            index = self._pool[slot]
            self._pool[slot] = int(rng.choice(len(self._keys), p=self._probs))
        pair, depth, motion, intr = self._load(index)
        if not self.params.test_phase:
            pair, depth, motion, intr = self._augment(pair, depth, motion, intr, rng)
        return self._preprocess(pair, depth, motion, intr)
