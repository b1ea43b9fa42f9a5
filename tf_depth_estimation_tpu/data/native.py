"""ctypes binding for the native C++ loader (``native/libfastloader.so``).

The C++ core (see ``native/fastloader.cc``) runs the byte-heavy path — JPEG decode,
TF1-parity bilinear resize, raw float32 depth reads — on worker threads outside the GIL,
handing whole fixed-shape sample buffers back through a bounded ring buffer.  Python
keeps the light text parsing (intrinsics / projection files) and batch assembly.

Falls back cleanly: ``available()`` is False when the shared library isn't built, and the
pure-NumPy datasets in ``data/colon.py`` remain the reference implementation.
"""
from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libfastloader.so"),
    os.path.join(os.path.dirname(__file__), "libfastloader.so"),
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.fastloader_create.restype = ctypes.c_void_p
            lib.fastloader_create.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_long), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.fastloader_next.restype = ctypes.c_long
            lib.fastloader_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.fastloader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load_lib() is not None


def native_sample_stream(
    image_paths: Sequence[str],
    depth_paths: Sequence[str],
    *,
    out_hw: Tuple[int, int],
    depth_hw: Tuple[int, int],
    order: Optional[np.ndarray] = None,
    num_threads: int = 4,
    queue_cap: int = 16,
) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Yields (dataset index, image [h, w, 3] f32, depth [dh, dw] f32) in pipeline order."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("libfastloader.so not built (run `make -C native`)")
    n = len(image_paths)
    assert len(depth_paths) == n
    order = np.arange(n, dtype=np.int64) if order is None else np.asarray(order, np.int64)
    img_blob = b"\0".join(p.encode() for p in image_paths) + b"\0"
    dep_blob = b"\0".join(p.encode() for p in depth_paths) + b"\0"
    out_h, out_w = out_hw
    dep_h, dep_w = depth_hw

    handle = lib.fastloader_create(
        img_blob, dep_blob, n,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        out_h, out_w, dep_h, dep_w, num_threads, queue_cap,
    )
    try:
        img_buf = np.empty((out_h, out_w, 3), np.float32)
        dep_buf = np.empty((dep_h, dep_w), np.float32)
        for _ in range(len(order)):
            idx = lib.fastloader_next(
                handle,
                img_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                dep_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if idx == -1:
                break
            if idx == -2:
                continue  # unreadable sample — skip, like TF queue runners logged+moved on
            yield int(idx), img_buf.copy(), dep_buf.copy()
    finally:
        lib.fastloader_destroy(handle)


class NativePairSampler:
    """Drop-in accelerator for ``PairDepthDataset``: decodes the packed-pair JPEG +
    depth natively, pulls the text fields from the dataset.

    NOTE: with ``num_threads > 1`` samples arrive in completion order, not index order
    (exactly like the reference's TF queue runners) — every sample is yielded exactly
    once, but ordering is only deterministic with a single worker."""

    def __init__(self, dataset, num_threads: int = 4, seed: int = 0,
                 shuffle: bool = True):
        self.ds = dataset
        self.num_threads = num_threads
        self.rng = np.random.RandomState(seed)
        self.shuffle = shuffle

    def __iter__(self):
        ds = self.ds
        n = len(ds)
        order = np.arange(n, dtype=np.int64)
        if self.shuffle:
            self.rng.shuffle(order)
        stream = native_sample_stream(
            [e["image"] for e in ds.entries],
            [e["depth"] for e in ds.entries],
            out_hw=(ds.resized_height, ds.resized_width * 2),
            depth_hw=(ds.image_height, ds.image_width),
            order=order,
            num_threads=self.num_threads,
        )
        from tf_depth_estimation_tpu.data.colon import _resize_area_np

        for idx, packed, depth in stream:
            e = ds.entries[idx]
            tgt = packed[:, : ds.resized_width]
            src = packed[:, ds.resized_width :]
            label = _resize_area_np(depth[..., None],
                                    (ds.resized_height, ds.resized_width))
            K = np.loadtxt(e["cam"], delimiter=",", dtype=np.float32).reshape(3, 3)
            tokens = np.array(open(e["proj"]).read().split(), dtype=np.float32)[:34]
            yield {
                "tgt_image": np.ascontiguousarray(tgt),
                "src_image": np.ascontiguousarray(src),
                "label": label.astype(np.float32),
                "intrinsics": ds.intrinsics_pyramid(K),
                "tgt2src_projs": tokens[:32].reshape(2, 4, 4),
                "m_scale": np.float32(tokens[32]),
            }
