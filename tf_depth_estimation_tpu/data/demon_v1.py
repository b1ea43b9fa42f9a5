"""Classic DeMoN v1 HDF5 archive converter.

The reference trains on the released DeMoN archives (sun3d/rgbd/mvs/scenes11 —
``/root/reference/Demon_Data_loader.py:69-79``) through the C++
``multi_vi_h5_data_reader``.  This module makes those classic v1 archives consumable
two ways:

- ``DemonV1Dataset`` — stream the v1 layout **in place** (a ``DemonDataset`` subclass;
  select with ``--demon_v1`` on the DeMoN CLIs), matching the reference's direct
  streaming;
- ``convert_demon_v1`` — a one-time offline rewrite into the flat schema
  ``data/demon.py`` reads, for users who prefer the simpler layout (decode cost paid
  once instead of per epoch).

v1 layout handled (the layout of DeMoN's ``view_io``-written training archives; the
synthetic fixture writer below is the executable contract used by the tests):

    <sample>/frames/t0/v0/image    encoded image bytes (webp/jpeg/png), 1-D uint8
    <sample>/frames/t0/v0/depth    float16/float32 depth map [H, W] (camera_z, metric)
    <sample>/frames/t0/v0/camera   float64 [fx fy skew cx cy | R row-major 9 | t 3]
    <sample>/frames/t0/v1/{image,camera}          (second view; depth optional)

``fx fy cx cy`` are stored normalized by image width/height — the reference turns the
reader's normalized intrinsics into pixel units by multiplying with W/H
(``Demon_Data_loader.py:135-138``), which is exactly what ``DemonDataset``'s
preprocessing does with the flat schema's normalized 4-vector.  Extrinsics follow the
DeMoN world-to-camera convention ``x_cam = R x_world + t``; the emitted motion is the
camera-1→2 relative transform in ANGLEAXIS6 layout ``[rotvec(3) | t(3)]``
(``Demon_Data_loader.py:57`` motion_format).

Variants tolerated: per-view ``K``(3x3)/``R``/``t`` datasets instead of the packed
17-vector; raw ``[H, W, 3]`` uint8 image arrays instead of encoded bytes.

Usage:
    python -m tf_depth_estimation_tpu.data.demon_v1 SRC.h5 [SRC2.h5 ...] -o OUT.h5
"""
from __future__ import annotations

import argparse
import io
from typing import Iterable, Tuple

import numpy as np

from tf_depth_estimation_tpu.data.demon import (
    DemonDataset,
    _matrix_to_rotvec_np,
    _rotvec_to_matrix_np,
)


# -------------------------------------------------------------------------------
# v1 parsing
# -------------------------------------------------------------------------------

def _decode_image(ds) -> np.ndarray:
    """Decode a v1 image dataset: encoded byte stream or raw [H, W, 3] uint8."""
    arr = np.asarray(ds)
    if arr.ndim == 3:
        return arr.astype(np.uint8)
    from PIL import Image

    img = Image.open(io.BytesIO(arr.tobytes()))
    return np.asarray(img.convert("RGB"), dtype=np.uint8)


def _read_camera(view) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(normalized K 4-vector [fx fy cx cy], R [3,3], t [3]) from either layout."""
    if "camera" in view:
        cam = np.asarray(view["camera"], dtype=np.float64).ravel()
        if cam.size != 17:
            raise ValueError(f"camera vector has {cam.size} values, expected 17")
        fx, fy, _skew, cx, cy = cam[:5]
        R = cam[5:14].reshape(3, 3)
        t = cam[14:17]
        return np.array([fx, fy, cx, cy]), R, t
    K = np.asarray(view["K"], dtype=np.float64)
    R = np.asarray(view["R"], dtype=np.float64).reshape(3, 3)
    t = np.asarray(view["t"], dtype=np.float64).ravel()
    return np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]), R, t


def is_v1_sample(g) -> bool:
    """True if an HDF5 group holds a complete v1 sample (two views + v0 depth)."""
    try:
        t0 = g["frames/t0"]
        # the containment checks must sit inside the try too: if frames/t0
        # resolves to a stray *dataset*, `"v0" in t0` raises rather than False
        return "v0" in t0 and "v1" in t0 and "depth" in t0["v0"]
    except (KeyError, TypeError, ValueError, AttributeError):  # stray datasets
        return False


def parse_v1_sample(g) -> dict:
    """One v1 sample group -> flat record (image_pair/depth/motion/intrinsics).

    Shared by the offline converter and the in-place ``DemonV1Dataset`` streamer.
    """
    t0 = g["frames/t0"]
    v0, v1 = t0["v0"], t0["v1"]
    img0 = _decode_image(v0["image"])
    img1 = _decode_image(v1["image"])
    depth = np.asarray(v0["depth"], dtype=np.float32)
    if depth.ndim == 1:  # flattened store
        depth = depth.reshape(img0.shape[0], img0.shape[1])
    intr0, R0, t0v = _read_camera(v0)
    _, R1, t1v = _read_camera(v1)
    # relative motion cam0 -> cam1 under x_cam = R x_world + t
    R_rel = R1 @ R0.T
    t_rel = t1v - R_rel @ t0v
    motion = np.concatenate(
        [_matrix_to_rotvec_np(R_rel), t_rel]).astype(np.float32)
    return {
        "image_pair": np.concatenate([img0, img1], axis=-1),
        "depth": depth,
        "motion": motion,
        "intrinsics": intr0.astype(np.float32),
    }


def iter_v1_samples(h5file) -> Iterable[Tuple[str, dict]]:
    """Yield (name, flat-record) for every valid sample group in a v1 archive."""
    for name in sorted(h5file.keys()):
        g = h5file[name]
        if is_v1_sample(g):
            yield name, parse_v1_sample(g)


def convert_demon_v1(src_paths, out_path: str, verbose: bool = False) -> int:
    """Convert one or more v1 archives into a single flat-schema HDF5. Returns count."""
    import h5py

    n = 0
    with h5py.File(out_path, "w") as out:
        for src in src_paths:
            with h5py.File(src, "r") as f:
                for name, rec in iter_v1_samples(f):
                    g = out.create_group(f"{n:08d}_{name}")
                    g.create_dataset("image_pair", data=rec["image_pair"],
                                     compression="gzip")
                    g.create_dataset("depth", data=rec["depth"], compression="gzip")
                    g.create_dataset("motion", data=rec["motion"])
                    g.create_dataset("intrinsics", data=rec["intrinsics"])
                    n += 1
                    if verbose and n % 500 == 0:
                        print(f"converted {n} samples...", flush=True)
    return n


# -------------------------------------------------------------------------------
# in-place streaming reader
# -------------------------------------------------------------------------------

class DemonV1Dataset(DemonDataset):
    """Stream classic DeMoN v1 archives in place — no offline conversion pass.

    Drop-in subclass of ``DemonDataset`` (same ``sample()`` scene-pool draw, same
    ``StreamLoader``/``BatchLoader`` compatibility, same preprocessing/augmentation):
    only sample-group enumeration and raw-record loading change to the nested v1
    layout, mirroring how the reference consumes the released sun3d/rgbd/mvs/scenes11
    HDF5s directly (``Demon_Data_loader.py:69-79``).  Decode cost (webp/jpeg bytes)
    is paid per draw on the host, exactly like the C++ reader's builder threads.
    """

    @staticmethod
    def _enumerate_keys(h5file):
        return [name for name in sorted(h5file.keys())
                if is_v1_sample(h5file[name])]

    def _load(self, index: int):
        fi, key = self._keys[index]
        rec = parse_v1_sample(self._files[fi][key])
        return rec["image_pair"], rec["depth"], rec["motion"], rec["intrinsics"]


# -------------------------------------------------------------------------------
# synthetic v1 fixture (the executable layout contract; tests round-trip through it)
# -------------------------------------------------------------------------------

def write_demon_v1_h5(path: str, num_scenes: int = 4, H: int = 48, W: int = 64,
                      seed: int = 0, encode: str = "webp") -> str:
    """Emit a classic-layout v1 archive with known geometry for round-trip tests."""
    import h5py
    from PIL import Image

    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        for i in range(num_scenes):
            g = f.create_group(f"seq{i:03d}-0")
            for v in ("v0", "v1"):
                view = g.create_group(f"frames/t0/{v}")
                img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
                if encode == "raw":
                    view.create_dataset("image", data=img)
                else:
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, format=encode.upper(),
                                              lossless=(encode == "webp"))
                    view.create_dataset(
                        "image", data=np.frombuffer(buf.getvalue(), np.uint8))
                rv = rng.randn(3) * 0.1
                R = _rotvec_to_matrix_np(rv)
                t = rng.randn(3)
                fx, fy = 0.9 + 0.2 * rng.rand(2)
                cam = np.concatenate(
                    [[fx, fy, 0.0, 0.5, 0.5], R.ravel(), t]).astype(np.float64)
                view.create_dataset("camera", data=cam)
                if v == "v0":
                    depth = (1.0 + 4.0 * rng.rand(H, W)).astype(np.float16)
                    view.create_dataset("depth", data=depth)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("sources", nargs="+", help="classic DeMoN v1 .h5 archives")
    ap.add_argument("-o", "--output", required=True, help="flat-schema output .h5")
    args = ap.parse_args(argv)
    n = convert_demon_v1(args.sources, args.output, verbose=True)
    print(f"wrote {n} samples to {args.output}")


if __name__ == "__main__":
    main()
