"""Colon-video dataset readers (host-side NumPy; no TF queues).

Three loaders mirror the reference's manifest/file formats exactly (SURVEY §2.4):

- ``SimpleDepthDataset``  (``imageselect_Dataloader.py``): ``<split>.txt`` of absolute
  image paths; depth label at ``<image>_z.bin`` (raw float32), image resized 224x224 and
  /255, label area-resized and **inverted** to 1/depth.
- ``PairDepthDataset``    (``imageselect_Dataloader_optflow.py``): lines
  ``subfolder id1 id2``; side-by-side packed pair JPEG ``id1_id2.jpg`` (width 2x) split
  into target|source; depth ``frame<id1>_<id2>.jpg_z.bin``; 3x3 intrinsics CSV
  ``_cam.txt``; 2x4x4 tgt2src projections + m_scale from a 34-token ``_tgt2src_proj.txt``.
- ``Dim11Dataset``        (``imageselect_Dataloader_optflow_dim11.py``): 224x224,
  normalization /255 - 0.5, depth from a separate ``depth_dir``, cam file = 6 raw values.

Decoding uses OpenCV (libjpeg-turbo) on the host; the TF1 ``resize_images`` default
(bilinear, align_corners=False) is reproduced with cv2's INTER_LINEAR equivalent via the
shared ``_resize_bilinear_np`` helper (cv2 uses half-pixel centers, which differs — so we
resize with the exact TF1 kernel in NumPy).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from tf_depth_estimation_tpu.ops.resize import _area_weights, _bilinear_weights


def _resize_np(img: np.ndarray, out_hw, weights_fn) -> np.ndarray:
    """Separable TF1-parity resize on the host (img: [H, W, C] float32)."""
    H, W = img.shape[:2]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return img
    Wh = weights_fn(H, out_h)
    Ww = weights_fn(W, out_w)
    return np.einsum("iy,yxc->ixc", Wh, np.einsum("jx,ixc->ijc", Ww, img))


def _resize_bilinear_np(img, out_hw):
    return _resize_np(img, out_hw, _bilinear_weights)


def _resize_area_np(img, out_hw):
    return _resize_np(img, out_hw, _area_weights)


def _decode_jpeg(path: str) -> np.ndarray:
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(path)
    return bgr[..., ::-1].astype(np.float32)  # BGR -> RGB


def _read_bin_depth(path: str, height: int, width: int) -> np.ndarray:
    d = np.fromfile(path, dtype=np.float32)
    return d.reshape(height, width, 1)


@dataclasses.dataclass
class SimpleDepthDataset:
    """Single image + inverse-depth label (ref ``imageselect_Dataloader.py:8-133``)."""

    dataset_dir: str
    split: str = "train"
    resized_height: int = 224
    resized_width: int = 224

    def __post_init__(self):
        with open(os.path.join(self.dataset_dir, f"{self.split}.txt")) as f:
            self.image_paths = [l.strip() for l in f if l.strip()]
        self.label_paths = [p + "_z.bin" for p in self.image_paths]

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, i: int):
        img = _decode_jpeg(self.image_paths[i])
        img = _resize_bilinear_np(img, (self.resized_height, self.resized_width)) / 255.0
        # label: raw float32 at source resolution == resized resolution in the reference
        # manifests; area-resize then invert (imageselect_Dataloader.py:97-101)
        d = np.fromfile(self.label_paths[i], dtype=np.float32)
        side = int(round((d.size) ** 0.5)) if d.size != (
            self.resized_height * self.resized_width
        ) else None
        if side is not None:
            label = d.reshape(side, side, 1)
        else:
            label = d.reshape(self.resized_height, self.resized_width, 1)
        label = _resize_area_np(label, (self.resized_height, self.resized_width))
        label = 1.0 / label
        return {"image": img.astype(np.float32), "label": label.astype(np.float32)}


@dataclasses.dataclass
class PairDepthDataset:
    """Packed image pair + depth + intrinsics + GT projections
    (ref ``imageselect_Dataloader_optflow.py:8-262``)."""

    dataset_dir: str
    split: str = "train"
    image_height: int = 240      # native label resolution (FLAGS.image_height)
    image_width: int = 720
    resized_height: int = 240
    resized_width: int = 720
    num_scales: int = 4

    def __post_init__(self):
        with open(os.path.join(self.dataset_dir, f"{self.split}.txt")) as f:
            lines = [l.strip().split(" ") for l in f if l.strip()]
        self.entries = []
        for sub, id1, id2 in lines:
            frame = f"{id1}_{id2}"
            base = os.path.join(self.dataset_dir, sub)
            self.entries.append(
                dict(
                    image=os.path.join(base, frame + ".jpg"),
                    cam=os.path.join(base, frame + "_cam.txt"),
                    depth=os.path.join(base, "frame" + frame + ".jpg" + "_z.bin"),
                    proj=os.path.join(base, frame + "_tgt2src_proj.txt"),
                )
            )

    def __len__(self):
        return len(self.entries)

    def intrinsics_pyramid(self, K: np.ndarray) -> np.ndarray:
        """Per-scale intrinsics with the resize-ratio correction
        (``imageselect_Dataloader_optflow.py:59-60,248-262``)."""
        xr = self.resized_width / self.image_width
        yr = self.resized_height / self.image_height
        out = np.zeros((self.num_scales, 3, 3), np.float32)
        for s in range(self.num_scales):
            f = 1 / 2**s
            out[s] = [
                [K[0, 0] * f * xr, 0, K[0, 2] * f * xr],
                [0, K[1, 1] * f * yr, K[1, 2] * f * yr],
                [0, 0, 1],
            ]
        return out

    def __getitem__(self, i: int):
        e = self.entries[i]
        seq = _decode_jpeg(e["image"])
        seq = _resize_bilinear_np(seq, (self.resized_height, self.resized_width * 2))
        # NOTE: the reference does NOT divide by 255 in this loader
        # (imageselect_Dataloader_optflow.py:129 commented out)
        tgt = seq[:, : self.resized_width]
        src = seq[:, self.resized_width :]

        # label stored at native (image_height, image_width); area-resized when the
        # training resolution differs.  (The reference's set_shape without resize at
        # imageselect_Dataloader_optflow.py:138-144 crashes for differing sizes — drift;
        # the dim11 loader's area-resize is the evident intent.)
        label = _read_bin_depth(e["depth"], self.image_height, self.image_width)
        label = _resize_area_np(label, (self.resized_height, self.resized_width))

        K = np.loadtxt(e["cam"], delimiter=",", dtype=np.float32).reshape(3, 3)

        tokens = np.array(open(e["proj"]).read().split(), dtype=np.float32)
        # 34 tokens: 32 = two 4x4s, then m_scale, then a trailing pad value
        # (imageselect_Dataloader_optflow.py:171-181 drops the last, takes m_scale)
        tokens = tokens[:34]
        m_scale = tokens[32]
        projs = tokens[:32].reshape(2, 4, 4)

        return {
            "tgt_image": tgt.astype(np.float32),
            "src_image": src.astype(np.float32),
            "label": label.astype(np.float32),
            "intrinsics": self.intrinsics_pyramid(K),
            "tgt2src_projs": projs.astype(np.float32),
            "m_scale": np.float32(m_scale),
        }


@dataclasses.dataclass
class Dim11Dataset(PairDepthDataset):
    """224x224 variant with separate depth dir and 6-value cam files
    (ref ``imageselect_Dataloader_optflow_dim11.py``)."""

    image_height: int = 224
    image_width: int = 224
    resized_height: int = 224
    resized_width: int = 224
    depth_dir: Optional[str] = None

    def __post_init__(self):
        super().__post_init__()
        if self.depth_dir:
            for e in self.entries:
                e["depth"] = os.path.join(
                    self.depth_dir, os.path.basename(e["depth"])
                )

    def __getitem__(self, i: int):
        e = self.entries[i]
        seq = _decode_jpeg(e["image"])
        seq = _resize_bilinear_np(seq, (self.resized_height, self.resized_width * 2))
        seq = seq / 255.0 - 0.5  # imageselect_Dataloader_optflow_dim11.py:128
        tgt = seq[:, : self.resized_width]
        src = seq[:, self.resized_width :]

        label = _read_bin_depth(e["depth"], self.image_height, self.image_width)
        label = _resize_area_np(label, (self.resized_height, self.resized_width))

        cam6 = np.array(open(e["cam"]).read().replace(",", " ").split(), np.float32)[:6]

        tokens = np.array(open(e["proj"]).read().split(), dtype=np.float32)[:34]
        m_scale = tokens[32]
        projs = tokens[:32].reshape(2, 4, 4)

        return {
            "tgt_image": tgt.astype(np.float32),
            "src_image": src.astype(np.float32),
            "label": label.astype(np.float32),
            "cam": cam6,
            "tgt2src_projs": projs.astype(np.float32),
            "m_scale": np.float32(m_scale),
        }
