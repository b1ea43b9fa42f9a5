"""Host-side streaming data pipelines with device prefetch (SURVEY §2.4).

Replaces the reference's TF1 queue-runner loaders (``imageselect_Dataloader*.py``) and the
DeMoN C++ HDF5 reader op (``Demon_Data_loader.py``) with:

- ``colon``     — the three colon-video loaders (simple, pair+cam, dim11)
- ``demon``     — DeMoN-style HDF5 streaming (scene pool, weighted sources, augmentation)
- ``pipeline``  — threaded host loader -> double-buffered ``jax.device_put`` prefetch
- ``synthetic`` — synthetic dataset writers for tests and benchmarks
- ``device_cache`` — HBM-resident corpus + on-device batch gather (small datasets)
"""

from tf_depth_estimation_tpu.data.colon import (
    SimpleDepthDataset,
    PairDepthDataset,
    Dim11Dataset,
)
from tf_depth_estimation_tpu.data.demon import DemonDataset, DemonReaderParams
from tf_depth_estimation_tpu.data.device_cache import DeviceCache, gather_batch
from tf_depth_estimation_tpu.data.pipeline import BatchLoader, IterBatcher, StreamLoader, device_prefetch

__all__ = [
    "DeviceCache",
    "gather_batch",
    "SimpleDepthDataset",
    "PairDepthDataset",
    "Dim11Dataset",
    "DemonDataset",
    "DemonReaderParams",
    "BatchLoader",
    "IterBatcher",
    "StreamLoader",
    "device_prefetch",
]
