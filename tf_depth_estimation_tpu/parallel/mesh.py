"""Mesh construction and data-parallel step wrapping.

Idiomatic JAX SPMD: one jit, shardings declared on inputs/outputs, XLA lowers the
gradient reduction to ICI all-reduces (scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put a host batch with the leading dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, sh)


def make_dp_step(step_fn, mesh: Mesh, axis_name: str = "data", donate_state: bool = True):
    """Wrap a ``(state, batch, *extras) -> (state, metrics)`` step for data parallelism.

    Params/opt-state replicated, batch sharded on ``axis_name``; XLA partitions the
    forward/backward across the mesh and inserts the gradient all-reduce over ICI.

    NOTE on batch-norm parity: with replicated params and a sharded batch, XLA computes
    batch statistics with cross-device all-reduces (sync BN) as a byproduct of the jit
    partitioning — stricter than per-tower TF1 BN, and the exact single-device semantics
    when the mesh has one device.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis_name)

    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
        static_argnums=(),
    )
