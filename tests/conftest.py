"""Test configuration: force an 8-virtual-device CPU platform.

The reference stack (wrlife/tf_depth_estimation) was single-GPU TF1; the rebuild targets TPU
meshes.  Tests run on CPU with 8 virtual devices so sharding semantics are exercised without
TPU hardware (SURVEY.md §4).  The axon TPU plugin ignores the JAX_PLATFORMS env var, so the
platform is forced through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # quiet the TF oracle used in parity tests

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tf_depth_estimation_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
