"""Test config: hermetic CPU runs with a virtual 8-device mesh.

Multi-chip sharding tests run on a forced 8-device CPU platform
(the SURVEY.md section 4 plan: XLA_FLAGS=--xla_force_host_platform_device_count).
Pallas kernels run in interpret mode on CPU; on TPU they compile natively.

Note: the axon TPU plugin on this host ignores the JAX_PLATFORMS env var, so
we also force the platform through jax.config before any device is touched.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("ENERF_TPU_INTERPRET", "1")  # Pallas interpret mode on CPU

import jax

jax.config.update("jax_platforms", "cpu")
