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


# ---------------------------------------------------------------------------
# Fast default suite / full suite split (VERDICT round-2 item 8).
#
# The dozen end-to-end trainer/convergence tests dominate suite wall-clock
# (~1900 of ~2600 CPU-seconds); they are marked `slow` and SKIPPED by
# default so `pytest tests/ -x -q` stays a <3-minute check.  Run everything
# with:  pytest tests/ --full


def pytest_addoption(parser):
    parser.addoption(
        "--full", action="store_true", default=False,
        help="also run tests marked slow (full suite)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long e2e/convergence test; skipped unless --full")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--full"):
        return
    import pytest as _pytest
    skip = _pytest.mark.skip(reason="slow (run with --full)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
