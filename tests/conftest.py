"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Distributed logic (DP sharding, latent-table scatter-add, grid-eval
sharding) is exercised without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 implication).

Note: this environment pre-imports jax and pins JAX_PLATFORMS=axon via
sitecustomize, so the env var alone is not enough — we must override
through jax.config before any backend is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (interpret-mode "
                          "kernel suites + long end-to-end trainings)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (interpret-mode Pallas or "
                   "multi-minute end-to-end); excluded from the default "
                   "tier, run with --runslow or RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow (or RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
