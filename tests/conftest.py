"""Test harness: force an 8-device virtual CPU platform so multi-chip sharding
logic is exercised without TPU hardware (the strategy SURVEY.md section 4
prescribes: XLA_FLAGS=--xla_force_host_platform_device_count=8).

Note: this environment pre-imports jax via sitecustomize, so JAX_PLATFORMS in
os.environ is read too early — `jax.config.update` is the reliable override.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: CPU compiles dominate suite wall-clock on
# this 1-core host (fast tier: 16 min cold); a warm cache cuts repeat runs
# to the actual execution time.
from occnet_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/jax_comp_cache_tests")

assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--slow", action="store_true", default=False,
        help="also run tests marked slow (subprocess CLIs, multi-minute "
             "model compiles) — the full suite takes ~1 h on this 1-core "
             "host; the default tier is the fast one")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: subprocess / multi-minute-compile tests, "
                   "excluded from the default tier (opt in with --slow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--slow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
