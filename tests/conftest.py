"""Test harness config: force an 8-device virtual CPU backend.

Multi-chip sharding logic is tested without TPUs via XLA's host-platform
device-count override — the standard JAX fake multi-device backend.

Note: a pytest plugin in this environment imports jax before conftest runs,
so setting JAX_PLATFORMS in os.environ alone is too late — the value was
already captured by jax's config at import. `jax.config.update` still works
because no backend has been initialized yet at collection time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Test tiers: `-m quick` is the <5-minute gate; `-m slow` the long tail.
# Every test not explicitly marked slow is auto-marked quick, so the two
# tiers always partition the suite (README "Running the tests").
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
