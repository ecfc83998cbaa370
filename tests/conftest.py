"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax initializes its backends (the standard JAX fake-mesh
trick from SURVEY.md §4): tests exercise the multi-chip sharding paths
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough if a harness pre-imported jax with another
# platform; the config update wins as long as no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")

import sys  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# tools/ scripts (converters, crosscheck harnesses) are imported by tests;
# resolve them relative to the repo, not the invocation cwd
_TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
