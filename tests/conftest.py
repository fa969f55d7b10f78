"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on virtual CPU devices exactly as the driver's multichip dry-run
does.
"""

import os

# The environment pre-sets JAX_PLATFORMS to the TPU plugin and the plugin
# wins over the env var; jax.config is authoritative.  Must run before any
# other module touches jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from soap_tpu.utils import mock_data


@pytest.fixture(scope="session")
def mock_sim(tmp_path_factory):
    """Session-scoped mock simulation: snapshot + HBT catalogue on disk."""
    tmpdir = tmp_path_factory.mktemp("mock_sim")
    return mock_data.make_mock_simulation(
        str(tmpdir), n_halos=12, n_field=8000, boxsize=30.0, seed=7
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
