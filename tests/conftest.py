"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver separately dry-runs the real
multi-chip path). Environment must be set before jax is imported anywhere.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU platform,
# but unit tests run on the virtual 8-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Host-side analysis parity lanes need float64 (the reference pipeline is
# float64 end to end; SURVEY.md §7 "Hard parts").
os.environ["JAX_ENABLE_X64"] = "1"

import pathlib

import pytest

# jax may already be imported by the time this conftest runs (site hooks pull
# it in with pytest), so env vars alone are not enough — set the config
# directly before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite's cost is dominated by CPU XLA
# compiles of the EfficientDet forward/backward (x64), which are identical
# run to run. First run pays them; reruns load serialized executables.
from vbt_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.path.expanduser("~/.cache/vbt_tpu_xla_tests")
)

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root() -> pathlib.Path:
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference data not available")
    return REFERENCE_ROOT
