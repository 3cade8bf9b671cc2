"""Test harness config: CPU backend with 8 virtual devices, f64 enabled.

Fixture-fidelity tests compare against Eigen-double golden trajectories from
the reference repo (SURVEY.md §4), so tests run in f64 on CPU. Multi-chip
sharding logic is exercised on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per SURVEY.md §4 item (d).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the (single-chip,
# tunneled) TPU backend, which is wrong for the f64 fixture tests and the
# virtual 8-device mesh tests. Benchmarks (bench.py) use the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The baked axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var — override it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib  # noqa: E402

import pytest  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    return FIXTURES
