"""Test configuration: force an 8-device CPU mesh.

All correctness tests run on CPU (SURVEY.md §4.2 items 5-6): the forced
host-platform device count lets ``tests/dist`` exercise real multi-device
sharding without TPU hardware, and Pallas kernels run with
``interpret=True``.  Benchmarks (bench.py) run on the real chip instead.

NOTE: this environment preloads jax with the TPU ("axon") backend via
sitecustomize and sets ``JAX_PLATFORMS=axon``, so a plain env-var default is
not enough — we must overwrite the env var AND update jax.config before any
backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 forced CPU devices, got {len(devs)}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_problem(rng, T, L, frame_dep_trans=False, scale=1.0, dtype=np.float32):
    """A random (state, trans, length) CRF problem with length <= T."""
    state = rng.normal(size=(T, L), scale=scale).astype(dtype)
    tshape = (T, L, L) if frame_dep_trans else (L, L)
    trans = rng.normal(size=tshape, scale=scale).astype(dtype)
    length = int(rng.integers(1, T + 1))
    return state, trans, length
