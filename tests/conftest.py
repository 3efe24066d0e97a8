"""Test harness configuration.

All tests run on CPU with a virtual 8-device mesh
(`--xla_force_host_platform_device_count=8`) — the TPU-native analog of a
fake backend, which the reference lacks (SURVEY.md §4). Must run BEFORE jax
is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# is authoritative
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()

import numpy as np
import pytest

# Hermetic test workload mirroring the reference's pytest config
# (reference: tests/conftest.py:21-26 — Q=100, B=1000, k=10, 384d synthetic)
QUERY_COUNT = 100
BASE_COUNT = 1000
K = 10
DIMENSIONS = 384


@pytest.fixture()
def rng():
    """Function-scoped: each test gets its own deterministic stream, so
    test data never depends on suite execution order (r3 test review: the
    old session-scoped mutable rng made every exact engine-vs-oracle
    index assertion downstream of any added/reordered test a potential
    order-dependent flake)."""
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def normalized_vectors():
    """Synthetic L2-normalized vectors — the reference's hermetic kNN test
    input (reference: tests/test_02_cu_knn.py:10-41). Own rng: immutable
    session-cached data, independent of the function-scoped `rng` stream."""
    rng = np.random.default_rng(42)
    q = rng.standard_normal((QUERY_COUNT, DIMENSIONS)).astype(np.float32)
    b = rng.standard_normal((BASE_COUNT, DIMENSIONS)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return q.astype(np.float32), b.astype(np.float32)
