"""Multi-chip kNN on the virtual 8-device CPU mesh: base-sharded
all_gather merge and the ring-rotation variant must match the single-device
engine exactly."""

import numpy as np
import pytest
import jax

from neighborhoodwatch_tpu.ops.knn import knn
from neighborhoodwatch_tpu.parallel.mesh import (
    make_mesh, DP_AXIS, MP_AXIS, base_sharding, query_sharding,
)
from neighborhoodwatch_tpu.parallel.sharded_knn import sharded_knn, ring_knn


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)  # dp=1, mp=8


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(8, dp=2)


def test_mesh_shapes(mesh8, mesh2x4):
    assert mesh8.shape == {DP_AXIS: 1, MP_AXIS: 8}
    assert mesh2x4.shape == {DP_AXIS: 2, MP_AXIS: 4}


def test_sharded_knn_matches_single_device(mesh8, normalized_vectors):
    q, b = normalized_vectors  # 100 x 384, 1000 x 384
    b = b[:960]  # divisible by 8 shards
    ref_d, ref_i = knn(q, b, k=10)
    d, i = sharded_knn(q, b, k=10, mesh=mesh8)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-6)


def test_sharded_knn_dp_axis(mesh2x4, normalized_vectors):
    q, b = normalized_vectors
    b = b[:960]
    ref_d, ref_i = knn(q, b, k=10)
    d, i = sharded_knn(q, b, k=10, mesh=mesh2x4)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_sharded_knn_k_exceeds_shard_raises(mesh8, normalized_vectors):
    q, b = normalized_vectors
    with pytest.raises(AssertionError, match="per-shard"):
        sharded_knn(q, b[:160], k=100, mesh=mesh8)


def test_ring_knn_matches(mesh8, normalized_vectors):
    q, b = normalized_vectors
    b = b[:960]
    ref_d, ref_i = knn(q, b, k=10)
    d, i = ring_knn(q, b, k=10, mesh=mesh8)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_ring_knn_cosine(mesh2x4, normalized_vectors):
    q, b = normalized_vectors
    b = b[:960]
    ref_d, ref_i = knn(q, b, k=8, metric="cosine")
    d, i = ring_knn(q, b, k=8, mesh=mesh2x4, metric="cosine")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))


def test_explicit_shardings_compile(mesh8, normalized_vectors):
    """Placing inputs with NamedSharding before the call keeps data resident
    (no implicit reshard)."""
    q, b = normalized_vectors
    b = b[:960]
    qd = jax.device_put(q, query_sharding(mesh8))
    bd = jax.device_put(b, base_sharding(mesh8))
    d, i = sharded_knn(qd, bd, k=10, mesh=mesh8)
    ref_d, ref_i = knn(q, b, k=10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
