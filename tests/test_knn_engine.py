"""Exact-kNN engine correctness vs a numpy CPU oracle (model of reference
tests/test_02_cu_knn.py, but actually runnable and hermetic)."""

import numpy as np
import pytest

from neighborhoodwatch_tpu.ops.distance import pairwise_distance, similarity_from_distance
from neighborhoodwatch_tpu.ops.knn import knn, StreamingKNN
from neighborhoodwatch_tpu.ops.topk import (
    merge_topk, merge_topk_many, sort_topk, check_monotonic,
)


def numpy_oracle(q, b, k, metric):
    """CPU reference: full distance matrix + stable argsort."""
    if metric == "sqeuclidean":
        d = ((q[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    elif metric == "euclidean":
        d = np.sqrt(((q[:, None, :] - b[None, :, :]) ** 2).sum(-1))
    elif metric == "cosine":
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        bn = b / np.linalg.norm(b, axis=1, keepdims=True)
        d = 1.0 - qn @ bn.T
    elif metric == "dot":
        d = 1.0 - q @ b.T
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


@pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "dot", "euclidean"])
def test_knn_exact_recall(normalized_vectors, metric):
    q, b = normalized_vectors
    k = 10
    od, oi = numpy_oracle(q.astype(np.float64), b.astype(np.float64), k, metric)
    dist, idx = knn(q, b, k=k, metric=metric)
    recall = np.mean([len(set(map(int, r)) & set(map(int, o))) / k
                      for r, o in zip(np.asarray(idx), oi)])
    assert recall == 1.0, f"recall@{k}={recall} for metric {metric}"
    np.testing.assert_allclose(np.asarray(dist), od, atol=2e-5)


def test_knn_tiled_matches_full(normalized_vectors):
    q, b = normalized_vectors
    d_full, i_full = knn(q, b, k=10)
    d_tile, i_tile = knn(q, b, k=10, tile_size=256)
    np.testing.assert_array_equal(np.asarray(i_full), np.asarray(i_tile))
    np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_tile), atol=1e-6)


def test_knn_unaligned_sizes(rng):
    """Base count not a multiple of any tile: padding must be masked out."""
    q = rng.standard_normal((7, 33)).astype(np.float32)
    b = rng.standard_normal((131, 33)).astype(np.float32)
    od, oi = numpy_oracle(q.astype(np.float64), b.astype(np.float64), 5, "sqeuclidean")
    d, i = knn(q, b, k=5, tile_size=64)
    np.testing.assert_array_equal(np.asarray(i), oi)
    assert np.asarray(d).max() < np.inf


def test_knn_base_offset(normalized_vectors):
    q, b = normalized_vectors
    _, i0 = knn(q, b, k=3)
    _, i1 = knn(q, b, k=3, base_offset=1000)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0) + 1000)


def test_knn_k_exceeds_base_raises(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    b = rng.standard_normal((4, 8)).astype(np.float32)
    with pytest.raises(AssertionError):
        knn(q, b, k=5)


def test_distance_raft_convention(normalized_vectors):
    """On normalized vectors sqeuclidean == 2*(1-cos): the validator's
    `1-sim == distance/2` relation (reference: parquet_to_format.py:373)."""
    q, b = normalized_vectors
    d = np.asarray(pairwise_distance(q[:5], b[:7], metric="sqeuclidean"))
    cos = np.asarray(pairwise_distance(q[:5], b[:7], metric="cosine"))
    np.testing.assert_allclose(d, 2 * cos, atol=1e-5)
    sim = similarity_from_distance(d, "sqeuclidean")
    np.testing.assert_allclose(sim, 1 - cos, atol=1e-5)


def test_streaming_knn_matches_oneshot(normalized_vectors):
    q, b = normalized_vectors
    ref_d, ref_i = knn(q, b, k=10)
    s = StreamingKNN(q, k=10)
    for off in range(0, len(b), 300):
        s.update(b[off:off + 300])
    d, i = s.finalize()
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(d, np.asarray(ref_d), atol=1e-6)
    assert check_monotonic(d)


def test_merge_topk_tie_break():
    """On distance ties the earlier (lower-index) candidate must win."""
    da = np.array([[1.0, 3.0]], dtype=np.float32)
    ia = np.array([[0, 5]], dtype=np.int32)
    db = np.array([[1.0, 2.0]], dtype=np.float32)
    ib = np.array([[7, 9]], dtype=np.int32)
    d, i = merge_topk(da, ia, db, ib, 3)
    # tie at d=1.0: list-a entry (idx 0) must precede list-b entry (idx 7)
    np.testing.assert_array_equal(np.asarray(i), [[0, 7, 9]])
    np.testing.assert_allclose(np.asarray(d), [[1.0, 1.0, 2.0]])


def test_merge_topk_many(rng):
    dists = np.sort(rng.standard_normal((4, 6, 5)).astype(np.float32), axis=2)
    idxs = rng.integers(0, 100, (4, 6, 5)).astype(np.int32)
    d, i = merge_topk_many(dists, idxs, 5)
    flat_d = dists.transpose(1, 0, 2).reshape(6, -1)
    flat_i = idxs.transpose(1, 0, 2).reshape(6, -1)
    order = np.argsort(flat_d, axis=1, kind="stable")[:, :5]
    np.testing.assert_allclose(np.asarray(d), np.take_along_axis(flat_d, order, 1))
    np.testing.assert_array_equal(np.asarray(i), np.take_along_axis(flat_i, order, 1))


def test_sort_topk(rng):
    d = rng.standard_normal((3, 8)).astype(np.float32)
    i = rng.integers(0, 50, (3, 8)).astype(np.int32)
    sd, si = sort_topk(d, i)
    assert check_monotonic(np.asarray(sd))
    for r in range(3):
        order = np.argsort(d[r], kind="stable")
        np.testing.assert_array_equal(np.asarray(si)[r], i[r][order])
