"""The 'verified' engine (approx_min_k + exactness proof + fallback) must
return exactly the same neighbor sets and distances as the exact engine."""

import numpy as np
import pytest

from neighborhoodwatch_tpu.ops.knn import knn, _select_engine


def _sets_equal(i1, i2):
    return all(set(map(int, a)) == set(map(int, b)) for a, b in zip(i1, i2))


@pytest.mark.parametrize("metric", ["sqeuclidean", "cosine"])
def test_verified_engine_matches_exact(normalized_vectors, metric):
    q, b = normalized_vectors
    k = 10
    de, ie = knn(q, b, k=k, metric=metric, engine="exact")
    dv, iv = knn(q, b, k=k, metric=metric, engine="verified")
    assert _sets_equal(np.asarray(ie), np.asarray(iv))
    np.testing.assert_allclose(np.sort(np.asarray(dv), axis=1),
                               np.sort(np.asarray(de), axis=1), atol=1e-6)


def test_verified_engine_tiled(normalized_vectors):
    q, b = normalized_vectors
    de, ie = knn(q, b, k=7, engine="exact", tile_size=256)
    dv, iv = knn(q, b, k=7, engine="verified", tile_size=256)
    assert _sets_equal(np.asarray(ie), np.asarray(iv))


def test_verified_engine_with_ties(rng):
    """Duplicated base rows force exact distance ties — the proof's
    tie-tolerant count argument must still produce a correct set. Under
    exact ties the top-k SET is not unique, so the index contract is:
    no duplicates per row, and every returned index points at a base row
    whose true distance matches the reported one (r3 test review: the old
    distances-only assert let wrong/duplicated tied indices pass)."""
    q = rng.standard_normal((16, 64)).astype(np.float32)
    b0 = rng.standard_normal((128, 64)).astype(np.float32)
    b = np.concatenate([b0, b0[:32], b0[:32]], axis=0)  # triplicate ties
    de, ie = knn(q, b, k=12, engine="exact")
    dv, iv = knn(q, b, k=12, engine="verified")
    np.testing.assert_allclose(np.asarray(dv), np.asarray(de), atol=1e-7)
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    for dists, idx in ((de, ie), (dv, iv)):
        idx = np.asarray(idx)
        assert all(len(set(row)) == len(row) for row in idx.tolist()), \
            "duplicate neighbor indices within a row"
        true_d = np.array([
            ((q64[i] - b64[idx[i]]) ** 2).sum(axis=1) for i in range(len(q))])
        np.testing.assert_allclose(np.asarray(dists), true_d, atol=1e-5)


def test_select_engine_on_cpu():
    assert _select_engine("auto") in ("exact", "verified")
    assert _select_engine("exact") == "exact"
    assert _select_engine("verified") == "verified"
