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
    tie-tolerant count argument must still produce a correct set."""
    q = rng.standard_normal((16, 64)).astype(np.float32)
    b0 = rng.standard_normal((128, 64)).astype(np.float32)
    b = np.concatenate([b0, b0[:32], b0[:32]], axis=0)  # triplicate ties
    de, ie = knn(q, b, k=12, engine="exact")
    dv, iv = knn(q, b, k=12, engine="verified")
    np.testing.assert_allclose(np.asarray(dv), np.asarray(de), atol=1e-7)


def test_select_engine_on_cpu():
    assert _select_engine("auto") in ("exact", "verified")
    assert _select_engine("exact") == "exact"
    assert _select_engine("verified") == "verified"
