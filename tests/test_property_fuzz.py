"""Seeded property sweep of the public knn() surface vs a float64 oracle.

The targeted tests (test_knn_engine/test_screened_engine/...) pin known
edge cases; this sweep walks a seeded random grid of shapes, metrics,
engines, and data pathologies (ties, duplicates, mixed scales, k == B,
D = 1, single-query batches) and checks every result against an
independent float64 recomputation — the same exactness contract the
reference's validator enforces file-level (parquet_to_format.py:351-491),
applied engine-level. Deterministic (fixed seed), CPU-sized.
"""

import numpy as np
import pytest

from neighborhoodwatch_tpu.ops.knn import knn

SEED = 20260818
TRIALS = 24


def _oracle_distances(q, b, metric):
    """Float64 (Q, B) distance matrix under the library's conventions
    (ops/distance.py: l2 from the dot identity, cosine/dot as 1 - sim)."""
    q64 = q.astype(np.float64)
    b64 = b.astype(np.float64)
    if metric == "cosine":
        def _norm(x):
            n = np.linalg.norm(x, axis=1, keepdims=True)
            return x / np.where(n == 0, 1.0, n)
        q64, b64 = _norm(q64), _norm(b64)
    dots = q64 @ b64.T
    if metric in ("sqeuclidean", "euclidean"):
        qn = np.sum(q64 * q64, axis=1, keepdims=True)
        bn = np.sum(b64 * b64, axis=1, keepdims=True)
        d = np.maximum(qn + bn.T - 2.0 * dots, 0.0)
        if metric == "euclidean":
            d = np.sqrt(d)
    else:
        d = 1.0 - dots
    return d


def _make_data(rng, Q, B, D, pattern):
    if pattern == "normal":
        q = rng.standard_normal((Q, D))
        b = rng.standard_normal((B, D))
    elif pattern == "duplicates":
        # few distinct rows -> massive ties; every engine must still
        # return k neighbors whose distances match the oracle's k-th
        pool = rng.standard_normal((max(2, B // 50), D))
        b = pool[rng.integers(0, len(pool), B)]
        q = pool[rng.integers(0, len(pool), Q)]
    elif pattern == "mixed-scale":
        q = rng.standard_normal((Q, D)) * (10.0 ** rng.integers(-4, 5, (Q, 1)))
        b = rng.standard_normal((B, D)) * (10.0 ** rng.integers(-4, 5, (B, 1)))
    else:  # "lattice": small-integer coordinates -> exact fp32 values, ties
        q = rng.integers(-3, 4, (Q, D)).astype(np.float64)
        b = rng.integers(-3, 4, (B, D)).astype(np.float64)
    return q.astype(np.float32), b.astype(np.float32)


def _check_against_oracle(q, b, k, metric, dist, idx):
    Q, B = q.shape[0], b.shape[0]
    dist = np.asarray(dist, np.float64)
    idx = np.asarray(idx)
    assert dist.shape == (Q, k) and idx.shape == (Q, k)
    assert np.all(idx >= 0) and np.all(idx < B), "index out of range"
    # per-row: no duplicate neighbor ids
    for r in range(Q):
        assert len(set(idx[r].tolist())) == k, f"row {r}: duplicate indices"
    # monotone nondecreasing distances (merge.py:104 analog)
    assert np.all(np.diff(dist, axis=1) >= -1e-12), "distances not sorted"
    d64 = _oracle_distances(q, b, metric)
    kth = np.partition(d64, k - 1, axis=1)[:, k - 1]
    # tolerance: fp32 inputs are exact, but engines accumulate in fp32;
    # scale the slack to the row's distance magnitude
    scale = np.maximum(np.abs(d64).max(axis=1), 1e-30)
    tol = 1e-5 * scale + 1e-12
    picked = np.take_along_axis(d64, idx.astype(np.int64), axis=1)
    # neighbor-set optimality: every returned neighbor's TRUE distance is
    # within tolerance of the true k-th (ties may swap members freely)
    worst = (picked - kth[:, None]).max(axis=1)
    assert np.all(worst <= tol), \
        f"non-optimal neighbor: excess {worst.max()} vs tol {tol[worst.argmax()]}"
    # reported distances agree with the true distances of the rows picked
    err = np.abs(dist - picked).max(axis=1)
    assert np.all(err <= tol), \
        f"reported distance off by {err.max()} vs tol {tol[err.argmax()]}"


@pytest.mark.parametrize("trial", range(TRIALS))
def test_knn_random_sweep_vs_float64_oracle(trial):
    rng = np.random.default_rng(SEED + trial)
    Q = int(rng.integers(1, 160))
    B = int(rng.integers(2, 2500))
    D = int(rng.choice([1, 7, 37, 64, 129, 384]))
    k_choice = rng.integers(0, 4)
    k = [1, min(10, B), min(100, B), B][k_choice]
    metric = str(rng.choice(["sqeuclidean", "euclidean", "cosine", "dot"]))
    engine = str(rng.choice(["exact", "verified"]))
    pattern = str(rng.choice(["normal", "duplicates", "mixed-scale",
                              "lattice"]))
    q, b = _make_data(rng, Q, B, D, pattern)
    dist, idx = knn(q, b, k=k, metric=metric, engine=engine)
    _check_against_oracle(q, b, k, metric, dist, idx)


def test_knn_sweep_base_offset_random():
    """base_offset must shift every returned index and nothing else."""
    rng = np.random.default_rng(SEED)
    q, b = _make_data(rng, 17, 301, 37, "normal")
    d0, i0 = knn(q, b, k=9, metric="sqeuclidean", engine="exact")
    off = int(rng.integers(1, 10 ** 6))
    d1, i1 = knn(q, b, k=9, metric="sqeuclidean", engine="exact",
                 base_offset=off)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0) + off)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))


def test_streaming_fold_random_splits_match_oneshot():
    """Folding the base in random-sized batches through StreamingKNN must
    equal the one-shot exact result for any split (the dataset path's
    invariant, reference cu_knn_ds.py:181-239)."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import StreamingKNN

    rng = np.random.default_rng(SEED + 99)
    q, b = _make_data(rng, 23, 1700, 64, "duplicates")
    k = 13
    d_ref, i_ref = knn(q, b, k=k, metric="sqeuclidean", engine="exact")
    for _round in range(3):
        cuts = np.sort(rng.integers(1, len(b), 4))
        parts = np.split(b, cuts)
        s = StreamingKNN(jnp.asarray(q), k=k, metric="sqeuclidean")
        off = 0
        for p in parts:
            if len(p):
                s.update(jnp.asarray(p), offset=off)
                off += len(p)
        d_s, i_s = s.finalize()
        np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_ref),
                                   rtol=0, atol=1e-6)
        # ties may reorder between equal-distance rows; compare the
        # distance multiset exactly and the index set per row
        d64 = _oracle_distances(q, b, "sqeuclidean")
        picked = np.take_along_axis(d64, np.asarray(i_s, np.int64), axis=1)
        ref = np.take_along_axis(d64, np.asarray(i_ref, np.int64), axis=1)
        np.testing.assert_allclose(np.sort(picked), np.sort(ref), atol=1e-9)
