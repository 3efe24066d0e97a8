"""Post-generation validators over the written fvec/ivec files.

Capability parity with the reference validators
(parquet_to_format.py:351-491), re-designed vectorized:

- v0: for every query, recompute similarities against the indexed base
  vectors and check the raft metric convention `1 - sim == distance / 2`
  (reference :373). The reference does this with an O(Q*k*d) interpreted
  Python zip loop and per-vector file seeks; here it is three bulk fvec
  reads + one batched device matmul.
- v1: additionally checks per-row monotonic nondecreasing distances
  (reference :419-421) and the cosine convention `1-sim == 1-distance`
  with atol 1e-4 (reference :417,:425); on mismatch, cross-checks with
  independent engines (full kNN recompute + pairwise distance) like the
  reference's 4-engine fallback (:427-466).

Both skip zero query vectors (failed-embedding sentinels, reference
:363-366) and report mismatch counts.
"""

import numpy as np

from neighborhoodwatch_tpu.io import fvec
from neighborhoodwatch_tpu.ops.distance import pairwise_distance
from neighborhoodwatch_tpu.ops.knn import knn


def _read(data_dir, filename):
    from neighborhoodwatch_tpu.utils.naming import get_full_filename
    return fvec.read_vectors(get_full_filename(data_dir, filename))


# above this base row count the validators gather only the referenced rows
# (one sequential chunked scan) instead of loading the whole base fvec —
# the 10M x 1536 target would otherwise need 61GB of host memory
_SELECTED_READ_ROWS = 1 << 19


def _base_neighbor_vectors(data_dir, base_fvec, indices):
    """(Q, k, d) base vectors for every index; the full base matrix too
    when it is small enough to keep (else None)."""
    from neighborhoodwatch_tpu.utils.naming import get_full_filename
    n = fvec.count_vectors(data_dir, base_fvec)
    if n > _SELECTED_READ_ROWS:
        full = get_full_filename(data_dir, base_fvec)
        return fvec.read_selected(full, indices), None
    base = _read(data_dir, base_fvec)
    return base[indices], base


def _gathered_similarities(queries, neighbors, batch=1024):
    """sim[q, j] = <queries[q], neighbors[q, j]> computed in batches."""
    out = np.empty(neighbors.shape[:2], dtype=np.float32)
    for s in range(0, len(queries), batch):
        qb = queries[s:s + batch]
        nb = neighbors[s:s + batch]      # (b, k, d)
        out[s:s + batch] = np.einsum("qd,qkd->qk", qb, nb, dtype=np.float64)
    return out


def validate_files_v0(data_dir, query_vector_fvec, base_vector_fvec,
                      indices_ivec, distances_fvec, atol=1e-4) -> int:
    """raft-convention check `1 - sim == distance / 2`
    (reference: parquet_to_format.py:351-383). Returns mismatch count."""
    queries = _read(data_dir, query_vector_fvec)
    indices = _read(data_dir, indices_ivec).astype(np.int64)
    distances = _read(data_dir, distances_fvec)
    neighbors, _ = _base_neighbor_vectors(data_dir, base_vector_fvec, indices)

    nonzero = np.any(queries != 0, axis=1)
    skipped = int((~nonzero).sum())
    if skipped:
        print(f"Skipping {skipped} zero query vectors")

    sims = _gathered_similarities(queries, neighbors)
    mismatch = ~np.isclose(1.0 - sims, distances / 2.0, atol=atol)
    mismatch &= nonzero[:, None]
    total_mismatch = int(mismatch.sum())
    for qi, col in zip(*np.nonzero(mismatch)):
        if total_mismatch <= 20 or col == 0:
            print(f"Expected '1 - similarity' ({1 - sims[qi, col]}) equal to "
                  f"distance ({distances[qi, col]}) for query vector {qi} and "
                  f"base vector {indices[qi, col]}")
    print(f"Total mismatch count: {total_mismatch}")
    return total_mismatch


def validate_files(data_dir, query_vector_fvec, base_vector_fvec, indices_ivec,
                   distances_fvec, columns=None, input_parquet=None,
                   atol=1e-4) -> int:
    """cosine-convention check + monotonicity + independent-engine
    cross-check on mismatch (reference: parquet_to_format.py:386-491).
    Returns mismatch count."""
    queries = _read(data_dir, query_vector_fvec)
    indices = _read(data_dir, indices_ivec).astype(np.int64)
    distances = _read(data_dir, distances_fvec)
    neighbors, base = _base_neighbor_vectors(data_dir, base_vector_fvec,
                                             indices)

    nonzero = np.any(queries != 0, axis=1)

    # per-row monotonic nondecreasing distances (reference :419-421)
    mono_viol = np.diff(distances, axis=1) < -1e-6
    assert not mono_viol[nonzero].any(), \
        f"distances not monotonically nondecreasing for rows {np.nonzero(mono_viol.any(1))[0][:10]}"

    sims = _gathered_similarities(queries, neighbors)
    mismatch = ~np.isclose(1.0 - sims, distances, atol=atol)
    mismatch &= nonzero[:, None]
    total_mismatch = int(mismatch.sum())

    if total_mismatch:
        # Independent-engine cross-check (analog of the reference's cuvs /
        # full-rebuild / torch fallbacks :427-466): recompute the full exact
        # kNN and the pairwise distances for offending queries.
        bad_rows = np.unique(np.nonzero(mismatch)[0])[:8]
        k = indices.shape[1]
        if base is not None:
            re_d, re_i = knn(queries[bad_rows], base, k=k, metric="cosine")
            re_d = np.asarray(re_d)
        else:   # base too large to re-rank fully; pairwise check only
            re_d = None
        for r, qi in enumerate(bad_rows):
            pw = np.asarray(pairwise_distance(
                queries[qi:qi + 1], neighbors[qi][mismatch[qi]][:4],
                metric="cosine"))
            recomputed = re_d[r][:5] if re_d is not None else "(skipped)"
            print(f"query {qi}: recomputed top-k dists {recomputed} "
                  f"vs file {distances[qi][:5]}; pairwise cross-check {pw[0]}")
    print(f"Total mismatch count: {total_mismatch}")
    return total_mismatch


def dot_product(a, b):
    """(reference: parquet_to_format.py:494-495 — kept for API parity,
    vectorized)"""
    return float(np.dot(np.asarray(a, dtype=np.float64),
                        np.asarray(b, dtype=np.float64)))
