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


def _expected_one_minus_sim(distances, metric):
    """Map a written distance back to the `1 - similarity` value each
    metric convention implies (on normalized vectors): raft sqeuclidean
    d == 2(1-sim) (reference parquet_to_format.py:373), euclidean is its
    sqrt, cosine/dot d == 1-sim (reference :417,:425)."""
    if metric == "sqeuclidean":
        return distances / 2.0
    if metric == "euclidean":
        return np.square(distances.astype(np.float64)) / 2.0
    if metric in ("cosine", "dot"):
        return distances
    raise ValueError(f"no validation convention for metric {metric!r}")


def validate_files_v0(data_dir, query_vector_fvec, base_vector_fvec,
                      indices_ivec, distances_fvec, atol=1e-4,
                      metric="sqeuclidean") -> int:
    """Recompute similarities and check the metric's distance convention
    (reference: parquet_to_format.py:351-383, raft `1-sim == d/2`; here
    dispatched on the generation metric). Returns mismatch count."""
    queries = _read(data_dir, query_vector_fvec)
    indices = _read(data_dir, indices_ivec).astype(np.int64)
    distances = _read(data_dir, distances_fvec)
    neighbors, _ = _base_neighbor_vectors(data_dir, base_vector_fvec, indices)

    nonzero = np.any(queries != 0, axis=1)
    skipped = int((~nonzero).sum())
    if skipped:
        print(f"Skipping {skipped} zero query vectors")

    sims = _gathered_similarities(queries, neighbors)
    expected = _expected_one_minus_sim(distances, metric)
    mismatch = ~np.isclose(1.0 - sims, expected, atol=atol)
    mismatch &= nonzero[:, None]
    total_mismatch = int(mismatch.sum())
    for qi, col in zip(*np.nonzero(mismatch)):
        if total_mismatch <= 20 or col == 0:
            print(f"Expected '1 - similarity' ({1 - sims[qi, col]}) equal to "
                  f"{metric}-implied value ({expected[qi, col]}) for query "
                  f"vector {qi} and base vector {indices[qi, col]}")
    print(f"Total mismatch count: {total_mismatch}")
    return total_mismatch


def _numpy_knn_f64(queries, base, k, metric):
    """Third independent engine: float64 numpy brute force — shares no code
    with the JAX engines (analog of the reference's torch matmul/topk
    fallback, parquet_to_format.py:460-466)."""
    q = np.asarray(queries, dtype=np.float64)
    b = np.asarray(base, dtype=np.float64)
    if metric == "cosine":
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-30)
    dots = q @ b.T
    if metric in ("sqeuclidean", "euclidean"):
        d = np.maximum((q * q).sum(1)[:, None] + (b * b).sum(1)[None, :]
                       - 2.0 * dots, 0.0)
        if metric == "euclidean":
            d = np.sqrt(d)
    else:
        d = 1.0 - dots
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def validate_files(data_dir, query_vector_fvec, base_vector_fvec, indices_ivec,
                   distances_fvec, atol=1e-4, metric="cosine") -> int:
    """Metric-convention check + monotonicity + FOUR-engine independent
    cross-check on mismatch (reference: parquet_to_format.py:386-491,
    whose mismatch escalation runs 4 engines :427-466). The four labeled
    counterparts here: exact device rebuild (engine="exact", HIGHEST),
    verified device engine (engine="verified" — approx_min_k selection,
    a different device code path), float64 numpy brute force (host, no
    JAX), and pairwise distance on the mismatching neighbor vectors.
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
    expected = _expected_one_minus_sim(distances, metric)
    mismatch = ~np.isclose(1.0 - sims, expected, atol=atol)
    mismatch &= nonzero[:, None]
    total_mismatch = int(mismatch.sum())

    if total_mismatch:
        # FOUR independent mismatch cross-check engines, labeled — full
        # parity with the reference's 4-engine escalation
        # (parquet_to_format.py:427-466):
        #   1/4 exact device rebuild (XLA matmul + top_k, HIGHEST
        #       precision)             ≙ cuvs full-corpus rebuild :435-449
        #   2/4 verified device engine (approx_min_k + count certificate
        #       — a DIFFERENT device selection path)
        #                              ≙ cuvs single-vector :450-456
        #   3/4 float64 numpy brute force (host, shares no code with the
        #       JAX engines)           ≙ torch matmul/topk :460-466
        #   4/4 pairwise distance on the mismatching neighbor vectors
        #                              ≙ cuvs pairwise_distance :427-433
        bad_rows = np.unique(np.nonzero(mismatch)[0])[:8]
        k = indices.shape[1]
        if base is not None:
            ex_d, _ = knn(queries[bad_rows], base, k=k, metric=metric,
                          engine="exact", precision="highest")
            ex_d = np.asarray(ex_d)
            ve_d, _ = knn(queries[bad_rows], base, k=k, metric=metric,
                          engine="verified")
            ve_d = np.asarray(ve_d)
            np_d, _ = _numpy_knn_f64(queries[bad_rows], base, k, metric)
        else:   # base too large to re-rank fully; pairwise check only
            ex_d = ve_d = np_d = None
        for r, qi in enumerate(bad_rows):
            pw = np.asarray(pairwise_distance(
                queries[qi:qi + 1], neighbors[qi][mismatch[qi]][:4],
                metric=metric))
            exact = ex_d[r][:5] if ex_d is not None else "(skipped)"
            verified = ve_d[r][:5] if ve_d is not None else "(skipped)"
            numpy64 = np_d[r][:5] if np_d is not None else "(skipped)"
            print(f"query {qi} vs file {distances[qi][:5]}: "
                  f"[1/4 exact-device] {exact}; "
                  f"[2/4 verified-device] {verified}; "
                  f"[3/4 float64-numpy] {numpy64}; "
                  f"[4/4 pairwise] {pw[0]}")
    print(f"Total mismatch count: {total_mismatch}")
    return total_mismatch


def _doc_token_ranges(doc_ids):
    """Ascending per-token doc ids -> (n_docs, 2) [start, end) token-row
    ranges, asserting the ids are dense 0..n_docs-1 (the contract the
    maxsim pipeline writes: colbert_pipeline.process_source_dataset)."""
    doc_ids = np.asarray(doc_ids).ravel()
    assert len(doc_ids) > 0, "empty doc-id map"
    assert (np.diff(doc_ids) >= 0).all(), "doc-id map is not ascending"
    n_docs = int(doc_ids[-1]) + 1
    starts = np.searchsorted(doc_ids, np.arange(n_docs), side="left")
    ends = np.searchsorted(doc_ids, np.arange(n_docs), side="right")
    assert (ends > starts).all(), "doc-id map has gaps (missing passage ids)"
    return np.stack([starts, ends], axis=1)


def _maxsim_scores_f64(q_tokens, doc_token_list):
    """MaxSim(q, doc) = sum over query tokens of max over doc tokens of
    dot, in float64 (shares no code with the JAX engines — the validator's
    independent scorer, same contract as ops.maxsim.maxsim_oracle)."""
    q = np.asarray(q_tokens, dtype=np.float64)
    return np.array([(q @ np.asarray(d, dtype=np.float64).T).max(axis=1).sum()
                     for d in doc_token_list])


def validate_maxsim_files(data_dir, query_vector_fvec, base_vector_fvec,
                          query_doc_map_ivec, base_doc_map_ivec,
                          indices_ivec, distances_fvec, atol=1e-3,
                          sample=256, exhaustive=None, seed=0) -> int:
    """Artifact-level validator for the `ck --maxsim` ground truth — the
    MaxSim analog of validate_files_v0/v1 (no reference counterpart: the
    reference validators cover only flat kNN, parquet_to_format.py:351-491).
    Works from the written files alone, proving the exported artifact set
    is self-contained:

    1. coherence — `neighbors` has one row per query passage in the doc-id
       map, every neighbor id is a valid base passage id, and per-row
       distances are monotonically nondecreasing (best-first negated
       scores);
    2. score check — for `sample` query passages (all, when fewer),
       recompute MaxSim(qp, b) in float64 for every listed neighbor b and
       check `-score == distance` within atol. Base passage tokens are
       gathered with one sequential chunked scan (fvec.read_selected), so
       arbitrarily large base exports validate in O(selected) memory;
    3. optimality — when `exhaustive` (default: auto for small bases),
       score the sampled queries against EVERY base passage and check no
       unlisted passage beats the written k-th score by more than atol:
       a true top-k proof from the artifacts.

    Returns the total mismatch count (0 = valid)."""
    from neighborhoodwatch_tpu.utils.naming import get_full_filename

    q_tokens = _read(data_dir, query_vector_fvec)
    q_ranges = _doc_token_ranges(_read(data_dir, query_doc_map_ivec))
    b_map = _read(data_dir, base_doc_map_ivec).ravel()
    b_ranges = _doc_token_ranges(b_map)
    indices = _read(data_dir, indices_ivec).astype(np.int64)
    distances = _read(data_dir, distances_fvec)
    n_q_docs, n_b_docs = len(q_ranges), len(b_ranges)

    # 1. coherence
    assert len(q_tokens) == int(q_ranges[-1, 1]), \
        f"query doc map covers {q_ranges[-1, 1]} rows, fvec has {len(q_tokens)}"
    assert indices.shape[0] == n_q_docs, \
        f"neighbors rows {indices.shape[0]} != query passage count {n_q_docs}"
    assert indices.shape == distances.shape
    assert indices.min() >= 0 and indices.max() < n_b_docs, \
        f"neighbor ids outside [0, {n_b_docs})"
    mono_viol = np.diff(distances, axis=1) < -1e-6
    assert not mono_viol.any(), \
        f"distances not monotonically nondecreasing for rows " \
        f"{np.nonzero(mono_viol.any(1))[0][:10]}"

    rng = np.random.default_rng(seed)
    if n_q_docs <= sample:
        q_sel = np.arange(n_q_docs)
    else:
        q_sel = np.sort(rng.choice(n_q_docs, size=sample, replace=False))

    n_b_tokens = int(b_ranges[-1, 1])
    if exhaustive is None:
        # auto: full-base optimality when the float64 rescore is cheap
        # (sampled query tokens x all base tokens x dim <= ~2 GFLOP)
        q_tok_sample = int((q_ranges[q_sel, 1] - q_ranges[q_sel, 0]).sum())
        exhaustive = (q_tok_sample * n_b_tokens * q_tokens.shape[1]
                      <= 2 * 10**9)

    base_full = get_full_filename(data_dir, base_vector_fvec)
    # base fvec <-> base doc map coherence in EVERY branch: the sampled
    # path (which large bases always take) used to skip this, silently
    # validating map-derived row ranges against a mismatched token file
    # (or surfacing a short file only as read_selected's opaque range
    # assert) — r3 review
    assert fvec.count_vectors(data_dir, base_vector_fvec) == n_b_tokens, \
        (f"base doc map covers {n_b_tokens} rows, fvec has "
         f"{fvec.count_vectors(data_dir, base_vector_fvec)}")
    if exhaustive:
        b_tokens = fvec.read_vectors(base_full)
        assert len(b_tokens) == n_b_tokens, \
            f"base doc map covers {n_b_tokens} rows, fvec has {len(b_tokens)}"
        doc_of = lambda p: b_tokens[b_ranges[p, 0]:b_ranges[p, 1]]
        # hoisted out of the per-query loop: the float64 image of the
        # whole base and its per-doc views — re-converting the full token
        # matrix per sampled query cost up to 256 redundant 8x-sized
        # conversions (r3 review)
        b64 = b_tokens.astype(np.float64)
        b_docs64 = [b64[s:e] for s, e in b_ranges]
    else:
        # gather only the listed neighbors' token rows: one sequential scan
        need = np.unique(indices[q_sel])
        rows = np.concatenate([np.arange(b_ranges[p, 0], b_ranges[p, 1])
                               for p in need])
        gathered = fvec.read_selected(base_full, rows)
        bounds = np.cumsum([b_ranges[p, 1] - b_ranges[p, 0] for p in need])
        parts = np.split(gathered, bounds[:-1])
        by_id = {int(p): t for p, t in zip(need, parts)}
        doc_of = lambda p: by_id[int(p)]

    k = indices.shape[1]
    total_mismatch = 0
    opt_viol = 0
    for qi in q_sel:
        qt = q_tokens[q_ranges[qi, 0]:q_ranges[qi, 1]]
        scores = _maxsim_scores_f64(qt, [doc_of(p) for p in indices[qi]])
        bad = ~np.isclose(-scores, distances[qi].astype(np.float64),
                          atol=atol)
        for j in np.nonzero(bad)[0][:3]:
            print(f"query passage {qi} neighbor {indices[qi, j]} (rank {j}): "
                  f"recomputed -MaxSim {-scores[j]:.6f} vs written "
                  f"distance {distances[qi, j]:.6f}")
        total_mismatch += int(bad.sum())
        if exhaustive:
            all_scores = _maxsim_scores_f64(qt, b_docs64)
            kth = -distances[qi, k - 1]          # written k-th best score
            unlisted = np.ones(n_b_docs, dtype=bool)
            unlisted[indices[qi]] = False
            beat = all_scores[unlisted] > kth + atol
            if beat.any():
                worst = all_scores[unlisted].max()
                print(f"query passage {qi}: unlisted base passage scores "
                      f"{worst:.6f} > written k-th score {kth:.6f}")
                opt_viol += int(beat.sum())
    if exhaustive:
        print(f"Optimality violations (unlisted passage beats written "
              f"k-th): {opt_viol}")
        total_mismatch += opt_viol
    print(f"Total mismatch count: {total_mismatch}")
    return total_mismatch


def dot_product(a, b):
    """(reference: parquet_to_format.py:494-495 — kept for API parity,
    vectorized)"""
    return float(np.dot(np.asarray(a, dtype=np.float64),
                        np.asarray(b, dtype=np.float64)))
