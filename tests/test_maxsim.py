"""ColBERT MaxSim scoring vs a float64 numpy oracle."""

import numpy as np

from neighborhoodwatch_tpu.ops.maxsim import (
    StreamingMaxSim, maxsim_scores, maxsim_topk, maxsim_oracle,
    pad_token_lists,
)


def _toy(rng, q_n=6, d_n=40, dim=32, tq=7, td=11):
    qs = [rng.standard_normal((rng.integers(2, tq), dim)).astype(np.float32)
          for _ in range(q_n)]
    ds = [rng.standard_normal((rng.integers(3, td), dim)).astype(np.float32)
          for _ in range(d_n)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    return q, qm, d, dm


def test_maxsim_scores_match_oracle(rng):
    """Dense engine scores == the float64 oracle. The oracle returns
    score-sorted rows with indices, so un-sort its output back to the dense
    layout instead of duplicating its masking loop inline (r3 test review:
    the inline copy could silently diverge from the oracle every other
    test uses)."""
    q, qm, d, dm = _toy(rng)
    got = np.asarray(maxsim_scores(q, qm, d, dm))
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=d.shape[0])
    dense = np.empty_like(exp_scores)
    np.put_along_axis(dense, exp_idx, exp_scores, axis=1)
    np.testing.assert_allclose(got, dense, atol=1e-4)


def test_maxsim_topk_exact(rng):
    q, qm, d, dm = _toy(rng, d_n=50)
    k = 5
    scores, idx = maxsim_topk(q, qm, d, dm, k=k, tile_docs=16)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-4)
    # scores descending
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_streaming_maxsim_matches_oracle(rng):
    """Uneven device-streamed tiles (with trailing padded rows and
    per-tile token widths) reproduce the oracle exactly."""
    q, qm, d, dm = _toy(rng, d_n=57)
    k = 7
    engine = StreamingMaxSim(q, qm, k=k)
    off = 0
    for size in (16, 5, 23, 13):            # 57 total
        tile, tmask = d[off:off + size], dm[off:off + size]
        pad = 8 - size % 8 if size % 8 else 0
        if pad:                              # static-shape style padding
            tile = np.pad(tile, ((0, pad), (0, 0), (0, 0)))
            tmask = np.pad(tmask, ((0, pad), (0, 0)))
        engine.update(tile, tmask, n_valid=size)
        off += size
    scores, idx = engine.finalize()
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(scores, exp_scores, atol=1e-4)


def test_compute_maxsim_knn_pipeline(rng, tmp_path):
    """Doc-tracked token parquet -> compute_maxsim_knn -> final files match
    the oracle (doc ids, negative-score distances)."""
    from neighborhoodwatch_tpu.core.colbert_pipeline import compute_maxsim_knn
    from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer
    from neighborhoodwatch_tpu.utils import naming
    import pyarrow.parquet as pq

    dim, k = 16, 4
    cols = [f"token_embedding_{i}" for i in range(dim)]
    data_dir = str(tmp_path)
    (tmp_path / "partial").mkdir()

    def write(filename, docs):
        streamer = ParquetStreamer(filename, cols)
        toks = np.concatenate(docs, axis=0)
        ids = np.concatenate([np.full(len(t), i, np.int32)
                              for i, t in enumerate(docs)])
        # two writes to exercise doc continuation across record batches
        half = len(toks) // 2
        streamer.stream_tokens_with_doc_ids(toks[:half], ids[:half])
        streamer.stream_tokens_with_doc_ids(toks[half:], ids[half:])
        streamer.close()

    q_docs = [rng.standard_normal((rng.integers(2, 6), dim)).astype(np.float32)
              for _ in range(5)]
    b_docs = [rng.standard_normal((rng.integers(2, 9), dim)).astype(np.float32)
              for _ in range(23)]
    qf = f"{data_dir}/q_src.parquet"
    bf = f"{data_dir}/b_src.parquet"
    write(qf, q_docs)
    write(bf, b_docs)

    timer, n_q, n_b = compute_maxsim_knn(data_dir, qf, bf, k=k, tile_docs=8,
                                         batch_rows=40)
    assert (n_q, n_b) == (5, 23)

    idx = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    dist = pq.read_table(
        naming.get_partial_distances_filename(data_dir, -1)).to_pandas().values

    q, qm = pad_token_lists(q_docs, dim)
    d, dm = pad_token_lists(b_docs, dim)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(dist, -exp_scores, atol=1e-4)
    # distance contract: ascending per row
    assert (np.diff(dist, axis=1) >= -1e-6).all()


def test_compute_maxsim_knn_long_passages(rng, tmp_path):
    """Full doc-level pipeline with passages past the 32-token kernel tile
    (chunked-path integration; CPU runs the XLA engine, TPU the chunked
    kernel — both must match the oracle)."""
    from neighborhoodwatch_tpu.core.colbert_pipeline import compute_maxsim_knn
    from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer
    from neighborhoodwatch_tpu.utils import naming
    import pyarrow.parquet as pq

    dim, k = 16, 3
    cols = [f"token_embedding_{i}" for i in range(dim)]
    data_dir = str(tmp_path)
    (tmp_path / "partial").mkdir()

    def write(filename, docs):
        with ParquetStreamer(filename, cols) as st:
            toks = np.concatenate(docs, axis=0)
            ids = np.concatenate([np.full(len(t), i, np.int32)
                                  for i, t in enumerate(docs)])
            st.stream_tokens_with_doc_ids(toks, ids)

    q_docs = [rng.standard_normal((int(rng.integers(2, 6)), dim))
              .astype(np.float32) for _ in range(4)]
    b_docs = [rng.standard_normal((int(rng.integers(30, 70)), dim))
              .astype(np.float32) for _ in range(12)]
    assert max(len(d) for d in b_docs) > 32
    qf, bf = f"{data_dir}/q.parquet", f"{data_dir}/b.parquet"
    write(qf, q_docs)
    write(bf, b_docs)

    compute_maxsim_knn(data_dir, qf, bf, k=k, tile_docs=8, batch_rows=100)
    idx = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    dist = pq.read_table(
        naming.get_partial_distances_filename(data_dir, -1)).to_pandas().values

    q, qm = pad_token_lists(q_docs, dim)
    d, dm = pad_token_lists(b_docs, dim)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(dist, -exp_scores, atol=1e-4)


def test_maxsim_padding_invariance(rng):
    """Extra token padding must not change scores."""
    q, qm, d, dm = _toy(rng, q_n=3, d_n=10)
    q2 = np.pad(q, ((0, 0), (0, 8), (0, 0)))
    qm2 = np.pad(qm, ((0, 0), (0, 8)))
    d2 = np.pad(d, ((0, 0), (0, 4), (0, 0)))
    dm2 = np.pad(dm, ((0, 0), (0, 4)))
    s1 = np.asarray(maxsim_scores(q, qm, d, dm))
    s2 = np.asarray(maxsim_scores(q2, qm2, d2, dm2))
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_maxsim_screened_matches_oracle(rng):
    """Pallas-screened MaxSim == float64 oracle (interpret mode on CPU);
    covers ragged doc counts, padded query/doc tokens, and the
    certificate's fallback path."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    dim, k = 32, 7
    qs = [rng.standard_normal((int(rng.integers(2, 9)), dim))
          .astype(np.float32) for _ in range(11)]
    ds = [rng.standard_normal((int(rng.integers(2, 13)), dim))
          .astype(np.float32) for _ in range(300)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_screened_precision_tiers():
    """The computed-eps tiers (medium = exact-q x bf16-docs, default =
    plain bf16) must stay exact end to end: certificate + repair recover
    the oracle result at every tier. Local fixed rng: suite-order
    independence (the shared session fixture is order-dependent)."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    rng = np.random.default_rng(1234)
    dim, k = 32, 5
    qs = [rng.standard_normal((int(rng.integers(2, 9)), dim))
          .astype(np.float32) for _ in range(7)]
    ds = [rng.standard_normal((int(rng.integers(2, 13)), dim))
          .astype(np.float32) for _ in range(260)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    for tier in ("medium", "default"):
        scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k,
                                           screen_precision=tier)
        np.testing.assert_array_equal(np.asarray(idx), exp_idx, tier)
        np.testing.assert_allclose(np.asarray(scores), exp_scores,
                                   atol=1e-3, err_msg=tier)


def test_maxsim_screened_mid_length_docs():
    """Td in 17..24 pads to 24 tokens (tdc=24): the doc-block width must
    stay a LANES multiple dividing MEGA_DOCS — the old tile formula gave
    db=170 here, which compile-fails on TPU and silently never screens
    doc columns >= 128 in interpret mode (r3 review finding). Plant the
    best docs in those columns and check against the oracle."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    rng = np.random.default_rng(555)
    dim, k = 16, 5
    q = rng.standard_normal((4, 6, dim)).astype(np.float32)
    qm = np.ones((4, 6), bool)
    ds = [rng.standard_normal((int(rng.integers(17, 25)), dim))
          .astype(np.float32) * 0.01 for _ in range(300)]
    d, dm = pad_token_lists(ds, dim)
    assert d.shape[1] == 24
    for qi, doc_id in enumerate((130, 170, 250, 299)):
        d[doc_id, :6] = q[qi] * 10.0       # unambiguous best match
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_screened_planted_collisions():
    """Five near-identical docs 128 apart land in one lane bin; the
    certificate must detect the bin overflow and fall back exactly.

    Local fixed rng (the session-scoped fixture makes test data depend
    on suite ORDER — a flake source) and tie-tolerant assertions: among
    the ~0.01-magnitude filler docs, two fp32-EQUAL scores may order
    differently than the float64 oracle; the framework's exactness
    contract is exact-under-fp32-scoring."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    rng = np.random.default_rng(777)
    dim, k = 16, 6
    q = rng.standard_normal((3, 4, dim)).astype(np.float32)
    qm = np.ones((3, 4), bool)
    d = rng.standard_normal((640, 8, dim)).astype(np.float32) * 0.01
    dm = np.ones((640, 8), bool)
    # plant 5 clones of a strong match in the same lane bin (stride 128)
    best = np.repeat(q[0].mean(0, keepdims=True), 8, axis=0) * 10
    for j in range(5):
        d[j * 128] = best + rng.standard_normal((8, dim)).astype(np.float32) * 1e-4
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    idx = np.asarray(idx)
    # the 5 bin-overflowing clones MUST all surface for query 0, in
    # oracle order (their scores are well separated from the filler)
    np.testing.assert_array_equal(idx[0, :5], exp_idx[0, :5])
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)
    # neighbor sets match up to fp32 ties at the k-th boundary
    for r in range(3):
        assert len(set(idx[r]) & set(exp_idx[r])) >= k - 1, r


def _collision_corpus(rng, dim, n_docs, lane, n_plant, plant_top=10.0,
                      plant_gap=0.2):
    """A corpus whose ONLY certifiable defect is a bin collision: every
    doc's tokens point along one unit vector v with a distinct magnitude,
    so scores are well-separated relative to the certificate eps (norms
    stay <= plant_top, keeping eps tiny — planting huge-norm clones into
    a random corpus instead inflates d_max until the eps band covers
    dozens of bins and overflows the merge, a LEGITIMATE fallback case).
    The n_plant strongest docs all sit in lane bin `lane` (stride 128)."""
    v = np.zeros(dim, np.float32)
    v[0] = 1.0
    mags = 1.0 + 0.005 * np.arange(n_docs, dtype=np.float32)  # fillers
    for j in range(n_plant):
        mags[j * 128 + lane] = plant_top - plant_gap * j
    d = np.tile(v, (n_docs, 8, 1)) * mags[:, None, None]
    dm = np.ones((n_docs, 8), bool)
    # query tokens ~ v + small noise: positive dots, moderate q_scale
    q = (v[None, None, :]
         + 0.05 * rng.standard_normal((2, 4, dim))).astype(np.float32)
    qm = np.ones((2, 4), bool)
    return q, qm, d, dm


def test_maxsim_screened_collisions_repair_in_trace(monkeypatch):
    """Bin collisions with an intact count certificate are repaired by
    _maxsim_select's in-trace class-A re-rank — the exact XLA fallback
    must NOT run (it cost ~0.3s of the 0.93s long-doc end-to-end for
    the ~2% colliding queries before the repair existed)."""
    from neighborhoodwatch_tpu.ops import maxsim as ms

    rng = np.random.default_rng(778)
    dim, k = 16, 6
    # 5 planted docs in lane bin 0: > KEEP-1 = 3 collide, the bin flags,
    # and true neighbors #4/#5 are missing from the merge pool
    q, qm, d, dm = _collision_corpus(rng, dim, 640, lane=0, n_plant=5)

    def _no_fallback(*a, **kw):
        raise AssertionError(
            "exact XLA fallback ran — the class-A repair should have "
            "certified this batch in-trace")

    monkeypatch.setattr(ms, "maxsim_topk", _no_fallback)
    scores, idx = ms.maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores,
                               rtol=1e-5, atol=1e-4)


def test_maxsim_repair_dedups_topk_members(monkeypatch):
    """A returned-top-k doc living in a suspicious bin must not appear
    twice after the repair merges the bin's exact scores back in (the
    bin's KEEP-1 kept members ARE in the returned top-k here)."""
    from neighborhoodwatch_tpu.ops import maxsim as ms

    rng = np.random.default_rng(779)
    dim, k = 16, 8
    # 6 planted docs in lane bin 3: clones 1-3 are kept, returned in the
    # top-k, AND re-scored by the repair's 64-member gather — without
    # the dedup they would each appear twice
    q, qm, d, dm = _collision_corpus(rng, dim, 768, lane=3, n_plant=6)
    monkeypatch.setattr(ms, "maxsim_topk", lambda *a, **kw: (_ for _ in ())
                        .throw(AssertionError("fallback ran")))
    scores, idx = ms.maxsim_topk_screened(q, qm, d, dm, k=k)
    idx = np.asarray(idx)
    for r in range(2):
        assert len(set(idx[r])) == k, f"duplicate neighbor in row {r}"
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores,
                               rtol=1e-5, atol=1e-4)


def test_maxsim_screened_wide_tokens(rng):
    """td in (17..32] engages the narrow doc-block config (db=128)."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    dim, k = 16, 5
    qs = [rng.standard_normal((int(rng.integers(20, 33)), dim))
          .astype(np.float32) for _ in range(4)]
    ds = [rng.standard_normal((int(rng.integers(20, 33)), dim))
          .astype(np.float32) for _ in range(150)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    assert d.shape[1] > 16
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_screened_long_docs(rng):
    """Doc token counts past the 32-token VMEM tile stream through the
    kernel in 32-token chunks with a running max (VERDICT r1 weak #6:
    real wikipedia passages routinely exceed 32 tokens). Td=64 engages
    2 chunks; ragged counts cross the chunk boundary."""
    import pytest

    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    dim, k = 16, 5
    qs = [rng.standard_normal((int(rng.integers(2, 9)), dim))
          .astype(np.float32) for _ in range(4)]
    ds = [rng.standard_normal((int(rng.integers(20, 65)), dim))
          .astype(np.float32) for _ in range(120)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    assert d.shape[1] > 32
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_screened_very_long_docs(rng):
    """Td=128 (4 chunks, ColBERT doc_maxlen territory)."""
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    dim, k = 16, 4
    qs = [rng.standard_normal((3, dim)).astype(np.float32) for _ in range(3)]
    ds = [rng.standard_normal((int(rng.integers(97, 129)), dim))
          .astype(np.float32) for _ in range(60)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    assert d.shape[1] > 96
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_process_source_dataset_doc_ids_are_per_sentence(tmp_path):
    """--maxsim doc_id granularity: one id per sentence/passage, not per
    source row (ADVICE r1: a whole article used to become one 'passage')."""
    from neighborhoodwatch_tpu.core.colbert_pipeline import (
        process_source_dataset,
    )
    from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer
    from neighborhoodwatch_tpu.models.colbert_flax import (
        ColbertFlaxEmbeddingGenerator,
    )
    import pyarrow.parquet as pq

    gen = ColbertFlaxEmbeddingGenerator()  # random init + hash tokenizer

    class DS:
        column_names = ["text"]

        def __iter__(self):
            return iter([
                {"text": "First sentence here. Second one too! Third thing?"},
                {"text": "Only sentence."},
            ])

    cols = [f"token_embedding_{i}" for i in range(128)]
    out = f"{tmp_path}/tok.parquet"
    st = ParquetStreamer(out, cols)
    rows, sentences, tokens, zeros = process_source_dataset(
        st, gen, DS(), 128, 10_000, "text", track_docs=True)
    st.close()
    assert rows == 2
    assert sentences == 4          # 3 + 1 passages
    table = pq.read_table(out)
    doc_ids = table.column("doc_id").to_numpy()
    assert sorted(set(doc_ids.tolist())) == [0, 1, 2, 3]
    # doc ids are contiguous runs (tokens of a passage stay together)
    change_points = (np.diff(doc_ids) != 0).sum()
    assert change_points == 3
    assert tokens == len(doc_ids)


def test_maxsim_fused_doc_stats_sound(rng):
    """screen_maxsim's fused doc_stats [d_max, dlo_max] (r3 review: the
    select used to re-read + re-convert the whole doc tensor for the same
    two statistics) must upper-bound the float64-true max valid-token
    norm and max bf16-residual norm — they are certificate UPPER bounds —
    and the screened path threaded with them must stay exact."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk_screened

    dim, k = 32, 5
    qs = [rng.standard_normal((int(rng.integers(2, 9)), dim))
          .astype(np.float32) for _ in range(5)]
    ds = [(rng.standard_normal((int(rng.integers(2, 13)), dim)) *
           np.exp2(rng.integers(-4, 5))).astype(np.float32)
          for _ in range(270)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    _, _, _, doc_stats = mk.screen_maxsim(q, qm, d, dm)
    stats = np.asarray(doc_stats, np.float64)
    d64 = d.astype(np.float64)
    dn = np.linalg.norm(d64, axis=2)
    dhi = np.asarray(jnp.asarray(d).astype(jnp.bfloat16)
                     .astype(jnp.float32), np.float64)
    dlo_n = np.linalg.norm(d64 - dhi, axis=2)
    assert stats[0] >= dn[dm].max()
    assert stats[1] >= dlo_n[dm].max()
    scores, idx = maxsim_topk_screened(q, qm, d, dm, k=k)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_pipelined_kernel_matches_plain(rng):
    """The software-pipelined MaxSim kernel (epilogue of linear step s-1
    overlapped with step s's MXU passes) must be bit-identical to the
    plain kernel: same candidate doc ids, same packed negated scores.
    Covers n_tc == 1 (single-chunk docs), n_tc > 1 (the running chunk-max
    fold retires one step late), and every precision tier."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    dim = 32
    for d_n, td_hi, prec in ((120, 30, "medium"),      # n_tc == 1
                             (70, 90, "high"),         # n_tc == 3
                             (260, 40, "default")):    # n_tc == 2, 2 subs
        qs = [rng.standard_normal((int(rng.integers(2, 9)), dim))
              .astype(np.float32) for _ in range(5)]
        ds = [rng.standard_normal((int(rng.integers(2, td_hi)), dim))
              .astype(np.float32) for _ in range(d_n)]
        q, qm = pad_token_lists(qs, dim)
        d, dm = pad_token_lists(ds, dim)
        outs = [mk.screen_maxsim(q, qm, d, dm, screen_precision=prec,
                                 pipelined=p) for p in (False, True)]
        (n0, i0, m0, s0), (n1, i1, m1, s1) = outs
        assert m0 == m1
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        n0, n1 = np.asarray(n0), np.asarray(n1)
        both_nan = np.isnan(n0) & np.isnan(n1)
        np.testing.assert_array_equal(n0[~both_nan], n1[~both_nan])
        np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_compute_maxsim_knn_rejects_base_without_doc_ids(rng, tmp_path):
    """A base token parquet generated WITHOUT --maxsim (no doc_id column)
    must be a clear error, not silently split on a float embedding column
    (r3 review, reproduced: get_field_index returns -1 and column(-1) is
    the last token_embedding column)."""
    import pytest
    from neighborhoodwatch_tpu.core.colbert_pipeline import compute_maxsim_knn
    from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer

    dim = 8
    cols = [f"token_embedding_{i}" for i in range(dim)]
    data_dir = str(tmp_path)
    (tmp_path / "partial").mkdir()
    qf, bf = f"{data_dir}/q_src.parquet", f"{data_dir}/b_src.parquet"
    q_docs = [rng.standard_normal((3, dim)).astype(np.float32)
              for _ in range(3)]
    toks = np.concatenate(q_docs, axis=0)
    ids = np.concatenate([np.full(3, i, np.int32) for i in range(3)])
    s = ParquetStreamer(qf, cols)
    s.stream_tokens_with_doc_ids(toks, ids)
    s.close()
    s = ParquetStreamer(bf, cols)    # flat token rows, no doc_id column
    s.stream_to_parquet_without_src_metadata(
        rng.standard_normal((20, dim)).astype(np.float32))
    s.close()
    with pytest.raises(AssertionError, match="doc_id"):
        compute_maxsim_knn(data_dir, qf, bf, k=2, tile_docs=8, batch_rows=16)


def test_streaming_maxsim_screened_honors_n_valid(rng):
    """The screened update branch must mask padding doc rows itself:
    tiles padded by REPEATING real docs (mask left True) used to score
    the duplicates for real and alias the next tile's doc ids
    (r3 review; only the ck pipeline's defensive mask-zeroing hid it)."""
    dim, k, n_docs, tile = 24, 5, 40, 16
    qs = [rng.standard_normal((3, dim)).astype(np.float32)
          for _ in range(4)]
    ds = [rng.standard_normal((int(rng.integers(2, 7)), dim))
          .astype(np.float32) for _ in range(n_docs)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    eng = StreamingMaxSim(q, qm, k=k, engine="screened")
    for start in range(0, n_docs, tile):
        chunk = d[start:start + tile]
        cmask = dm[start:start + tile]
        n_valid = len(chunk)
        if n_valid < tile:          # edge-pad, mask left True on purpose
            reps = tile - n_valid
            chunk = np.concatenate([chunk, chunk[:1].repeat(reps, 0)])
            cmask = np.concatenate([cmask, cmask[:1].repeat(reps, 0)])
        eng.update(chunk, cmask, n_valid=n_valid)
    s, i = eng.finalize()
    exp_s, exp_i = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(i, exp_i)
    np.testing.assert_allclose(s, exp_s, atol=1e-3)


def test_maxsim_auto_engine_gates_on_dim(monkeypatch):
    """'auto' must fall back to the exact path for token dims the kernel
    cannot lay out (not <=128 and not a 128-multiple) instead of crashing
    on the kernel's dim assert (r3 review)."""
    from neighborhoodwatch_tpu.ops.maxsim import _maxsim_engine
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _maxsim_engine("auto", 10_000, 8, 128) == "screened"
    assert _maxsim_engine("auto", 10_000, 8, 256) == "screened"
    assert _maxsim_engine("auto", 10_000, 8, 64) == "screened"
    assert _maxsim_engine("auto", 10_000, 8, 192) == "exact"
    assert _maxsim_engine("auto", 10_000, 40, 128) == "exact"  # tq cap


def test_streaming_maxsim_finalize_requires_k_docs(rng):
    """finalize() on an under-fed stream must fail loudly (rows past
    _seen would be -inf scores with garbage doc id 0 — r3 review; same
    guard as StreamingKNN)."""
    import pytest
    dim = 16
    q, qm = pad_token_lists([rng.standard_normal((2, dim))
                             .astype(np.float32)], dim)
    d, dm = pad_token_lists([rng.standard_normal((3, dim))
                             .astype(np.float32)] * 4, dim)
    eng = StreamingMaxSim(q, qm, k=10)
    eng.update(d, dm)
    with pytest.raises(AssertionError, match="saw only 4"):
        eng.finalize()


def test_validate_maxsim_files_catches_corruption(tmp_path):
    """The maxsim artifact validator must (a) pass pristine artifacts,
    (b) catch a corrupted distance, (c) catch a wrong neighbor id whose
    written distance was forged to look consistent (optimality check).
    Local rng: the data must not depend on suite execution order."""
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.validate import validate_maxsim_files

    rng = np.random.default_rng(7)
    dim, k = 8, 3
    q_docs = [rng.standard_normal((int(rng.integers(2, 5)), dim))
              .astype(np.float32) for _ in range(6)]
    b_docs = [rng.standard_normal((int(rng.integers(2, 6)), dim))
              .astype(np.float32) for _ in range(20)]

    # float64 ground truth (the oracle used by every engine test)
    scores = np.array([[ (q.astype(np.float64) @ b.astype(np.float64).T)
                         .max(axis=1).sum() for b in b_docs]
                       for q in q_docs])
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k].astype(np.int32)
    dist = -np.take_along_axis(scores, idx.astype(np.int64), axis=1)

    d = str(tmp_path)
    names = dict(query_vector_fvec="q.fvec", base_vector_fvec="b.fvec",
                 query_doc_map_ivec="qmap.ivec",
                 base_doc_map_ivec="bmap.ivec",
                 indices_ivec="n.ivec", distances_fvec="dist.fvec")
    fvec.write_vectors(f"{d}/q.fvec", np.concatenate(q_docs), "f")
    fvec.write_vectors(f"{d}/b.fvec", np.concatenate(b_docs), "f")
    fvec.write_vectors(f"{d}/qmap.ivec", np.concatenate(
        [np.full(len(t), i, np.int32) for i, t in enumerate(q_docs)])[:, None], "i")
    fvec.write_vectors(f"{d}/bmap.ivec", np.concatenate(
        [np.full(len(t), i, np.int32) for i, t in enumerate(b_docs)])[:, None], "i")
    fvec.write_vectors(f"{d}/n.ivec", idx, "i")
    fvec.write_vectors(f"{d}/dist.fvec", dist.astype(np.float32), "f")

    assert validate_maxsim_files(d, **names) == 0          # pristine

    bad_dist = dist.copy()
    # corrupt the LAST column: keeps per-row monotonicity so the coherence
    # assert cannot preempt the score check this case is about
    bad_dist[2, -1] += 0.25
    fvec.write_vectors(f"{d}/dist.fvec", bad_dist.astype(np.float32), "f")
    assert validate_maxsim_files(d, **names) >= 1

    # forge a consistent-looking wrong neighbor: replace query 0's true
    # best with the WORST passage and write its true (recomputed) score,
    # so the per-neighbor score check passes — only the exhaustive
    # optimality check can catch it
    worst = int(np.argsort(-scores[0])[-1])
    bad_idx, bad_dist = idx.copy(), dist.copy()
    bad_idx[0, 0] = worst
    bad_dist[0, 0] = -scores[0, worst]
    order = np.argsort(bad_dist[0], kind="stable")          # keep monotone
    bad_idx[0], bad_dist[0] = bad_idx[0][order], bad_dist[0][order]
    fvec.write_vectors(f"{d}/n.ivec", bad_idx, "i")
    fvec.write_vectors(f"{d}/dist.fvec", bad_dist.astype(np.float32), "f")
    assert validate_maxsim_files(d, **names) >= 1

    # sampled (non-exhaustive) mode still validates pristine artifacts
    fvec.write_vectors(f"{d}/n.ivec", idx, "i")
    fvec.write_vectors(f"{d}/dist.fvec", dist.astype(np.float32), "f")
    assert validate_maxsim_files(d, exhaustive=False, sample=4, **names) == 0


def test_maxsim_garbage_docs_never_win():
    """Docs containing inf tokens (bad upstream embeddings) produce NaN
    MaxSim scores, and NaN WINS lax.top_k — the bug class fixed for the
    knn engines (test_screened_garbage_base_rows_never_win) existed in the
    exact MaxSim paths too (r3 test review: the fused kernel sanitizes NaN
    negscores, the exact scorer did not). Contract, every engine: any NaN
    in a doc's score makes that doc lose; finite docs rank exactly as the
    float64 oracle says."""
    rng = np.random.default_rng(123)
    dim, k, n_docs = 16, 6, 64
    qs = [rng.standard_normal((3, dim)).astype(np.float32) for _ in range(4)]
    ds = [rng.standard_normal((4, dim)).astype(np.float32)
          for _ in range(n_docs)]
    bad = [5, 17, 18, 40]
    for j, b in enumerate(bad):          # all-inf and mixed-sign inf tokens
        ds[b] = np.full((4, dim), np.inf if j % 2 else -np.inf,
                        dtype=np.float32)
        ds[b][0, ::2] *= -1              # mixed signs -> NaN dots
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)

    finite = [i for i in range(n_docs) if i not in bad]
    exp_s, exp_local = maxsim_oracle(q[:, :, :], qm,
                                     d[finite], dm[finite], k=k)
    exp_idx = np.asarray(finite, dtype=np.int64)[exp_local]

    # exact tiled engine
    s1, i1 = maxsim_topk(q, qm, d, dm, k=k, tile_docs=16)
    np.testing.assert_array_equal(np.asarray(i1), exp_idx)
    np.testing.assert_allclose(np.asarray(s1), exp_s, atol=1e-4)

    # streaming engine (exact auto path on CPU), uneven tiles
    eng = StreamingMaxSim(q, qm, k=k)
    eng.update(d[:40], dm[:40], 0)
    eng.update(d[40:], dm[40:], 40)
    s2, i2 = eng.finalize()
    np.testing.assert_array_equal(np.asarray(i2), exp_idx)

    # dense scorer: garbage docs carry the sentinel losing score, not NaN
    dense = np.asarray(maxsim_scores(q, qm, d, dm))
    assert np.isfinite(dense).all()
    assert (dense[:, bad] <= -1e29).all()

def test_maxsim_subhigh_failures_escalate_to_high_screen(monkeypatch):
    """Sub-high screen tiers whose certificate fails must escalate the
    failed queries to the 3-pass screened engine (~4x cheaper than the
    exact XLA path) and only reach the XLA path if the 3-pass
    certificate fails too — the sound fold-proofed eps fails nearly
    every query at 1/2 passes on concentrated MaxSim scores (measured
    0/1000 and 28/1000 on the 1k x 200k bench), so this route is the
    difference between a 0.5s and a 2.1s production call."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops import maxsim as ms

    rng = np.random.default_rng(77)
    dim, k = 32, 5
    q, qm = pad_token_lists(
        [rng.standard_normal((6, dim)).astype(np.float32)
         for _ in range(9)], dim)
    d, dm = pad_token_lists(
        [rng.standard_normal((8, dim)).astype(np.float32)
         for _ in range(300)], dim)

    tiers_seen = []
    real_select = ms._maxsim_select

    def spy_select(*a, **kw):
        tiers_seen.append(kw.get("passes", 3))
        s, doc_k, ok = real_select(*a, **kw)
        if len(tiers_seen) == 1:          # force the sub-high cert to fail
            ok = jnp.zeros_like(ok)
        return s, doc_k, ok

    xla_calls = []
    real_topk = ms.maxsim_topk

    def spy_topk(*a, **kw):
        xla_calls.append(kw.get("engine", "exact"))
        return real_topk(*a, **kw)

    monkeypatch.setattr(ms, "_maxsim_select", spy_select)
    monkeypatch.setattr(ms, "maxsim_topk", spy_topk)
    scores, idx = ms.maxsim_topk_screened(q, qm, d, dm, k=k,
                                          screen_precision="default")
    assert tiers_seen[0] == 1, "first screen must run the requested tier"
    assert 3 in tiers_seen, "failures must escalate to the 3-pass screen"
    # the 3-pass certificate is clean here, so the XLA path never runs
    assert not xla_calls, "escalation must not fall through to XLA"
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-3)


def test_maxsim_engine_typo_raises():
    """A typo'd engine must error, not silently run the ~21x-slower exact
    path (same contract as ops.knn and the sharded wrappers)."""
    import pytest
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 4, 16)).astype(np.float32)
    qm = np.ones((2, 4), dtype=bool)
    d = rng.standard_normal((32, 6, 16)).astype(np.float32)
    dm = np.ones((32, 6), dtype=bool)
    with pytest.raises(ValueError, match="unknown engine"):
        maxsim_topk(q, qm, d, dm, k=3, engine="screend")
    with pytest.raises(ValueError, match="unknown engine"):
        StreamingMaxSim(q, qm, k=3, engine="Exact").update(d, dm)


def test_compute_maxsim_knn_resumes_from_checkpoint(rng, tmp_path, capsys):
    """Mid-stream resume: a checkpoint taken at 12/23 base docs restores,
    checkpoint-covered parquet ROW GROUPS are skipped at the reader (the
    doc_id column-statistics path — pre-fix every covered batch was fully
    decoded on the 1-vCPU host just to be discarded), and the finished
    stream matches the float64 oracle."""
    import os
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.core.colbert_pipeline import compute_maxsim_knn
    from neighborhoodwatch_tpu.core.pipeline import (
        _save_stream_ckpt, _stream_ckpt_path,
    )
    from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer
    from neighborhoodwatch_tpu.ops.maxsim import StreamingMaxSim
    from neighborhoodwatch_tpu.utils import naming

    dim, k = 16, 4
    cols = [f"token_embedding_{i}" for i in range(dim)]
    data_dir = str(tmp_path)
    (tmp_path / "partial").mkdir()

    def write(filename, docs, chunks=3):
        streamer = ParquetStreamer(filename, cols)
        toks = np.concatenate(docs, axis=0)
        ids = np.concatenate([np.full(len(t), i, np.int32)
                              for i, t in enumerate(docs)])
        # several stream calls -> several row groups, so the resume's
        # row-group statistics skip has something to skip
        step = -(-len(toks) // chunks)
        for s in range(0, len(toks), step):
            streamer.stream_tokens_with_doc_ids(toks[s:s + step],
                                                ids[s:s + step])
        streamer.close()

    q_docs = [rng.standard_normal((rng.integers(2, 6), dim)).astype(np.float32)
              for _ in range(5)]
    b_docs = [rng.standard_normal((rng.integers(2, 9), dim)).astype(np.float32)
              for _ in range(23)]
    qf = f"{data_dir}/q_src.parquet"
    bf = f"{data_dir}/b_src.parquet"
    write(qf, q_docs, chunks=1)
    write(bf, b_docs, chunks=3)
    assert pq.ParquetFile(bf).metadata.num_row_groups >= 3

    # simulate a run that died after the first 12 base docs, mirroring the
    # pipeline's exact fingerprint keys (a subset would silently degrade
    # the resume below to a fresh run)
    done = 12
    q, qm = pad_token_lists(q_docs, dim)
    eng = StreamingMaxSim(q, qm, k=k)
    d_head, dm_head = pad_token_lists(b_docs[:done], dim)
    eng.update(d_head, dm_head)
    st, stq = os.stat(bf), os.stat(qf)
    fingerprint = {"f_mode": "maxsim", "f_k": k, "f_base": bf,
                   "f_q": len(q_docs), "f_dims": dim,
                   "f_qpad": eng.state[0].shape[0], "f_prec": "highest",
                   "f_bsize": st.st_size, "f_bmtime": round(st.st_mtime, 3),
                   "f_qsize": stq.st_size,
                   "f_qmtime": round(stq.st_mtime, 3)}
    _save_stream_ckpt(_stream_ckpt_path(data_dir), eng, fingerprint)

    capsys.readouterr()
    timer, n_q, n_b = compute_maxsim_knn(data_dir, qf, bf, k=k, tile_docs=8,
                                         batch_rows=40)
    assert "resuming MaxSim stream" in capsys.readouterr().out
    assert (n_q, n_b) == (5, 23)

    idx = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    dist = pq.read_table(
        naming.get_partial_distances_filename(data_dir, -1)).to_pandas().values
    d, dm = pad_token_lists(b_docs, dim)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(idx, exp_idx)
    np.testing.assert_allclose(dist, -exp_scores, atol=1e-4)
