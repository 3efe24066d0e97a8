"""End-to-end pipeline on synthetic embeddings: parquet -> kNN -> merge ->
export -> validate (the minimum end-to-end slice, SURVEY.md §7)."""

import numpy as np
import pytest

from neighborhoodwatch_tpu.core.merge import merge_indices_and_distances
from neighborhoodwatch_tpu.core.pipeline import compute_knn, compute_knn_ds
from neighborhoodwatch_tpu.core.tuner import plan_knn, tune_memory
from neighborhoodwatch_tpu.io import fvec
from neighborhoodwatch_tpu.io.export import generate_output_files
from neighborhoodwatch_tpu.io.parquet_io import ParquetStreamer, cleanup_partial_parquet
from neighborhoodwatch_tpu.ops.knn import knn
from neighborhoodwatch_tpu.utils import naming
from neighborhoodwatch_tpu.validate import validate_files_v0, validate_files

from tests.conftest import QUERY_COUNT, BASE_COUNT, K, DIMENSIONS

MODEL = "intfloat/e5-small-v2"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory, normalized_vectors):
    """Write synthetic query/base embedding parquet files in the real
    output-tree layout."""
    root = tmp_path_factory.mktemp("knn_dataset")
    data_dir = naming.setup_model_output_folder(
        str(root), MODEL, QUERY_COUNT, BASE_COUNT, K)
    q, b = normalized_vectors
    qfile = naming.get_source_query_dataset_filename(
        data_dir, MODEL, QUERY_COUNT, DIMENSIONS)
    bfile = naming.get_source_base_dataset_filename(
        data_dir, MODEL, BASE_COUNT, DIMENSIONS)
    with ParquetStreamer(qfile, ["title", "question"]) as ps:
        ps.stream_to_parquet([["t", f"q{i}"] for i in range(len(q))], q)
    with ParquetStreamer(bfile, ["title", "text"]) as ps:
        ps.stream_to_parquet([["t", f"d{i}"] for i in range(len(b))], b)
    return data_dir, qfile, bfile


def test_table_path_end_to_end(dataset_dir, normalized_vectors):
    data_dir, qfile, bfile = dataset_dir
    q, b = normalized_vectors
    cleanup_partial_parquet(f"{data_dir}/partial")

    compute_knn(data_dir, MODEL, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                BASE_COUNT, mem_tune=False, k=K, initial_batch_size=300)
    merge_indices_and_distances(data_dir, k=K)

    files = generate_output_files(
        data_dir, naming.get_model_prefix(MODEL), DIMENSIONS, bfile, qfile,
        BASE_COUNT, QUERY_COUNT,
        naming.get_partial_indices_filename(data_dir, -1),
        naming.get_partial_distances_filename(data_dir, -1),
        K, output_hdf5=True)
    qf, bf, inf, df = files

    # files exist with right counts
    assert fvec.count_vectors(data_dir, qf) == QUERY_COUNT
    assert fvec.count_vectors(data_dir, bf) == BASE_COUNT
    assert fvec.count_vectors(data_dir, inf) == QUERY_COUNT
    assert fvec.count_vectors(data_dir, df) == QUERY_COUNT

    # exact vs oracle
    ref_d, ref_i = knn(q, b, k=K)
    got_i = fvec.read_vectors(naming.get_full_filename(data_dir, inf))
    got_d = fvec.read_vectors(naming.get_full_filename(data_dir, df))
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))
    np.testing.assert_allclose(got_d, np.asarray(ref_d), atol=1e-5)

    # raft-convention validator passes on normalized vectors
    assert validate_files_v0(data_dir, qf, bf, inf, df) == 0

    # hdf5 groups present
    import h5py
    h5 = naming.get_hdf5_filename(data_dir, naming.get_model_prefix(MODEL),
                                  DIMENSIONS, BASE_COUNT, QUERY_COUNT, K)
    with h5py.File(h5, "r") as f:
        assert set(f.keys()) == {"train", "test", "neighbors", "distances"}
        assert f["train"].shape == (BASE_COUNT, DIMENSIONS)
        assert f["neighbors"].shape == (QUERY_COUNT, K)


def test_dataset_path_streaming(dataset_dir, normalized_vectors):
    data_dir, qfile, bfile = dataset_dir
    q, b = normalized_vectors
    cleanup_partial_parquet(f"{data_dir}/partial")

    compute_knn_ds(data_dir, DIMENSIONS, qfile, QUERY_COUNT, bfile, BASE_COUNT,
                   k=K, initial_batch_size=250)
    import pyarrow.parquet as pq
    got_i = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    got_d = pq.read_table(
        naming.get_partial_distances_filename(data_dir, -1)).to_pandas().values
    ref_d, ref_i = knn(q, b, k=K)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))
    np.testing.assert_allclose(got_d, np.asarray(ref_d), atol=1e-5)


def test_cosine_metric_validator(dataset_dir, normalized_vectors):
    """cosine-convention pipeline passes the v1 validator."""
    data_dir, qfile, bfile = dataset_dir
    cleanup_partial_parquet(f"{data_dir}/partial")
    compute_knn_ds(data_dir, DIMENSIONS, qfile, QUERY_COUNT, bfile, BASE_COUNT,
                   k=K, metric="cosine")
    prefix = naming.get_model_prefix(MODEL) + "cos"
    files = generate_output_files(
        data_dir, prefix, DIMENSIONS, bfile, qfile, BASE_COUNT, QUERY_COUNT,
        naming.get_partial_indices_filename(data_dir, -1),
        naming.get_partial_distances_filename(data_dir, -1),
        K, output_hdf5=False)
    qf, bf, inf, df = files
    assert validate_files(data_dir, qf, bf, inf, df) == 0


def test_validator_four_engine_crosscheck_on_planted_corruption(
        dataset_dir, normalized_vectors, capsys):
    """Reference parity for the mismatch escalation
    (parquet_to_format.py:427-466): a planted distance corruption must
    (a) be counted, and (b) trigger all FOUR labeled independent
    cross-check engines — exact device rebuild, verified device engine,
    float64 numpy, pairwise — whose outputs agree with each other and
    expose the corrupt file value."""
    data_dir, qfile, bfile = dataset_dir
    cleanup_partial_parquet(f"{data_dir}/partial")
    compute_knn_ds(data_dir, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                   BASE_COUNT, k=K, metric="cosine")
    prefix = naming.get_model_prefix(MODEL) + "corr"
    files = generate_output_files(
        data_dir, prefix, DIMENSIONS, bfile, qfile, BASE_COUNT, QUERY_COUNT,
        naming.get_partial_indices_filename(data_dir, -1),
        naming.get_partial_distances_filename(data_dir, -1),
        K, output_hdf5=False)
    qf, bf, inf, df = files

    # corrupt the LAST distance column of two rows upward (preserves
    # per-row monotonicity so the coherence assert still passes and the
    # cross-check engines are what must catch it)
    dpath = naming.get_full_filename(data_dir, df)
    d = fvec.read_vectors(dpath)
    d[1, -1] += 0.25
    d[3, -1] += 0.25
    fvec.write_vectors(dpath, d)

    mismatches = validate_files(data_dir, qf, bf, inf, df)
    out = capsys.readouterr().out
    assert mismatches == 2, out
    for label in ("[1/4 exact-device]", "[2/4 verified-device]",
                  "[3/4 float64-numpy]", "[4/4 pairwise]"):
        assert label in out, f"missing cross-check engine {label}:\n{out}"
    # engine agreement: the four independent recomputes of query 1's
    # distances appear and the corrupted file value is visibly larger
    assert "query 1 vs file" in out and "query 3 vs file" in out


def test_tuner_plans_are_deterministic():
    p1 = plan_knn(10_000, 1536, 100, base_count=10_000_000)
    p2 = plan_knn(10_000, 1536, 100, base_count=10_000_000)
    assert p1 == p2
    assert p1.tile_size % 1024 == 0
    assert p1.batch_size >= p1.tile_size
    assert p1.est_bytes < p1.bytes_limit

    bs = tune_memory(5000, 100, 384, 10, initial_batch_size=100_000,
                     max_memory_threshold=0.1)
    assert 0 < bs <= 5000 + 1024


def test_streaming_checkpoint_resume(dataset_dir, normalized_vectors,
                                     capsys):
    """An interrupted stream resumes from partial/stream_state.npz and
    produces results identical to a fresh run; mismatched fingerprints —
    including a same-name same-count REGENERATED base (different
    size/mtime, r3 review) — are ignored."""
    import os
    from neighborhoodwatch_tpu.core.pipeline import (
        _load_stream_ckpt, _save_stream_ckpt, _stream_ckpt_path,
    )
    from neighborhoodwatch_tpu.ops.knn import StreamingKNN

    data_dir, qfile, bfile = dataset_dir
    q, b = normalized_vectors
    cleanup_partial_parquet(f"{data_dir}/partial")

    # simulate a run that died after the first 400 base rows, using the
    # SAME fingerprint keys the pipeline builds (the content-identity and
    # state-shape keys included — a hand-rolled subset would make the
    # resume below silently degrade to a fresh run)
    st = os.stat(naming.get_full_filename(data_dir, bfile))
    stq = os.stat(naming.get_full_filename(data_dir, qfile))
    fingerprint = {"f_k": K, "f_metric": "sqeuclidean", "f_dims": DIMENSIONS,
                   "f_base": bfile, "f_nbase": BASE_COUNT, "f_q": QUERY_COUNT,
                   "f_prec": "highest",
                   "f_bsize": st.st_size, "f_bmtime": round(st.st_mtime, 3),
                   "f_qsize": stq.st_size,
                   "f_qmtime": round(stq.st_mtime, 3),
                   "f_qpad": QUERY_COUNT}
    acc = StreamingKNN(q, k=K)
    acc.update(b[:400], 0)
    ckpt = _stream_ckpt_path(data_dir)
    _save_stream_ckpt(ckpt, acc, fingerprint)
    assert _load_stream_ckpt(ckpt, fingerprint) is not None
    assert _load_stream_ckpt(ckpt, {**fingerprint, "f_k": K + 1}) is None
    # a regenerated base (same name/counts, different stat) must NOT resume
    assert _load_stream_ckpt(
        ckpt, {**fingerprint, "f_bmtime": fingerprint["f_bmtime"] + 1}) is None
    # ... nor a regenerated QUERY file: its checkpointed per-query state
    # was computed from the OLD embeddings (r3 review — both sides)
    assert _load_stream_ckpt(
        ckpt, {**fingerprint, "f_qmtime": fingerprint["f_qmtime"] + 1}) is None
    # ... nor a run at a different matmul precision: resuming would mix
    # arithmetic regimes in one output (r3 review)
    assert _load_stream_ckpt(
        ckpt, {**fingerprint, "f_prec": "default"}) is None

    capsys.readouterr()
    compute_knn_ds(data_dir, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                   BASE_COUNT, k=K, initial_batch_size=200)
    # the checkpoint must have actually engaged (fingerprint parity with
    # the pipeline's own construction)
    assert "resuming kNN stream from checkpoint: 400" in capsys.readouterr().out
    import pyarrow.parquet as pq
    got_i = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    ref_d, ref_i = knn(q, b, k=K)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))
    assert not os.path.exists(ckpt)  # consumed on success


def test_table_path_streams_base_larger_than_hbm_plan(dataset_dir,
                                                      normalized_vectors,
                                                      monkeypatch):
    """The table path must keep the base HOST-resident and device_put only
    plan-sized batches (VERDICT r1 weak #2: it used to device_put the whole
    corpus, so a 61 GB base could never run on a 16 GB chip). With a
    monkeypatched tiny HBM plan the base exceeds the per-step budget many
    times over; every device transfer must respect it and the merged result
    must still match the oracle."""
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.core import pipeline as P
    from neighborhoodwatch_tpu.core.tuner import KnnPlan

    tiny = KnnPlan(batch_size=128, tile_size=128, query_block=QUERY_COUNT,
                   bytes_limit=1 << 20, est_bytes=1 << 19)
    monkeypatch.setattr(P, "plan_knn", lambda *a, **kw: tiny)

    widths = []
    real = P._batch_to_device

    def spy(base_t, offset, batch_size):
        out = real(base_t, offset, batch_size)
        widths.append(out.shape[0])
        return out

    monkeypatch.setattr(P, "_batch_to_device", spy)

    data_dir, qfile, bfile = dataset_dir
    q, b = normalized_vectors
    cleanup_partial_parquet(f"{data_dir}/partial")
    compute_knn(data_dir, MODEL, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                BASE_COUNT, k=K)
    assert len(widths) == -(-BASE_COUNT // 128)  # truly batched
    assert max(widths) <= 128                    # never the whole base
    merge_indices_and_distances(data_dir, k=K)
    got_i = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    ref_d, ref_i = knn(q, b, k=K)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))


def test_table_path_query_split(dataset_dir, normalized_vectors):
    """Query-axis splitting preserves the exact partial-file layout."""
    import pyarrow.parquet as pq

    data_dir, qfile, bfile = dataset_dir
    q, b = normalized_vectors
    cleanup_partial_parquet(f"{data_dir}/partial")
    compute_knn(data_dir, MODEL, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                BASE_COUNT, k=K, initial_batch_size=300, query_split_rows=33)
    merge_indices_and_distances(data_dir, k=K)
    got_i = pq.read_table(
        naming.get_partial_indices_filename(data_dir, -1)).to_pandas().values
    ref_d, ref_i = knn(q, b, k=K)
    np.testing.assert_array_equal(got_i, np.asarray(ref_i))


def test_validator_large_base_path(dataset_dir, normalized_vectors,
                                   monkeypatch):
    """validate_files_v0 over the selected-row (big-base) read path gives
    the same verdict as the in-memory path."""
    from neighborhoodwatch_tpu import validate as V

    data_dir, qfile, bfile = dataset_dir
    cleanup_partial_parquet(f"{data_dir}/partial")
    compute_knn(data_dir, MODEL, DIMENSIONS, qfile, QUERY_COUNT, bfile,
                BASE_COUNT, k=K, initial_batch_size=300)
    merge_indices_and_distances(data_dir, k=K)
    files = generate_output_files(
        data_dir, naming.get_model_prefix(MODEL) + "big", DIMENSIONS, bfile,
        qfile, BASE_COUNT, QUERY_COUNT,
        naming.get_partial_indices_filename(data_dir, -1),
        naming.get_partial_distances_filename(data_dir, -1),
        K, output_hdf5=False)
    qf, bf, inf, df = files
    monkeypatch.setattr(V, "_SELECTED_READ_ROWS", 10)
    assert V.validate_files_v0(data_dir, qf, bf, inf, df) == 0
