"""Format round-trip tests: fvec/ivec byte-exactness, hdf5 groups, parquet
streamer schema, naming parity (model of reference tests/test_04_gen_ifvec_hdf5.py)."""

import os
import struct

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from neighborhoodwatch_tpu.io import fvec
from neighborhoodwatch_tpu.io.hdf5_io import write_hdf5, read_hdf5_group, find_duplicates
from neighborhoodwatch_tpu.io.parquet_io import (
    ParquetStreamer, embedding_column_names, read_embeddings,
    iter_embedding_batches, write_matrix_to_parquet, count_partial_files,
    cleanup_partial_parquet,
)
from neighborhoodwatch_tpu.utils import naming


def _reference_fvec_bytes(data: np.ndarray, type_char: str) -> bytes:
    """Reproduce the reference's per-row writer byte-for-byte
    (reference: parquet_to_format.py:84-89)."""
    out = b""
    for row in data:
        vec = row.astype(np.int32) if type_char == "i" else row.astype(np.float32)
        out += len(vec).to_bytes(4, "little") + vec.tobytes()
    return out


def test_fvec_bytes_bit_exact(tmp_path, rng):
    data = rng.standard_normal((17, 24)).astype(np.float32)
    path = str(tmp_path / "x.fvec")
    fvec.write_vectors(path, data)
    with open(path, "rb") as f:
        assert f.read() == _reference_fvec_bytes(data, "f")


def test_ivec_bytes_bit_exact(tmp_path, rng):
    data = rng.integers(0, 1_000_000, size=(11, 10)).astype(np.int64)
    path = str(tmp_path / "x.ivec")
    fvec.write_vectors(path, data)
    with open(path, "rb") as f:
        assert f.read() == _reference_fvec_bytes(data, "i")


def test_fvec_roundtrip_and_random_access(tmp_path, rng):
    data = rng.standard_normal((50, 12)).astype(np.float32)
    path = str(tmp_path / "v.fvec")
    fvec.write_vectors(path, data)
    back = fvec.read_vectors(path)
    np.testing.assert_array_equal(back, data)
    assert fvec.count_vectors(str(tmp_path), "v.fvec") == 50
    v7 = fvec.get_nth_vector(str(tmp_path), "v.fvec", 7)
    np.testing.assert_allclose(np.array(v7, dtype=np.float32), data[7], rtol=0)
    assert fvec.get_first_vector(str(tmp_path), "v.fvec") == tuple(data[0])


def test_fvec_append_streaming(tmp_path, rng):
    a = rng.standard_normal((5, 8)).astype(np.float32)
    b = rng.standard_normal((3, 8)).astype(np.float32)
    path = str(tmp_path / "s.fvec")
    fvec.write_vectors(path, a)
    fvec.append_vectors(path, b)
    np.testing.assert_array_equal(fvec.read_vectors(path), np.vstack([a, b]))


def test_write_from_dataframe_tolerates_rownum(tmp_path, rng):
    data = rng.standard_normal((6, 4)).astype(np.float32)
    df = pd.DataFrame(data, columns=[f"{i}" for i in range(4)])
    df["RowNum"] = np.arange(6)
    fvec.write_ivec_fvec_from_dataframe(str(tmp_path), "m", "r.fvec", df, "f", 4)
    np.testing.assert_array_equal(fvec.read_vectors(str(tmp_path / "r.fvec")), data)


def test_hdf5_groups_and_idempotency(tmp_path, rng):
    train = rng.standard_normal((20, 8)).astype(np.float32)
    test = rng.standard_normal((4, 8)).astype(np.float32)
    path = str(tmp_path / "gt.hdf5")
    write_hdf5(str(tmp_path), "m", train, path, "train")
    write_hdf5(str(tmp_path), "m", test, path, "test")
    # second write is a group-level no-op (resume semantics)
    write_hdf5(str(tmp_path), "m", test * 2, path, "test")
    np.testing.assert_array_equal(read_hdf5_group(str(tmp_path), path, "test"), test)
    np.testing.assert_array_equal(read_hdf5_group(str(tmp_path), path, "train"), train)


def test_hdf5_voyage_binary_encoding(tmp_path, rng):
    data = rng.integers(-128, 127, size=(5, 16)).astype(np.int8)
    path = str(tmp_path / "v.hdf5")
    write_hdf5(str(tmp_path), "voyage-3-large", data, path, "train",
               output_dtype="binary")
    import h5py
    with h5py.File(path, "r") as f:
        assert f["train"].dtype == np.int8
        assert f["train"].attrs["encoding"] == "binary_int8"


def test_hdf5_dupe_detector(tmp_path):
    data = np.array([[1, 2], [1, 2], [3, 4]], dtype=np.float32)
    path = str(tmp_path / "d.hdf5")
    write_hdf5(str(tmp_path), "m", data, path, "train")
    rep = find_duplicates(path, groups=("train",))
    assert rep["train"]["duplicate_groups"] == 1
    assert rep["train"]["duplicate_rows"] == 1


def test_parquet_streamer_schema(tmp_path, rng):
    emb = rng.standard_normal((7, 5)).astype(np.float32)
    meta = [[f"title{i}", f"text{i}"] for i in range(7)]
    path = str(tmp_path / "e.parquet")
    with ParquetStreamer(path, ["title", "text"]) as ps:
        ps.stream_to_parquet(meta, emb)
        ps.stream_to_parquet(meta, emb)
    table = pq.read_table(path)
    assert table.num_rows == 14
    cols = embedding_column_names(table)
    assert cols == [f"embedding_{i}" for i in range(5)]
    assert table.schema.field("embedding_0").type == "float"
    mat = read_embeddings(str(tmp_path), "e.parquet")
    np.testing.assert_allclose(mat, np.vstack([emb, emb]), rtol=0)


def test_parquet_streamer_atomic_rename(tmp_path, rng):
    """A killed embedding run must never leave a footerless parquet at the
    FINAL path, and the resume probe must never delete another writer's
    in-flight file (r3 review): ParquetStreamer writes <path>.inprogress
    and os.replace()s on close."""
    from neighborhoodwatch_tpu.data.sources import _valid_parquet
    emb = rng.standard_normal((5, 3)).astype(np.float32)
    path = str(tmp_path / "a.parquet")

    # simulate a kill: stream rows, never close
    ps = ParquetStreamer(path, ["title"])
    ps.stream_to_parquet([["t"]] * 5, emb)
    assert not os.path.exists(path)              # nothing at the final path
    assert os.path.exists(path + ".inprogress")  # the half-write lives here
    assert not _valid_parquet(path)              # resume probe: regenerate

    # a foreign/legacy corrupt file at the final path: probe says invalid
    # but does NOT delete it (it may belong to a concurrent run)
    with open(path, "wb") as f:
        f.write(b"PAR1 not a real footer")
    assert not _valid_parquet(path)
    assert os.path.exists(path)

    # the regenerating run atomically supersedes it
    with ParquetStreamer(path, ["title"]) as ps2:
        ps2.stream_to_parquet([["t"]] * 5, emb)
    assert _valid_parquet(path)
    assert not os.path.exists(path + ".inprogress")
    mat = read_embeddings(str(tmp_path), "a.parquet")
    np.testing.assert_allclose(mat, emb, rtol=0)


def test_parquet_streamer_exception_discards_partial(tmp_path, rng):
    """An exception inside the with-block must NOT publish the partial
    stream: a truncated-but-footered parquet at the final path would make
    the resume guards silently reuse 10% of a dataset as complete
    (r3 review). close() must also be idempotent (explicit close inside a
    with-block used to crash the second os.replace)."""
    from neighborhoodwatch_tpu.data.sources import _valid_parquet
    emb = rng.standard_normal((5, 3)).astype(np.float32)
    path = str(tmp_path / "x.parquet")
    with pytest.raises(RuntimeError):
        with ParquetStreamer(path, ["title"]) as ps:
            ps.stream_to_parquet([["t"]] * 5, emb)
            raise RuntimeError("embedding loop died")
    assert not os.path.exists(path)              # partial never published
    assert not os.path.exists(path + ".inprogress")   # and not leaked
    assert not _valid_parquet(path)

    # explicit close inside a with-block: second close is a no-op
    with ParquetStreamer(path, ["title"]) as ps:
        ps.stream_to_parquet([["t"]] * 5, emb)
        ps.close()
        ps.close()
    assert _valid_parquet(path)
    mat = read_embeddings(str(tmp_path), "x.parquet")
    np.testing.assert_allclose(mat, emb, rtol=0)

    # exception AFTER an explicit close must not unpublish the file
    with pytest.raises(RuntimeError):
        with ParquetStreamer(str(tmp_path / "y.parquet"), ["title"]) as ps:
            ps.stream_to_parquet([["t"]] * 5, emb)
            ps.close()
            raise RuntimeError("post-close failure")
    assert _valid_parquet(str(tmp_path / "y.parquet"))


def test_parquet_token_streamer(tmp_path, rng):
    emb = rng.standard_normal((9, 4)).astype(np.float32)
    cols = [f"token_embedding_{i}" for i in range(4)]
    path = str(tmp_path / "t.parquet")
    with ParquetStreamer(path, cols) as ps:
        ps.stream_to_parquet_without_src_metadata(emb)
    mat = read_embeddings(str(tmp_path), "t.parquet")
    np.testing.assert_allclose(mat, emb, rtol=0)


def test_iter_embedding_batches(tmp_path, rng):
    emb = rng.standard_normal((25, 3)).astype(np.float32)
    path = str(tmp_path / "b.parquet")
    with ParquetStreamer(path, ["title"]) as ps:
        ps.stream_to_parquet([["t"]] * 25, emb)
    got = list(iter_embedding_batches(str(tmp_path), "b.parquet", batch_size=10))
    assert [o for o, _ in got] == [0, 10, 20]
    np.testing.assert_allclose(np.vstack([m for _, m in got]), emb, rtol=0)
    # with count clamp
    got = list(iter_embedding_batches(str(tmp_path), "b.parquet", batch_size=10, count=15))
    assert sum(len(m) for _, m in got) == 15
    # count an EXACT batch multiple with rows left in the file: must stop
    # AT count — the old `>` test yielded a zero-width batch that crashed
    # the kNN fold (r3 review, reproduced)
    got = list(iter_embedding_batches(str(tmp_path), "b.parquet",
                                      batch_size=10, count=20))
    assert [(o, len(m)) for o, m in got] == [(0, 10), (10, 10)]
    np.testing.assert_allclose(np.vstack([m for _, m in got]), emb[:20],
                               rtol=0)


def test_partial_file_helpers(tmp_path, rng):
    partial = tmp_path / "partial"
    partial.mkdir()
    for i in range(3):
        write_matrix_to_parquet(str(partial / f"indices{i}.parquet"),
                                rng.integers(0, 10, (4, 2)))
    assert count_partial_files(str(partial)) == 3
    cleanup_partial_parquet(str(partial))
    assert count_partial_files(str(partial)) == 0


def test_naming_parity(tmp_path):
    """Path scheme matches reference nw_utils.py:62-154 exactly."""
    home = naming.get_model_data_homedir("out", "intfloat/e5-small-v2", 100, 1000, 10)
    assert home == "out/intfloat_e5-small-v2/q100_b1000_k10"
    d = naming.setup_model_output_folder(str(tmp_path), "m", 1, 2, 3)
    assert (tmp_path / "m" / "q1_b2_k3" / "partial").is_dir()
    assert naming.get_partial_indices_filename(d, 5) == f"{d}/partial/indices5.parquet"
    assert naming.get_partial_indices_filename(d, -1) == f"{d}/partial/final_indices.parquet"
    assert naming.get_partial_distances_filename(d, -1) == f"{d}/partial/final_distances.parquet"
    q, b, i, dist = naming.get_ivec_fvec_filenames(d, "intfloat/e5-small-v2", 384,
                                                   1000, 100, 10)
    assert q.endswith("intfloat_e5-small-v2_384_query_vectors_100.fvec")
    assert b.endswith("intfloat_e5-small-v2_384_base_vectors_1000.fvec")
    assert i.endswith("intfloat_e5-small-v2_384_indices_b1000_q100_k10.ivec")
    assert dist.endswith("intfloat_e5-small-v2_384_distances_b1000_q100_k10.fvec")
    h = naming.get_hdf5_filename(d, "m", 384, 1000, 100, 10, output_dtype="int8")
    assert h.endswith("m_384_int8_base_1000_query_100_k10.hdf5")
    assert naming.get_source_query_dataset_filename(d, "m", 100, 384) \
        == f"{d}/m_384_query_vector_data_100.parquet"
    assert naming.get_source_base_dataset_filename(d, "m", 100, 384, "int8") \
        == f"{d}/m_384_int8_base_vector_data_100.parquet"


def test_table_to_colmajor_matches_matrix(tmp_path):
    """(d, n) col-major fast path == transposed (n, d) path, including
    column order and multi-chunk tables."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.io.parquet_io import (
        iter_embedding_batches, table_to_colmajor, table_to_matrix,
    )

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((257, 8)).astype(np.float32)
    tab = pa.table({f"embedding_{i}": mat[:, i] for i in range(8)})
    # two chunks to exercise the batch loop
    tab = pa.concat_tables([tab.slice(0, 100), tab.slice(100)])
    np.testing.assert_array_equal(table_to_colmajor(tab), mat.T)
    np.testing.assert_array_equal(table_to_matrix(tab), mat)

    f = str(tmp_path / "emb.parquet")
    pq.write_table(tab, f)
    rows = list(iter_embedding_batches(str(tmp_path), "emb.parquet",
                                       batch_size=64, count=200,
                                       layout="col"))
    got = np.concatenate([m for _, m in rows], axis=1)
    np.testing.assert_array_equal(got, mat[:200].T)
    assert [off for off, _ in rows] == [0, 64, 128, 192]


def test_streaming_base_export_matches_direct(tmp_path):
    """Out-of-core base export (fvec append + hdf5 slabs) is byte-identical
    to the whole-DataFrame path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import h5py
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.io.export import (
        _generate_base_vectors_streaming, generate_base_vectors_fvec,
    )

    rng = np.random.default_rng(5)
    mat = rng.standard_normal((517, 12)).astype(np.float32)
    data_dir = str(tmp_path)
    pq.write_table(pa.table({f"embedding_{i}": mat[:, i] for i in range(12)}),
                   f"{data_dir}/b.parquet")

    generate_base_vectors_fvec(data_dir, "m", "b.parquet", 517, 12,
                               "direct.fvec", output_hdf5=True,
                               hdf5_file="direct.hdf5")
    _generate_base_vectors_streaming(data_dir, "m", "b.parquet", 517, 12,
                                     "streamed.fvec", True, None,
                                     "streamed.hdf5", None, batch_rows=100)

    a = open(f"{data_dir}/direct.fvec", "rb").read()
    b = open(f"{data_dir}/streamed.fvec", "rb").read()
    assert a == b and len(a) == 517 * (1 + 12) * 4
    with h5py.File(f"{data_dir}/direct.hdf5") as f1, \
         h5py.File(f"{data_dir}/streamed.hdf5") as f2:
        np.testing.assert_array_equal(np.asarray(f1["train"]),
                                      np.asarray(f2["train"]))
        assert "_streaming" not in f2["train"].attrs

    # resume: a second streamed run is a no-op (files unchanged)
    _generate_base_vectors_streaming(data_dir, "m", "b.parquet", 517, 12,
                                     "streamed.fvec", True, None,
                                     "streamed.hdf5", None, batch_rows=100)
    assert open(f"{data_dir}/streamed.fvec", "rb").read() == b


def test_streaming_fvec_export_crash_leaves_no_final_file(tmp_path,
                                                          monkeypatch):
    """A killed streamed export must not leave a truncated FINAL fvec:
    batches land in a '.streaming' temp renamed only after the last batch
    (r3 review — the fvec analog of the hdf5 _streaming marker), so the
    rerun regenerates instead of shipping a silently short corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.io.export import (
        _generate_base_vectors_streaming,
    )

    rng = np.random.default_rng(7)
    mat = rng.standard_normal((300, 5)).astype(np.float32)
    data_dir = str(tmp_path)
    pq.write_table(pa.table({f"embedding_{i}": mat[:, i] for i in range(5)}),
                   f"{data_dir}/b.parquet")

    real_append = fvec.append_vectors

    def crashing_append(*a, **k):
        raise RuntimeError("killed mid-export")

    monkeypatch.setattr(fvec, "append_vectors", crashing_append)
    with pytest.raises(RuntimeError):
        _generate_base_vectors_streaming(data_dir, "m", "b.parquet", 300,
                                         5, "base.fvec", False, None, None,
                                         None, batch_rows=100)
    import os
    assert not os.path.exists(f"{data_dir}/base.fvec")   # nothing final
    assert os.path.exists(f"{data_dir}/base.fvec.streaming")

    # rerun completes and is byte-identical to a clean streamed export
    monkeypatch.setattr(fvec, "append_vectors", real_append)
    _generate_base_vectors_streaming(data_dir, "m", "b.parquet", 300, 5,
                                     "base.fvec", False, None, None, None,
                                     batch_rows=100)
    got = open(f"{data_dir}/base.fvec", "rb").read()
    fvec.write_vectors(f"{data_dir}/ref.fvec", mat, "f")
    assert got == open(f"{data_dir}/ref.fvec", "rb").read()
    assert not os.path.exists(f"{data_dir}/base.fvec.streaming")


def test_read_selected_matches_full(tmp_path):
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((1000, 6)).astype(np.float32)
    f = str(tmp_path / "m.fvec")
    fvec.write_vectors(f, mat, "f")
    ids = np.array([[999, 0, 512], [7, 7, 123]])
    got = fvec.read_selected(f, ids)
    np.testing.assert_array_equal(got, mat[ids])
    # validators use the large-base path when forced
    from neighborhoodwatch_tpu import validate as V
    old = V._SELECTED_READ_ROWS
    try:
        V._SELECTED_READ_ROWS = 10
        nb, base = V._base_neighbor_vectors(str(tmp_path), "m.fvec", ids)
        assert base is None
        np.testing.assert_array_equal(nb, mat[ids])
    finally:
        V._SELECTED_READ_ROWS = old


def test_hdf5_slab_crashed_stream_restarts(tmp_path):
    """A leftover _streaming marker from a crashed export must trigger a
    restart-from-scratch, not a silent 'already exists' no-op that keeps
    zero rows past the crash point (ADVICE r1)."""
    import h5py
    from neighborhoodwatch_tpu.io.hdf5_io import write_hdf5_slab

    data_dir = str(tmp_path)
    rng = np.random.default_rng(9)
    full = rng.standard_normal((200, 8)).astype(np.float32)

    # simulate a crash: only the first slab of a 200-row export lands
    assert write_hdf5_slab(data_dir, "m", full[:100], "x.hdf5", "train",
                           total_rows=200, offset=0)
    with h5py.File(f"{data_dir}/x.hdf5") as f:
        assert f["train"].attrs.get("_streaming") == 1

    # rerun from scratch: must recreate and complete
    assert write_hdf5_slab(data_dir, "m", full[:100], "x.hdf5", "train",
                           total_rows=200, offset=0)
    assert write_hdf5_slab(data_dir, "m", full[100:], "x.hdf5", "train",
                           total_rows=200, offset=100)
    with h5py.File(f"{data_dir}/x.hdf5") as f:
        np.testing.assert_array_equal(np.asarray(f["train"]), full)
        assert "_streaming" not in f["train"].attrs

    # complete export: further slabs are a no-op
    assert not write_hdf5_slab(data_dir, "m", np.zeros((100, 8), np.float32),
                               "x.hdf5", "train", total_rows=200, offset=0)
    with h5py.File(f"{data_dir}/x.hdf5") as f:
        np.testing.assert_array_equal(np.asarray(f["train"]), full)


def test_export_rerun_skips_parquet_reads(tmp_path, monkeypatch):
    """On an idempotent rerun with the fvec AND hdf5 group complete, the
    exporters must not decode the input parquet at all (r3 review: a
    262k x 1536 query table costs minutes on a weak host just to print
    'already exists')."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.io import export as E

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((40, 6)).astype(np.float32)
    data_dir = str(tmp_path)
    pq.write_table(pa.table({f"embedding_{i}": mat[:, i] for i in range(6)}),
                   f"{data_dir}/q.parquet")
    idx = rng.integers(0, 40, (9, 4)).astype(np.int32)
    pq.write_table(pa.table({f"c{i}": idx[:, i] for i in range(4)}),
                   f"{data_dir}/i.parquet")

    E.generate_query_vectors_fvec(data_dir, "m", "q.parquet", 40, 6,
                                  f"{data_dir}/q.fvec", True, None, "g.hdf5")
    E.generate_indices_ivec(data_dir, "m", "i.parquet", 4, f"{data_dir}/i.ivec",
                            True, "g.hdf5")

    def boom(*a, **k):
        raise AssertionError("rerun must not read the input parquet")

    monkeypatch.setattr(E, "read_and_extract", boom)
    monkeypatch.setattr(E, "read_parquet_to_dataframe", boom)
    E.generate_query_vectors_fvec(data_dir, "m", "q.parquet", 40, 6,
                                  f"{data_dir}/q.fvec", True, None, "g.hdf5")
    E.generate_indices_ivec(data_dir, "m", "i.parquet", 4, f"{data_dir}/i.ivec",
                            True, "g.hdf5")
    # with hdf5 disabled, a complete fvec alone must also skip the read
    E.generate_query_vectors_fvec(data_dir, "m", "q.parquet", 40, 6,
                                  f"{data_dir}/q.fvec", False, None, None)


def test_streaming_export_rejects_width_mismatch(tmp_path):
    """The streamed base export must enforce the configured dimensions
    like the non-streaming path does (r3 review: a 6-wide parquet exported
    under dimensions=12 silently contradicted the `_12_` in every
    filename)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from neighborhoodwatch_tpu.io.export import _generate_base_vectors_streaming

    rng = np.random.default_rng(13)
    mat = rng.standard_normal((50, 6)).astype(np.float32)
    data_dir = str(tmp_path)
    pq.write_table(pa.table({f"embedding_{i}": mat[:, i] for i in range(6)}),
                   f"{data_dir}/b.parquet")
    with pytest.raises(AssertionError, match="embedding width"):
        _generate_base_vectors_streaming(data_dir, "m", "b.parquet", 50, 12,
                                         "b.fvec", False, None, None, None,
                                         batch_rows=20)


def test_iter_vector_batches_rejects_truncated_file(tmp_path, monkeypatch):
    """The streaming reader's fallback must reject a truncated trailing
    row like read_vectors does — floor-dividing the size silently dropped
    the partial row, so streaming and whole-file consumers disagreed on
    the corpus (r3 review)."""
    monkeypatch.setenv("NW_TPU_NATIVE", "0")
    rng = np.random.default_rng(9)
    path = str(tmp_path / "t.fvec")
    fvec.write_vectors(path, rng.standard_normal((6, 5)).astype(np.float32), "f")
    with open(path, "ab") as f:
        f.write(b"\x05\x00\x00\x00" + b"\x00" * 8)   # header + 2 of 5 words
    with pytest.raises(AssertionError, match="truncated"):
        list(fvec.iter_vector_batches(path, 4))


def test_iter_embedding_batches_start_row_skips_row_groups(tmp_path, rng):
    """Resume must skip covered parquet row groups at the reader — the old
    scan decoded every covered batch from row 0 just to discard it
    (r3 review). Yields may begin before start_row (straddling row
    group) but never a whole group below it, and the surviving rows must
    be identical to the full scan's."""
    from neighborhoodwatch_tpu.io.parquet_io import (
        iter_embedding_batches, write_matrix_to_parquet,
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    mat = rng.standard_normal((1000, 4)).astype(np.float32)
    path = str(tmp_path / "m.parquet")
    w = pq.ParquetWriter(path, pa.table(
        {f"embedding_{i}": mat[:100, i] for i in range(4)}).schema)
    for s in range(0, 1000, 100):                  # 10 row groups of 100
        w.write_table(pa.table(
            {f"embedding_{i}": mat[s:s + 100, i] for i in range(4)}))
    w.close()

    full = {off: m.copy() for off, m in iter_embedding_batches(
        str(tmp_path), "m.parquet", batch_size=100)}
    got = list(iter_embedding_batches(str(tmp_path), "m.parquet",
                                      batch_size=100, start_row=450))
    offsets = [off for off, _ in got]
    assert min(offsets) == 400, offsets        # straddling group included
    assert sum(m.shape[0] for _, m in got) == 600
    for off, m in got:
        np.testing.assert_array_equal(m, full[off])
    # exact group boundary: starts at the group itself
    got2 = list(iter_embedding_batches(str(tmp_path), "m.parquet",
                                       batch_size=100, start_row=500))
    assert min(o for o, _ in got2) == 500
    # past the end: nothing
    assert list(iter_embedding_batches(str(tmp_path), "m.parquet",
                                       batch_size=100, start_row=1000)) == []


def test_streaming_export_clamps_to_actual_rows(tmp_path):
    """A source parquet shorter than base_count must still produce a
    COMPLETE export: pre-clamp, the hdf5 slab's total_rows was never
    reached, the '_streaming' incompleteness marker never cleared, and
    every rerun re-streamed the whole export forever while the fvec
    silently held fewer rows than requested (r3 review)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import h5py
    from neighborhoodwatch_tpu.io.export import (
        _generate_base_vectors_streaming,
    )

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((300, 8)).astype(np.float32)
    data_dir = str(tmp_path)
    pq.write_table(pa.table({f"embedding_{i}": mat[:, i] for i in range(8)}),
                   f"{data_dir}/short.parquet")

    # requested 1000 rows, source holds 300
    _generate_base_vectors_streaming(data_dir, "m", "short.parquet", 1000, 8,
                                     "short.fvec", True, None,
                                     "short.hdf5", None, batch_rows=128)
    from neighborhoodwatch_tpu.io import fvec
    assert fvec.count_vectors(data_dir, "short.fvec") == 300
    with h5py.File(f"{data_dir}/short.hdf5") as f:
        assert f["train"].shape == (300, 8)
        assert "_streaming" not in f["train"].attrs   # complete, not stuck

    # idempotent rerun: no re-stream, files unchanged
    before = open(f"{data_dir}/short.fvec", "rb").read()
    _generate_base_vectors_streaming(data_dir, "m", "short.parquet", 1000, 8,
                                     "short.fvec", True, None,
                                     "short.hdf5", None, batch_rows=128)
    assert open(f"{data_dir}/short.fvec", "rb").read() == before
