"""Operator tooling (nw-tools): parquet inspect/validate/split/sort + hdf5
duplicate detection — working equivalents of the reference's L0 DuckDB
scripts (which are run-as-script only and untested there)."""

import io
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neighborhoodwatch_tpu import tools


@pytest.fixture
def scalar_parquet(tmp_path):
    rng = np.random.default_rng(0)
    n, d = 300, 8
    mat = rng.standard_normal((n, d)).astype(np.float32)
    mat[17] = 0.0  # one zero embedding
    cols = {"document_id": pa.array(np.arange(n)),
            "text": pa.array([f"doc {i}" for i in range(n)])}
    for i in range(d):
        cols[f"embedding_{i}"] = pa.array(mat[:, i])
    path = str(tmp_path / "scalars.parquet")
    pq.write_table(pa.table(cols), path)
    return path, mat


def test_inspect(scalar_parquet):
    path, _ = scalar_parquet
    buf = io.StringIO()
    info = tools.inspect_parquet(path, head=2, out=buf)
    assert info["rows"] == 300
    assert info["columns"] == 10
    assert "document_id: int64" in buf.getvalue()


def test_validate_counts_zero_rows(scalar_parquet):
    path, _ = scalar_parquet
    report = tools.validate_parquet(path, batch_size=64, out=io.StringIO())
    assert report["rows"] == 300
    assert report["embedding_columns"] == 8
    assert report["zero_embedding_rows"] == 1
    assert report["null_cells"] == 0


def test_split_list_column(tmp_path):
    rng = np.random.default_rng(1)
    n, d = 100, 6
    mat = rng.standard_normal((n, d)).astype(np.float32)
    src = str(tmp_path / "list.parquet")
    dst = str(tmp_path / "split.parquet")
    pq.write_table(pa.table({
        "id": pa.array(np.arange(n)),
        "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
    }), src)

    rows = tools.split_embedding_column(src, dst, batch_size=32)
    assert rows == n
    out = pq.read_table(dst)
    assert out.column_names == ["id"] + [f"embedding_{i}" for i in range(d)]
    got = np.column_stack([out.column(f"embedding_{i}").to_numpy()
                           for i in range(d)])
    np.testing.assert_array_equal(got, mat)


def test_sort_external_merge(tmp_path):
    rng = np.random.default_rng(2)
    n = 1000
    keys = rng.integers(0, 50, n)
    vals = rng.standard_normal(n).astype(np.float32)
    src = str(tmp_path / "unsorted.parquet")
    dst = str(tmp_path / "sorted.parquet")
    pq.write_table(pa.table({"part": pa.array(keys),
                             "val": pa.array(vals)}), src)

    # batch_size < n forces multiple spill runs + the heap merge path
    rows = tools.sort_parquet(src, dst, keys=["part"], batch_size=128)
    assert rows == n
    out = pq.read_table(dst)
    got_keys = out.column("part").to_numpy()
    assert (np.diff(got_keys) >= 0).all()
    # same multiset of rows
    got = sorted(zip(got_keys.tolist(), out.column("val").to_numpy().tolist()))
    want = sorted(zip(keys.tolist(), vals.tolist()))
    assert got == want


def test_sort_merge_is_stable_across_ties(tmp_path):
    """Equal keys must keep source order even when a run of ties crosses
    run-batch boundaries (the batched merge pulls a run's next-batch
    equal-key tail into the same splice; a naive prefix cut would emit
    other runs' ties first)."""
    n = 1200
    keys = np.repeat(np.arange(12), 100)          # long tie runs
    vals = np.arange(n, dtype=np.int64)           # source position marker
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    src = str(tmp_path / "ties.parquet")
    dst = str(tmp_path / "ties_sorted.parquet")
    pq.write_table(pa.table({"part": keys[perm], "val": vals[perm]}), src)
    assert tools.sort_parquet(src, dst, keys=["part"], batch_size=64) == n
    out = pq.read_table(dst)
    idx = np.argsort(keys[perm], kind="stable")
    np.testing.assert_array_equal(out.column("part").to_numpy(),
                                  keys[perm][idx])
    np.testing.assert_array_equal(out.column("val").to_numpy(),
                                  vals[perm][idx])


def test_sort_multi_key_merge(tmp_path):
    rng = np.random.default_rng(4)
    n = 500
    a = rng.integers(0, 8, n)
    b = rng.integers(0, 8, n)
    src = str(tmp_path / "mk.parquet")
    dst = str(tmp_path / "mk_sorted.parquet")
    pq.write_table(pa.table({"a": a, "b": b}), src)
    assert tools.sort_parquet(src, dst, keys=["a", "b"], batch_size=64) == n
    out = pq.read_table(dst)
    ga, gb = out.column("a").to_numpy(), out.column("b").to_numpy()
    order = np.lexsort((b, a))
    np.testing.assert_array_equal(ga, a[order])
    np.testing.assert_array_equal(gb, b[order])


def test_sort_single_run_fast_path(tmp_path):
    src = str(tmp_path / "small.parquet")
    dst = str(tmp_path / "small_sorted.parquet")
    pq.write_table(pa.table({"k": pa.array([3, 1, 2])}), src)
    assert tools.sort_parquet(src, dst, keys=["k"]) == 3
    assert pq.read_table(dst).column("k").to_pylist() == [1, 2, 3]


def test_hdf5_dupes(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "gt.hdf5")
    rng = np.random.default_rng(3)
    train = rng.standard_normal((50, 4)).astype(np.float32)
    train[10] = train[3]  # one duplicate pair
    with h5py.File(path, "w") as f:
        f.create_dataset("train", data=train)
        f.create_dataset("test", data=rng.standard_normal((20, 4)))
    report = tools.hdf5_duplicates(path, out=io.StringIO())
    assert report["train"]["duplicated_vectors"] == 1
    assert report["train"]["redundant_rows"] == 1
    assert report["test"]["duplicated_vectors"] == 0


def test_cli_entry(scalar_parquet, capsys):
    path, _ = scalar_parquet
    assert tools.main(["validate", path]) == 0
    out = capsys.readouterr().out
    assert json.loads(out.splitlines()[0])["rows"] == 300


def test_ifvec_inspect(tmp_path, capsys):
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.tools import inspect_ifvec, main

    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    fvec.write_vectors(str(tmp_path / "x.fvec"), mat, "f")
    rep = inspect_ifvec(str(tmp_path / "x.fvec"))
    assert rep["vectors"] == 3 and rep["dim"] == 4 and rep["kind"] == "fvec"
    np.testing.assert_allclose(rep["head"][0], mat[0])

    idx = np.arange(6, dtype=np.int32).reshape(2, 3)
    fvec.write_vectors(str(tmp_path / "y.ivec"), idx, "i")
    assert main(["ifvec", str(tmp_path / "y.ivec")]) == 0
    out = capsys.readouterr().out
    assert '"kind": "ivec"' in out and '"vectors": 2' in out


def test_knn_over_fvec(tmp_path):
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.ops.knn import knn
    from neighborhoodwatch_tpu.tools import knn_over_fvec

    rng = np.random.default_rng(13)
    q = rng.standard_normal((20, 24)).astype(np.float32)
    b = rng.standard_normal((500, 24)).astype(np.float32)
    qf, bf = str(tmp_path / "q.fvec"), str(tmp_path / "b.fvec")
    fvec.write_vectors(qf, q, "f")
    fvec.write_vectors(bf, b, "f")

    idx_file, dist_file = knn_over_fvec(qf, bf, k=7, batch_rows=128)
    idx = fvec.read_vectors(idx_file)
    ref_d, ref_i = knn(q, b, k=7)
    np.testing.assert_array_equal(idx, np.asarray(ref_i))


def test_sort_low_cardinality_keys_stream_stably(tmp_path):
    """A key with very few distinct values (here: 2 over 20k rows) must
    merge without materializing whole equal-key groups — and stay a
    stable sort (r3 review finding: the <=-bound splice held entire
    equal-key groups in RAM)."""
    n = 20_000
    keys = np.zeros(n, dtype=np.int64)
    keys[n // 2:] = 1
    vals = np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(9)
    perm = rng.permutation(n)
    src = str(tmp_path / "lowcard.parquet")
    dst = str(tmp_path / "lowcard_sorted.parquet")
    pq.write_table(pa.table({"part": keys[perm], "val": vals[perm]}), src)
    # batch_size 256 -> ~78 spill runs, every one full of duplicate keys
    assert tools.sort_parquet(src, dst, keys=["part"], batch_size=256) == n
    out = pq.read_table(dst)
    idx = np.argsort(keys[perm], kind="stable")
    np.testing.assert_array_equal(out.column("part").to_numpy(),
                                  keys[perm][idx])
    np.testing.assert_array_equal(out.column("val").to_numpy(),
                                  vals[perm][idx])


def test_sort_nan_and_null_keys_terminate(tmp_path):
    """A NaN float key used to make the merge's vectorized bound
    comparisons all-False and spin FOREVER, and a null string key raised
    TypeError (r3 review, both reproduced). The total-order key expansion
    must sort them last (arrow sort_by convention) and terminate."""
    src, dst = str(tmp_path / "s.parquet"), str(tmp_path / "d.parquet")
    vals = np.array([3.0, np.nan, 1.0, 2.0, np.nan, 0.5], np.float64)
    pq.write_table(pa.table({"score": vals, "row": np.arange(6)}), src)
    n = tools.sort_parquet(src, dst, ["score"], batch_size=2)
    assert n == 6
    got = pq.read_table(dst).column("score").to_numpy(zero_copy_only=False)
    assert np.array_equal(got[:4], np.array([0.5, 1.0, 2.0, 3.0]))
    assert np.all(np.isnan(got[4:]))

    src2, dst2 = str(tmp_path / "s2.parquet"), str(tmp_path / "d2.parquet")
    pq.write_table(pa.table({"name": ["b", None, "a", None, "c"]}), src2)
    assert tools.sort_parquet(src2, dst2, ["name"], batch_size=2) == 5
    got2 = pq.read_table(dst2).column("name").to_pylist()
    assert got2[:3] == ["a", "b", "c"] and got2[3:] == [None, None]


def test_split_empty_source_writes_valid_dst(tmp_path):
    """A zero-row source must still produce a readable dst parquet, not
    silently no file at all (r3 review)."""
    src, dst = str(tmp_path / "e.parquet"), str(tmp_path / "o.parquet")
    pq.write_table(pa.table({"id": pa.array([], pa.int64()),
                             "embedding": pa.array([], pa.list_(pa.float32()))}),
                   src)
    assert tools.split_embedding_column(src, dst) == 0
    t = pq.read_table(dst)
    assert t.num_rows == 0 and t.schema.names == ["id"]


def test_sort_and_split_write_plain_encoding(tmp_path):
    """Embedding parquets must be PLAIN (CLAUDE.md rule): dictionary pages
    cost +50% size and 5-10x slower decode on all-distinct floats."""
    rng = np.random.default_rng(3)
    src = str(tmp_path / "s.parquet")
    n = 512
    pq.write_table(pa.table({"key": rng.integers(0, 9, n),
                             "embedding_0": rng.standard_normal(n)
                             .astype(np.float32)}), src)
    dst = str(tmp_path / "sorted.parquet")
    tools.sort_parquet(src, dst, ["key"], batch_size=100)
    meta = pq.ParquetFile(dst).metadata
    for rg in range(meta.num_row_groups):
        for c in range(meta.num_columns):
            col = meta.row_group(rg).column(c)
            assert "PLAIN_DICTIONARY" not in str(col.encodings) and \
                "RLE_DICTIONARY" not in str(col.encodings), \
                (col.path_in_schema, col.encodings)


def test_recall_ivec_and_ties(tmp_path, capsys):
    """recall@k: 1.0 on identical files (order-insensitive), fractional on
    corrupted rows, and tie-forgiving when ground-truth distances prove the
    k-th boundary is tied."""
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.tools import main, recall_report

    rng = np.random.default_rng(7)
    n, k = 50, 10
    truth = np.argsort(rng.standard_normal((n, 64)), axis=1)[:, :k]
    tf = str(tmp_path / "truth.ivec")
    fvec.write_vectors(tf, truth.astype(np.int32), "i")

    # identical but column-shuffled candidate: recall is set-based
    cand = truth[:, ::-1].copy()
    cf = str(tmp_path / "cand.ivec")
    fvec.write_vectors(cf, cand.astype(np.int32), "i")
    rep = recall_report(tf, cf)
    assert rep["recall"] == 1.0 and rep["perfect_queries"] == n
    assert rep["k"] == k and not rep["tie_aware"]

    # corrupt 2 of 10 entries in half the rows -> mean = 1 - 0.2*0.5
    bad = cand.copy()
    bad[: n // 2, :2] = 10_000
    bf = str(tmp_path / "bad.ivec")
    fvec.write_vectors(bf, bad.astype(np.int32), "i")
    rep = recall_report(tf, bf)
    assert abs(rep["recall"] - 0.9) < 1e-12
    assert rep["min_recall"] == 0.8 and rep["perfect_queries"] == n - n // 2

    # tied boundary, evaluated at k=9 against the 10-wide truth file: the
    # 9th and 10th truth entries (100, 101) tie at distance 0.7; truth[:9]
    # kept 100 but the ANN returned the equally-correct 101 — plain recall
    # penalizes (8/9), tie-aware must not, because the full truth row
    # proves 101 is at the same distance as the k-th neighbor
    truth2 = np.arange(k, dtype=np.int32)[None, :].repeat(4, axis=0)
    truth2[:, -2:] = [100, 101]
    dist2 = np.linspace(0.0, 0.5, k, dtype=np.float32)[None, :].repeat(4, 0)
    dist2[:, -2:] = 0.7                       # ties at the boundary
    cand2 = truth2.copy()
    cand2[:, -2] = 101                        # the OTHER tied neighbor
    t2 = str(tmp_path / "truth2.ivec")
    d2 = str(tmp_path / "dist2.fvec")
    c2 = str(tmp_path / "cand2.ivec")
    fvec.write_vectors(t2, truth2, "i")
    fvec.write_vectors(d2, dist2, "f")
    fvec.write_vectors(c2, cand2, "i")
    assert abs(recall_report(t2, c2, k=9)["recall"] - 8 / 9) < 1e-12
    rep = recall_report(t2, c2, k=9, truth_distances=d2)
    assert rep["tie_aware"] and rep["recall"] == 1.0

    assert main(["recall", tf, cf, "-k", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["k"] == 5


def test_recall_hdf5_inputs(tmp_path):
    """hdf5 neighbors/distances datasets (the pipeline's export format)
    work as either side of the comparison."""
    import h5py
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.tools import recall_report

    truth = np.arange(40, dtype=np.int32).reshape(8, 5)
    dist = np.sort(np.random.default_rng(3)
                   .random((8, 5)).astype(np.float32), axis=1)
    h5 = str(tmp_path / "gt.h5")
    with h5py.File(h5, "w") as f:
        f.create_dataset("neighbors", data=truth)
        f.create_dataset("distances", data=dist)
    cf = str(tmp_path / "cand.ivec")
    fvec.write_vectors(cf, truth, "i")

    rep = recall_report(h5, cf, truth_distances=h5)
    assert rep["recall"] == 1.0 and rep["tie_aware"]

    with pytest.raises(AssertionError):
        recall_report(h5, cf, dataset="nope")


def test_recall_hardening(tmp_path):
    """Review-pass edges: .ivecs plural extension parses as int32, -1
    'not found' padding never aliases across rows, NaN truth distances are
    rejected, unknown extensions raise, and truncated boundary ties are
    flagged in the report."""
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.tools import recall_report

    truth = np.arange(30, dtype=np.int32).reshape(3, 10)
    tf = str(tmp_path / "t.ivec")
    fvec.write_vectors(tf, truth, "i")

    # .ivecs (texmex plural): must parse as int indices, not float bits
    cf = str(tmp_path / "c.ivecs")
    fvec.write_vectors(cf, truth, "i")
    assert recall_report(tf, cf)["recall"] == 1.0

    # -1 padding: row 1's pad must not alias into row 0's id range — the
    # candidate is otherwise all-wrong, so any hit would be the alias
    cand = np.full_like(truth, 9999)
    cand[1, :] = -1
    cp = str(tmp_path / "pad.ivec")
    fvec.write_vectors(cp, cand, "i")
    assert recall_report(tf, cp)["recall"] == 0.0

    # NaN inside k in the truth distances: loud error, not recall 0
    dist = np.tile(np.linspace(0.0, 1.0, 10, dtype=np.float32), (3, 1))
    dist[2, 4] = np.nan
    df = str(tmp_path / "d.fvec")
    fvec.write_vectors(df, dist, "f")
    with pytest.raises(AssertionError, match="non-finite"):
        recall_report(tf, cf, truth_distances=df)
    # ...but a NaN beyond k is fine
    rep = recall_report(tf, cf, k=3, truth_distances=df)
    assert rep["recall"] == 1.0

    # truncated boundary tie: tie at the k-th distance reaching the last
    # exported column is flagged (forgiveness can't see beyond the export)
    dist2 = np.tile(np.linspace(0.0, 1.0, 10, dtype=np.float32), (3, 1))
    dist2[0, 4:] = 0.5                 # tie from k-1 through the last col
    d2 = str(tmp_path / "d2.fvec")
    fvec.write_vectors(d2, dist2, "f")
    rep = recall_report(tf, cf, k=5, truth_distances=d2)
    assert rep["boundary_tie_truncated"] == 1 and rep["recall"] == 1.0

    # unknown extension: loud error instead of dtype guessing
    bad = str(tmp_path / "x.bin")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="unrecognized extension"):
        recall_report(tf, bad)
    # float file as indices: rejected
    with pytest.raises(ValueError, match="indices"):
        recall_report(tf, df)
