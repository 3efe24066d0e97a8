"""Device k-way merge of partial top-k parquet files (model of reference
tests/test_03_merge.py, with a working signature)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from neighborhoodwatch_tpu.core.merge import merge_indices_and_distances
from neighborhoodwatch_tpu.io.parquet_io import write_matrix_to_parquet
from neighborhoodwatch_tpu.utils.naming import (
    get_partial_indices_filename, get_partial_distances_filename,
)


def _write_partials(data_dir, rng, n_files=4, rows=50, k=10, base_per_file=100):
    """Synthetic partial results: file i covers base offsets [i*B, (i+1)*B)."""
    (data_dir / "partial").mkdir(exist_ok=True)
    all_d, all_i = [], []
    for i in range(n_files):
        d = np.sort(rng.random((rows, k)).astype(np.float32), axis=1)
        idx = rng.permutation(base_per_file)[:k]
        idx = np.tile(idx, (rows, 1)).astype(np.int32) + i * base_per_file
        write_matrix_to_parquet(get_partial_distances_filename(str(data_dir), i), d)
        write_matrix_to_parquet(get_partial_indices_filename(str(data_dir), i), idx)
        all_d.append(d)
        all_i.append(idx)
    return np.concatenate(all_d, axis=1), np.concatenate(all_i, axis=1)


def test_merge_matches_cpu_argsort(tmp_path, rng):
    k = 10
    cat_d, cat_i = _write_partials(tmp_path, rng, k=k)
    merge_indices_and_distances(str(tmp_path), k=k)

    final_d = pq.read_table(get_partial_distances_filename(str(tmp_path), -1)).to_pandas().values
    final_i = pq.read_table(get_partial_indices_filename(str(tmp_path), -1)).to_pandas().values

    order = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
    exp_d = np.take_along_axis(cat_d, order, axis=1)
    exp_i = np.take_along_axis(cat_i, order, axis=1)
    np.testing.assert_allclose(final_d, exp_d, atol=1e-7)
    np.testing.assert_array_equal(final_i, exp_i)
    assert (np.diff(final_d, axis=1) >= 0).all()


def test_merge_noop_without_partials(tmp_path):
    (tmp_path / "partial").mkdir()
    merge_indices_and_distances(str(tmp_path), k=5)
    assert not (tmp_path / "partial" / "final_indices.parquet").exists()


def test_merge_strips_rownum(tmp_path, rng):
    """Partial files may carry a RowNum column (reference merge.py:30-36)."""
    k = 4
    (tmp_path / "partial").mkdir()
    d = np.sort(rng.random((8, k)).astype(np.float32), axis=1)
    idx = rng.integers(0, 100, (8, k)).astype(np.int32)
    for i in range(2):
        ddf = pd.DataFrame(d + i, columns=[str(c) for c in range(k)])
        idf = pd.DataFrame(idx + i, columns=[str(c) for c in range(k)])
        ddf["RowNum"] = np.arange(8)
        idf["RowNum"] = np.arange(8)
        pq.write_table(pa.Table.from_pandas(ddf),
                       get_partial_distances_filename(str(tmp_path), i))
        pq.write_table(pa.Table.from_pandas(idf),
                       get_partial_indices_filename(str(tmp_path), i))
    merge_indices_and_distances(str(tmp_path), k=k)
    final_d = pq.read_table(
        get_partial_distances_filename(str(tmp_path), -1)).to_pandas()
    assert "RowNum" not in final_d.columns
    assert final_d.shape == (8, k)


def test_merge_rejects_mismatched_partial_row_counts(tmp_path):
    """A stale partial file with MORE rows than file 0 (leftover from a
    prior larger-Q run) used to pass the per-batch shape assert whenever
    its extras aligned to whole batches, silently dropping candidates;
    a SHORTER one died with a bare StopIteration (r3 review). Both must
    now fail loudly up front."""
    import pytest
    from neighborhoodwatch_tpu.utils.naming import (
        get_partial_distances_filename, get_partial_indices_filename,
    )

    data_dir = str(tmp_path)
    os.makedirs(f"{data_dir}/partial")
    rng = np.random.default_rng(0)

    def write(i, rows):
        d = np.sort(rng.random((rows, 4)).astype(np.float32), axis=1)
        ix = rng.integers(0, 100, (rows, 4)).astype(np.int32)
        pq.write_table(pa.table({str(j): ix[:, j] for j in range(4)}),
                       get_partial_indices_filename(data_dir, i))
        pq.write_table(pa.table({str(j): d[:, j] for j in range(4)}),
                       get_partial_distances_filename(data_dir, i))

    write(0, 100)
    write(1, 150)     # aligned surplus: 100-row batch would mask it
    with pytest.raises(AssertionError, match="expected 100"):
        merge_indices_and_distances(data_dir, k=4, row_batch_size=100)


def test_merge_rejects_empty_partial(tmp_path):
    """A zero-row partial file 0 must be a diagnostic, not a
    ZeroDivisionError (r3 review)."""
    import pytest
    from neighborhoodwatch_tpu.utils.naming import (
        get_partial_distances_filename, get_partial_indices_filename,
    )
    data_dir = str(tmp_path)
    os.makedirs(f"{data_dir}/partial")
    empty = pa.table({"0": pa.array([], pa.int32())})
    pq.write_table(empty, get_partial_indices_filename(data_dir, 0))
    pq.write_table(empty, get_partial_distances_filename(data_dir, 0))
    with pytest.raises(AssertionError, match="empty"):
        merge_indices_and_distances(data_dir, k=4)
