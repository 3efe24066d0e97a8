"""Partial top-k result merging — on device.

Replaces the reference's CPU merge (merge.py:39-114: pandas concat +
`np.argsort` full re-sort of all N*k candidates per partial-file pair,
O(files * rows * k log k) on one core) with a device-side k-way merge:
all partial (distance, index) lists for a query-row batch are stacked and
reduced with one `lax.top_k` over the concatenated candidates
(ops/topk.merge_topk_many). Partial files are produced in ascending
base-offset order, so stable top_k preserves lowest-index tie-breaks.
"""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from neighborhoodwatch_tpu.io.parquet_io import count_partial_files
from neighborhoodwatch_tpu.ops.topk import merge_topk_many, check_monotonic
from neighborhoodwatch_tpu.utils.naming import (
    get_partial_indices_filename, get_partial_distances_filename,
)

DEFAULT_ROW_BATCH = 10_000_000  # reference merge.py:46


def _strip_rownum(table: pa.Table) -> pa.Table:
    idx = table.schema.get_field_index("RowNum")
    if idx != -1:
        table = table.remove_column(idx)
    return table


def _to_matrix(table: pa.Table, dtype) -> np.ndarray:
    cols = [table.column(i).to_numpy(zero_copy_only=False)
            for i in range(table.num_columns)]
    return np.stack(cols, axis=1).astype(dtype, copy=False)


def _matrix_table(mat: np.ndarray) -> pa.Table:
    return pa.table({str(j): pa.array(mat[:, j]) for j in range(mat.shape[1])})


def merge_indices_and_distances(data_dir: str, k: int = 100,
                                row_batch_size: int = DEFAULT_ROW_BATCH) -> None:
    """Merge partial/indices{i}.parquet + distances{i}.parquet into
    partial/final_{indices,distances}.parquet (reference: merge.py:39-114).

    No-op when there are no partial files (the streaming pipeline writes
    finals directly)."""
    file_count = count_partial_files(f"{data_dir}/partial")
    if file_count == 0:
        return

    n_rows = pq.ParquetFile(get_partial_indices_filename(data_dir, 0)).metadata.num_rows
    batch_size = min(row_batch_size, n_rows)
    batch_count = math.ceil(n_rows / batch_size)

    idx_writer = None
    dist_writer = None
    try:
        for b in range(batch_count):
            start = b * batch_size
            length = min(batch_size, n_rows - start)
            dists, idxs = [], []
            for i in range(file_count):
                it = _strip_rownum(pq.read_table(get_partial_indices_filename(data_dir, i)))
                dt = _strip_rownum(pq.read_table(get_partial_distances_filename(data_dir, i)))
                idxs.append(_to_matrix(it.slice(start, length), np.int32))
                dists.append(_to_matrix(dt.slice(start, length), np.float32))
            stack_d = np.stack(dists)  # (F, rows, k_partial)
            stack_i = np.stack(idxs)
            k_out = min(k, stack_d.shape[0] * stack_d.shape[2])
            d, ix = merge_topk_many(stack_d, stack_i, k_out)
            d, ix = np.asarray(d), np.asarray(ix)
            assert check_monotonic(d), "merged distances not monotonically nondecreasing"

            idx_table = _matrix_table(ix)
            dist_table = _matrix_table(d)
            if idx_writer is None:
                idx_writer = pq.ParquetWriter(
                    get_partial_indices_filename(data_dir, -1), idx_table.schema)
                dist_writer = pq.ParquetWriter(
                    get_partial_distances_filename(data_dir, -1), dist_table.schema)
            idx_writer.write_table(idx_table)
            dist_writer.write_table(dist_table)
    finally:
        if idx_writer is not None:
            idx_writer.close()
        if dist_writer is not None:
            dist_writer.close()
