"""fvec / ivec binary codecs.

Byte layout (little-endian), identical to the reference's struct-based codec
(reference: neighborhoodwatch/parquet_to_format.py:71-89, 37-68):

    per vector: int32 dim | dim * 4-byte payload (float32 for fvec, int32 for ivec)

Unlike the reference's per-row Python loop, reading and writing here are
vectorized through numpy (single buffer view + one `tofile`/`fromfile`),
which is ~1000x faster for the 10M-row exports and produces identical bytes.
When the native C++ engine (neighborhoodwatch_tpu/native, libnwio.so) is
available it takes over bulk reads/writes (multithreaded header-stripping
pread) and out-of-core streaming (background producer thread); the numpy
path remains as the byte-identical fallback.
"""

import os
import struct

import numpy as np

from neighborhoodwatch_tpu.native import nwio
from neighborhoodwatch_tpu.utils.naming import get_full_filename


def _type_char_for(filename: str) -> str:
    # ".ivecs" is the texmex-standard plural spelling external ANN tools
    # write; without it, int32 index bits silently parse as float32
    # denormals (surfaced by `nw-tools recall` on external results)
    return "i" if filename.endswith(("ivec", "ivecs")) else "f"


def write_vectors(filename: str, data: np.ndarray, type_char: str | None = None) -> None:
    """Write a (n, dim) array as fvec/ivec. Bytes identical to the reference's
    per-row `dim.to_bytes(4,'little') + vec.tobytes()` loop
    (reference: parquet_to_format.py:84-89)."""
    data = np.asarray(data)
    assert data.ndim == 2, f"expected (n, dim) array, got shape {data.shape}"
    n, dim = data.shape
    if type_char is None:
        type_char = _type_char_for(filename)
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    data = np.ascontiguousarray(data.astype(payload_dtype, copy=False))

    if nwio.available() and n > 0:
        nwio.write_rows(filename, data, append=False)
        return
    buf = np.empty((n, dim + 1), dtype=np.dtype("<i4"))
    buf[:, 0] = np.int32(dim)
    # reinterpret payload as raw int32 words so one contiguous write suffices
    buf[:, 1:] = data.view(np.dtype("<i4"))
    with open(filename, "wb") as f:
        buf.tofile(f)


def append_vectors(filename: str, data: np.ndarray, type_char: str | None = None) -> None:
    """Append rows to an existing fvec/ivec file (streamed export)."""
    data = np.asarray(data)
    n, dim = data.shape
    if type_char is None:
        type_char = _type_char_for(filename)
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    data = np.ascontiguousarray(data.astype(payload_dtype, copy=False))
    if nwio.available() and n > 0:
        nwio.write_rows(filename, data, append=True)
        return
    buf = np.empty((n, dim + 1), dtype=np.dtype("<i4"))
    buf[:, 0] = np.int32(dim)
    buf[:, 1:] = data.view(np.dtype("<i4"))
    with open(filename, "ab") as f:
        buf.tofile(f)


def read_vectors(filename: str, dtype=None) -> np.ndarray:
    """Read a whole fvec/ivec file into a (n, dim) array.

    Requires all rows to share one dimension (always true for files this
    framework writes)."""
    type_char = _type_char_for(filename)
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    size = os.path.getsize(filename)
    if size == 0:
        return np.empty((0, 0), dtype=payload_dtype)
    if nwio.available():
        info = nwio.probe(filename)
        if info is not None:
            n, dim = info
            out = nwio.read_rows(filename, 0, n, dim, payload_dtype)
            return out.astype(dtype) if dtype is not None else out
    with open(filename, "rb") as f:
        dim = struct.unpack("<i", f.read(4))[0]
        f.seek(0)
        row_bytes = 4 * (dim + 1)
        assert size % row_bytes == 0, \
            f"{filename}: size {size} not a multiple of row bytes {row_bytes}"
        n = size // row_bytes
        raw = np.fromfile(f, dtype=np.dtype("<i4"), count=n * (dim + 1))
    raw = raw.reshape(n, dim + 1)
    assert (raw[:, 0] == dim).all(), f"{filename}: inconsistent per-row dims"
    out = raw[:, 1:].view(payload_dtype)
    if dtype is not None:
        out = out.astype(dtype)
    return out


def iter_vector_batches(filename: str, batch_rows: int, count: int | None = None):
    """Yield (offset, (rows, dim) ndarray) batches of an fvec/ivec file,
    out-of-core. Uses the native background-threaded double-buffered reader
    when available (disk IO overlaps consumer compute), else a seek loop."""
    type_char = _type_char_for(filename)
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    if nwio.available() and nwio.probe(filename) is not None:
        for offset, batch in nwio.FvecStream(filename, batch_rows, payload_dtype):
            if count is not None and offset >= count:
                break
            if count is not None and offset + batch.shape[0] > count:
                batch = batch[: count - offset]
            yield offset, batch
        return
    size = os.path.getsize(filename)
    if size == 0:
        return
    with open(filename, "rb") as f:
        dim = struct.unpack("<i", f.read(4))[0]
        f.seek(0)
        row_words = dim + 1
        assert size % (4 * row_words) == 0, \
            (f"{filename}: size {size} is not a whole number of "
             f"{dim}-dim rows — truncated trailing row (killed export?); "
             f"read_vectors would reject this file and the stream must "
             f"too, not silently drop the tail (r3 review)")
        n = size // (4 * row_words)
        if count is not None:
            n = min(n, count)
        offset = 0
        while offset < n:
            take = min(batch_rows, n - offset)
            raw = np.fromfile(f, dtype=np.dtype("<i4"), count=take * row_words)
            raw = raw.reshape(take, row_words)
            assert (raw[:, 0] == dim).all(), \
                f"{filename}: inconsistent per-row dims"
            yield offset, raw[:, 1:].view(payload_dtype)
            offset += take


def read_selected(filename: str, row_ids) -> np.ndarray:
    """Read only `row_ids` (any order, duplicates allowed) from an
    fvec/ivec file with one sequential chunked scan — memory stays
    O(selected + chunk) instead of the whole file, which matters when the
    validators hit a 10M x 1536 (61GB) base export."""
    row_ids = np.asarray(row_ids, dtype=np.int64)
    uniq, inverse = np.unique(row_ids, return_inverse=True)
    type_char = _type_char_for(filename)
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    size = os.path.getsize(filename)
    with open(filename, "rb") as f:
        dim = struct.unpack("<i", f.read(4))[0]
        row_bytes = 4 * (dim + 1)
        n = size // row_bytes
        assert uniq.size == 0 or (0 <= uniq[0] and uniq[-1] < n), \
            f"row id out of range for {filename} ({n} rows)"
        out = np.empty((uniq.size, dim), dtype=payload_dtype)
        chunk_rows = max(1, (64 << 20) // row_bytes)
        got = 0
        f.seek(0)
        for start in range(0, n, chunk_rows):
            lo = np.searchsorted(uniq, start)
            hi = np.searchsorted(uniq, min(start + chunk_rows, n))
            if lo == hi:
                continue
            f.seek(start * row_bytes)
            count = min(chunk_rows, n - start)
            raw = np.fromfile(f, dtype=np.dtype("<i4"),
                              count=count * (dim + 1)).reshape(count, dim + 1)
            sel = raw[uniq[lo:hi] - start]
            # validate the selected rows' dim headers: a heterogeneous or
            # corrupt file would otherwise return garbage payload bytes
            # silently (r3 review)
            assert (sel[:, 0] == dim).all(), \
                f"{filename}: inconsistent per-row dims in selected rows"
            out[lo:hi] = sel[:, 1:].view(payload_dtype)
            got += hi - lo
            if got == uniq.size:
                break
    return out[inverse].reshape(*row_ids.shape, dim)


def count_vectors(data_dir: str, filename: str) -> int:
    """Number of vectors in the file (reference: parquet_to_format.py:37-48)."""
    full_filename = get_full_filename(data_dir, filename)
    size = os.path.getsize(full_filename)
    if size == 0:
        return 0
    with open(full_filename, "rb") as f:
        dim = struct.unpack("<i", f.read(4))[0]
    row_bytes = 4 * (dim + 1)
    if size % row_bytes == 0:
        return size // row_bytes
    # Heterogeneous dims: fall back to the sequential scan the reference uses.
    count = 0
    with open(full_filename, "rb") as f:
        while True:
            hdr = f.read(4)
            if not hdr:
                break
            dim = struct.unpack("<i", hdr)[0]
            f.seek(4 * dim, 1)
            count += 1
    return count


def get_nth_vector(data_dir: str, filename: str, n: int):
    """Random-access single-vector read; returns a tuple like the reference
    (reference: parquet_to_format.py:55-68)."""
    full_filename = get_full_filename(data_dir, filename)
    # the shared sniff, not a local endswith("ivec"): external ".ivecs"
    # files otherwise unpack int32 index bits as float denormals here
    # while every other reader parses them correctly (r3 review)
    format_char = _type_char_for(full_filename)
    with open(full_filename, "rb") as f:
        dimension = struct.unpack("<i", f.read(4))[0]
        f.seek(int(4 * n * (1 + dimension)), 1)
        assert os.path.getsize(full_filename) >= f.tell() + 4 * dimension, \
            "file size is less than expected"
        return struct.unpack("<" + format_char * dimension, f.read(4 * dimension))


def get_first_vector(data_dir: str, filename: str):
    return get_nth_vector(data_dir, filename, 0)


def write_ivec_fvec_from_dataframe(data_dir, model_name, filename, df,
                                   type_char, num_columns) -> None:
    """DataFrame-input writer with the reference's RowNum-tolerance and
    dimension-validity contract (reference: parquet_to_format.py:71-89)."""
    from neighborhoodwatch_tpu.utils.misc import output_dimension_validity_check

    full_filename = get_full_filename(data_dir, filename)
    values = df.values
    if values.shape[1] == num_columns + 1:
        values = values[:, :-1]  # trailing RowNum column
    assert output_dimension_validity_check(model_name, num_columns, values.shape[1]), \
        (f"Expected {num_columns} values, got {values.shape[1]} for model "
         f"{model_name} [filename: {filename}]")
    write_vectors(full_filename, values, type_char)
