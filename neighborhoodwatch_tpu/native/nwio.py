"""ctypes bindings for the native IO engine (libnwio.so).

Every entry point has a pure-numpy fallback in io/fvec.py; this module only
reports `available()` and exposes the fast paths. Disable with
NW_TPU_NATIVE=0 (e.g. to A/B the codecs or on toolchain-less hosts).
"""

import ctypes
import os

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NW_TPU_NATIVE", "1") == "0":
        return None
    from neighborhoodwatch_tpu.native.build import build
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.nwio_fvec_probe.restype = ctypes.c_int
    lib.nwio_fvec_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32)]
    lib.nwio_fvec_read_rows.restype = ctypes.c_int64
    lib.nwio_fvec_read_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int32]
    lib.nwio_fvec_write_rows.restype = ctypes.c_int64
    lib.nwio_fvec_write_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32]
    lib.nwio_stream_open.restype = ctypes.c_void_p
    lib.nwio_stream_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int32]
    lib.nwio_stream_next.restype = ctypes.c_int64
    lib.nwio_stream_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.nwio_stream_close.restype = None
    lib.nwio_stream_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def probe(path: str):
    """(n_rows, dim) of a homogeneous fvec/ivec file, or None if the file
    is missing/heterogeneous (callers fall back to the Python codec)."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    dim = ctypes.c_int32()
    rc = lib.nwio_fvec_probe(path.encode(), ctypes.byref(n), ctypes.byref(dim))
    if rc != 0:
        return None
    return n.value, dim.value


def read_rows(path: str, row_start: int, n_rows: int, dim: int,
              payload_dtype, n_threads: int | None = None) -> np.ndarray:
    lib = _load()
    assert lib is not None
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    out = np.empty((n_rows, dim), dtype=payload_dtype)
    # dim rides the ABI so the native side can reject a file whose actual
    # width differs from this buffer's — without the check a regenerated
    # wider file corrupted the heap, a narrower one returned uninitialized
    # tail columns (r3 review)
    got = lib.nwio_fvec_read_rows(path.encode(), row_start, n_rows,
                                  out.ctypes.data_as(ctypes.c_void_p),
                                  n_threads, dim)
    if got == -7:
        raise IOError(f"nwio_fvec_read_rows({path}): file dim != {dim} "
                      f"(file changed since probe?)")
    if got != n_rows:
        raise IOError(f"nwio_fvec_read_rows({path}) -> {got}, wanted {n_rows}")
    return out


def write_rows(path: str, data: np.ndarray, append: bool = False) -> None:
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data)
    assert data.ndim == 2 and data.itemsize == 4
    n, dim = data.shape
    got = lib.nwio_fvec_write_rows(path.encode(), int(append),
                                   data.ctypes.data_as(ctypes.c_void_p),
                                   n, dim)
    if got != n:
        raise IOError(f"nwio_fvec_write_rows({path}) -> {got}, wanted {n}")


class FvecStream:
    """Background-threaded batch reader over an fvec/ivec file.

    The native producer thread reads batch i+1 from disk while the consumer
    processes batch i — the host half of the HBM tile pipeline (SURVEY.md
    §2 'pipeline parallel' row).
    """

    def __init__(self, path: str, batch_rows: int, payload_dtype,
                 n_threads: int | None = None):
        self._handle = None          # set first: __del__ runs on any path
        lib = _load()
        assert lib is not None
        info = probe(path)
        if info is None:
            raise IOError(f"cannot stream {path}")
        self.n_rows, self.dim = info
        self.batch_rows = batch_rows
        self.payload_dtype = payload_dtype
        self._lib = lib
        if self.n_rows == 0:
            # the C++ opener rejects empty files; the pure-Python fallback
            # yields nothing — the A/B invariance the module promises
            # requires matching it, not raising (r3 review, reproduced)
            return
        # self.dim rides the ABI like read_rows' expected_dim: the C++
        # side RE-probes the file, so a regeneration at a different width
        # between the two probes would otherwise memcpy wider rows into
        # this object's narrower consumer buffers — heap corruption
        # (r3 review)
        self._handle = lib.nwio_stream_open(
            path.encode(), batch_rows,
            n_threads or min(4, os.cpu_count() or 1), self.dim)
        if not self._handle:
            raise IOError(f"nwio_stream_open({path}) failed "
                          f"(missing/empty file, or dim != {self.dim} — "
                          f"file changed since probe?)")

    def __iter__(self):
        if self.n_rows == 0:         # empty file: nothing to stream
            return
        if self._handle is None:
            # exhausted or closed: silently yielding nothing would make a
            # two-pass consumer (or a retry loop) process 0 rows without
            # any signal (r3 review) — the stream is single-pass
            raise IOError("FvecStream already consumed/closed — construct "
                          "a new stream for another pass")
        offset = 0
        try:
            while True:
                buf = np.empty((self.batch_rows, self.dim),
                               dtype=self.payload_dtype)
                got = self._lib.nwio_stream_next(
                    self._handle, buf.ctypes.data_as(ctypes.c_void_p))
                if got < 0:
                    raise IOError(f"nwio_stream_next -> {got}")
                if got == 0:
                    break
                yield offset, buf[:got]
                offset += got
        finally:
            self.close()

    def close(self):
        if self._handle:
            self._lib.nwio_stream_close(self._handle)
            self._handle = None

    # a constructed-but-never-iterated stream must not leak the fd and a
    # producer thread parked on the condition variable (r3 review)
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
