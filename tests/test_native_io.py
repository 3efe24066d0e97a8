"""Native C++ IO engine (libnwio.so): byte-identity with the numpy codec,
bulk reads, and the background-threaded streaming reader."""

import os

import numpy as np
import pytest

from neighborhoodwatch_tpu.io import fvec
from neighborhoodwatch_tpu.native import nwio

pytestmark = pytest.mark.skipif(not nwio.available(),
                                reason="native toolchain unavailable")


def _numpy_write(filename, data, type_char):
    """The pure-numpy reference writer (native path bypassed)."""
    payload_dtype = np.dtype("<i4") if type_char == "i" else np.dtype("<f4")
    data = np.ascontiguousarray(data.astype(payload_dtype, copy=False))
    n, dim = data.shape
    buf = np.empty((n, dim + 1), dtype=np.dtype("<i4"))
    buf[:, 0] = np.int32(dim)
    buf[:, 1:] = data.view(np.dtype("<i4"))
    with open(filename, "wb") as f:
        buf.tofile(f)


def test_probe_and_bulk_read(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((257, 384)).astype(np.float32)
    path = str(tmp_path / "a.fvec")
    _numpy_write(path, data, "f")

    assert nwio.probe(path) == (257, 384)
    out = nwio.read_rows(path, 0, 257, 384, np.float32)
    np.testing.assert_array_equal(out, data)
    # offset read
    out2 = nwio.read_rows(path, 100, 57, 384, np.float32)
    np.testing.assert_array_equal(out2, data[100:157])


def test_native_write_byte_identical(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((64, 129)).astype(np.float32)
    p_native = str(tmp_path / "n.fvec")
    p_numpy = str(tmp_path / "p.fvec")
    nwio.write_rows(p_native, data)
    _numpy_write(p_numpy, data, "f")
    with open(p_native, "rb") as a, open(p_numpy, "rb") as b:
        assert a.read() == b.read()


def test_native_append(tmp_path):
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1000, (10, 16)).astype(np.int32)
    b = rng.integers(0, 1000, (7, 16)).astype(np.int32)
    path = str(tmp_path / "x.ivec")
    nwio.write_rows(path, a)
    nwio.write_rows(path, b, append=True)
    out = fvec.read_vectors(path)
    np.testing.assert_array_equal(out, np.vstack([a, b]))


def test_fvec_module_uses_native_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.standard_normal((1000, 77)).astype(np.float32)
    path = str(tmp_path / "r.fvec")
    fvec.write_vectors(path, data)
    out = fvec.read_vectors(path)
    np.testing.assert_array_equal(out, data)
    # random access matches the struct-based reader contract
    v = fvec.get_nth_vector(str(tmp_path), "r.fvec", 123)
    np.testing.assert_allclose(np.asarray(v, dtype=np.float32), data[123],
                               rtol=0, atol=0)


def test_stream_batches(tmp_path):
    rng = np.random.default_rng(4)
    data = rng.standard_normal((1003, 64)).astype(np.float32)
    path = str(tmp_path / "s.fvec")
    fvec.write_vectors(path, data)

    seen = []
    for offset, batch in fvec.iter_vector_batches(path, batch_rows=256):
        assert offset == sum(b.shape[0] for b in seen)
        seen.append(batch.copy())
    got = np.vstack(seen)
    np.testing.assert_array_equal(got, data)
    assert [b.shape[0] for b in seen] == [256, 256, 256, 235]


def test_stream_with_count_limit(tmp_path):
    rng = np.random.default_rng(5)
    data = rng.standard_normal((500, 32)).astype(np.float32)
    path = str(tmp_path / "c.fvec")
    fvec.write_vectors(path, data)
    got = np.vstack([b for _, b in
                     fvec.iter_vector_batches(path, 128, count=300)])
    np.testing.assert_array_equal(got, data[:300])


def test_python_fallback_matches(tmp_path, monkeypatch):
    rng = np.random.default_rng(6)
    data = rng.standard_normal((200, 48)).astype(np.float32)
    path = str(tmp_path / "f.fvec")
    fvec.write_vectors(path, data)

    native = fvec.read_vectors(path)
    native_batches = [b for _, b in fvec.iter_vector_batches(path, 64)]
    monkeypatch.setattr(nwio, "available", lambda: False)
    fallback = fvec.read_vectors(path)
    fallback_batches = [b for _, b in fvec.iter_vector_batches(path, 64)]
    np.testing.assert_array_equal(native, fallback)
    for a, b in zip(native_batches, fallback_batches, strict=True):
        np.testing.assert_array_equal(a, b)


def test_native_stream_empty_file_matches_python(tmp_path):
    """A zero-row fvec must stream as 'nothing' on BOTH engines — the
    native opener rejects empty files, so the binding special-cases them
    instead of raising where the numpy fallback returns cleanly
    (r3 review, reproduced)."""
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.native import nwio

    f = str(tmp_path / "empty.fvec")
    fvec.write_vectors(f, np.empty((0, 4), np.float32), "f")
    assert list(fvec.iter_vector_batches(f, 16)) == []
    if nwio.available():
        assert list(nwio.FvecStream(f, 16, np.float32)) == []


def test_native_stream_context_manager_and_gc(tmp_path):
    """FvecStream supports `with`, and a constructed-but-never-iterated
    stream must not leak its fd / parked producer thread (r3 review)."""
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.native import nwio

    if not nwio.available():
        import pytest
        pytest.skip("no native toolchain")
    mat = np.arange(80, dtype=np.float32).reshape(20, 4)
    f = str(tmp_path / "m.fvec")
    fvec.write_vectors(f, mat, "f")
    with nwio.FvecStream(f, 8, np.float32) as s:
        got = np.vstack([b for _, b in s])
    np.testing.assert_array_equal(got, mat)
    s2 = nwio.FvecStream(f, 8, np.float32)
    del s2                                  # __del__ closes; no hang


def test_read_rows_rejects_dim_mismatch(tmp_path):
    """read_rows re-probes the file natively, so the caller's buffer dim
    must ride the ABI: a file regenerated WIDER between probe() and
    read_rows() would otherwise write past the numpy buffer (heap
    corruption); NARROWER would return uninitialized tail columns
    (r3 review)."""
    if not nwio.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    path = str(tmp_path / "a.fvec")
    fvec.write_vectors(path, rng.standard_normal((10, 8)).astype(np.float32), "f")
    ok = nwio.read_rows(path, 0, 10, 8, np.dtype("<f4"))
    assert ok.shape == (10, 8)
    for wrong in (4, 16):
        with pytest.raises(IOError, match="dim"):
            nwio.read_rows(path, 0, 10, wrong, np.dtype("<f4"))


def test_stream_second_pass_raises(tmp_path):
    """A consumed FvecStream must raise on re-iteration, not silently
    yield nothing (r3 review: a two-pass consumer would process 0 rows
    with no signal). Empty files still iterate-empty any number of times
    (the Python-fallback A/B invariant)."""
    if not nwio.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(6)
    path = str(tmp_path / "b.fvec")
    fvec.write_vectors(path, rng.standard_normal((7, 4)).astype(np.float32), "f")
    s = nwio.FvecStream(path, 3, np.dtype("<f4"))
    assert sum(b.shape[0] for _, b in s) == 7
    with pytest.raises(IOError, match="consumed/closed"):
        list(s)
    empty = str(tmp_path / "e.fvec")
    open(empty, "wb").close()
    se = nwio.FvecStream(empty, 3, np.dtype("<f4"))
    assert list(se) == [] and list(se) == []


def test_stream_open_rejects_dim_mismatch(tmp_path, monkeypatch):
    """FvecStream sizes its consumer buffers from an early probe while the
    C++ opener re-probes the file: if the file's width changes between the
    two probes, the opener must refuse (pre-fix it streamed wider rows
    into the narrower numpy buffers — heap corruption; the batch-read
    analog of nwio_fvec_read_rows' -7 expected_dim check)."""
    import numpy as np
    from neighborhoodwatch_tpu.io import fvec
    from neighborhoodwatch_tpu.native import nwio

    if not nwio.available():
        pytest.skip("native lib unavailable")
    path = str(tmp_path / "x.fvec")
    fvec.write_vectors(path, np.ones((16, 8), np.float32), "f")

    real_probe = nwio.probe
    monkeypatch.setattr(nwio, "probe",
                        lambda p: (16, 4) if p == path else real_probe(p))
    with pytest.raises(IOError, match="dim != 4"):
        nwio.FvecStream(path, batch_rows=8, payload_dtype=np.float32)
