"""Multi-chip MaxSim on the virtual 8-device CPU mesh: doc-sharded
all_gather merge must match the single-device exact scorer (BASELINE
config 4's mesh path — VERDICT r2 weak #3)."""

import numpy as np
import pytest

from neighborhoodwatch_tpu.ops.maxsim import (
    maxsim_topk, pad_token_lists, StreamingMaxSim,
)
from neighborhoodwatch_tpu.parallel.mesh import make_mesh, MP_AXIS
from neighborhoodwatch_tpu.parallel.sharded_maxsim import ShardedStreamingMaxSim


def _random_docs(rng, n, td, dim):
    docs = rng.standard_normal((n, td, dim)).astype(np.float32)
    mask = np.ones((n, td), dtype=bool)
    # ragged token counts: mask a tail per doc
    lens = rng.integers(1, td + 1, n)
    for i, L in enumerate(lens):
        mask[i, L:] = False
    return docs, mask


def test_sharded_maxsim_matches_single_device():
    rng = np.random.default_rng(5)
    mesh = make_mesh(8, dp=2)                    # mp=4
    q_n, tq, dim, k = 6, 4, 32, 9
    n_docs = 480
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    qm[:, tq - 1] = False                        # ragged query tokens
    docs, dm = _random_docs(rng, n_docs, 8, dim)

    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=64)

    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh)
    off = 0
    for size in (160, 240, 80):                  # multi-tile, ragged widths
        acc.update(docs[off:off + size], dm[off:off + size], off)
        off += size
    s, i = acc.finalize()
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(s, np.asarray(ref_s), rtol=1e-5, atol=1e-5)


def test_sharded_maxsim_odd_rows_and_tile_padding():
    """Query rows not divisible by dp; a tile whose doc count is not a
    multiple of mp (padded internally with n_valid masking)."""
    rng = np.random.default_rng(6)
    mesh = make_mesh(8, dp=4)                    # mp=2
    q_n, tq, dim, k = 5, 3, 16, 4
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _random_docs(rng, 101, 6, dim)    # 101 % 2 != 0

    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=32)
    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh)
    acc.update(docs[:57], dm[:57], 0)            # 57 % 2 != 0 either
    acc.update(docs[57:], dm[57:], 57)
    s, i = acc.finalize()
    assert s.shape == (q_n, k)
    np.testing.assert_array_equal(i, np.asarray(ref_i))


def test_sharded_maxsim_screened_engine_interpret():
    """The fused MaxSim screen kernel runs per shard UNDER the mesh
    (interpret mode on CPU) with in-shard certified select; exact vs the
    single-device scorer."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    rng = np.random.default_rng(7)
    mesh = make_mesh(8, dp=4)                    # mp=2
    mp = mesh.shape[MP_AXIS]
    n_docs = mk.MEGA_DOCS * mp                   # one mega per shard
    q_n, tq, dim, k = 4, 8, 32, 6
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _random_docs(rng, n_docs, 8, dim)

    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh, engine="screened")
    acc.update(docs, dm, 0)
    s, i = acc.finalize()

    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=2048)
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(s, np.asarray(ref_s), rtol=1e-4, atol=1e-4)


def test_sharded_maxsim_checkpoint_roundtrip():
    rng = np.random.default_rng(8)
    mesh = make_mesh(8)                          # dp=1, mp=8
    q_n, tq, dim, k = 4, 4, 16, 5
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _random_docs(rng, 320, 8, dim)

    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh)
    acc.update(docs[:160], dm[:160], 0)
    s0, i0, seen = acc.state_arrays()
    assert seen == 160

    # resume into a fresh accumulator and finish the stream
    acc2 = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh)
    acc2.restore(s0, i0, seen)
    acc2.update(docs[160:], dm[160:], 160)
    s, i = acc2.finalize()

    ref = StreamingMaxSim(q, qm, k=k)
    ref.update(docs, dm)
    ref_s, ref_i = ref.finalize()
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=1e-5, atol=1e-5)


def test_sharded_maxsim_screened_ragged_tail_below_k():
    """Regression (r3 review finding #1): a ragged tile with fewer valid
    docs than k used to crash the screened mesh path (dynamic selection
    width) or trip the repair-width assert. The tail tile here has
    n_valid < k. Since the ragged-cliff fix, update() routes such tiles
    to the EXACT mesh engine up front (a shard that cannot fill its
    static selection width kk makes tau=-inf and every certificate fail,
    which forced a whole-tile single-device recompute); the result must
    be identical either way."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    rng = np.random.default_rng(17)
    mesh = make_mesh(8, dp=4)                    # mp=2
    mp = mesh.shape[MP_AXIS]
    n_full = mk.MEGA_DOCS * mp
    q_n, tq, dim, k = 3, 4, 16, 12
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _random_docs(rng, n_full + 10, 6, dim)

    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh, engine="screened")
    acc.update(docs[:n_full], dm[:n_full], 0)
    acc.update(docs[n_full:], dm[n_full:], n_full)   # 10 valid docs < k
    s, i = acc.finalize()

    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=2048)
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(s, np.asarray(ref_s), rtol=1e-4, atol=1e-4)


def test_sharded_maxsim_forced_repair_is_exact(monkeypatch):
    """Force every certificate to fail: the host-path repair must still
    produce exact results (covers the REPLACE path end-to-end)."""
    import neighborhoodwatch_tpu.ops.maxsim as ms

    real_select = ms._maxsim_select
    calls = []

    def failing_select(*args, **kwargs):
        calls.append(1)
        out = real_select(*args, **kwargs)
        sk_, dk_, ok = out[:3]
        import jax.numpy as jnp
        # pass any adaptive-tier diagnostics through unchanged (the
        # default screen_precision="auto" requests them since r5)
        return (sk_, dk_, jnp.zeros_like(ok)) + tuple(out[3:])

    monkeypatch.setattr(ms, "_maxsim_select", failing_select)

    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    rng = np.random.default_rng(18)
    mesh = make_mesh(8, dp=4)                    # mp=2
    mp = mesh.shape[MP_AXIS]
    n_docs = mk.MEGA_DOCS * mp
    q_n, tq, dim, k = 3, 4, 24, 9                # unique shapes: fresh trace
    q = rng.standard_normal((q_n, tq, dim)).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _random_docs(rng, n_docs, 6, dim)

    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh, engine="screened")
    acc.update(docs, dm, 0)
    s, i = acc.finalize()

    # the monkeypatch only takes on a FRESH jit trace (the select is bound
    # at trace time); if a cache hit defused it, this test proved nothing
    # (r3 test review) — the unique (q_n, tq, dim, k) shapes above are what
    # keeps the trace fresh, and this assert makes a regression loud
    assert calls, "forced-failure select never ran: jit trace-cache hit"

    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=2048)
    np.testing.assert_array_equal(i, np.asarray(ref_i))
    np.testing.assert_allclose(s, np.asarray(ref_s), rtol=1e-4, atol=1e-4)


def test_sharded_maxsim_auto_engine_dim_gate(monkeypatch):
    """'auto' must mirror ops.maxsim._maxsim_engine's kernel dim gate:
    a 192-dim corpus used to select 'screened' on TPU and die on the
    kernel's lane-layout assert mid-stream (r3 review). Unknown engine
    names must raise, not coerce to the auto heuristic."""
    import jax
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
    from neighborhoodwatch_tpu.parallel.mesh import make_mesh
    from neighborhoodwatch_tpu.parallel.sharded_maxsim import (
        ShardedStreamingMaxSim,
    )

    mesh = make_mesh(8)
    q = np.random.default_rng(0).standard_normal((4, 8, 128)) \
        .astype(np.float32)
    qm = np.ones((4, 8), bool)
    eng = ShardedStreamingMaxSim(q, qm, k=2, mesh=mesh)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert eng._engine(mk.MEGA_DOCS, 32, True, 128) == "screened"
    assert eng._engine(mk.MEGA_DOCS, 32, True, 256) == "screened"
    assert eng._engine(mk.MEGA_DOCS, 32, True, 192) == "exact"   # the gate
    assert eng._engine(mk.MEGA_DOCS, 32, True, 200) == "exact"
    assert eng._engine(mk.MEGA_DOCS, 48, True, 128) == "exact"   # tq gate

    with pytest.raises(AssertionError, match="unknown engine"):
        ShardedStreamingMaxSim(q, qm, k=2, mesh=mesh, engine="screend")
