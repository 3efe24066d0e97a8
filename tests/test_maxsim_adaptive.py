"""Adaptive MaxSim screen-tier controller (VERDICT r4 item 3): the
streaming accumulators' "auto" tier starts at the always-certifying
3-pass screen, DOWNSHIFTS when the high-tier batches' free diagnostics
predict the cheaper tier certifies (the wide-score-gap corpus class of
tests/test_maxsim_tiers.py — measured 2.1x on hardware), and
RE-ESCALATES the moment a downshifted batch's realized certificate
failures spike. Exactness is tier-independent (certificates + per-call
escalation), so every streamed result here is checked against the exact
engine regardless of the tier trajectory."""

import numpy as np

from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
from neighborhoodwatch_tpu.ops.maxsim import (
    MAXSIM_TIER_LADDER, MaxSimTierController, StreamingMaxSim, maxsim_topk,
)
from neighborhoodwatch_tpu.parallel.mesh import make_mesh
from neighborhoodwatch_tpu.parallel.sharded_maxsim import ShardedStreamingMaxSim

TILE = mk.MEGA_DOCS          # one kernel mega-tile of docs per stream tile


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _tiled_corpus(rng, n_tiles, q_n=4, tq=8, td=8, dim=64,
                  rel_per_tile=24, gap_tiles=None):
    """Streamable corpus of `n_tiles` x TILE docs. Tiles listed in
    `gap_tiles` (default: all) get `rel_per_tile` planted near-duplicate
    docs PER QUERY (wide score gap within every tile — each per-tile
    top-k stays inside the planted set, so the per-tile certificates can
    hold at the cheap tier); other tiles are pure iid tokens (scores
    concentrate, sub-high certificates fail wholesale)."""
    n_docs = n_tiles * TILE
    gap_tiles = set(range(n_tiles)) if gap_tiles is None else set(gap_tiles)
    q = _unit(rng.standard_normal((q_n, tq, dim))).astype(np.float32)
    docs = _unit(rng.standard_normal((n_docs, td, dim))).astype(np.float32)
    t = min(tq, td)
    for ti in sorted(gap_tiles):
        lo = ti * TILE
        ids = lo + rng.permutation(TILE)[: q_n * rel_per_tile].reshape(
            q_n, rel_per_tile)
        for i in range(q_n):
            noisy = q[i, :t][None] + 0.01 * rng.standard_normal(
                (rel_per_tile, t, dim))
            docs[ids[i], :t] = _unit(noisy).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    dm = np.ones((n_docs, td), dtype=bool)
    return q, qm, docs, dm


def _concentrated_corpus(rng, n_tiles, q_n=4, tq=8, td=8, dim=64,
                         sigma=1.6e-3):
    """Corpus whose MaxSim scores CONCENTRATE inside the sub-high eps
    bands but not the 3-pass band: every doc has one valid token, a
    tiny perturbation of a shared direction, so per-query scores spread
    over ~6 sigma' with sigma' = sigma * ||sum_t q_t|| ~ the 3-pass eps
    — hundreds of docs sit within the 1-pass band (certificates would
    fail wholesale) while the 3-pass band holds only tens (class-A
    repairable). This is the corpus class the adaptive controller must
    KEEP at the high tier."""
    q = _unit(rng.standard_normal((q_n, tq, dim))).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    docs, dm = _concentrated_tiles(rng, n_tiles, td, dim, sigma)
    return q, qm, docs, dm


def _concentrated_tiles(rng, n_tiles, td=8, dim=64, sigma=1.6e-3):
    """Doc tensor + mask of `n_tiles` x TILE concentrated docs (see
    _concentrated_corpus) for splicing behind a wide-gap prefix."""
    c = _unit(rng.standard_normal((dim,)))
    n_docs = n_tiles * TILE
    d0 = _unit(c[None] + sigma * rng.standard_normal((n_docs, dim)))
    docs = np.zeros((n_docs, td, dim), dtype=np.float32)
    docs[:, 0] = d0.astype(np.float32)
    dm = np.zeros((n_docs, td), dtype=bool)
    dm[:, 0] = True
    return docs, dm


def _check_exact(acc, q, qm, docs, dm, k):
    s, i = acc.finalize()
    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=2048)
    np.testing.assert_array_equal(np.asarray(i)[: q.shape[0]],
                                  np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(s)[: q.shape[0]],
                               np.asarray(ref_s), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- unit


def test_controller_downshifts_after_consecutive_clean_predictions():
    c = MaxSimTierController()
    q = 1000
    assert c.tier_arg == "high"
    # one clean prediction is not enough (DOWN_AFTER = 2)
    c.observe(np.array([0, 0, 0]), 0, q)
    assert c.tier_idx == 0
    c.observe(np.array([0, 0, 0]), 0, q)
    assert c.tier_arg == "default"      # jumps straight to the cheapest


def test_controller_targets_medium_when_only_medium_predicts_clean():
    c = MaxSimTierController()
    q = 1000
    for _ in range(c.DOWN_AFTER):
        c.observe(np.array([0, 0, 900]), 0, q)   # default-band floods
    assert c.tier_arg == "medium"


def test_controller_tolerates_moderate_failures_at_the_cheap_tier():
    """Below FAIL_FRAC (25%), per-call escalation of the failed queries
    is cheaper than a safer tier every batch (measured: default+14%
    escalations 0.143 s/tile vs medium 0.184) — the controller must NOT
    re-escalate on moderate failure counts."""
    c = MaxSimTierController()
    q = 1000
    for _ in range(c.DOWN_AFTER):
        c.observe(np.array([0, 0, 0]), 0, q)
    assert c.tier_arg == "default"
    for _ in range(4):
        c.observe(np.array([140, 0, 0]), c.tier_idx, q)
        assert c.tier_arg == "default"


def test_controller_reescalates_on_realized_failures_with_hysteresis():
    c = MaxSimTierController()
    q = 1000
    for _ in range(c.DOWN_AFTER):
        c.observe(np.array([0, 0, 0]), 0, q)
    assert c.tier_arg == "default"
    # failures above FAIL_FRAC but below JUMP_FRAC: one rung up
    c.observe(np.array([400, 0, 0]), c.tier_idx, q)
    assert c.tier_arg == "medium"
    # wholesale failure: straight to the safe tier
    c.observe(np.array([900, 0, 0]), c.tier_idx, q)
    assert c.tier_arg == "high"
    # hysteresis: after re-escalations the downshift needs a 4x streak
    for _ in range(c.DOWN_AFTER * 2):
        c.observe(np.array([0, 0, 0]), 0, q)
        assert c.tier_arg == "high"
    for _ in range(c.DOWN_AFTER * 2):
        c.observe(np.array([0, 0, 0]), 0, q)
    assert c.tier_arg == "default"


def test_controller_ignores_stale_tier_diagnostics():
    c = MaxSimTierController()
    c.observe(np.array([0, 0, 0]), 0, 100)
    # a diag taken at a different ladder level than current: no effect
    c.observe(np.array([0, 0, 0]), 2, 100)
    assert c.tier_idx == 0 and c._streak == 0
    assert MAXSIM_TIER_LADDER[c.tier_idx] == "high"


# ---------------------------------------------------------- streaming


def test_streaming_auto_downshifts_on_wide_gap_and_stays_exact():
    rng = np.random.default_rng(50)
    k = 8
    n_tiles = 4
    q, qm, docs, dm = _tiled_corpus(rng, n_tiles)
    acc = StreamingMaxSim(q, qm, k=k, engine="screened",
                          screen_precision="auto")
    tiers = []
    for ti in range(n_tiles):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        tiers.append(acc._tier_idx)
    # first DOWN_AFTER batches run high while the probe confirms, then
    # the stream drops to the cheap tier and stays there
    assert tiers[0] == 0
    assert tiers[-1] == 2, f"tier trajectory {tiers}"
    _check_exact(acc, q, qm, docs, dm, k)


def test_streaming_auto_stays_high_on_concentrated_corpus():
    rng = np.random.default_rng(51)
    k = 8
    n_tiles = 3
    q, qm, docs, dm = _concentrated_corpus(rng, n_tiles)
    acc = StreamingMaxSim(q, qm, k=k, engine="screened",
                          screen_precision="auto")
    for ti in range(n_tiles):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        assert acc._tier_idx == 0, "downshifted on a concentrated corpus"
    _check_exact(acc, q, qm, docs, dm, k)


def test_streaming_auto_reescalates_when_the_corpus_turns_concentrated():
    rng = np.random.default_rng(52)
    k = 8
    n_tiles = 5
    # tiles 0-2 wide-gap (downshift), tiles 3-4 concentrated (realized
    # failures at the cheap tier must push the ladder back up)
    q, qm, docs, dm = _tiled_corpus(rng, 3)
    docs_c, dm_c = _concentrated_tiles(rng, 2)
    docs = np.concatenate([docs, docs_c])
    dm = np.concatenate([dm, dm_c])
    acc = StreamingMaxSim(q, qm, k=k, engine="screened",
                          screen_precision="auto")
    tiers = []
    for ti in range(n_tiles):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        tiers.append(acc._tier_idx)
    assert tiers[2] == 2, f"no downshift on the wide-gap prefix: {tiers}"
    assert tiers[-1] < 2, f"no re-escalation on the shift: {tiers}"
    _check_exact(acc, q, qm, docs, dm, k)


def test_streaming_fixed_tier_never_moves():
    rng = np.random.default_rng(53)
    k = 8
    q, qm, docs, dm = _tiled_corpus(rng, 2)
    acc = StreamingMaxSim(q, qm, k=k, engine="screened",
                          screen_precision="high")
    for ti in range(2):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        assert acc._tier_idx == 0
    assert acc._ctrl is None
    _check_exact(acc, q, qm, docs, dm, k)


# ------------------------------------------------------------ sharded


def test_sharded_streaming_auto_downshifts_and_stays_exact():
    rng = np.random.default_rng(54)
    mesh = make_mesh(8, dp=4)                    # mp=2
    k = 8
    n_tiles = 4
    q, qm, docs, dm = _tiled_corpus(rng, n_tiles, q_n=4)
    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh, engine="screened",
                                 screen_precision="auto")
    tiers = []
    for ti in range(n_tiles):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        tiers.append(acc._tier_idx)
    assert tiers[0] == 0
    assert tiers[-1] == 2, f"tier trajectory {tiers}"
    _check_exact(acc, q, qm, docs, dm, k)


def test_sharded_streaming_auto_escalation_repairs_exactly():
    """A downshifted sharded stream hitting a concentrated tile must (a)
    repair that tile exactly via the on-device high-tier re-run and (b)
    re-escalate the ladder."""
    rng = np.random.default_rng(55)
    mesh = make_mesh(8, dp=4)                    # mp=2
    k = 8
    n_tiles = 4
    q, qm, docs, dm = _tiled_corpus(rng, 3, q_n=4)
    docs_c, dm_c = _concentrated_tiles(rng, 1)
    docs = np.concatenate([docs, docs_c])
    dm = np.concatenate([dm, dm_c])
    acc = ShardedStreamingMaxSim(q, qm, k=k, mesh=mesh, engine="screened",
                                 screen_precision="auto")
    tiers = []
    for ti in range(n_tiles):
        lo = ti * TILE
        acc.update(docs[lo:lo + TILE], dm[lo:lo + TILE], lo)
        tiers.append(acc._tier_idx)
    assert tiers[2] == 2, f"no downshift on the wide-gap prefix: {tiers}"
    assert tiers[-1] < 2, f"no re-escalation on the shift: {tiers}"
    _check_exact(acc, q, qm, docs, dm, k)
