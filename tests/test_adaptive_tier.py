"""Adaptive screen-tier controller (VERDICT r4 item 1): the library
default `screen_precision="auto"` runs the lean 1-pass plan, and the
streaming accumulators escalate the tier from observed per-batch repair
diagnostics. Exactness never depends on the tier (certificates + in-trace
repair), so these tests check (a) the escalation RULE, (b) that a
benign stream stays at the fast tier, (c) that an adversarial clustered
stream escalates AND stays exact, (d) that diagnostics flow through the
sharded fold."""

import numpy as np
import pytest
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.ops import screen_kernel

MEGA = screen_kernel.MEGA


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _oracle(q, b, k):
    d = ((q.astype(np.float64) ** 2).sum(1)[:, None]
         + (b.astype(np.float64) ** 2).sum(1)[None, :]
         - 2.0 * q.astype(np.float64) @ b.astype(np.float64).T)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


# ---------------------------------------------------------------------------
# the escalation rule itself (pure logic)
# ---------------------------------------------------------------------------

def test_advance_tier_benign_stays():
    idx = K.advance_screen_tier(0, 0, np.array([3, 0, 0]), 10_000,
                                1_000_000, 100)
    assert idx == 0


def test_advance_tier_escalates_on_tile_recompute():
    idx = K.advance_screen_tier(0, 0, np.array([0, 0, 1]), 10_000,
                                1_000_000, 100)
    assert idx == 1


def test_advance_tier_escalates_on_budget_pressure():
    q = 10_000
    nb = K._repair_budget(q, None, screen_kernel.pick_sub(1_000_000, 100,
                                                          q_rows=q), 100)
    idx = K.advance_screen_tier(0, 0, np.array([0, nb // 2 + 1, 0]), q,
                                1_000_000, 100)
    assert idx == 1
    # class-A pressure escalates too
    na = K._chernoff_budget(q, K._BIN_FLAG_RATE[1], 100)
    idx = K.advance_screen_tier(0, 0, np.array([na // 2 + 1, 0, 0]), q,
                                1_000_000, 100)
    assert idx == 1


def test_advance_tier_ignores_stale_and_caps():
    # diagnostics from an older tier must not double-escalate
    assert K.advance_screen_tier(1, 0, np.array([0, 0, 1]), 100, MEGA,
                                 10) == 1
    # the top of the ladder never escalates past itself
    assert K.advance_screen_tier(2, 2, np.array([0, 0, 1]), 100, MEGA,
                                 10) == 2


def test_controller_deescalates_after_clean_streak():
    """One clustered region must not condemn a 100M-row stream to the
    elevated tier forever: after DOWN_AFTER consecutive clean batches the
    controller steps back down (hysteresis bounds any thrash)."""
    ctrl = K.ScreenTierController()
    q, n = 10_000, 1_000_000
    ctrl.observe(np.array([0, 0, 1]), 0, q, n, 100)      # hard escalation
    assert ctrl.tier_idx == 1
    for _ in range(ctrl.DOWN_AFTER - 1):
        ctrl.observe(np.array([0, 0, 0]), 1, q, n, 100)
    assert ctrl.tier_idx == 1                            # not yet
    ctrl.observe(np.array([0, 0, 0]), 1, q, n, 100)
    assert ctrl.tier_idx == 0                            # back to lean
    # a non-clean batch resets the streak
    ctrl.observe(np.array([0, 0, 1]), 0, q, n, 100)
    assert ctrl.tier_idx == 1
    ctrl.observe(np.array([0, 5, 0]), 1, q, n, 100)      # class-B activity
    for _ in range(ctrl.DOWN_AFTER - 1):
        ctrl.observe(np.array([0, 0, 0]), 1, q, n, 100)
    assert ctrl.tier_idx == 1                            # streak was reset
    # stale diagnostics (taken at another tier) neither move nor count
    ctrl.observe(np.array([0, 0, 0]), 0, q, n, 100)
    assert ctrl.tier_idx == 1


def test_resolve_screen_tier():
    assert K.resolve_screen_tier("auto") == ("default", True)
    assert K.resolve_screen_tier("medium") == ("medium", False)
    # the lean plan is narrower than the headroom'd plan
    cap = 10_000
    assert K._merge_width(100, 1, cap, lean=True) < \
        K._merge_width(100, 1, cap, lean=False)


# ---------------------------------------------------------------------------
# streaming integration (interpret-mode kernel on CPU)
# ---------------------------------------------------------------------------

def test_streaming_auto_stays_fast_on_benign_corpus():
    rng = np.random.default_rng(31)
    q = _norm_rows(rng.standard_normal((8, 48)).astype(np.float32))
    b = _norm_rows(rng.standard_normal((MEGA, 48)).astype(np.float32))
    acc = K.StreamingKNN(q, k=10, engine="screened")
    acc.update(b[: MEGA // 2])
    acc.update(b[MEGA // 2:])
    # the second update harvested the first batch's diagnostics...
    # (batches below MEGA rows route to the verified early-return with
    # zero diagnostics, which must also not escalate)
    assert acc._tier_idx == 0
    _, idx = acc.finalize()
    np.testing.assert_array_equal(idx, _oracle(q, b, 10))


def test_streaming_auto_escalates_on_adversarial_corpus_and_stays_exact():
    """A clustered corpus (every base row a tiny perturbation of one
    point) puts EVERY candidate inside the certificate band: the lean
    1-pass count certificate fails for every query, class-B overflows
    into the whole-tile recompute (exactness preserved), and the
    controller must escalate the tier for the following batches."""
    rng = np.random.default_rng(32)
    d = 32
    center = _norm_rows(rng.standard_normal((1, d)).astype(np.float32))
    q = _norm_rows(center + 1e-3 * rng.standard_normal((6, d))
                   .astype(np.float32))
    b = _norm_rows(
        np.repeat(center, MEGA + 64, axis=0)
        + 1e-4 * rng.standard_normal((MEGA + 64, d)).astype(np.float32))
    acc = K.StreamingKNN(q, k=5, engine="screened")
    acc.update(b[:MEGA])           # screened at the lean tier; all certs fail
    acc.update(b[MEGA:])           # harvest -> must escalate
    assert acc._tier_idx >= 1, "controller failed to escalate"
    dist, idx = acc.finalize()
    # the engine contract is exactness UNDER THE ENGINE'S fp32 arithmetic
    # (on this corpus the true distance spread ~1e-5 sits below fp32
    # cancellation noise of the qn+bn-2qb epilogue, so a float64 oracle
    # is the wrong bar — the reference's own engines have the same
    # property). The repair path shares the exact engine's arithmetic, so
    # the k smallest fp32 DISTANCES must agree exactly; tied indices may
    # legitimately differ across the batch merge.
    ref = K.StreamingKNN(q, k=5, engine="exact")
    ref.update(b[:MEGA])
    ref.update(b[MEGA:])
    ref_d, _ = ref.finalize()
    np.testing.assert_array_equal(dist, ref_d)


def test_sharded_fold_reports_diagnostics():
    """The mesh fold psums per-shard diagnostics so the sharded stream's
    controller sees global repair counts."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from neighborhoodwatch_tpu.parallel.mesh import make_mesh
    from neighborhoodwatch_tpu.parallel.sharded_knn import ShardedStreamingKNN

    rng = np.random.default_rng(33)
    d = 32
    q = _norm_rows(rng.standard_normal((8, d)).astype(np.float32))
    b = _norm_rows(rng.standard_normal((2 * MEGA, d)).astype(np.float32))
    mesh = make_mesh(2, dp=1)
    acc = ShardedStreamingKNN(q, k=6, mesh=mesh, engine="screened",
                              screen_precision="auto")
    acc.update(jnp.asarray(b), 0)
    assert acc._pending_diag is not None
    diag = np.asarray(acc._pending_diag[0])
    assert diag.shape == (3,) and (diag >= 0).all()
    _, idx = acc.finalize()
    np.testing.assert_array_equal(idx, _oracle(q, b, 6))
