"""Screened engine: fused Pallas distance+screen kernel (interpret mode on
CPU) + certified re-rank + fallback. The kernel itself is the TPU-native
replacement for RAFT's fused distance+select (reference: cu_knn.py:243-245);
these tests pin its exactness contract on every metric and edge shape."""

import numpy as np
import pytest
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import screen_kernel
from neighborhoodwatch_tpu.ops.knn import knn, screened_knn, _screened_select

MEGA = screen_kernel.MEGA


def _data(q_n, b_n, d, seed=0, normalize=False):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((q_n, d)).astype(np.float32)
    b = rng.standard_normal((b_n, d)).astype(np.float32)
    if normalize:
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
    return q, b


def _oracle_sets(q, b, k, metric):
    """float64 neighbor sets (the arbiter for fp32 tie-order differences)."""
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    if metric in ("sqeuclidean", "euclidean"):
        dm = ((q64 ** 2).sum(1)[:, None] + (b64 ** 2).sum(1)[None, :]
              - 2 * q64 @ b64.T)
    elif metric == "cosine":
        qn = q64 / np.linalg.norm(q64, axis=1, keepdims=True)
        bn = b64 / np.linalg.norm(b64, axis=1, keepdims=True)
        dm = 1.0 - qn @ bn.T
    else:
        dm = 1.0 - q64 @ b64.T
    return np.argsort(dm, axis=1, kind="stable")[:, :k]


@pytest.mark.parametrize("metric", ["sqeuclidean", "euclidean", "cosine", "dot"])
def test_screened_exact_all_metrics(metric):
    q, b = _data(16, MEGA + 1000, 64, seed=1)  # one mega + ragged tail
    k = 10
    d_s, i_s = screened_knn(q, b, k, metric=metric)
    oracle = _oracle_sets(q, b, k, metric)
    for r in range(q.shape[0]):
        assert set(np.asarray(i_s)[r]) == set(oracle[r]), (metric, r)
    # distances ascending
    assert (np.diff(np.asarray(d_s), axis=1) >= -1e-6).all()


def test_screened_matches_exact_engine_aligned():
    q, b = _data(8, 2 * MEGA, 48, seed=2)
    d_s, i_s = screened_knn(q, b, 25)
    d_e, i_e = knn(q, b, 25, engine="exact")
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_e))
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_e), atol=1e-4)


def test_small_base_routes_to_exact():
    q, b = _data(8, 500, 32, seed=3)
    d_s, i_s = screened_knn(q, b, 5)
    d_e, i_e = knn(q, b, 5, engine="exact")
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_e))


def test_base_offset_applied():
    q, b = _data(4, MEGA + 17, 32, seed=4)
    _, i0 = screened_knn(q, b, 5)
    _, i1 = screened_knn(q, b, 5, base_offset=1234)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0) + 1234)


def test_certificate_detects_planted_duplicates():
    """Plant 5 near-identical rows 128 apart so they collide in one lane
    bin; the trio keeps only 3, so the certificate must flag the query
    (and the fallback must still return the exact set)."""
    q, b = _data(4, MEGA, 32, seed=5)
    target = q[0] + 1e-4 * np.arange(32, dtype=np.float32)
    for j in range(5):
        b[7 + j * 128] = target + 1e-6 * j  # same lane bin (stride 128)
    k = 5
    cd, ci, _ = screen_kernel.screen_candidates(
        jnp.asarray(q), jnp.asarray(b), epilogue="l2",
        screen_precision="high", interpret=True)
    _, _, ok, _, _ = _screened_select(jnp.asarray(q), jnp.asarray(b),
                                      cd, ci, k, 256, "sqeuclidean", 3)
    assert not bool(np.asarray(ok)[0]), \
        "certificate failed to flag a 5-way bin collision"
    # end-to-end result is still exact thanks to the fallback
    d_s, i_s = screened_knn(q, b, k)
    oracle = _oracle_sets(q, b, k, "sqeuclidean")
    assert set(np.asarray(i_s)[0]) == set(oracle[0])


@pytest.mark.parametrize("precision", ["default", "medium", "high"])
@pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "dot"])
def test_screened_exact_under_adversarial_rounding(precision, metric):
    """The 1/2-pass certificate eps is computed from the data's actual
    bf16 residual norms (ops.knn._screen_err_bounds). Data built to
    maximize bf16 rounding error (mantissas just past the bf16 cut, mixed
    magnitudes) must still yield EXACT results at every tier: either the
    certificate holds (eps sound) or the repair path fires."""
    rng = np.random.default_rng(17)
    q_n, b_n, d = 12, MEGA + 333, 64
    # worst-case-ish bf16 operands: 1 + (2m+1)*2^-9 rounds with near-half-
    # ulp error in every element; random signs and a 2^±6 magnitude spread
    def adversarial(n):
        m = rng.integers(0, 256, (n, d))
        x = (1.0 + (2 * m + 1) * 2.0 ** -9).astype(np.float32)
        x *= rng.choice([-1.0, 1.0], (n, d)).astype(np.float32)
        x *= np.exp2(rng.integers(-6, 7, (n, 1))).astype(np.float32)
        return x
    q, b = adversarial(q_n), adversarial(b_n)
    k = 8
    d_s, i_s = screened_knn(q, b, k, metric=metric,
                            screen_precision=precision)
    oracle = _oracle_sets(q, b, k, metric)
    for r in range(q_n):
        assert set(np.asarray(i_s)[r]) == set(oracle[r]), (precision,
                                                           metric, r)


def test_screen_err_bounds_are_sound():
    """The computed per-query dot-error bound must dominate the ACTUAL
    screen error |q.b - screen(q, b)| for every (q, b) pair, at both
    computed tiers, including zero padding rows (which must not poison
    the cosine ratio bound)."""
    from neighborhoodwatch_tpu.ops.knn import _screen_err_bounds

    rng = np.random.default_rng(23)
    q = (rng.standard_normal((8, 96)) *
         np.exp2(rng.integers(-4, 5, (8, 1)))).astype(np.float32)
    b = (rng.standard_normal((500, 96)) *
         np.exp2(rng.integers(-4, 5, (500, 1)))).astype(np.float32)
    b[490:] = 0.0                                     # padding rows
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    exact = q64 @ b64.T
    bhi = jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32)
    qhi = jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
    qlo = (jnp.asarray(q) - qhi).astype(jnp.bfloat16).astype(jnp.float32)
    screens = {
        1: np.asarray(qhi, np.float64) @ np.asarray(bhi, np.float64).T,
        2: (np.asarray(qhi, np.float64) + np.asarray(qlo, np.float64))
           @ np.asarray(bhi, np.float64).T,
    }
    for passes, scr in screens.items():
        d_err, r_err, qabs = _screen_err_bounds(
            jnp.asarray(q), jnp.asarray(b), passes)
        err = np.abs(exact - scr)                      # (8, 500)
        assert (err.max(axis=1) <= np.asarray(d_err)).all(), passes
        bnorm = np.linalg.norm(b64, axis=1)
        live = bnorm > 0
        rerr_true = (err[:, live] / bnorm[live][None, :]).max(axis=1)
        assert (rerr_true <= np.asarray(r_err)).all(), passes
        # and the bound is meaningfully tighter than the static 2^-7/2^-8
        static = (2.0 ** -(6 + passes)) * np.asarray(qabs) * bnorm.max()
        assert (np.asarray(d_err) < static).all(), passes


def test_screen_err_bound_covers_qlo_double_rounding():
    """The 2-pass screen ships bf16(qlo) — its per-query bound must cover
    the qlo DOUBLE-ROUNDING term (qlo - bf16(qlo)).bhi (r3 review: the
    old bound claimed q.bhi exact and relied on an RMS-sized guard).
    Queries constructed so every qlo element sits a half-ulp past the
    bf16 cut maximize exactly that term."""
    from neighborhoodwatch_tpu.ops.knn import _screen_err_bounds

    rng = np.random.default_rng(31)
    n, d = 6, 128
    # qhi = 1.0 exactly; qlo_f = 2^-9 + (2j+1)*2^-17 rounds to bf16 with a
    # near-half-ulp error in every element (bf16 ulp at 2^-9 is 2^-16)
    j = rng.integers(0, 32, (n, d))
    q = (1.0 + 2.0 ** -9 + (2 * j + 1) * 2.0 ** -17).astype(np.float32)
    q *= rng.choice([-1.0, 1.0], (n, d)).astype(np.float32)
    # base EXACTLY bf16-representable: blo = 0, so the screen's only
    # input error is the qlo double rounding this test targets
    b = np.asarray(jnp.asarray(
        rng.standard_normal((300, d)).astype(np.float32)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    bhi = np.asarray(jnp.asarray(b).astype(jnp.bfloat16), np.float64)
    qhi = np.asarray(jnp.asarray(q).astype(jnp.bfloat16), np.float64)
    qlo_b = np.asarray(jnp.asarray(
        (jnp.asarray(q) - jnp.asarray(qhi, jnp.float32))
    ).astype(jnp.bfloat16), np.float64)
    scr = (qhi + qlo_b) @ bhi.T                       # ideal 2-pass screen
    err = np.abs(q64 @ b64.T - scr)
    d_err, _, _ = _screen_err_bounds(jnp.asarray(q), jnp.asarray(b), 2)
    assert (err.max(axis=1) <= np.asarray(d_err)).all()
    # with blo = 0, the double-rounding term IS the screen's input error
    # (otherwise this test stresses nothing)
    dr = np.abs(qlo_b - (q64 - qhi)) @ np.abs(bhi).T
    assert dr.max() > 0.9 * err.max() > 0.0


def test_eps3_static_bound_covers_three_pass_screen():
    """The 3-pass static bound (_eps3_rel) must dominate the bf16x3
    screen's true error, including all three dropped residual terms, on
    near-half-ulp adversarial operands."""
    from neighborhoodwatch_tpu.ops.knn import _eps3_rel
    from neighborhoodwatch_tpu.ops.screen_kernel import PACK_EPS_REL

    rng = np.random.default_rng(37)
    n, d = 6, 256
    def adversarial(rows):
        m = rng.integers(0, 256, (rows, d))
        x = (1.0 + (2 * m + 1) * 2.0 ** -9).astype(np.float32)
        return x * rng.choice([-1.0, 1.0], (rows, d)).astype(np.float32)
    q, b = adversarial(n), adversarial(400)
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    f32, bf16 = jnp.float32, jnp.bfloat16
    qhi = jnp.asarray(q).astype(bf16)
    bhi = jnp.asarray(b).astype(bf16)
    qlo = (jnp.asarray(q) - qhi.astype(f32)).astype(bf16)
    blo = (jnp.asarray(b) - bhi.astype(f32)).astype(bf16)
    to64 = lambda x: np.asarray(x.astype(f32), np.float64)
    scr = (to64(qhi) @ to64(bhi).T + to64(qlo) @ to64(bhi).T
           + to64(qhi) @ to64(blo).T)
    err = np.abs(q64 @ b64.T - scr)
    scale = (np.linalg.norm(q64, axis=1)[:, None]
             * np.linalg.norm(b64, axis=1)[None, :])
    # the ideal-arithmetic error must fit inside the non-accumulation,
    # non-quantization part of the budget (accumulation/quantization are
    # kernel-side effects this numpy model does not reproduce)
    budget = _eps3_rel(d) - PACK_EPS_REL
    assert (err / scale).max() <= budget


def test_screen_kernel_candidate_indices_valid():
    q, b = _data(4, MEGA + 100, 24, seed=6)
    cd, ci, n_mega = screen_kernel.screen_candidates(
        jnp.asarray(q), jnp.asarray(b), n_rows=MEGA, epilogue="l2",
        interpret=True)
    ci = np.asarray(ci)
    cd = np.asarray(cd)
    assert n_mega == 1
    valid = np.isfinite(cd)
    assert (ci[valid] >= 0).all() and (ci[valid] < MEGA).all()
    # each query's best candidate equals the true argmin over the prefix
    d64 = ((q.astype(np.float64) ** 2).sum(1)[:, None]
           + (b[:MEGA].astype(np.float64) ** 2).sum(1)[None, :]
           - 2 * q.astype(np.float64) @ b[:MEGA].astype(np.float64).T)
    np.testing.assert_array_equal(ci[np.arange(4), cd.argmin(1)],
                                  d64.argmin(1))


def test_screen_kernel_alternate_tile_shapes():
    """tb/sub/dk are tunable (perf sweeps); the packed-position decode
    must stay exact for non-default base-tile widths."""
    import pytest

    for tb, sub in ((512, 16), (2048, 8)):
        mega = tb * sub
        q, b = _data(4, mega + 70, 24, seed=7)
        cd, ci, n_mega = screen_kernel.screen_candidates(
            jnp.asarray(q), jnp.asarray(b), n_rows=mega, epilogue="l2",
            tb=tb, sub=sub, interpret=True)
        ci = np.asarray(ci)
        cd = np.asarray(cd)
        assert n_mega == 1
        valid = np.isfinite(cd)
        assert (ci[valid] >= 0).all() and (ci[valid] < mega).all()
        d64 = ((q.astype(np.float64) ** 2).sum(1)[:, None]
               + (b[:mega].astype(np.float64) ** 2).sum(1)[None, :]
               - 2 * q.astype(np.float64) @ b[:mega].astype(np.float64).T)
        np.testing.assert_array_equal(ci[np.arange(4), cd.argmin(1)],
                                      d64.argmin(1))
    # position-field overflow must be rejected, not silently wrapped
    # (128 x 16 lane-slices = 2048 positions > the 10-bit field)
    with pytest.raises(AssertionError):
        screen_kernel.screen_candidates(
            jnp.asarray(q), jnp.asarray(b), n_rows=mega, epilogue="l2",
            tb=2048, sub=128, interpret=True)


def test_screen_kernel_wide_tier_positions():
    """The sub=112 wide tier (pick_sub at k<=150 on big bases) packs
    in-bin positions up to 895 — past the 9-bit field of the original
    packing. Plant exact matches deep in the mega-tile (lane-slice
    index > 511) and check the decode recovers the exact rows."""
    mega = screen_kernel.TB * 112
    q, b = _data(4, mega + 70, 24, seed=11)
    plant = np.array([110_003, 111_222, 112_441, 114_660]) % mega
    b[plant] = q * 1.0                      # distance-0 best candidates
    cd, ci, n_mega = screen_kernel.screen_candidates(
        jnp.asarray(q), jnp.asarray(b), n_rows=mega, epilogue="l2",
        sub=112, interpret=True)
    assert n_mega == 1
    cd = np.asarray(cd)
    ci = np.asarray(ci)
    # every planted row sits at in-bin position (row // LANES) > 511
    assert (plant // screen_kernel.LANES > 511).all()
    np.testing.assert_array_equal(ci[np.arange(4), cd.argmin(1)], plant)
    assert screen_kernel.pick_sub(2_000_000, 100) == 112
    assert screen_kernel.pick_sub(2_000_000, 600) == 56
    assert screen_kernel.pick_sub(100_000, 100) == screen_kernel.SUB_PER_MEGA
    # very large query batches stay on the safe sub=56 tier (~0.1% repairs)
    assert screen_kernel.pick_sub(2_000_000, 100, q_rows=10_000) == 112
    assert screen_kernel.pick_sub(2_000_000, 100, q_rows=32_768) == 56


def test_repair_budget_scales_with_batch():
    """The in-trace certificate-repair budget must scale with the query
    batch (a fixed 128 sat ~3 sigma from the whole-tile-recompute cliff
    at Q=24576 on the wide tier — r3 review) BUT in 128-row quanta that
    keep the 10k headline at exactly 128: repair cost is step-quantized
    (nb=156 measured slower than nb=256 and +18% over nb=128 end-to-end
    on v5e), and the Poisson tail at lambda~61 makes 128 a 4e-13 risk."""
    from neighborhoodwatch_tpu.ops.knn import _repair_budget
    # headline: Q=10k on the wide (sub=112) tier stays at the 128 floor
    assert _repair_budget(10_000, None, 112, 100) == 128
    assert _repair_budget(1_000, None, 112, 100) == 128     # floor
    assert _repair_budget(64, None, 112, 100) == 64         # never > Q
    # big batches step up BEFORE the cliff gets within Chernoff reach
    assert _repair_budget(24_576, None, 112, 100) == 256
    # the narrow tier's lower failure rate sizes smaller at the same Q
    assert _repair_budget(100_000, None, 56, 100) == 384
    assert _repair_budget(100_000, None, 112, 100) >= 768
    # k above the measured 100 inflates the expected-failure intensity
    assert (_repair_budget(24_576, None, 56, 150)
            > _repair_budget(24_576, None, 56, 100))
    assert _repair_budget(24_576, 200, 112, 100) == 200     # explicit wins
    # budgets are always 128-row quanta (or Q itself)
    for q in (5_000, 10_000, 20_000, 50_000):
        nb = _repair_budget(q, None, 112, 100)
        assert nb % 128 == 0


def test_prepared_base_matches_unprepared():
    """prepare_base hoists the per-call corpus passes (norms + certificate
    stats); results must be identical to the unprepared path on every
    metric, and the stats must match the in-trace computation."""
    from neighborhoodwatch_tpu.ops.knn import prepare_base, \
        compute_screen_stats

    q, b = _data(8, MEGA + 300, 48, seed=23)
    prep = prepare_base(b)
    np.testing.assert_allclose(np.asarray(prep.bn_row),
                               (b.astype(np.float64) ** 2).sum(1),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(prep.stats),
                                  np.asarray(compute_screen_stats(b)))
    for metric in ("sqeuclidean", "cosine", "dot"):
        d0, i0 = knn(q, b, 10, metric=metric, engine="screened")
        d1, i1 = knn(q, prep, 10, metric=metric, engine="screened")
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_pipelined_kernel_matches_plain():
    """The software-pipelined kernel variant (epilogue of sub-tile i
    overlapped with sub-tile i+1's MXU steps) must be bit-identical to the
    plain kernel: same candidate indices, same packed distances. Masked
    tail rows decode to NaN-bit-pattern keys in BOTH variants, so the
    distance comparison is NaN-aware."""
    for b_n, tb, sub, epi, d in (
            (1061, 128, 4, "l2", 128),      # ragged tail
            (1024, 128, 4, "dot", 256),     # exact megas, n_dk > 1
            (562, 128, 2, "rdot", 128),
            (3000, 256, 3, "l2", 384)):
        q, b = _data(8, b_n, d, seed=17)
        outs = [screen_kernel.screen_candidates(
                    jnp.asarray(q), jnp.asarray(b), epilogue=epi,
                    screen_precision="default", tb=tb, sub=sub,
                    interpret=True, pipelined=p) for p in (False, True)]
        (d0, i0, nm0), (d1, i1, nm1) = outs
        assert nm0 == nm1
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        d0, d1 = np.asarray(d0), np.asarray(d1)
        both_nan = np.isnan(d0) & np.isnan(d1)
        np.testing.assert_array_equal(d0[~both_nan], d1[~both_nan])


def test_select_m_override_stays_exact():
    """knn(select_m=...) narrows/widens the certified merge width; any
    value must keep results exact (a too-slim m fails certificates and
    repairs in-trace)."""
    q, b = _data(6, MEGA + 200, 32, seed=13)
    k = 12
    oracle = _oracle_sets(q, b, k, "sqeuclidean")
    for m in (16, 64, 512):
        _, i_s = knn(q, b, k, engine="screened", select_m=m)
        for r in range(6):
            assert set(np.asarray(i_s)[r]) == set(oracle[r]), (m, r)


def test_screened_large_k():
    """Large k widens the merged top-M; the re-rank block shrinks to keep
    the gather buffer bounded and results stay exact."""
    q, b = _data(4, 2 * MEGA, 24, seed=11)
    k = 600
    d_s, i_s = screened_knn(jnp.asarray(q), jnp.asarray(b), k)
    d64 = ((q.astype(np.float64) ** 2).sum(1)[:, None]
           + (b.astype(np.float64) ** 2).sum(1)[None, :]
           - 2 * q.astype(np.float64) @ b.astype(np.float64).T)
    oracle = np.argsort(d64, axis=1, kind="stable")[:, :k]
    for r in range(4):
        assert set(np.asarray(i_s)[r]) == set(oracle[r])


def test_norm_guard_covers_worst_case_accumulation():
    """norm_guard must budget the WORST-CASE fp32 accumulation of the
    norm computation itself — (dim+1)*2^-24 on the squared sum regardless
    of add order, halved through sqrt plus one sqrt rounding (r3 review:
    the flat 1.0001 guard is outgrown at dim >= ~3500) — and
    _prepare_arrays' certificate stats must dominate their float64
    truth (they are UPPER bounds consumed multiplicatively by eps)."""
    from neighborhoodwatch_tpu.ops.knn import _prepare_arrays
    from neighborhoodwatch_tpu.ops.screen_kernel import norm_guard

    u = 2.0 ** -24
    for dim in (64, 1536, 4096, 16384, 65536, 262144):
        # rigorous reciprocal-side requirement: a computed positive sum
        # can be true*(1 - gamma) with gamma = dim*u/(1 - dim*u), so the
        # guard must be >= 1/(1-gamma), PLUS the guard multiply's own
        # rounding and a sqrt rounding (second r3 review finding: the
        # first-order (dim+1)*u check missed the dim^2*u^2 term at
        # dim >= ~8192)
        gamma = dim * u / (1.0 - dim * u)
        assert norm_guard(dim) >= (1.0 + gamma) * (1.0 + 4 * u), dim

    rng = np.random.default_rng(41)
    dim = 4096
    b = (rng.standard_normal((64, dim)) *
         np.exp2(rng.integers(-5, 6, (64, 1)))).astype(np.float32)
    _, stats, _ = _prepare_arrays(jnp.asarray(b))
    stats = np.asarray(stats, np.float64)
    b64 = b.astype(np.float64)
    bn_true = (b64 ** 2).sum(1)
    blo64 = b64 - np.asarray(
        jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32), np.float64)
    blo_n = np.sqrt((blo64 ** 2).sum(1))
    assert stats[0] >= bn_true.max()                 # bn_max
    assert stats[1] >= np.sqrt(bn_true.max())        # babs_max
    assert stats[2] >= blo_n.max()                   # blo_max
    assert stats[3] >= (blo_n / np.sqrt(bn_true)).max()   # ratio_max


def test_screened_garbage_base_rows_never_win():
    """Base rows containing inf (bad upstream embeddings) make the l2
    epilogue's qn + inf - 2*inf a NaN. Two r3 review fixes pinned here:
    a NaN with its sign bit set used to bitcast to a huge NEGATIVE packed
    key that won every screen bin, and NaN distances WIN lax.top_k, so
    even the exact engine returned garbage rows as nearest. Sanitized
    (every NON-FINITE distance -> +inf), garbage rows must lose in every
    engine and the engines must agree — including "dot", where a +inf
    base row's d = 1 - inf = -inf used to win the exact engine while the
    screen kernel's isinf mask excluded it (r3 review: engines disagreed
    on the same corpus)."""
    rng = np.random.default_rng(77)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    b = rng.standard_normal((MEGA + 500, 32)).astype(np.float32)
    bad = rng.choice(len(b), 64, replace=False)
    b[bad[:32]] = np.inf
    b[bad[32:]] = -np.inf
    k = 9
    for metric in ("sqeuclidean", "cosine", "dot"):
        d_e, i_e = knn(q, b, k, metric=metric, engine="exact")
        d_s, i_s = screened_knn(q, b, k, metric=metric)
        for r in range(6):
            got, exp = set(np.asarray(i_s)[r]), set(np.asarray(i_e)[r])
            assert got == exp, (metric, r)
            assert not (got & set(bad)), (metric, r)
            assert not (exp & set(bad)), (metric, r)


def test_bf16_round_matches_real_conversion_bitwise():
    """screen_kernel.bf16_round (integer RNE, fold-proof) must equal the
    hardware bf16 conversion BIT-EXACTLY on finite values and +/-inf —
    it feeds every certificate residual, so a semantic drift would
    desync the eps bounds from what the kernels actually drop. astype
    itself is NOT usable there: XLA's excess-precision folding turns
    `x - x.astype(bf16).astype(f32)` into zero under jit on TPU (the
    round-3 soundness bug this helper fixed)."""
    import jax
    rng = np.random.default_rng(7)
    vals = [rng.standard_normal(8192).astype(np.float32),
            (rng.standard_normal(2048) *
             np.exp(rng.uniform(-80, 80, 2048))).astype(np.float32)]
    # crafted tie/carry patterns: low mantissa exactly 0x8000 (RNE to
    # even), 0x7FFF (down), 0x8001 (up), across signs and exponents
    exps = np.array([1, 63, 127, 200, 254], np.uint32)
    m7 = np.array([0, 1, 0x7E, 0x7F], np.uint32)
    low = np.array([0x0000, 0x0001, 0x7FFF, 0x8000, 0x8001, 0xFFFF],
                   np.uint32)
    bits = [(s << 31) | (e << 23) | (m << 16) | lo
            for s in (0, 1) for e in exps for m in m7 for lo in low]
    vals.append(np.array(bits, np.uint32).view(np.float32))
    # zeros, subnormals, max finite, infinities
    vals.append(np.array([0.0, -0.0, 1e-44, -1e-44, 1e-38, 3.4e38,
                          -3.4e38, np.inf, -np.inf], np.float32))
    x = np.concatenate(vals)
    got = np.asarray(jax.jit(screen_kernel.bf16_round)(x))
    want = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                      .astype(jnp.float32))
    np.testing.assert_array_equal(got.view(np.uint32),
                                  want.view(np.uint32))


def test_certificate_residuals_survive_jit():
    """The certificate's data-dependent stats and per-query error bounds
    must be NONZERO under jit for data with real bf16 residuals. On TPU,
    computing them with astype round-trips made them exactly zero (XLA
    excess-precision folding) — an eps under-budget that silently
    voided the exactness certificates; this test pins the fold-proof
    computation on every backend that runs the suite."""
    import jax
    from neighborhoodwatch_tpu.ops.knn import (_prepare_arrays,
                                               _screen_err_bounds)
    rng = np.random.default_rng(11)
    base = rng.standard_normal((512, 384)).astype(np.float32)
    q = rng.standard_normal((64, 384)).astype(np.float32)
    _, stats, bhi = jax.jit(_prepare_arrays)(jnp.asarray(base))
    stats = np.asarray(stats)
    assert stats[2] > 1e-6, f"blo_max collapsed to {stats[2]} under jit"
    assert stats[3] > 1e-6, f"ratio_max collapsed to {stats[3]} under jit"
    # the true residual norm is a lower bound on the guarded stat
    blo_true = np.linalg.norm(
        base - np.asarray(jnp.asarray(base).astype(jnp.bfloat16),
                          np.float32), axis=1)
    assert stats[2] >= blo_true.max() * 0.999

    for passes in (1, 2):
        d_err = np.asarray(jax.jit(
            lambda qq, bb, p=passes: _screen_err_bounds(qq, bb, p)[0]
        )(jnp.asarray(q), jnp.asarray(base)))
        d_err_eager = np.asarray(
            _screen_err_bounds(jnp.asarray(q), jnp.asarray(base),
                               passes)[0])
        np.testing.assert_allclose(d_err, d_err_eager, rtol=1e-5)
        assert d_err.min() > 1e-6, \
            f"{passes}-pass d_err collapsed under jit"


def test_maxsim_doc_stats_survive_jit():
    """Same fold-proofing for the MaxSim certificate's doc stats and the
    3-pass lo operands (doc_cert_stats / the operand prep both computed
    zero residuals under jit on TPU before bf16_round)."""
    import jax
    from neighborhoodwatch_tpu.ops.maxsim_kernel import doc_cert_stats
    rng = np.random.default_rng(13)
    docs = rng.standard_normal((32, 8, 128)).astype(np.float32)
    dmask = np.ones((32, 8), bool)
    stats = np.asarray(jax.jit(
        lambda d, m: doc_cert_stats(d, m, 128, need_dlo=True)
    )(jnp.asarray(docs), jnp.asarray(dmask)))
    assert stats[1] > 1e-6, f"dlo_max collapsed to {stats[1]} under jit"


def _traced_exact_check(q, b, k, metric="sqeuclidean", precision="default"):
    """Run screened_knn_traced and compare the neighbor set to float64."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import screened_knn_traced
    d, i = screened_knn_traced(jnp.asarray(q), jnp.asarray(b), b.shape[0],
                               0, k, metric, precision)
    oracle = _oracle_sets(q, b, k, metric)
    for r in range(q.shape[0]):
        assert set(np.asarray(i)[r].tolist()) == set(oracle[r]), r


def test_bin_targeted_repair_recovers_collisions():
    """Class-A repair: 5 near-identical rows in ONE lane bin (the trio
    keeps 3, the certificate flags the bin) — the suspicious-bin gather
    must recover the 2 dropped true neighbors WITHOUT a full rescan
    (it is the only repair that can fire here: cert_merge holds and
    n_susp=1 <= REPAIR_BINS)."""
    q, b = _data(4, MEGA, 32, seed=41)
    target = q[0] + 1e-4 * np.arange(32, dtype=np.float32)
    for j in range(5):
        b[7 + j * 128] = target + 1e-6 * j      # one lane bin, stride 128
    _traced_exact_check(q, b, k=5)


def test_full_rescan_repair_when_bins_overflow():
    """Class-B repair: collisions planted in MORE than REPAIR_BINS
    distinct lane bins of one query force the full-rescan path — the
    result must still be exact."""
    from neighborhoodwatch_tpu.ops.knn import REPAIR_BINS
    q, b = _data(3, MEGA, 32, seed=43)
    k = 4 * (REPAIR_BINS + 1)
    for bin_j in range(REPAIR_BINS + 1):
        target = q[0] + 1e-4 * np.arange(32, dtype=np.float32) \
            + 0.01 * bin_j
        for j in range(5):                       # 5-way collision per bin
            # 1e-3 spacing keeps the rows fp32-distinguishable (1e-6
            # made the float64 oracle and the fp32 engine disagree on
            # genuine sub-fp32 ties)
            b[bin_j + 3 + j * 128] = target + 1e-3 * j
    _traced_exact_check(q, b, k=k)


def test_traced_repair_all_metrics_with_collisions():
    """Planted bin collisions stay exact on every metric through the
    traced path (the bin repair's distance math is the shared
    _exact_pair_dists — this pins the metric branches)."""
    for metric in ("sqeuclidean", "euclidean", "cosine", "dot"):
        q, b = _data(3, MEGA, 32, seed=47, normalize=True)
        target = q[1] / np.linalg.norm(q[1])
        for j in range(5):
            b[11 + j * 128] = (target + 1e-6 * j).astype(np.float32)
        _traced_exact_check(q, b, k=5, metric=metric)


def test_class_b_budget_overflow_recomputes_whole_tile():
    """When MORE queries need a class-B full rescan than the budget rows
    (max_fallback), the engine must take the whole-tile verified cond —
    the ~18x perf cliff documented in _repair_budget — and stay exact.
    Forced here with max_fallback=1 and multi-bin collisions planted on
    TWO queries (each exceeds REPAIR_BINS suspicious bins, so neither is
    class-A repairable)."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import (REPAIR_BINS,
                                               screened_knn_traced)
    q, b = _data(3, MEGA, 32, seed=53)
    k = 4 * (REPAIR_BINS + 1)
    for qi in (0, 2):
        for bin_j in range(REPAIR_BINS + 1):
            target = q[qi] + 1e-4 * np.arange(32, dtype=np.float32) \
                + 0.01 * bin_j
            for j in range(5):
                b[qi + bin_j * 7 + 3 + j * 128] = target + 1e-3 * j
    d, i = screened_knn_traced(jnp.asarray(q), jnp.asarray(b), b.shape[0],
                               0, k, "sqeuclidean", "default",
                               max_fallback=1)
    oracle = _oracle_sets(q, b, k, "sqeuclidean")
    for r in range(q.shape[0]):
        assert set(np.asarray(i)[r].tolist()) == set(oracle[r]), r


def test_bf16_round_nan_patterns_stay_nan():
    """The raw integer RNE add would carry a high-payload NaN's mantissa
    through the exponent and WRAP it to a finite +/-0.0 (measured:
    0x7FFFFFFF -> -0.0, 0xFFFFFFFF -> +0.0 — the all-ones garbage
    pattern), handing the screen a finite bhi operand for a garbage row
    (r3 review). bf16_round must pass every NaN through unchanged so the
    residual stays NaN and the kernels' isnan sanitize excludes the row."""
    import jax
    bits = np.array([0x7FFFFFFF, 0xFFFFFFFF,   # carry wraps to +/-0.0 raw
                     0x7FC00000, 0xFFC00000,   # canonical quiet NaNs
                     0x7F800001, 0xFF800001,   # signaling, low payload
                     0x7FBFFFFF],              # mantissa carry, no exp wrap
                    np.uint32)
    x = bits.view(np.float32)
    for fn in (screen_kernel.bf16_round, jax.jit(screen_kernel.bf16_round)):
        got = np.asarray(fn(x))
        assert np.all(np.isnan(got)), got.view(np.uint32)
        # pass-through, not canonicalization: payload bits preserved
        np.testing.assert_array_equal(got.view(np.uint32), bits)


def test_screened_all_ones_garbage_rows_dot_metric():
    """An all-ones-bits base row (0xFFFFFFFF garbage memory: a NaN whose
    mantissa carry used to WRAP bf16_round to a finite 0.0) must lose on
    metric='dot' through the traced screened path: the pre-fix chain gave
    the row screen value -q·0 = 0, the unsanitized re-rank turned it into
    NaN distances, and the NaN threshold misclassified the query with
    vacuously-true certificates (r3 review). Exact and screened engines
    must agree and exclude the garbage rows."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import screened_knn_traced
    rng = np.random.default_rng(83)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    b = rng.standard_normal((MEGA + 300, 32)).astype(np.float32)
    bad = rng.choice(len(b), 48, replace=False)
    b[bad[:24]] = np.array([0xFFFFFFFF], np.uint32).view(np.float32)[0]
    b[bad[24:]] = np.nan
    k = 7
    d_e, i_e = knn(q, b, k, metric="dot", engine="exact")
    d_s, i_s = screened_knn_traced(jnp.asarray(q), jnp.asarray(b),
                                   b.shape[0], 0, k, "dot", "default")
    for r in range(len(q)):
        got, exp = set(np.asarray(i_s)[r]), set(np.asarray(i_e)[r])
        assert got == exp, r
        assert not (got & set(bad.tolist())), r
    assert not np.isnan(np.asarray(d_s)).any()


def test_class_a_budget_overflow_falls_through_to_class_b():
    """When MORE queries flag class-A (suspicious-bin) repairs than the
    Chernoff budget na, the excess never reaches the bin repair — it must
    fall through to the class-B full rescan instead of silently keeping
    its uncertified screened result (r3 review). Forced here with 160
    queries ALL given a 5-way single-bin collision at k=5: na floors at
    128, so 32 queries overflow the class-A budget."""
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import screened_knn_traced
    nq = 160
    q, b = _data(nq, MEGA, 32, seed=59)
    for qi in range(nq):
        lane = qi % 128
        start = (qi // 128) * 1024 + lane
        target = q[qi] + 1e-4 * np.arange(32, dtype=np.float32)
        for j in range(5):                    # one lane bin, stride 128
            b[start + j * 128] = target + 1e-3 * j
    d, i = screened_knn_traced(jnp.asarray(q), jnp.asarray(b), b.shape[0],
                               0, 5, "sqeuclidean", "default")
    oracle = _oracle_sets(q, b, 5, "sqeuclidean")
    wrong = [r for r in range(nq)
             if set(np.asarray(i)[r].tolist()) != set(oracle[r])]
    assert not wrong, f"{len(wrong)} queries inexact: {wrong[:8]}"


def test_engine_typo_raises():
    """A typo'd engine must error, not silently run the plain exact scan
    (bench/perf tests would quietly measure the wrong engine)."""
    q, b = _data(2, 256, 16, seed=71)
    for bad in ("vrfied", "screened ", "Exact", ""):
        with pytest.raises(ValueError, match="unknown engine"):
            knn(q, b, 3, engine=bad)


def test_nan_base_row_keeps_certificates_viable():
    """A NaN corpus row must not poison the certificate stats: excluded
    from the eps bound (it can never be a candidate), thresh stays finite
    and the planted one-bin collision repairs via class A exactly as on a
    clean corpus. Pre-fix the NaN made thresh=NaN for EVERY query, and
    before the binfix finite gate the all-False comparisons made
    cert_merge hold vacuously with n_susp=0 — the dropped collision rows
    were silently lost behind a vacuous class-A 'repair'."""
    q, b = _data(4, MEGA, 32, seed=53)
    b[9000] = np.nan
    target = q[0] + 1e-4 * np.arange(32, dtype=np.float32)
    for j in range(5):
        b[7 + j * 128] = target + 1e-6 * j      # one lane bin, stride 128
    _traced_exact_check(q, b, k=5)              # NaN row sorts last in f64


def test_class_a_gather_excludes_nonfinite_rows_dot():
    """Class-A repair gathers suspicious-bin rows by POSITION, not
    candidacy, so a +inf garbage row sharing the flagged bin reaches the
    repair's exact re-rank: under `dot` its d = 1 - inf = -inf used to
    survive the NaN-only sanitize and win the repair top_k, fabricating
    a nearest neighbor at distance -inf (r3 review)."""
    from neighborhoodwatch_tpu.ops.knn import screened_knn_traced
    q, b = _data(4, MEGA, 32, seed=59, normalize=True)
    target = q[0] / np.linalg.norm(q[0])
    for j in range(5):
        b[7 + j * 128] = (target + 1e-6 * j).astype(np.float32)
    garbage = 7 + 5 * 128                       # same lane bin as the trio
    b[garbage] = np.inf
    k = 5
    d, i = screened_knn_traced(jnp.asarray(q), jnp.asarray(b), b.shape[0],
                               0, k, "dot", "default")
    i = np.asarray(i)
    assert not (set(i.flatten().tolist()) & {garbage})
    q64, b64 = q.astype(np.float64), b.astype(np.float64)
    dm = 1.0 - q64 @ np.where(np.isfinite(b64), b64, 0.0).T
    dm[:, garbage] = np.inf
    oracle = np.argsort(dm, axis=1, kind="stable")[:, :k]
    for r in range(q.shape[0]):
        assert set(i[r].tolist()) == set(oracle[r]), r


@pytest.mark.parametrize("metric", ["sqeuclidean", "dot", "cosine"])
def test_fused_kernel_default_and_equivalent_to_dk_kernels(metric):
    """The r5 fused-depth kernel (FUSED_DEFAULT) must (a) actually engage
    for default calls at fusable shapes and (b) produce the same
    candidate top-k as the dk-chunked pipelined kernel — the 2q-prescaled
    l2 epilogue and tb=512/sub-rescaled tiling are value-identical by
    construction (docs/DESIGN.md r5), so the selected neighbor sets must
    agree exactly."""
    q, b = _data(8, screen_kernel.MEGA + 77, 24, seed=11,
                 normalize=metric == "cosine")
    k = 10
    d_f, i_f = screened_knn(q, b, k, metric=metric, interpret=True)
    # force the dk-chunked path for the comparison run
    import neighborhoodwatch_tpu.ops.screen_kernel as sk
    old = sk.FUSED_DEFAULT
    sk.FUSED_DEFAULT = False
    try:
        d_p, i_p = screened_knn(q, b, k, metric=metric, interpret=True)
    finally:
        sk.FUSED_DEFAULT = old
    np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_p),
                               rtol=1e-6, atol=1e-6)
    # and the fused gate really says yes at this shape
    assert sk._fused_ok(1, 256, sk.FUSED_TB, 128)


def test_fused_l2_epilogue_exact_duplicates_and_zero_distance():
    """The fused kernel's abs-only clamp (no max(,0)) must keep exact
    self-distances at the front: plant exact copies of queries in the
    base — their screen-space distance is 0 up to fp32 rounding, which
    the abs maps to |delta| within the certificate's accumulation eps —
    and the engine must return them first with distance ~0."""
    q, b = _data(6, MEGA + 31, 32, seed=13)
    for r in range(6):
        b[100 + 97 * r] = q[r]
    k = 4
    d_s, i_s = screened_knn(q, b, k, metric="sqeuclidean", interpret=True)
    d_s, i_s = np.asarray(d_s), np.asarray(i_s)
    for r in range(6):
        assert i_s[r, 0] == 100 + 97 * r, (r, i_s[r])
        assert abs(d_s[r, 0]) < 1e-4, d_s[r]
    oracle = _oracle_sets(q, b, k, "sqeuclidean")
    for r in range(6):
        assert set(i_s[r]) == set(oracle[r])
