"""MaxSim sub-high screen tiers: prove the corpus class they exist for
(VERDICT r4 item 7). On concentrated score distributions (iid gaussian
tokens) the 1/2-pass certificates fail en masse — measured 0/1000 and
28/1000 on the bench corpus — and every query escalates to the 3-pass
screen. The class they were kept for is WIDE-GAP retrieval corpora:
documents that are either clearly relevant (sharing token directions with
the query, score ~ sum of near-1 maxima) or clearly irrelevant (near-
orthogonal tokens, score ~ tq * max-of-random-cos), with a gap >> the
1-pass eps band. These tests construct that class hermetically and assert
the 1-pass certificate actually PASSES (no escalation), plus exactness on
both corpus classes."""

import numpy as np
import pytest

import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
from neighborhoodwatch_tpu.ops.maxsim import (
    _maxsim_select, maxsim_screen_plan, maxsim_topk, maxsim_topk_screened,
)


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _wide_gap_corpus(rng, q_n=4, tq=8, n_docs=None, td=8, dim=64,
                     rel_per_q=32):
    """Each query gets `rel_per_q` planted documents whose tokens are
    noisy copies of its own (score ~ tq); every other document is random
    (score ~ tq * ~0.35 at 64d). Planted ids are disjoint across
    queries."""
    n_docs = n_docs if n_docs is not None else mk.MEGA_DOCS
    q = _unit(rng.standard_normal((q_n, tq, dim))).astype(np.float32)
    docs = _unit(rng.standard_normal((n_docs, td, dim))).astype(np.float32)
    ids = rng.permutation(n_docs)[: q_n * rel_per_q].reshape(q_n, rel_per_q)
    t = min(tq, td)
    for i in range(q_n):
        noisy = q[i, :t][None] + 0.01 * rng.standard_normal(
            (rel_per_q, t, dim))
        docs[ids[i], :t] = _unit(noisy).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    dm = np.ones((n_docs, td), dtype=bool)
    return q, qm, docs, dm, ids


@pytest.mark.parametrize("tier,passes", [("default", 1), ("medium", 2)])
def test_sub_high_tier_certifies_wide_gap_corpus(tier, passes):
    rng = np.random.default_rng(41)
    k = 8
    q, qm, docs, dm, ids = _wide_gap_corpus(rng)
    m, block, ok_plan = maxsim_screen_plan(docs.shape[0], k, docs.shape[1],
                                           docs.shape[2], passes=passes)
    assert ok_plan
    cand_neg, cand_doc, _, doc_stats = mk.screen_maxsim(
        jnp.asarray(q), jnp.asarray(qm), jnp.asarray(docs), jnp.asarray(dm),
        screen_precision=tier)
    s, i, ok = _maxsim_select(jnp.asarray(q), jnp.asarray(qm),
                              jnp.asarray(docs), jnp.asarray(dm),
                              cand_neg, cand_doc, k, m, block=block,
                              passes=passes, doc_stats=doc_stats)
    # the whole point of the sub-high tier: certificates PASS on this
    # corpus class (no escalation to the 3-pass screen)
    assert np.asarray(ok).all(), \
        f"{tier} certificate failed on the wide-gap corpus"
    # and the results are the true top-k: every neighbor is a planted doc
    i_host = np.asarray(i)
    for r in range(q.shape[0]):
        assert set(i_host[r]) <= set(ids[r]), "non-planted doc in top-k"
    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=1024)
    np.testing.assert_array_equal(i_host, np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)


def test_sub_high_tier_escalates_but_stays_exact_on_concentrated_corpus():
    """iid gaussian tokens: the 1-pass certificate cannot hold (the eps
    band covers thousands of docs) — the public entry point must
    escalate and still return exact results."""
    rng = np.random.default_rng(42)
    q_n, tq, td, dim, k = 3, 6, 8, 32, 5
    q = _unit(rng.standard_normal((q_n, tq, dim))).astype(np.float32)
    docs = _unit(rng.standard_normal((mk.MEGA_DOCS, td, dim))
                 ).astype(np.float32)
    qm = np.ones((q_n, tq), dtype=bool)
    dm = np.ones((mk.MEGA_DOCS, td), dtype=bool)
    s, i = maxsim_topk_screened(q, qm, docs, dm, k=k,
                                screen_precision="default")
    ref_s, ref_i = maxsim_topk(q, qm, docs, dm, k=k, tile_docs=1024)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s),
                               rtol=1e-5, atol=1e-5)
