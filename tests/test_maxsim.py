"""ColBERT MaxSim scoring vs a float64 numpy oracle."""

import numpy as np

from neighborhoodwatch_tpu.ops.maxsim import (
    maxsim_scores, maxsim_topk, maxsim_oracle, pad_token_lists,
)


def _toy(rng, q_n=6, d_n=40, dim=32, tq=7, td=11):
    qs = [rng.standard_normal((rng.integers(2, tq), dim)).astype(np.float32)
          for _ in range(q_n)]
    ds = [rng.standard_normal((rng.integers(3, td), dim)).astype(np.float32)
          for _ in range(d_n)]
    q, qm = pad_token_lists(qs, dim)
    d, dm = pad_token_lists(ds, dim)
    return q, qm, d, dm


def test_maxsim_scores_match_oracle(rng):
    q, qm, d, dm = _toy(rng)
    got = np.asarray(maxsim_scores(q, qm, d, dm))
    exp, _ = maxsim_oracle(q, qm, d, dm, k=d.shape[0])
    # oracle returns sorted scores; compare the dense matrix instead
    q64 = q.astype(np.float64)
    dense = np.zeros((q.shape[0], d.shape[0]))
    for qi in range(q.shape[0]):
        for di in range(d.shape[0]):
            sims = q64[qi] @ d[di].astype(np.float64).T
            sims[:, ~dm[di]] = -np.inf
            per_tok = sims.max(axis=1)
            per_tok[~qm[qi]] = 0.0
            dense[qi, di] = per_tok.sum()
    np.testing.assert_allclose(got, dense, atol=1e-4)


def test_maxsim_topk_exact(rng):
    q, qm, d, dm = _toy(rng, d_n=50)
    k = 5
    scores, idx = maxsim_topk(q, qm, d, dm, k=k, tile_docs=16)
    exp_scores, exp_idx = maxsim_oracle(q, qm, d, dm, k=k)
    np.testing.assert_array_equal(np.asarray(idx), exp_idx)
    np.testing.assert_allclose(np.asarray(scores), exp_scores, atol=1e-4)
    # scores descending
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_maxsim_padding_invariance(rng):
    """Extra token padding must not change scores."""
    q, qm, d, dm = _toy(rng, q_n=3, d_n=10)
    q2 = np.pad(q, ((0, 0), (0, 8), (0, 0)))
    qm2 = np.pad(qm, ((0, 0), (0, 8)))
    d2 = np.pad(d, ((0, 0), (0, 4), (0, 0)))
    dm2 = np.pad(dm, ((0, 0), (0, 4)))
    s1 = np.asarray(maxsim_scores(q, qm, d, dm))
    s2 = np.asarray(maxsim_scores(q2, qm2, d2, dm2))
    np.testing.assert_allclose(s1, s2, atol=1e-5)
