"""Seeded property sweep of the MaxSim surface vs the float64 oracle.

Companion to tests/test_property_fuzz.py (the flat-kNN sweep): random
token geometries (ragged doc/query masks, fully-masked docs, zero-valid
queries), random k, and random streaming splits, checked against
ops.maxsim.maxsim_oracle. Deterministic seed, CPU-sized.
"""

import numpy as np
import pytest

from neighborhoodwatch_tpu.ops.maxsim import (
    StreamingMaxSim, maxsim_topk,
)

SEED = 20260818
TRIALS = 10


def _random_tokens(rng, n, t, dim, degenerate_frac=0.0):
    x = rng.standard_normal((n, t, dim)).astype(np.float32)
    x /= np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
    # ragged valid-token counts in [1, t]; a degenerate slice gets 0
    counts = rng.integers(1, t + 1, n)
    if degenerate_frac:
        kill = rng.random(n) < degenerate_frac
        counts = np.where(kill, 0, counts)
    mask = np.arange(t)[None, :] < counts[:, None]
    x = np.where(mask[..., None], x, 0.0)
    return x, mask


def _check_topk_vs_oracle(q, qm, d, dm, k, scores, idx):
    """Neighbor-set optimality under ties: every returned doc's TRUE
    score must be >= the true k-th score - tol, and the reported scores
    must match the true scores of the docs actually returned (fully
    masked docs score -inf in the oracle and a large-negative finite
    value in the engines — both lose everywhere, so rows only ever
    compare where the k-th true score is finite)."""
    # dense float64 per-(query, doc) score table (maxsim_oracle returns
    # sorted scores, which loses the doc identity the set check needs)
    dense = np.zeros((q.shape[0], d.shape[0]))
    for qi in range(q.shape[0]):
        qv = q[qi].astype(np.float64)
        for di in range(d.shape[0]):
            sims = qv @ d[di].astype(np.float64).T
            sims[:, ~dm[di]] = -np.inf
            per = sims.max(axis=1)
            per[~qm[qi]] = 0.0
            dense[qi, di] = per.sum()
    kth = np.sort(dense, axis=1)[:, ::-1][:, k - 1]
    idx = np.asarray(idx)
    scores = np.asarray(scores, np.float64)
    assert idx.shape == scores.shape == (q.shape[0], k)
    assert np.all(idx >= 0) and np.all(idx < d.shape[0])
    for r in range(q.shape[0]):
        assert len(set(idx[r].tolist())) == k
    picked = np.take_along_axis(dense, idx.astype(np.int64), axis=1)
    tol = 1e-4 * np.maximum(np.abs(dense[np.isfinite(dense)]).max()
                            if np.isfinite(dense).any() else 1.0, 1.0)
    finite_kth = np.isfinite(kth)
    short = kth[finite_kth, None] - picked[finite_kth] - tol
    assert short.max(initial=-np.inf) <= 0, \
        f"sub-optimal doc: short by {short.max()}"
    fin = np.isfinite(picked)
    assert np.allclose(scores[fin], picked[fin], atol=tol), \
        "reported scores disagree with true scores of returned docs"


@pytest.mark.parametrize("trial", range(TRIALS))
def test_maxsim_random_sweep_vs_oracle(trial):
    rng = np.random.default_rng(SEED + trial)
    Q = int(rng.integers(1, 12))
    D = int(rng.integers(2, 90))
    tq = int(rng.integers(1, 9))
    td = int(rng.integers(1, 17))
    dim = int(rng.choice([16, 32, 128]))
    k = int(rng.integers(1, D + 1))
    q, qm = _random_tokens(rng, Q, tq, dim)
    d, dm = _random_tokens(rng, D, td, dim, degenerate_frac=0.15)
    # zero-valid-token queries: every doc scores 0 — any k docs are
    # optimal; the set check below handles the total tie
    if rng.random() < 0.3:
        qm[0, :] = False
        q[0] = 0.0
    s, i = maxsim_topk(q, qm, d, dm, k=k, engine="exact")
    _check_topk_vs_oracle(q, qm, d, dm, k, s, i)


def test_streaming_maxsim_random_splits_and_resume():
    """Random tile splits + a mid-stream checkpoint/restore must match
    the one-shot oracle (the ck --maxsim streaming invariant)."""
    rng = np.random.default_rng(SEED + 77)
    Q, D, tq, td, dim, k = 6, 70, 4, 8, 32, 9
    q, qm = _random_tokens(rng, Q, tq, dim)
    d, dm = _random_tokens(rng, D, td, dim, degenerate_frac=0.1)
    for _round in range(3):
        cuts = np.sort(rng.integers(1, D, 3))
        s = StreamingMaxSim(q, qm, k=k, engine="exact")
        off = 0
        for part, pmask in zip(np.split(d, cuts), np.split(dm, cuts)):
            if not len(part):
                continue
            s.update(part, pmask, offset=off)
            off += len(part)
            if off >= D // 2 and _round == 2:
                # checkpoint round-trip mid-stream
                sc, ix, seen = s.state_arrays()
                s2 = StreamingMaxSim(q, qm, k=k, engine="exact")
                s2.restore(sc, ix, seen)
                s = s2
        scores, idx = s.finalize()
        _check_topk_vs_oracle(q, qm, d, dm, k, scores, idx)
