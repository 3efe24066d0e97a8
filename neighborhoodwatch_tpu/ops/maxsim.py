"""Batched ColBERT MaxSim scoring on TPU.

The reference approximates ColBERT retrieval as a flat token-vs-token kNN
(SURVEY.md §3.4: tokens treated as independent vectors, no per-document
aggregation — colbert_knn.py:84-126). This module implements the proper
late-interaction scoring as its TPU generalization (BASELINE.json):

    score(q, doc) = sum_{i in q tokens} max_{j in doc tokens} <q_i, d_j>

computed as one big (Qq*Tq, Td*D) matmul per document tile on the MXU with
the max/sum reductions fused by XLA, scanned over document tiles with a
running top-k of document scores per query.

Inputs are padded token tensors + token-count masks (static shapes):
  queries:  (Q, Tq, d) with q_mask (Q, Tq)
  docs:     (D, Td, d) with d_mask (D, Td)
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops.distance import resolve_precision
from neighborhoodwatch_tpu.ops.screen_kernel import LANES
from neighborhoodwatch_tpu.ops.topk import merge_topk
from neighborhoodwatch_tpu.utils.misc import round_up

NEG = -1e30


@partial(jax.jit, static_argnames=("precision",))
def maxsim_scores(queries, q_mask, docs, d_mask, precision: str = "highest"):
    """Dense MaxSim scores: (Q, D).

    Layout-aware: everything stays 2D/3D with the reduction axes in the
    trailing (lane) position — a 4D (Q, Tq, D, Td) formulation relayouts
    catastrophically on TPU (measured ~2000x off peak)."""
    prec = resolve_precision(precision)
    q_n, tq = queries.shape[:2]
    d_n, td = docs.shape[:2]
    q2 = queries.reshape(q_n * tq, queries.shape[-1])
    d2 = docs.reshape(d_n * td, docs.shape[-1])
    sims = jax.lax.dot_general(
        q2, d2, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)  # (Qt, D*Td)
    sims = jnp.where(d_mask.reshape(1, d_n * td), sims, NEG)
    per_qtok = jnp.max(sims.reshape(q_n * tq, d_n, td), axis=2)  # (Qt, D)
    per_qtok = jnp.where(q_mask.reshape(q_n * tq, 1), per_qtok, 0.0)
    scores = jnp.sum(per_qtok.reshape(q_n, tq, d_n), axis=1)     # (Q, D)
    # garbage docs (inf/NaN upstream embeddings) produce NaN scores, and
    # NaN WINS lax.top_k — the bug class fixed for the knn engines (ops.knn
    # sanitizes NaN distances to +inf) existed here too. Match the fused
    # kernel's contract (maxsim_kernel.py: NaN negscore -> +inf): any NaN
    # in a doc's score makes that doc LOSE in every engine.
    return jnp.where(jnp.isnan(scores), NEG, scores)


def pad_token_lists(token_lists, dim, max_tokens=None):
    """[(t_i, d)] -> ((N, T, d) padded array, (N, T) bool mask)."""
    if max_tokens is None:
        max_tokens = max((len(t) for t in token_lists), default=1)
        max_tokens = round_up(max(max_tokens, 1), 8)
    n = len(token_lists)
    out = np.zeros((n, max_tokens, dim), dtype=np.float32)
    mask = np.zeros((n, max_tokens), dtype=bool)
    for i, toks in enumerate(token_lists):
        t = min(len(toks), max_tokens)
        if t:
            out[i, :t] = np.asarray(toks)[:t]
            mask[i, :t] = True
    return out, mask


@partial(jax.jit, static_argnames=("k", "precision"))
def _maxsim_tile_step(run_s, run_i, queries, q_mask, tile, tmask, start,
                      n_docs, k: int, precision: str):
    tile_docs = tile.shape[0]
    scores = maxsim_scores(queries, q_mask, tile, tmask, precision=precision)
    local_idx = jnp.arange(tile_docs, dtype=jnp.int32)
    valid = (start + local_idx) < n_docs
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    ts, ti = jax.lax.top_k(scores, min(k, tile_docs))
    ti = (ti + start).astype(jnp.int32)
    # larger score is better: negate into the smaller-is-better merge
    md, mi = merge_topk(-run_s, run_i, -ts, ti, k)
    return -md, mi


def maxsim_kernel_shape_ok(tq: int, dim: int) -> bool:
    """Backend + shape gates for the fused MaxSim kernel: doc token counts
    are unbounded (long docs stream through in 32-token chunks); the query
    side is capped by the VMEM tiling (tq <= 32 — ColBERT's query_maxlen)
    and the token dim by the kernel's lane layout (<= 128 or a
    128-multiple). ONE predicate shared by _maxsim_engine and the mesh
    path's engine choice — two copies desynced once and a 192-dim corpus
    crashed the sharded stream on the kernel assert (r3 review)."""
    return (jax.default_backend() == "tpu" and tq <= 32
            and (dim <= LANES or dim % LANES == 0))


def _maxsim_engine(engine: str, n_docs: int, tq: int, dim: int) -> str:
    """'screened' = the fused Pallas kernel + certified re-rank (21x the
    XLA path on TPU, measured 0.50s vs 10.8s for 1k x 200k docs); see
    maxsim_kernel_shape_ok for the auto gates. 'exact' = the XLA tile
    loop, any shape. Unknown names raise — a typo silently coerced to
    the ~21x-slower exact path would benchmark the wrong engine (same
    contract as ops.knn._select_engine, r3 review)."""
    if engine not in ("auto", "exact", "screened"):
        raise ValueError(f"unknown engine {engine!r}; expected one of "
                         f"auto/exact/screened")
    if engine != "auto":
        return engine
    if n_docs >= 4096 and maxsim_kernel_shape_ok(tq, dim):
        return "screened"
    return "exact"


def maxsim_topk(queries, q_mask, docs, d_mask, k: int,
                precision: str = "highest", tile_docs: int = 128,
                engine: str = "exact", screen_precision: str = "high"):
    """Top-k documents per query by MaxSim score.

    Returns (scores desc, doc indices), exact. engine="auto" uses the
    fused Pallas screen kernel on TPU when the token counts fit
    (ops/maxsim_kernel.py); `screen_precision` then picks the screen's
    MXU-pass tier (cf. maxsim_topk_screened — exact at every tier). The
    default XLA path processes documents in `tile_docs` tiles through one
    compiled tile step driven by a host loop of async dispatches — a 4D
    `lax.scan` over the doc tensor compiles to a ~400x slower program on
    TPU (measured: 120s vs 0.29s over 1M base tokens), so the loop
    deliberately stays on the host."""
    engine = _maxsim_engine(engine, docs.shape[0],
                            queries.shape[1], docs.shape[-1])
    if engine == "screened":
        return maxsim_topk_screened(queries, q_mask, docs, d_mask, k,
                                    screen_precision=screen_precision)
    queries = jnp.asarray(queries, dtype=jnp.float32)
    docs = jnp.asarray(docs, dtype=jnp.float32)
    q_mask = jnp.asarray(q_mask, dtype=bool)
    d_mask = jnp.asarray(d_mask, dtype=bool)
    n_docs = docs.shape[0]
    assert k <= n_docs

    q_n = queries.shape[0]
    run_s = jnp.full((q_n, k), -jnp.inf, dtype=jnp.float32)
    run_i = jnp.zeros((q_n, k), dtype=jnp.int32)
    n_full = (n_docs // tile_docs) * tile_docs
    for start in range(0, n_full, tile_docs):
        tile = jax.lax.dynamic_slice_in_dim(docs, start, tile_docs)
        tmask = jax.lax.dynamic_slice_in_dim(d_mask, start, tile_docs)
        run_s, run_i = _maxsim_tile_step(run_s, run_i, queries, q_mask,
                                         tile, tmask, start, n_docs, k,
                                         precision)
    if n_docs > n_full:
        # pad only the final ragged TILE, not the corpus: jnp.pad of the
        # whole doc tensor transiently doubled device memory (a ~2x HBM
        # spike on multi-GB corpora) just to append < tile_docs rows —
        # and this path is the screened engine's certificate fallback,
        # exactly where memory headroom is scarce (r3 review). The tile
        # step's (start + i) < n_docs mask already hides the pad rows.
        pad = tile_docs - (n_docs - n_full)
        tile = jnp.pad(docs[n_full:], ((0, pad), (0, 0), (0, 0)))
        tmask = jnp.pad(d_mask[n_full:], ((0, pad), (0, 0)))
        run_s, run_i = _maxsim_tile_step(run_s, run_i, queries, q_mask,
                                         tile, tmask, n_full, n_docs, k,
                                         precision)
    return run_s, run_i


def _maxsim_tier_eps(queries, q_mask, q_scale, d_max, dlo_max, rerank_acc,
                     g_sum, dim: int, passes: int):
    """Per-query screening-error bound of a `passes`-pass MaxSim screen on
    the score scale (the SOUND data-dependent eps — one definition shared
    by the certificate and the adaptive tier probe, which evaluates it
    for tiers OTHER than the one that ran). See _maxsim_select for the
    derivation of each term."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    if passes >= 3:
        # bf16x3 residual + worst-case fp32 accumulation + quantization
        return mk.maxsim_eps3_rel(dim) * q_scale * d_max + rerank_acc
    # 2-pass drops q_t . d_lo,s (d_lo = d - bf16(d), exactly
    # representable by Sterbenz): per token <= |q_t| * max||d_lo||,
    # computed from the data (~2.9x tighter than the static 2^-8
    # worst case), PLUS the q-side double rounding — the kernel ships
    # bf16(q_lo), dropping (q_lo - bf16(q_lo)) . d_hi (r3 review);
    # + worst-case fp32 accumulation and key quantization on the
    # score scale (mk.maxsim_acc_rel — one definition with the
    # 3-pass bound)
    eps = q_scale * dlo_max + rerank_acc \
        + (mk.maxsim_acc_rel(dim) + mk.PACK_EPS_REL) * q_scale * d_max
    # bf16_round, not astype: the astype round-trip folds to the
    # identity under jit on TPU, zeroing qlo/qres and silently
    # shrinking eps (screen_kernel.bf16_round doc)
    qhi = mk.bf16_round(queries)
    qlo = queries - qhi                        # exact (Sterbenz)
    if passes == 1:
        qres = qlo                             # drops q_lo . d_hi whole
    else:
        qres = qlo - mk.bf16_round(qlo)
    qres_n = jnp.linalg.norm(qres, axis=2)
    qres_scale = jnp.sum(jnp.where(q_mask, qres_n, 0.0), axis=1) * g_sum
    # ||d_hi|| <= (1 + 2^-8) ||d||
    return eps + qres_scale * 1.004 * d_max


@partial(jax.jit, static_argnames=("k", "m", "block", "passes",
                                   "with_diagnostics"))
def _maxsim_select(queries, q_mask, docs, d_mask, cand_neg, cand_doc,
                   k: int, m: int, block: int = 128, passes: int = 3,
                   doc_stats=None, with_diagnostics: bool = False):
    """Top-M merge of screened MaxSim candidates + exact fp32 re-rank +
    exactness certificate + in-trace class-A repair (the MaxSim analog of
    ops.knn._screened_select AND screened_knn_traced's suspicious-bin
    repair — certificate failures with an intact count certificate are
    repaired here by exactly re-ranking the suspicious bins' members, so
    rows return ok=True without the caller's exact-path fallback).
    Returns (scores desc, doc ids, ok). `passes` is the screen's MXU-pass
    tier; below 3 passes the certificate eps is computed from the data's
    actual bf16 residual norms (cf. ops.knn._screen_err_bounds).
    `doc_stats` is screen_maxsim's fused (2,) [d_max, dlo_max] — without
    it the fallback here re-reads (and re-converts) the whole doc tensor
    for the same two statistics (r3 review).

    `with_diagnostics=True` adds a fourth output: a (Q, 2) bool
    PREDICTION of per-query certificate failure at the cheaper tiers
    [medium, default], evaluated from this screen's candidates with each
    tier's own eps — a query is predicted-fail when its eps band would
    overflow 3/4 of the merge width m or flag more than REPAIR_BINS
    bins. The prediction is a tier-routing heuristic for the adaptive
    stream controller (MaxSimTierController), never an exactness input;
    the caller's doc_stats must then carry a REAL dlo_max
    (screen_maxsim(..., want_dlo_stat=True)) or the sub-high bands are
    underestimated and the controller downshifts too eagerly."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk

    q_count, tq, dim = queries.shape
    td = docs.shape[1]
    keep, lanes = mk.KEEP, mk.LANES
    n4 = cand_neg.reshape(q_count, -1, keep, lanes)
    d4 = cand_doc.reshape(q_count, -1, keep, lanes)
    cert_last = n4[:, :, keep - 1, :]
    merge_n = n4[:, :, : keep - 1, :].reshape(q_count, -1)
    merge_d = d4[:, :, : keep - 1, :].reshape(q_count, -1)

    # smallest-m of the negated scores: stable pair-sort + slice below the
    # ~14k-width crossover, TopK beyond (ops.knn._merge_select's measured
    # rule; identical selection + order either way)
    from neighborhoodwatch_tpu.ops.knn import _merge_select
    scr, doc_m = _merge_select(merge_n, merge_d, m)
    doc_m = jnp.minimum(doc_m, docs.shape[0] - 1)  # padded megas decode past D

    q_pad = (-q_count) % block
    qp = jnp.pad(queries, ((0, q_pad), (0, 0), (0, 0)))
    qmp = jnp.pad(q_mask, ((0, q_pad), (0, 0)))
    dp = jnp.pad(doc_m, ((0, q_pad), (0, 0)))

    def refine(args):
        qb, qmb, ib = args                        # (B,tq,dim),(B,tq),(B,m)
        cb = docs[ib]                             # (B, m, td, dim)
        cmb = d_mask[ib]                          # (B, m, td)
        sims = jnp.einsum("btd,bmsd->btms", qb, cb,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        sims = jnp.where(cmb[:, None, :, :], sims, NEG)
        per_tok = jnp.max(sims, axis=3)           # (B, tq, m)
        per_tok = jnp.where(qmb[:, :, None], per_tok, 0.0)
        return jnp.sum(per_tok, axis=1)           # (B, m)

    s_exact = jax.lax.map(
        refine,
        (qp.reshape(-1, block, tq, dim), qmp.reshape(-1, block, tq),
         dp.reshape(-1, block, m)),
    ).reshape(-1, m)[:q_count]
    # huge negated screen values are padding bins/docs, never candidates
    s_exact = jnp.where(scr > 1e29, -jnp.inf, s_exact)

    sk, selk = jax.lax.top_k(s_exact, k)
    doc_k = jnp.take_along_axis(doc_m, selk, axis=1)
    tau = sk[:, k - 1]

    # per-query screening error bound on the score scale. score =
    # sum_t max_s <q_t, d_s>, and |max a - max b| <= max|a - b|, so the
    # per-token dot error bounds sum over the valid query tokens. Every
    # computed norm entering the bound multiplicatively carries the
    # worst-case fp32 accumulation guard (screen_kernel.norm_guard — r3
    # review: the flat 1.0001 is outgrown at dim >= ~3500). The q-side
    # scales are SUMS of up to tq norms, so their guard budgets the sum's
    # own accumulation too (dim + 2*tq — second r3 review finding).
    from neighborhoodwatch_tpu.ops.screen_kernel import norm_guard
    g_sum = norm_guard(dim + 2 * tq)
    q_norms = jnp.linalg.norm(queries, axis=2)
    q_scale = jnp.sum(jnp.where(q_mask, q_norms, 0.0), axis=1) * g_sum
    if doc_stats is None:
        # no fused stats from the screen: recompute them here (extra full
        # passes over the doc tensor — the screened entry points always
        # pass doc_stats; this branch serves direct callers) via the ONE
        # shared definition (r3 review: a local copy could desync)
        doc_stats = mk.doc_cert_stats(docs, d_mask, dim,
                                      need_dlo=passes < 3
                                      or with_diagnostics)
    d_max, dlo_max = doc_stats[0], doc_stats[1]
    d_max = jnp.maximum(d_max, 1e-6)
    # the re-rank recomputes every candidate score with its OWN fp32
    # accumulation — one extra maxsim_acc_rel on the score scale (the
    # MaxSim epilogue has no norms, so unlike ops.knn there is no norm-
    # consistency term; r3 review follow-up)
    rerank_acc = mk.maxsim_acc_rel(dim) * q_scale * d_max
    eps = _maxsim_tier_eps(queries, q_mask, q_scale, d_max, dlo_max,
                           rerank_acc, g_sum, dim, passes)
    thresh = (-tau + eps)[:, None]

    cert_bins = jnp.min(cert_last, axis=(1, 2)) >= thresh[:, 0]
    c_all = jnp.sum((merge_n < thresh).astype(jnp.int32), axis=1)
    c_sel = jnp.sum((scr < thresh).astype(jnp.int32), axis=1)
    cert_merge = c_all == c_sel
    ok = jnp.logical_and(cert_bins, cert_merge)

    # ---- in-trace class-A repair: exact re-rank of suspicious bins ----
    #
    # Measured on the 1k x 50k long-doc workload (32x64 tokens, dim 128,
    # k=100, high tier): ALL certificate failures were bin flags with the
    # merge-count certificate intact (21/1000 bins_fail, 0 count_fail) —
    # genuine >KEEP-1 candidate collisions inside one 64-doc bin. The eps
    # band below thresh holds ~134 candidates across n_mega*128 bins, so
    # at 7 megas Poisson puts >= KEEP of them in one bin for ~2% of
    # queries. Each such query took the exact XLA fallback: ~0.3s of the
    # 0.93s end-to-end. The repair is the MaxSim analog of
    # ops.knn.screened_knn_traced's class A and provably exact by the
    # same argument: when the count certificate holds, every candidate
    # below thresh outside the suspicious bins was merged and re-ranked
    # exactly, and the bin certificate proves non-suspicious bins' unkept
    # members score beyond the band — so the true top-k is contained in
    # (returned top-k) U (members of the suspicious bins). Bin membership
    # needs no kernel db: db and LANES are both 128-multiples, so a
    # bin's members are exactly its mega's docs with id % 128 == lane
    # (MEGA_DOCS/LANES = 64 of them). Queries the repair cannot prove
    # (count failures, > REPAIR_BINS collisions, budget overflow) keep
    # ok=False and escalate through the caller's fallback as before.
    from neighborhoodwatch_tpu.ops.knn import REPAIR_BINS, _chernoff_budget

    n_docs = docs.shape[0]
    fail = jnp.logical_not(ok)
    # NaN thresh (garbage corpus stats / NaN query): every comparison is
    # all-False, cert_merge holds vacuously and no bin is suspicious — a
    # NaN-thresh query must keep ok=False, never be "repaired" from zero
    # bins (same gate as the kNN class A, r3 review)
    sflat = (cert_last < thresh[:, :, None]).reshape(q_count, -1)
    n_susp = jnp.sum(sflat.astype(jnp.int32), axis=1)
    binfix = jnp.logical_and(
        jnp.logical_and(fail, jnp.isfinite(thresh[:, 0])),
        jnp.logical_and(cert_merge, n_susp <= REPAIR_BINS))

    # bin collisions are band-occupancy events (not eps-band flags like
    # the kNN tiers), so one conservative rate sizes every tier's budget;
    # the measured 2.1% worst case leaves ~2.4x headroom
    na = _chernoff_budget(q_count, 0.05, k)
    members = mk.MEGA_DOCS // lanes               # 64 docs per bin
    w = REPAIR_BINS * members
    # blocked gather: bound the live (blk, w, td, dim) buffer at ~256MB
    # like the select's re-rank (w*td*dim is per-QUERY here — long docs
    # shrink the block, never the budget)
    blk = min(128, max(8, (1 << 28) // max(1, w * td * dim * 4)))
    blk = 1 << (blk.bit_length() - 1)
    nap = round_up(na, blk)
    _, rows_a = jax.lax.top_k(binfix.astype(jnp.int32), na)
    take_a = binfix[rows_a]

    def _bin_repair(args):
        sk, doc_k = args
        flags = sflat[rows_a]                     # (na, n_mega*lanes)
        _, bins_a = jax.lax.top_k(flags.astype(jnp.int32), REPAIR_BINS)
        mega_a = bins_a // lanes                  # (na, S)
        lane_a = bins_a % lanes
        step = jnp.arange(members, dtype=jnp.int32)
        rg = (mega_a[..., None] * mk.MEGA_DOCS
              + step[None, None, :] * lanes
              + lane_a[..., None]).reshape(na, w)
        valid = rg < n_docs          # last mega's decode runs past D
        rgc = jnp.minimum(rg, n_docs - 1)
        qa = queries[rows_a]
        qma = q_mask[rows_a]

        def block_s(args):
            qb_, qmb_, rb, vb = args
            cb = docs[rb]                         # (blk, w, td, dim)
            cmb = d_mask[rb]
            sims = jnp.einsum("btd,bwsd->btws", qb_, cb,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            sims = jnp.where(cmb[:, None, :, :], sims, NEG)
            per_tok = jnp.max(sims, axis=3)       # (blk, tq, w)
            per_tok = jnp.where(qmb_[:, :, None], per_tok, 0.0)
            s = jnp.sum(per_tok, axis=1)          # (blk, w)
            # NaN scores (garbage tokens) and phantom rows must LOSE —
            # the gather pulls bin rows by POSITION, not candidacy, so
            # the screen's own NaN sanitization never saw them
            keep_s = jnp.logical_and(vb, jnp.logical_not(jnp.isnan(s)))
            return jnp.where(keep_s, s, -jnp.inf)

        def padded(x):
            return jnp.pad(x, ((0, nap - na),) + ((0, 0),) * (x.ndim - 1))

        s_bin = jax.lax.map(
            block_s, (padded(qa).reshape(-1, blk, tq, dim),
                      padded(qma).reshape(-1, blk, tq),
                      padded(rgc).reshape(-1, blk, w),
                      padded(valid).reshape(-1, blk, w)),
        ).reshape(nap, w)[:na]
        # dedup: a returned-top-k doc living in a gathered bin has its
        # exact score in s_bin already — keeping both would fabricate a
        # duplicate neighbor
        sk_a = sk[rows_a]
        dk_a = doc_k[rows_a]
        binid_k = (dk_a // mk.MEGA_DOCS) * lanes + (dk_a % lanes)
        dup = jnp.any(binid_k[:, :, None] == bins_a[:, None, :], axis=2)
        sk_a = jnp.where(dup, -jnp.inf, sk_a)
        s_new, sel2 = jax.lax.top_k(
            jnp.concatenate([sk_a, s_bin], axis=1), k)
        d_new = jnp.take_along_axis(
            jnp.concatenate([dk_a, rgc], axis=1), sel2, axis=1)
        ta = take_a[:, None]
        sk = sk.at[rows_a].set(jnp.where(ta, s_new, sk[rows_a]))
        doc_k = doc_k.at[rows_a].set(jnp.where(ta, d_new, doc_k[rows_a]))
        return sk, doc_k

    sk, doc_k = jax.lax.cond(jnp.any(binfix), _bin_repair,
                             lambda a: a, (sk, doc_k))
    # budget overflow guard: rows_a holds only the FIRST na flagged
    # queries; anything past the budget keeps ok=False and escalates
    repaired = jnp.zeros((q_count,), bool).at[rows_a].set(take_a)
    ok = jnp.logical_or(ok, repaired)
    if not with_diagnostics:
        return sk, doc_k, ok

    # ---- adaptive-tier probe: predicted failure at the cheaper tiers ----
    # Evaluated from THIS screen's candidates with each cheaper tier's own
    # eps band: the band occupancy (vs 3/4 of the merge width, headroom
    # for selection differences at the cheaper screen) and the flagged-bin
    # count (vs the class-A repair's REPAIR_BINS) are exactly the two
    # statistics whose overflow makes a sub-high tier escalate. A NaN
    # thresh (garbage data) predicts failure — the sound direction.
    pred = []
    for p in (2, 1):
        eps_p = _maxsim_tier_eps(queries, q_mask, q_scale, d_max, dlo_max,
                                 rerank_acc, g_sum, dim, p)
        thr_p = (-tau + eps_p)[:, None]
        band_p = jnp.sum((merge_n < thr_p).astype(jnp.int32), axis=1)
        susp_p = jnp.sum((cert_last < thr_p[:, :, None]).astype(jnp.int32),
                         axis=(1, 2))
        pfail = jnp.logical_or(band_p > (3 * m) // 4,
                               susp_p > REPAIR_BINS)
        pred.append(jnp.logical_or(pfail,
                                   jnp.logical_not(
                                       jnp.isfinite(thr_p[:, 0]))))
    return sk, doc_k, ok, jnp.stack(pred, axis=1)


def maxsim_bin_cap(n_docs: int) -> int:
    """Merge capacity of the MaxSim screen's candidate bins (excludes the
    certificate slab, 1 of KEEP per mega) — the ONE definition of the bin
    layout's capacity, shared by maxsim_screen_plan and
    maxsim_topk_screened (two inline copies of certificate-critical math
    can silently desync — r3 review)."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
    return (-(-n_docs // mk.MEGA_DOCS)) * mk.LANES * (mk.KEEP - 1)


def resolve_maxsim_tier(screen_precision: str) -> str:
    """Resolve the tier knob for a SINGLE MaxSim call. "auto" means
    "high" here: with the sound eps only the 3-pass certificate holds on
    concentrated MaxSim score distributions (maxsim_screen_plan's
    measurement record) — the kNN engine's lean 1-pass auto would
    escalate every query, and a one-shot call has no batch history to
    learn from. The STREAMING accumulators treat "auto" adaptively
    instead (MaxSimTierController): start high, downshift when the
    high-tier batches' free diagnostics predict the cheaper tier
    certifies (wide-score-gap corpora — 2.1x, tests/test_maxsim_tiers.py),
    re-escalate on realized failures."""
    return "high" if screen_precision == "auto" else screen_precision


# adaptive-stream ladder, SAFEST first (index 0 = the tier that always
# certifies); downshifts move right, re-escalations move left. The
# direction is inverted vs ops.knn.SCREEN_TIER_AUTO_LADDER because the
# economics invert: kNN's 1-pass certificates hold on realistic corpora
# (start cheap, escalate on repairs), MaxSim's concentrate-and-fail
# (start safe, downshift only when the high-tier probe says the cheap
# band is sparse — a blind cheap start would pay a wholesale escalation
# on the very first concentrated batch).
MAXSIM_TIER_LADDER = ("high", "medium", "default")


class MaxSimTierController:
    """Adaptive screen-tier state for the MaxSim streaming accumulators
    (StreamingMaxSim / ShardedStreamingMaxSim) — the MaxSim counterpart
    of ops.knn.ScreenTierController, with the inverted ladder direction
    (see MAXSIM_TIER_LADDER).

    Every batch screened with diagnostics yields (a) the realized
    certificate-failure count at the tier that ran and (b) per-query
    PREDICTED failure at the two cheaper tiers, evaluated from the same
    screen's candidates with each tier's own sound eps band
    (_maxsim_select's probe — free: no extra device passes beyond one
    doc-residual statistic). The controller downshifts to the cheapest
    tier predicted clean for DOWN_AFTER consecutive batches, and
    re-escalates when realized failures exceed FAIL_FRAC of the queries
    — one rung, or straight to "high" past JUMP_FRAC (wholesale
    failure). FAIL_FRAC is deliberately lenient (25%): failed queries
    already paid the per-call escalation to the 3-pass screen, and that
    escalation is CHEAPER than running a safer tier on every batch
    until the failure fraction is large — measured on the streamed
    wide-gap bench (1k x 1M, k=32, v5e): pinned default with ~14% of
    queries escalating = 0.143 s/tile vs medium 0.184 vs high 0.233;
    the original 5% threshold parked the stream at medium, 28% slower
    than tolerating the escalations. Each re-escalation doubles the
    streak required before the next downshift (capped), so a
    persistently marginal corpus converges to the safe tier instead of
    thrashing. Every tier is exact — tier moves are purely a perf
    decision (VERDICT r4 item 3)."""

    DOWN_AFTER = 2
    FAIL_FRAC = 0.25
    JUMP_FRAC = 0.60
    MAX_DOWN_AFTER = 32

    def __init__(self):
        self.tier_idx = 0
        self._streak = 0
        self._target = 0
        self._down_need = self.DOWN_AFTER

    @property
    def tier_arg(self) -> str:
        return MAXSIM_TIER_LADDER[self.tier_idx]

    def observe(self, diag, diag_idx: int, q_rows: int) -> None:
        """Fold one batch's diagnostics, taken at ladder level
        `diag_idx`: diag = (n_fail_realized, pred_fail_medium,
        pred_fail_default) query counts."""
        import sys
        if diag_idx != self.tier_idx:
            self._streak = 0
            return
        n_fail, pred_med, pred_low = (int(x) for x in np.asarray(diag))
        if self.tier_idx > 0 and n_fail > max(1, int(q_rows
                                                     * self.FAIL_FRAC)):
            if n_fail > q_rows * self.JUMP_FRAC:
                self.tier_idx = 0          # wholesale failure: go safe
            else:
                self.tier_idx -= 1
            self._streak = 0
            self._down_need = min(self.MAX_DOWN_AFTER, 2 * self._down_need)
            print(f"  [maxsim tier] re-escalating to "
                  f"'{MAXSIM_TIER_LADDER[self.tier_idx]}' "
                  f"({n_fail}/{q_rows} certificates failed; the failed "
                  f"queries were repaired exactly via escalation)",
                  file=sys.stderr)
            return
        # cheapest tier predicted clean (within the per-batch tolerance)
        tol = max(1, q_rows // 50)
        target = self.tier_idx
        if pred_med <= tol:
            target = max(target, 1)
        if pred_low <= tol:
            target = max(target, 2)
        if target <= self.tier_idx:
            self._streak = 0
            return
        self._streak = self._streak + 1 if target == self._target else 1
        self._target = target
        if self._streak >= self._down_need:
            self.tier_idx = target
            self._streak = 0
            print(f"  [maxsim tier] downshifting to "
                  f"'{MAXSIM_TIER_LADDER[self.tier_idx]}' (the cheap-tier "
                  f"eps band held for {self._down_need} consecutive "
                  f"batches) — exactness unaffected", file=sys.stderr)


def maxsim_screen_plan(n_docs: int, k: int, td: int, dim: int,
                       passes: int = 2):
    """Static merge-width/block plan for the screened MaxSim select —
    ONE sizing policy shared by the single-device path and the mesh path
    (parallel/sharded_maxsim.py). Returns (m, block, ok): ok=False means
    the screen cannot represent k candidates (k > bin capacity) or even
    the smallest re-rank gather exceeds the ~256MB buffer budget (very
    long docs — r2 advisor finding), and the caller must use the exact
    XLA path.

    `passes` is the screen-precision tier knob (cf. ops.knn._screen_plan).
    Measured on the 1k x 200k bench (k=100) with the SOUND fold-proofed
    certificate eps (screen_kernel.bf16_round): the 3-pass tier
    certifies 1000/1000 at m=256, but the 1/2-pass tiers certify 0/1000
    and 28/1000 (6/1000 unnormalized) — MaxSim scores concentrate (a sum
    of tq per-token maxima), so the eps band around tau (~0.8% of tau,
    the same RELATIVE width that works for the kNN screen) covers
    thousands of docs and no merge width can hold it. The width is
    therefore tier-independent; sub-high tiers stay available for
    corpora with wider score gaps and ESCALATE failed queries to the
    3-pass screen (maxsim_topk_screened), never silently."""
    cap = maxsim_bin_cap(n_docs)
    del passes  # one measured width for every tier (see docstring)
    m = max(256, round_up(k + 156, 128))
    m = min(max(m, k), cap)
    budget = 1 << 28
    per_cand = td * dim * 4
    block = 128
    while block > 8 and block * m * per_cand > budget:
        block //= 2
    m_floor = min(max(k, 128), cap)
    while m > m_floor and block * m * per_cand > budget:
        m = max(m_floor, m - 128)
    ok = (cap >= k) and (block * m * per_cand <= budget)
    return m, block, ok


def maxsim_topk_screened(queries, q_mask, docs, d_mask, k: int,
                         m: int | None = None,
                         screen_precision: str = "high",
                         with_diagnostics: bool = False):
    """Exact top-k documents by MaxSim via the fused Pallas screen kernel
    (ops/maxsim_kernel.py) + certified fp32 re-rank. ~20x the XLA path's
    throughput on TPU for large doc sets. `screen_precision` trades MXU
    passes against certificate margin (high/medium/default = 3/2/1, cf.
    screen_maxsim); every tier is exact via the certificates + repair.

    "high" is the default because with the SOUND eps only the 3-pass
    certificate holds on concentrated MaxSim score distributions
    (maxsim_screen_plan's measurement record). Bin collisions with an
    intact count certificate are repaired IN-TRACE by _maxsim_select
    (the dominant failure class — measured ALL of the high-tier
    failures on the 1k x 50k long-doc workload). Remaining failed
    queries at a sub-high tier escalate to the 3-pass screen (~4x
    cheaper than the exact XLA path); residual 3-pass failures (count
    overflows / >2-bin collisions) fall back to the exact XLA path.

    `with_diagnostics=True` returns (scores, idx, diag) where diag is a
    host (3,) int array (realized certificate failures, predicted
    failures at the medium tier, predicted failures at the default tier)
    for the adaptive stream controller — or None when the screen could
    not run at all (maxsim_screen_plan said no). Costs one extra
    doc-residual statistic pass; no extra device syncs (the ok
    certificate is fetched either way)."""
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
    from neighborhoodwatch_tpu.ops.screen_kernel import PASSES
    screen_precision = resolve_maxsim_tier(screen_precision)
    passes = PASSES[screen_precision]

    queries = jnp.asarray(queries, dtype=jnp.float32)
    docs = jnp.asarray(docs, dtype=jnp.float32)
    q_mask = jnp.asarray(q_mask, dtype=bool)
    d_mask = jnp.asarray(d_mask, dtype=bool)
    n_docs = docs.shape[0]
    assert k <= n_docs

    plan_m, block, plan_ok = maxsim_screen_plan(
        n_docs, k, docs.shape[1], docs.shape[2], passes=passes)
    if not plan_ok:   # k unrepresentable / gather unaffordable -> exact
        s, i = maxsim_topk(queries, q_mask, docs, d_mask, k=k,
                           tile_docs=2048)
        return (s, i, None) if with_diagnostics else (s, i)
    if m is None:
        m = plan_m
    m = min(max(m, k), maxsim_bin_cap(n_docs))

    cand_neg, cand_doc, _, doc_stats = mk.screen_maxsim(
        queries, q_mask, docs, d_mask, screen_precision=screen_precision,
        want_dlo_stat=with_diagnostics)
    out = _maxsim_select(queries, q_mask, docs, d_mask,
                         cand_neg, cand_doc, k, m, block=block,
                         passes=passes, doc_stats=doc_stats,
                         with_diagnostics=with_diagnostics)
    if with_diagnostics:
        scores, idx, ok, pred_fail = out
    else:
        scores, idx, ok = out
    ok_host = np.asarray(ok)
    if not ok_host.all():
        bad = np.nonzero(~ok_host)[0]
        n_bad = len(bad)
        bucket = max(8, int(2 ** np.ceil(np.log2(n_bad))))
        sel_rows = np.pad(bad, (0, bucket - n_bad), mode="edge")
        if screen_precision != "high":
            # escalate to the 3-pass screen: ~4x cheaper than the exact
            # XLA path, and exact itself (certificate + XLA fallback)
            s_f, i_f = maxsim_topk_screened(
                queries[jnp.asarray(sel_rows)], q_mask[jnp.asarray(sel_rows)],
                docs, d_mask, k=k, m=m, screen_precision="high")
        else:
            s_f, i_f = maxsim_topk(queries[jnp.asarray(sel_rows)],
                                   q_mask[jnp.asarray(sel_rows)],
                                   docs, d_mask, k=k, tile_docs=2048)
        scores = np.array(scores)
        idx = np.array(idx)
        scores[bad] = np.asarray(s_f)[:n_bad]
        idx[bad] = np.asarray(i_f)[:n_bad]
    if with_diagnostics:
        pf = np.asarray(pred_fail)
        diag = np.array([int((~ok_host).sum()),
                         int(pf[:, 0].sum()), int(pf[:, 1].sum())],
                        dtype=np.int64)
        return scores, idx, diag
    return scores, idx


class StreamingMaxSim:
    """Running top-k of document MaxSim scores over host-streamed doc tiles.

    The doc-level analog of ops.knn.StreamingKNN: feed padded
    (tile, Td, d) token tensors in ascending doc-offset order; the
    (score, idx) state stays on device. Used by the `ck --maxsim`
    pipeline to stream a corpus that never fits in HBM at once."""

    def __init__(self, queries, q_mask, k: int, precision: str = "highest",
                 engine: str = "auto", screen_precision: str = "auto"):
        # "auto" on a STREAM is adaptive (MaxSimTierController): start at
        # the always-certifying 3-pass tier, downshift when the batches'
        # free diagnostics predict a cheaper tier certifies (2.1x on
        # wide-score-gap corpora), re-escalate on realized failures.
        # Every tier is exact; the ladder only prices the repair work.
        self._adaptive = screen_precision == "auto"
        self._ctrl = MaxSimTierController() if self._adaptive else None
        screen_precision = resolve_maxsim_tier(screen_precision)
        self.queries = jnp.asarray(queries, dtype=jnp.float32)
        self.q_mask = jnp.asarray(q_mask, dtype=bool)
        self.k = k
        self.precision = precision
        self.engine = engine
        self.screen_precision = screen_precision
        q_n = self.queries.shape[0]
        self.state = (jnp.full((q_n, k), -jnp.inf, dtype=jnp.float32),
                      jnp.zeros((q_n, k), dtype=jnp.int32))
        self._seen = 0

    def update(self, doc_tile, tile_mask, offset: int | None = None,
               n_valid: int | None = None) -> None:
        """Merge one (tile, Td, d) doc tile. `n_valid` < tile rows marks
        trailing padding rows (added to keep tile shapes static) invalid."""
        if offset is None:
            offset = self._seen
        assert offset == self._seen, \
            "doc tiles must arrive in ascending contiguous offset order"
        n = doc_tile.shape[0] if n_valid is None else n_valid
        doc_tile = jnp.asarray(doc_tile, dtype=jnp.float32)
        tile_mask = jnp.asarray(tile_mask, dtype=bool)
        if n < doc_tile.shape[0]:
            # honor the n_valid contract for EVERY engine: the screened
            # branch has no n_docs cutoff, so unmasked padding rows would
            # score for real and alias the NEXT tile's doc ids (r3
            # review; previously only safe because the ck pipeline
            # defensively pre-zeroed the padding mask itself)
            tile_mask = tile_mask.at[n:].set(False)
        engine = _maxsim_engine(self.engine, doc_tile.shape[0],
                                self.queries.shape[1], doc_tile.shape[-1])
        run_s, run_i = self.state
        if engine == "screened":
            kk = min(self.k, n)
            if self._adaptive:
                tier_idx = self._ctrl.tier_idx
                ts, ti, diag = maxsim_topk_screened(
                    self.queries, self.q_mask, doc_tile, tile_mask, k=kk,
                    screen_precision=self._ctrl.tier_arg,
                    with_diagnostics=True)
                if diag is not None:
                    # no harvest delay needed: maxsim_topk_screened syncs
                    # its ok certificate to the host either way, so the
                    # diag read adds no device round-trip
                    self._ctrl.observe(diag, tier_idx,
                                       self.queries.shape[0])
            else:
                ts, ti = maxsim_topk_screened(
                    self.queries, self.q_mask, doc_tile, tile_mask, k=kk,
                    screen_precision=self.screen_precision)
            ts = jnp.asarray(ts)
            ti = (jnp.asarray(ti) + offset).astype(jnp.int32)
            md, mi = merge_topk(-run_s, run_i, -ts, ti, self.k)
            self.state = (-md, mi)
        else:
            self.state = _maxsim_tile_step(
                run_s, run_i, self.queries, self.q_mask,
                doc_tile, tile_mask,
                offset, offset + n, self.k, self.precision)
        self._seen += n

    @property
    def docs_seen(self) -> int:
        return self._seen

    @property
    def _tier_idx(self) -> int:
        """Current adaptive ladder level (bench/test observability);
        0 = "high". Always 0 when a fixed tier was requested."""
        return self._ctrl.tier_idx if self._adaptive else 0

    def force_state(self, state) -> None:
        """Backpressure sync (see ops.knn.StreamingKNN.force_state)."""
        _ = np.asarray(state[0][0, 0])

    def state_arrays(self):
        """(scores, idx, seen) as host arrays — the streaming checkpoint
        (mirrors ops.knn.StreamingKNN.state_arrays)."""
        return np.asarray(self.state[0]), np.asarray(self.state[1]), self._seen

    def restore(self, scores, idx, seen: int) -> None:
        """Resume from a checkpoint taken by `state_arrays` (the running
        top-k over the first `seen` base docs)."""
        q_n = self.queries.shape[0]
        assert scores.shape == (q_n, self.k) and idx.shape == (q_n, self.k)
        self.state = (jnp.asarray(scores, dtype=jnp.float32),
                      jnp.asarray(idx, dtype=jnp.int32))
        self._seen = int(seen)

    def finalize(self):
        """(scores desc, doc indices) as numpy."""
        # same guard as StreamingKNN.finalize: an under-fed stream would
        # return -inf scores with garbage doc id 0 past row _seen
        # (r3 review)
        assert self._seen >= self.k, \
            f"saw only {self._seen} base docs but k={self.k}"
        s, i = self.state
        return np.asarray(s), np.asarray(i)


def maxsim_oracle(queries, q_mask, docs, d_mask, k):
    """float64 numpy reference for tests."""
    q = np.asarray(queries, dtype=np.float64)
    d = np.asarray(docs, dtype=np.float64)
    qm = np.asarray(q_mask, dtype=bool)
    dm = np.asarray(d_mask, dtype=bool)
    q_n, tq, dim = q.shape
    d_n, td, _ = d.shape
    scores = np.zeros((q_n, d_n))
    for qi in range(q_n):
        for di in range(d_n):
            sims = q[qi] @ d[di].T  # (tq, td)
            sims[:, ~dm[di]] = -np.inf
            per_tok = sims.max(axis=1)
            per_tok[~qm[qi]] = 0.0
            scores[qi, di] = per_tok.sum()
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx
