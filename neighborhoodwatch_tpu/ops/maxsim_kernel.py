"""Pallas TPU kernel: fused ColBERT MaxSim scoring + candidate screening.

The XLA MaxSim path (ops/maxsim.py) computes score(q, doc) = sum_t max_s
<q_t, d_s> as one (Q*Tq, D*Td) matmul whose output is ~Q*D*Tq*Td*4 bytes —
HBM-bound at ~1% of MXU peak (measured 18.6M doc-scores/s on v5e for
1k x 200k docs). This kernel keeps the similarity tile in VMEM and fuses:

1. MXU: sims = q_tokens . doc_tokens^T per (query block, doc block), bf16x3
   passes (fp32-accurate to ~2^-32, cf. ops/screen_kernel.py) on
   PRE-CONVERTED bf16 hi/lo operand pairs (the in-kernel splits were ~25%
   of the kernel's VPU work);
2. VPU: per-token max over Td as TD aligned slab maxes (doc tokens are
   laid out td-major so token s of every doc in the block occupies one
   contiguous column slab; masked doc tokens are pre-replaced by a
   duplicate of the doc's first valid token — max-invariant, so no
   per-token bias — and empty/padding docs get one per-DOC bias); docs
   longer than 32 tokens stream through in 32-token chunks (innermost grid
   dim) with a running per-(query token, doc) max in VMEM scratch — max
   over Td decomposes over chunks — so Td is unbounded; masked
   per-query-token sum over Tq as TQ contiguous row-slab adds (query
   tokens laid out tq-major);
3. per-lane-bin top-KEEP screening of NEGATED scores with the packed
   sortable-int32 keys of the kNN screen kernel (distance bits | position),
   flushed per mega-tile of doc blocks.

ops/maxsim.py re-ranks the merged candidates with exact fp32 MaxSim and
proves per-query exactness with the same bin + count certificates; failed
queries fall back to the exact XLA path. Capability context: the reference
approximates ColBERT retrieval as flat token kNN (colbert_knn.py:84-126);
this is the exact late-interaction generalization at MXU speed.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neighborhoodwatch_tpu.ops.screen_kernel import (
    KEEP, LANES, POS_BITS, POS_MASK, PACK_EPS_REL,
    bf16_round, norm_guard,
)
from neighborhoodwatch_tpu.utils.misc import round_up

# Software pipelining (the transform that bought the kNN screen 8%) is
# measured SLOWER here and defaults off: unlike the kNN kernel, every
# grid step completes a similarity tile, so the retire copy is a full
# (tqr, tdc*db) 4MB VMEM pass per step with no n_dk amortization — and
# the 3-pass screen already runs at ~85% of the MXU roof (27.5 TFLOP per
# pass => 0.42s floor vs 0.489s measured on the 1k x 200k x 32x16
# headline), leaving <15% of epilogue to hide. Measured on v5e,
# bit-identical outputs: high 0.489 -> 0.516s, 1-pass 0.211 -> 0.237s.
# The variant stays available (screen_maxsim(pipelined=True)) and
# regression-tested for TPU generations with a different VPU/MXU balance.
PIPELINED_DEFAULT = False

TQR = 256          # query-token rows per block (qb queries x padded Tq);
                   # 512 for big short-doc batches — the doc tensor is
                   # re-read from HBM once per query block (the dominant
                   # HBM term, cf. the kNN screen kernel), so taller
                   # query blocks halve it
DB = 256           # docs per block at td<=16; fewer when the (TQR,
                   # td*DB) fp32 similarity tile would leave VMEM (the
                   # tile is capped at 4MB; db never drops below the
                   # 128-lane bin width)
SUB_PER_MEGA = 32
MEGA_DOCS = DB * SUB_PER_MEGA  # 8192 docs per mega-tile regardless of DB
CAND_PER_MEGA = KEEP * LANES
NEG_BIAS = -1e30   # per-DOC empty/padding bias (finite: avoids inf-inf
                   # NaNs; masked tokens of nonempty docs need no bias —
                   # they are pre-replaced by duplicate valid tokens)

def maxsim_acc_rel(dim: int) -> float:
    """WORST-CASE fp32 accumulation guard for one MaxSim dot + token sum,
    relative to the score scale: dim adds at 2^-24 regardless of order
    (the ops.knn._acc_rel argument), +64 covers the <=32-term query-token
    sum and the epilogue ops, 1.05 covers second-order terms. ONE
    definition shared by the 3-pass static bound (maxsim_eps3_rel) and
    the 1/2-pass data-dependent eps (ops.maxsim._maxsim_select) — r3
    review: the expression was duplicated and could silently desync."""
    return (dim + 64) * 2.0 ** -24 * 1.05


def doc_cert_stats(docs, d_mask, dim: int, dhi=None, need_dlo: bool = True):
    """Certificate doc statistics: (2,) f32 [d_max, dlo_max] — guarded
    UPPER bounds on the max valid-token norm and max bf16-residual norm
    (norm_guard budgets their own fp32 accumulation). ONE definition for
    the fused screen prep (_screen_exec, where the bf16 image `dhi`
    already exists) and ops.maxsim._maxsim_select's direct-caller
    fallback — r3 review: two copies of certificate-critical math can
    silently desync. `dim` is the true token dim (padding zeros add
    exactly). need_dlo=False (the 3-pass tier, whose eps branch never
    reads dlo_max) skips the residual pass over the doc tensor and
    stores a 0 placeholder."""
    g = norm_guard(dim)
    dn = jnp.sqrt(jnp.sum(docs * docs, axis=2))
    d_max = jnp.max(jnp.where(d_mask, dn, 0.0)) * g
    if not need_dlo:
        return jnp.stack([d_max, jnp.zeros_like(d_max)])
    if dhi is None:
        # bf16_round, not astype: the astype round-trip folds to the
        # identity under jit on TPU and `res` becomes zero (bf16_round doc)
        dhi = bf16_round(docs).astype(jnp.bfloat16)
    res = docs - dhi.astype(jnp.float32)
    dlo_n = jnp.sqrt(jnp.sum(res * res, axis=2))
    dlo_max = jnp.max(jnp.where(d_mask, dlo_n, 0.0)) * g
    return jnp.stack([d_max, dlo_max])


def maxsim_eps3_rel(dim: int) -> float:
    """WORST-CASE screening error of the 3-pass (bf16x3) MaxSim screen,
    relative to the score scale (sum_t ||q_t||) x max_s ||d_s||: three
    dropped bf16 residual cross-terms each <= 2^-16 per token pair (cf.
    ops.knn._eps3_rel), the fp32 accumulation (maxsim_acc_rel —
    adversarial alignment included; r3 review: the old static 1e-5 only
    covered the RMS case), and the packed-key quantization."""
    return 3.1 * 2.0 ** -16 + maxsim_acc_rel(dim) + PACK_EPS_REL


def _screen_scores(m, dbias, out_ref, mk_ref, bi, *,
                   tq: int, qb: int, sub: int, db: int):
    """Sum the per-query-token maxes over each query's tq token rows
    (tq-major: contiguous row slabs), add the per-DOC bias (NEG_BIAS for
    empty/padding docs — masked tokens of nonempty docs never reach here:
    they are replaced by a duplicate of the doc's first valid token, which
    leaves every max unchanged), then screen: keep the KEEP best (largest)
    scores per lane bin, flushed per mega-tile."""
    acc = m[0:qb]
    for t in range(1, tq):
        acc = acc + m[t * qb:(t + 1) * qb]            # (QB, DB)
    acc = acc + dbias

    # negate into ascending order and pack like the kNN screen kernel.
    # NaN scores (inf/NaN garbage tokens) must LOSE every bin: a NaN with
    # its sign bit set would transform to a huge negative key that wins
    # unconditionally (r3 review, cf. the kNN screen's sanitization)
    negscore = -acc
    negscore = jnp.where(jnp.isnan(negscore), jnp.inf, negscore)
    bits = jax.lax.bitcast_convert_type(negscore, jnp.int32)
    neg = jax.lax.shift_right_arithmetic(bits, 31)
    bits = bits ^ (neg & jnp.int32(0x7FFFFFFF))

    @pl.when(bi % sub == 0)
    def _():
        mk_ref[:] = jnp.full(mk_ref.shape, jnp.int32(0x7FFFFFFF))

    ks = [mk_ref[t] for t in range(KEEP)]
    pos0 = (bi % sub) * (db // LANES)
    for j in range(db // LANES):
        kj = (bits[:, j * LANES:(j + 1) * LANES]
              & jnp.int32(~POS_MASK)) | (pos0 + j)
        hi = kj
        for t in range(KEEP):
            lo = jnp.minimum(ks[t], hi)
            if t < KEEP - 1:
                hi = jnp.maximum(ks[t], hi)
            ks[t] = lo
    for t in range(KEEP):
        mk_ref[t] = ks[t]

    @pl.when(bi % sub == sub - 1)
    def _():
        for t in range(KEEP):
            out_ref[:, t * LANES:(t + 1) * LANES] = ks[t]


def _kernel(db_ref, qhi_ref, *rest,
            tq: int, tdc: int, qb: int, sub: int, db: int, n_tc: int,
            passes: int = 3):
    # operand layout varies with the precision tier (cf. the kNN screen
    # kernel's tiers): 1-pass = qhi.dhi; 2-pass "medium" = + qlo.dhi
    # (= exact-q x bf16-docs); 3-pass "high" = + qhi.dlo (bf16x3,
    # fp32-accurate ~2^-32). The dropped terms at the computed tiers are
    # bounded per query by the data-dependent certificate eps in
    # ops.maxsim._maxsim_select.
    rest = list(rest)
    qlo_ref = rest.pop(0) if passes >= 2 else None
    dhi_ref = rest.pop(0)
    dlo_ref = rest.pop(0) if passes >= 3 else None
    out_ref, mk_ref, m_ref = rest
    bi = pl.program_id(1)
    tc = pl.program_id(2)

    # token operands arrive as PRE-CONVERTED bf16 hi/lo pairs: the
    # in-kernel fp32->bf16 splits cost ~1M VPU elem-ops per grid step —
    # on par with the step's MXU time — and serialized with it.
    dim = qhi_ref.shape[-1]
    qhi = qhi_ref[:].reshape(tq * qb, dim)            # (qb*tq, dim)
    dhi = dhi_ref[:].reshape(tdc * db, dim)           # (tdc*db, dim)
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    sims = dot(qhi, dhi)
    if passes >= 2:
        sims = sims + dot(qlo_ref[:].reshape(tq * qb, dim), dhi)
    if passes >= 3:
        sims = sims + dot(qhi, dlo_ref[:].reshape(tdc * db, dim))

    # No per-token masking work: masked/padded QUERY tokens are
    # pre-zeroed (a zero token's max is exactly the masked contribution,
    # 0), and masked DOC tokens are pre-replaced by a duplicate of the
    # doc's first valid token (duplicates never change a max) — only
    # fully-empty/padding docs need a bias, applied per DOC in
    # _screen_scores. The old per-ELEMENT bias add cost 1 VPU op per
    # similarity — ~25% of the kernel's non-MXU work.

    # per-query-token max over this chunk's tdc tokens: td-major layout
    # makes token s of all DB docs one contiguous column slab
    m = sims[:, :db]
    for s in range(1, tdc):
        m = jnp.maximum(m, sims[:, s * db:(s + 1) * db])  # (TQR, db)

    if n_tc == 1:
        _screen_scores(m, db_ref[:], out_ref, mk_ref, bi,
                       tq=tq, qb=qb, sub=sub, db=db)
    else:
        # docs longer than one chunk: fold the chunk max into a running
        # per-(query token, doc) max — max over Td decomposes over chunks
        @pl.when(tc == 0)
        def _():
            m_ref[:] = m

        @pl.when(tc > 0)
        def _():
            m_ref[:] = jnp.maximum(m_ref[:], m)

        @pl.when(tc == n_tc - 1)
        def _():
            _screen_scores(m_ref[:], db_ref[:], out_ref, mk_ref, bi,
                           tq=tq, qb=qb, sub=sub, db=db)


def _kernel_pipelined(db_ref, qhi_ref, *rest,
                      tq: int, tdc: int, qb: int, sub: int, db: int,
                      n_tc: int, n_b: int, passes: int = 3):
    """Software-pipelined variant of `_kernel`: the VPU epilogue (chunk
    max + token sum + packed-key screen) for grid step s-1 runs DURING
    step s's MXU passes, mirroring screen_kernel._kernel_pipelined.

    Each step writes its finished similarity tile to a dedicated RETIRE
    buffer; the next step's epilogue reads ONLY that buffer while the
    MXU accumulates the new tile — independent instruction streams on
    statically-disjoint refs. The grid gains one trailing `bi` step per
    query block to retire the final tile (its own dots run on a clamped
    doc block and are never consumed). Body order matters: the retire
    read precedes this step's publish write. Outputs are bit-identical
    to `_kernel` (regression-tested in interpret mode)."""
    rest = list(rest)
    qlo_ref = rest.pop(0) if passes >= 2 else None
    dhi_ref = rest.pop(0)
    dlo_ref = rest.pop(0) if passes >= 3 else None
    out_ref, mk_ref, m_ref, ret_ref = rest
    bi = pl.program_id(1)
    tc = pl.program_id(2)

    # ---- retire the PREVIOUS linear step ps = s-1 (from ret_ref) ----
    # pbi/ptc are ps's (doc block, token chunk); the trailing bi == n_b
    # steps retire only at tc == 0 (ps past the last real step is dead)
    s = bi * n_tc + tc
    ps = s - 1
    pbi = ps // n_tc
    ptc = ps - pbi * n_tc
    live = jnp.logical_and(ps >= 0, ps <= n_b * n_tc - 1)

    @pl.when(live)
    def _():
        sims = ret_ref[:]
        m = sims[:, :db]
        for c in range(1, tdc):
            m = jnp.maximum(m, sims[:, c * db:(c + 1) * db])
        if n_tc == 1:
            _screen_scores(m, db_ref[:], out_ref, mk_ref, pbi,
                           tq=tq, qb=qb, sub=sub, db=db)
        else:
            # fold the chunk max into the running per-(q token, doc) max;
            # screen once the retiring tile closes its doc block
            @pl.when(ptc == 0)
            def _():
                m_ref[:] = m

            @pl.when(ptc > 0)
            def _():
                m_ref[:] = jnp.maximum(m_ref[:], m)

            @pl.when(ptc == n_tc - 1)
            def _():
                _screen_scores(m_ref[:], db_ref[:], out_ref, mk_ref, pbi,
                               tq=tq, qb=qb, sub=sub, db=db)

    # ---- MXU: this step's similarity tile (cf. _kernel) ----
    dim = qhi_ref.shape[-1]
    qhi = qhi_ref[:].reshape(tq * qb, dim)
    dhi = dhi_ref[:].reshape(tdc * db, dim)
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    sims = dot(qhi, dhi)
    if passes >= 2:
        sims = sims + dot(qlo_ref[:].reshape(tq * qb, dim), dhi)
    if passes >= 3:
        sims = sims + dot(qhi, dlo_ref[:].reshape(tdc * db, dim))

    # ---- publish for the next step's retire (after the read above) ----
    ret_ref[:] = sims


@partial(jax.jit, static_argnames=("tq", "tdc", "db", "tqr", "passes",
                                   "interpret", "pipelined"))
def _maxsim_screen_call(qhi_t, qlo_t, dhi_t, dlo_t, doc_bias,
                        tq: int, tdc: int, db: int,
                        interpret: bool, tqr: int = TQR, passes: int = 3,
                        pipelined: bool = PIPELINED_DEFAULT):
    """qhi_t/qlo_t: (tq, Qp, dim) tq-major bf16 query-token hi/lo pairs
    (masked tokens pre-zeroed; qlo_t None below 2 passes); dhi_t/dlo_t:
    (td, Dp, dim) td-major bf16 doc-token pairs (masked tokens
    pre-duplicated, td a multiple of the chunk size tdc; dlo_t None below
    3 passes); doc_bias: (1, Dp) 0/NEG_BIAS for empty/padding docs.
    Returns packed keys (Qp, n_mega*CAND_PER_MEGA)."""
    Qp, dim = qhi_t.shape[1], qhi_t.shape[2]
    td, Dp = dhi_t.shape[0], dhi_t.shape[1]
    qb = tqr // tq
    sub = MEGA_DOCS // db
    n_q = Qp // qb
    n_b = Dp // db
    n_tc = td // tdc
    n_mega = Dp // MEGA_DOCS

    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    q_spec = pl.BlockSpec((tq, qb, dim), lambda qi, bi, tc: (0, qi, 0),
                          memory_space=pltpu.VMEM)
    if pipelined:
        # one trailing bi step per query block retires the final tile's
        # epilogue; its own dots run on the clamped last doc block and
        # are never consumed. The bias/out blocks follow the RETIRING
        # linear step s-1 (clamped at s=0, when no epilogue fires).
        grid = (n_q, n_b + 1, n_tc)
        kernel = partial(_kernel_pipelined, tq=tq, tdc=tdc, qb=qb, sub=sub,
                         db=db, n_tc=n_tc, n_b=n_b, passes=passes)

        def _pb(bi, tc):        # retiring step's doc block, clamped
            return jnp.clip((bi * n_tc + tc - 1) // n_tc, 0, n_b - 1)

        d_spec = pl.BlockSpec(
            (tdc, db, dim),
            lambda qi, bi, tc: (tc, jnp.minimum(bi, n_b - 1), 0),
            memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((1, db),
                                 lambda qi, bi, tc: (0, _pb(bi, tc)),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((qb, CAND_PER_MEGA),
                                lambda qi, bi, tc: (qi, _pb(bi, tc) // sub),
                                memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((KEEP, qb, LANES), jnp.int32),
            pltpu.VMEM((tqr, db), jnp.float32),        # running chunk max
            pltpu.VMEM((tqr, tdc * db), jnp.float32),  # retire buffer
        ]
    else:
        grid = (n_q, n_b, n_tc)
        kernel = partial(_kernel, tq=tq, tdc=tdc, qb=qb, sub=sub, db=db,
                         n_tc=n_tc, passes=passes)
        d_spec = pl.BlockSpec((tdc, db, dim),
                              lambda qi, bi, tc: (tc, bi, 0),
                              memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((1, db), lambda qi, bi, tc: (0, bi),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((qb, CAND_PER_MEGA),
                                lambda qi, bi, tc: (qi, bi // sub),
                                memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((KEEP, qb, LANES), jnp.int32),
            pltpu.VMEM((tqr, db), jnp.float32),        # running chunk max
        ]
    in_specs = [bias_spec]                                  # per-doc bias
    operands = [doc_bias, qhi_t]
    in_specs.append(q_spec)                                 # query hi
    if passes >= 2:
        in_specs.append(q_spec)                             # query lo
        operands.append(qlo_t)
    in_specs.append(d_spec)                                 # doc hi
    operands.append(dhi_t)
    if passes >= 3:
        in_specs.append(d_spec)                             # doc lo
        operands.append(dlo_t)
    keys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * tq * Dp * td * dim * passes,
            # bf16 operand pairs: docs move 2 bytes/elem below 3 passes
            # (hi only), 4 at bf16x3; queries hi(+lo) likewise
            bytes_accessed=int(
                Dp * td * dim * (4 if passes >= 3 else 2) * n_q
                + Qp * tq * dim * (4 if passes >= 2 else 2)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    # decode: negated score (quantized) + global doc id
    vbits = keys & jnp.int32(~POS_MASK)
    neg = jax.lax.shift_right_arithmetic(vbits, 31)
    vbits = vbits ^ (neg & jnp.int32(0x7FFFFFFF))
    cand_negscore = jax.lax.bitcast_convert_type(vbits, jnp.float32)
    pos = keys & POS_MASK
    col = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    mega_i = col // CAND_PER_MEGA
    lane = col % LANES
    n_slice = db // LANES
    cand_doc = (mega_i * MEGA_DOCS + (pos // n_slice) * db
                + (pos % n_slice) * LANES + lane)
    return cand_negscore, cand_doc


@partial(jax.jit, static_argnames=("Qp", "Dp", "tq", "td", "tdc", "db",
                                   "tqr", "dimp", "passes", "interpret",
                                   "pipelined", "want_dlo_stat"))
def _screen_exec(queries, q_mask, docs, d_mask, *, Qp: int, Dp: int,
                 tq: int, td: int, tdc: int, db: int, tqr: int,
                 dimp: int, passes: int, interpret: bool,
                 pipelined: bool = PIPELINED_DEFAULT,
                 want_dlo_stat: bool = False):
    """One fused program: mask/pad/duplicate/bf16-split/relayout the token
    tensors and run the screen kernel. Keeping the prep inside the jit
    matters — as ~12 eager dispatches it measured +0.05s per call on the
    1k x 200k bench (and XLA fuses the conversions into the relayouts)."""
    Q, Tq, dim = queries.shape
    D, Td = docs.shape[:2]

    # masked query tokens contribute zero to MaxSim; zeroing them here
    # removes the mask from the kernel entirely (see _kernel comment)
    queries = jnp.where(q_mask[:, :, None], queries, 0.0)
    queries = jnp.pad(queries, ((0, Qp - Q), (0, tq - Tq), (0, dimp - dim)))
    docs = jnp.pad(docs, ((0, Dp - D), (0, td - Td), (0, dimp - dim)))
    d_mask = jnp.pad(d_mask, ((0, Dp - D), (0, td - Td)))

    # masked DOC tokens -> a duplicate of the doc's first valid token:
    # max over tokens is invariant under duplicates, so MaxSim is exactly
    # unchanged and the kernel needs no per-token bias (the old
    # per-ELEMENT bias add was ~25% of the kernel's VPU work). Docs with
    # no valid token at all (fully masked, or pure Dp-padding rows) keep
    # their zero/garbage tokens and are pushed out of every bin by one
    # per-DOC bias instead.
    first_tok = jnp.take_along_axis(
        docs, jnp.argmax(d_mask, axis=1)[:, None, None], axis=1)
    docs = jnp.where(d_mask[:, :, None], docs, first_tok)
    doc_bias = jnp.where(jnp.any(d_mask, axis=1), 0.0, NEG_BIAS) \
        .astype(jnp.float32)[None, :]                     # (1, Dp)

    # bf16 hi/lo operand pairs, pre-converted (the in-kernel splits were
    # ~25% of the kernel's VPU work, serialized with the MXU stream).
    # lo = x - bf16(x) is exact in fp32 (Sterbenz) but the bf16 cast of
    # lo rounds once more — that double-rounding term is budgeted in the
    # certificate eps (ops.maxsim._maxsim_select). Tiers below 3 passes
    # skip the unused lo operand entirely. The hi images come from
    # bf16_round (integer RNE), NOT astype: under jit on TPU XLA folds
    # an astype round-trip and the qlo/dlo operands below become ZERO —
    # the 2/3-pass tiers silently degrade to 1-pass (bf16_round doc).
    qhi_f = bf16_round(queries)
    dhi_f = bf16_round(docs)
    qhi = qhi_f.astype(jnp.bfloat16)
    dhi = dhi_f.astype(jnp.bfloat16)

    # certificate doc stats fused here where the doc tensor and its bf16
    # image are already live: computing them in the select's own jit
    # re-read + re-converted the whole corpus every call (r3 review).
    # Dupe-filled tokens mirror a valid token of the same doc, and
    # fully-masked/padding rows are excluded by d_mask, so masking by
    # d_mask bounds every token that can influence a candidate score.
    doc_stats = doc_cert_stats(docs, d_mask, dim, dhi=dhi,
                               need_dlo=passes < 3 or want_dlo_stat)

    # device relayouts: tq-major queries, td-major docs
    qhi_t = jnp.swapaxes(qhi, 0, 1)                       # (tq, Qp, dim)
    dhi_t = jnp.swapaxes(dhi, 0, 1)                       # (td, Dp, dim)
    qlo_t = dlo_t = None
    if passes >= 2:
        qlo = (queries - qhi_f).astype(jnp.bfloat16)
        qlo_t = jnp.swapaxes(qlo, 0, 1)
    if passes >= 3:
        dlo = (docs - dhi_f).astype(jnp.bfloat16)
        dlo_t = jnp.swapaxes(dlo, 0, 1)

    cand_neg, cand_doc = _maxsim_screen_call(qhi_t, qlo_t, dhi_t, dlo_t,
                                             doc_bias,
                                             tq, tdc, db, interpret,
                                             tqr=tqr, passes=passes,
                                             pipelined=pipelined)
    return cand_neg[:Q], cand_doc[:Q], doc_stats


def screen_maxsim(queries, q_mask, docs, d_mask, *,
                  screen_precision: str = "medium",
                  interpret: bool | None = None,
                  pipelined: bool | None = None,
                  want_dlo_stat: bool = False):
    """Fused MaxSim screen: (Q, Tq, dim) x (D, Td, dim) -> per-mega-tile
    candidate lists of (negated quantized score, doc id). The last KEEP-slab
    per mega is the certificate slab (4th-best score per 64-doc bin).

    Returns (cand_neg, cand_doc, n_mega, doc_stats); doc_stats is the
    (2,) f32 [d_max, dlo_max] certificate statistics, computed fused with
    the screen's operand prep (pass to _maxsim_select to avoid its
    fallback corpus passes). At the 3-pass tier dlo_max is normally a 0
    placeholder (the 3-pass eps never reads it); `want_dlo_stat=True`
    forces the real residual statistic — required when the caller asks
    _maxsim_select for adaptive-tier diagnostics, whose sub-high eps
    bands are built from dlo_max.

    `screen_precision` picks the MXU passes (cf. the kNN screen tiers):
    "high" = bf16x3 (~2^-32), "medium" = full-q x bf16-docs (2 passes —
    the default, matching ops.maxsim), "default" = plain bf16 (1 pass).
    The computed tiers' screening error is bounded per query by the
    data-dependent certificate eps in ops.maxsim._maxsim_select, so
    every tier stays exact end to end."""
    from neighborhoodwatch_tpu.ops.screen_kernel import PASSES
    passes = PASSES[screen_precision]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if pipelined is None:
        pipelined = PIPELINED_DEFAULT
    queries = jnp.asarray(queries, jnp.float32)
    docs = jnp.asarray(docs, jnp.float32)
    q_mask = jnp.asarray(q_mask, bool)
    d_mask = jnp.asarray(d_mask, bool)

    Q, Tq, dim = queries.shape
    D, Td = docs.shape[:2]
    assert dim % LANES == 0 or dim <= LANES, \
        f"token dim {dim} must be <= 128 or a multiple of 128"
    # VMEM sizing: one (TQR, tdc*DB) similarity tile must stay on-chip and
    # the (qb, ...) output block needs qb >= 8; callers with longer QUERY
    # token lists use the XLA path (maxsim_topk). Doc-token counts are
    # unbounded: docs longer than one chunk stream through the kernel in
    # td-chunks with a running per-(query token, doc) max (the max over Td
    # decomposes over chunks), so real passages (ColBERT doc_maxlen 180+)
    # stay on the fused kernel instead of falling back to the XLA path.
    assert Tq <= 32, f"screened MaxSim supports <= 32 query tokens, got {Tq}"
    dimp = round_up(dim, LANES)
    td = round_up(Td, 8)
    if td > 32:
        td = round_up(td, 32)   # a whole number of 32-token chunks
    tdc = td if td <= 32 else 32
    # 512-row query blocks halve the dominant HBM term (the doc tensor
    # is re-read once per query block: 125 x 1.6GB = 205GB on the 1k x
    # 200k bench at tqr=256). The fp32 similarity tile (tqr, tdc*db) is
    # capped at 4MB and db cannot shrink below the 128-lane bin width,
    # so the tall blocks apply only when the doc chunk is <= 16 tokens
    # (and the query batch is big enough to fill them)
    tqr = 512 if (tdc <= 16 and Q * Tq >= 4096) else TQR
    tq = round_up(Tq, 8)
    while tqr % tq:
        tq += 8
    qb = tqr // tq
    Qp = round_up(Q, qb)
    Dp = round_up(D, MEGA_DOCS)
    # the (tqr, tdc*db) fp32 similarity tile is capped at 4MB. db must be
    # a LANES multiple that divides MEGA_DOCS (the screen loops db//LANES
    # lane slices and sub = MEGA_DOCS//db): the tile budget picks from
    # {256, 128} — an intermediate value like 170 (tdc=24) would compile-
    # fail on TPU and silently skip columns >= 128 in interpret mode
    # (r3 review finding)
    db = DB if tqr * tdc * DB * 4 <= (1 << 22) else DB // 2

    cand_neg, cand_doc, doc_stats = _screen_exec(
        queries, q_mask, docs, d_mask, Qp=Qp, Dp=Dp, tq=tq, td=td,
        tdc=tdc, db=db, tqr=tqr, dimp=dimp, passes=passes,
        interpret=interpret, pipelined=pipelined,
        want_dlo_stat=want_dlo_stat)
    return cand_neg, cand_doc, Dp // MEGA_DOCS, doc_stats
