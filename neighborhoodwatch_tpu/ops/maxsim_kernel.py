"""Pallas TPU kernel: fused ColBERT MaxSim scoring + candidate screening.

The XLA MaxSim path (ops/maxsim.py) computes score(q, doc) = sum_t max_s
<q_t, d_s> as one (Q*Tq, D*Td) matmul whose output is ~Q*D*Tq*Td*4 bytes —
HBM-bound at ~1% of MXU peak (measured 18.6M doc-scores/s on v5e for
1k x 200k docs). This kernel keeps the similarity tile in VMEM and fuses:

1. MXU: sims = q_tokens . doc_tokens^T per (query block, doc block), bf16x3
   passes (fp32-accurate to ~2^-32, cf. ops/screen_kernel.py);
2. VPU: + (-inf) doc-token padding bias, per-token max over Td as TD
   aligned slab maxes (doc tokens are laid out td-major so token s of every
   doc in the block occupies one contiguous column slab); docs longer than
   32 tokens stream through in 32-token chunks (innermost grid dim) with a
   running per-(query token, doc) max in VMEM scratch — max over Td
   decomposes over chunks — so Td is unbounded; masked per-query-token sum
   over Tq as TQ contiguous row-slab adds (query tokens laid out tq-major);
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
)
from neighborhoodwatch_tpu.utils.misc import round_up

TQR = 256          # query-token rows per block (QB queries x padded Tq)
DB = 256           # docs per block at td<=16; 128 at td<=32 (the (TQR,
                   # td*DB) similarity tile must stay inside VMEM)
SUB_PER_MEGA = 32
MEGA_DOCS = DB * SUB_PER_MEGA  # 8192 docs per mega-tile regardless of DB
CAND_PER_MEGA = KEEP * LANES
NEG_BIAS = -1e30   # doc-token padding bias (finite: avoids inf-inf NaNs)

# bf16x3 residual + packed-key quantization, relative to the score scale
MAXSIM_EPS_REL = 1e-5 + PACK_EPS_REL


def _screen_scores(m, out_ref, mk_ref, bi, *,
                   tq: int, qb: int, sub: int, db: int):
    """Sum the per-query-token maxes over each query's tq token rows
    (tq-major: contiguous row slabs), then screen: keep the KEEP best
    (largest) scores per lane bin, flushed per mega-tile."""
    acc = m[0:qb]
    for t in range(1, tq):
        acc = acc + m[t * qb:(t + 1) * qb]            # (QB, DB)

    # negate into ascending order and pack like the kNN screen kernel
    bits = jax.lax.bitcast_convert_type(-acc, jnp.int32)
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


def _kernel(db_ref, q_ref, d_ref, out_ref, mk_ref, m_ref, *,
            tq: int, tdc: int, qb: int, sub: int, db: int, n_tc: int):
    bi = pl.program_id(1)
    tc = pl.program_id(2)

    q = q_ref[:].reshape(TQR, q_ref.shape[-1])        # (QB*tq, dim)
    d = d_ref[:].reshape(tdc * db, d_ref.shape[-1])   # (tdc*db, dim)
    qhi = q.astype(jnp.bfloat16)
    dhi = d.astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    sims = dot(qhi, dhi)
    qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
    dlo = (d - dhi.astype(jnp.float32)).astype(jnp.bfloat16)
    sims = sims + dot(qlo, dhi) + dot(qhi, dlo)       # (TQR, tdc*DB)

    # doc-token padding: masked tokens carry NEG_BIAS and never win a max.
    # Query-token masking needs no in-kernel work: masked/padded query
    # tokens are pre-zeroed, and a zero token's max over any doc with a
    # valid token is exactly 0 — the masked contribution.
    sims = sims + db_ref[:].reshape(1, tdc * db)

    # per-query-token max over this chunk's tdc tokens: td-major layout
    # makes token s of all DB docs one contiguous column slab
    m = sims[:, :db]
    for s in range(1, tdc):
        m = jnp.maximum(m, sims[:, s * db:(s + 1) * db])  # (TQR, db)

    if n_tc == 1:
        _screen_scores(m, out_ref, mk_ref, bi, tq=tq, qb=qb, sub=sub, db=db)
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
            _screen_scores(m_ref[:], out_ref, mk_ref, bi,
                           tq=tq, qb=qb, sub=sub, db=db)


@partial(jax.jit, static_argnames=("tq", "tdc", "db", "interpret"))
def _maxsim_screen_call(q_t, d_t, dbias_t, tq: int, tdc: int, db: int,
                        interpret: bool):
    """q_t: (tq, Qp, dim) tq-major query tokens (masked tokens pre-zeroed);
    d_t: (td, Dp, dim) td-major doc tokens (td a multiple of the chunk
    size tdc); dbias_t: (td, Dp) 0/NEG_BIAS.
    Returns packed keys (Qp, n_mega*CAND_PER_MEGA)."""
    Qp, dim = q_t.shape[1], q_t.shape[2]
    td, Dp = d_t.shape[0], d_t.shape[1]
    qb = TQR // tq
    sub = MEGA_DOCS // db
    n_q = Qp // qb
    n_b = Dp // db
    n_tc = td // tdc
    n_mega = Dp // MEGA_DOCS
    grid = (n_q, n_b, n_tc)

    kernel = partial(_kernel, tq=tq, tdc=tdc, qb=qb, sub=sub, db=db,
                     n_tc=n_tc)
    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    keys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tdc, db), lambda qi, bi, tc: (tc, bi),
                         memory_space=pltpu.VMEM),          # doc-token bias
            pl.BlockSpec((tq, qb, dim), lambda qi, bi, tc: (0, qi, 0),
                         memory_space=pltpu.VMEM),          # query tokens
            pl.BlockSpec((tdc, db, dim), lambda qi, bi, tc: (tc, bi, 0),
                         memory_space=pltpu.VMEM),          # doc tokens
        ],
        out_specs=pl.BlockSpec((qb, CAND_PER_MEGA),
                               lambda qi, bi, tc: (qi, bi // sub),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((KEEP, qb, LANES), jnp.int32),
            pltpu.VMEM((TQR, db), jnp.float32),   # running chunk max
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * tq * Dp * td * dim * 3,
            bytes_accessed=int(Dp * td * dim * 4 * n_q + Qp * tq * dim * 4),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(dbias_t, q_t, d_t)

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


def screen_maxsim(queries, q_mask, docs, d_mask, *,
                  interpret: bool | None = None):
    """Fused MaxSim screen: (Q, Tq, dim) x (D, Td, dim) -> per-mega-tile
    candidate lists of (negated quantized score, doc id). The last KEEP-slab
    per mega is the certificate slab (4th-best score per 64-doc bin)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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
    tq = round_up(Tq, 8)
    while TQR % tq:
        tq += 8
    td = round_up(Td, 8)
    if td > 32:
        td = round_up(td, 32)   # a whole number of 32-token chunks
    qb = TQR // tq
    Qp = round_up(Q, qb)
    Dp = round_up(D, MEGA_DOCS)

    # masked query tokens contribute zero to MaxSim; zeroing them here
    # removes the mask from the kernel entirely (see _kernel comment)
    queries = jnp.where(q_mask[:, :, None], queries, 0.0)
    queries = jnp.pad(queries, ((0, Qp - Q), (0, tq - Tq), (0, dimp - dim)))
    docs = jnp.pad(docs, ((0, Dp - D), (0, td - Td), (0, dimp - dim)))
    d_mask = jnp.pad(d_mask, ((0, Dp - D), (0, td - Td)))

    # device relayouts: tq-major queries, td-major docs
    q_t = jnp.swapaxes(queries, 0, 1)                     # (tq, Qp, dim)
    d_t = jnp.swapaxes(docs, 0, 1)                        # (td, Dp, dim)
    dbias_t = jnp.where(jnp.swapaxes(d_mask, 0, 1), 0.0, NEG_BIAS) \
        .astype(jnp.float32)

    # the (TQR, tdc*db) similarity tile must fit VMEM with its bf16 copies
    tdc = td if td <= 32 else 32
    db = DB if tdc <= 16 else DB // 2
    cand_neg, cand_doc = _maxsim_screen_call(q_t, d_t, dbias_t,
                                             tq, tdc, db, interpret)
    return cand_neg[:Q], cand_doc[:Q], Dp // MEGA_DOCS
