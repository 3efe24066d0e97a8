"""Pallas TPU kernel: fused distance + candidate screening for exact kNN.

This is the hot kernel of the framework — the TPU-native replacement for the
fused distance+select inside `pylibraft.neighbors.brute_force.knn`
(reference: cu_knn.py:243-245). Measured on v5e, XLA's selection primitives
cost far more than the distance matmul itself over wide tiles
(approx_min_k ~215ms vs 14ms of matmul per (10k, 27648) tile), so selection
must be fused into the distance computation on-chip. This kernel:

1. computes the query x base distance tile on the MXU, accumulating fp32
   over D-chunks; precision is either one bf16 pass ("default") or a manual
   hi/lo bf16x3 decomposition ("high", ~fp32-accurate: the float32 operands
   are split as x = hi + lo with hi = bf16(x), and q.b = qhi.bhi + qlo.bhi
   + qhi.blo up to O(lo.lo) = 2^-32 relative);
2. packs each distance and its position within the lane bin into ONE
   sortable int32 key — the distance's IEEE bits (sign-flip-adjusted so
   int order == float order, low POS_BITS mantissa bits replaced by the
   position) — and keeps the KEEP smallest keys per VMEM lane in scratch
   across the sub-tiles of a mega-tile. The packed sorted-insert is 7
   int min/max ops per 128-lane slice (vs ~16 where/compare ops for a
   separate (value, index) pair — the kernel is VPU-epilogue-bound, so
   this is the difference between ~0.74s and ~0.5s on the 10k x 1M x
   1536 headline workload), and candidate HBM writes halve;
3. flushes KEEP x 128 packed keys per (query row, mega-tile) to HBM; the
   host-side decode recovers (quantized distance, exact global row id).

The KEEP-th minimum doubles as an **exactness certificate**: a lane bin
holds sub*8 base rows; if m_KEEP >= tau + eps (tau = exact k-th distance
after re-ranking, eps = screening error bound INCLUDING the key
quantization from the POS_BITS replaced mantissa bits — 2^-13 worst-case
floor, budgeted as PACK_EPS_REL = 2^-11) then at most KEEP-1 bin
members can be < tau and all are in the candidate set, so no true
neighbor was lost. Queries whose certificate fails fall back to the
exact engine (ops/knn.py).

Candidate indices are exact global row ids (mega offset + packed bin
position + lane), matching the reference's batch_offset bookkeeping
(cu_knn.py:273).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TQ = 256            # query rows per block (default; 512 for big batches —
                    # halves the per-query-block re-reads of the base from
                    # HBM and the scalar-core grid overhead)
TB = 1024           # base rows per sub-tile (8 slices of 128 lanes)
SUB_PER_MEGA = 28   # sub-tiles per mega-tile -> 28672 base rows (default;
                    # 56 for big bases — halves the candidate width the
                    # select stage's exact top_k must chew through)
MEGA = TB * SUB_PER_MEGA
KEEP = 4            # mins kept per lane bin (the last is the certificate;
                    # with 224-row bins, P(5 of the top-100 sharing a bin
                    # over a 1M base) ~ 1e-6, so the exact-fallback path
                    # almost never fires; 448-row bins at sub=56 raise the
                    # fallback rate to ~0.1%, 896-row bins at sub=112 to
                    # ~0.4% at k=100 — still cheap to repair (pick_sub
                    # gates the wide tier on k for exactly this reason)
CAND_PER_MEGA = KEEP * LANES

# base row count from which the wide (sub=56/112) mega-tiles pay off
_BIG_BASE = 16 * TB * 56


def pick_sub(n_rows: int, k: int | None = None,
             q_rows: int | None = None) -> int:
    """Sub-tiles per mega-tile for a base of `n_rows` (callers that know
    k and the query-batch size should pass them so the widest tier can
    be used safely).

    Wider megas halve the candidate width the select stage's exact top_k
    must merge (the select is ~40% of the screened engine's wall-clock on
    the 10k x 1M x 1536 headline). The limit is bin size: a mega's lane
    bin holds sub*8 rows and keeps KEEP=4 minima, so ~k/(n_mega*128)
    true neighbors land per bin and the P(>=4 collide) ~ lambda^4
    certificate-repair rate grows steeply with k — the 896-row sub=112
    tier is measured ~0.4% repairs at k=100 / >=8 megas, but would blow
    past repair budgets at k ~ several hundred. The rate also scales the
    EXPECTED FAILURE COUNT with the query batch: screened_knn_traced
    repairs a statistically-sized budget of rows in-trace (128-row
    quanta, Chernoff tail <= 1e-9 over the tier's measured rate — see
    ops.knn._repair_budget) before a lax.cond recomputes the whole tile
    verified, and the q_rows gate below drops very large batches to
    sub=56 (~0.1% rate) as a second line of defense (r3 review
    findings). q_rows=None means the caller's repair path has no such
    cliff (the host path re-solves any number of failed rows); k
    unknown -> the safe 56."""
    if n_rows < _BIG_BASE:
        return SUB_PER_MEGA
    wide_ok = (k is not None and k <= 150
               and (q_rows is None or q_rows <= 24576))
    return 112 if wide_ok else 56

# low mantissa bits of the fp32 distance replaced by the bin position
# (sub*8 positions; 10 bits covers the sub=112 wide tier). Quantization:
# the packed key floors the distance by <= 2^-13 relative.
POS_BITS = 10
POS_MASK = (1 << POS_BITS) - 1
# relative screening-error contribution of the key quantization (folded
# into the certificate eps by ops/knn.py; 4x the worst-case floor error,
# same safety convention as the 9-bit round-2 packing)
PACK_EPS_REL = 2.0 ** -11


def norm_guard(dim: int) -> float:
    """WORST-CASE multiplicative guard for an fp32-computed Euclidean norm
    (or squared norm) over `dim` terms. The positive-term sum-of-squares
    error chain is <= (dim+1)*2^-24 relative regardless of add order (the
    ops.knn._acc_rel argument); sqrt halves it and rounds once more. The
    soundness requirement is on the RECIPROCAL side — a computed sum can
    be true*(1 - gamma) with gamma = dim*u/(1 - dim*u), so the guard must
    be >= 1/(1 - gamma) ~= 1 + dim*u + (dim*u)^2 — and the guard multiply
    itself rounds once. The 1.05 factor (same convention as _acc_rel)
    covers those second-order terms up to dim ~ 700k; (dim+8)*u covers
    the first order with slack (sqrt/rsqrt rounding included).

    Every certificate-critical max-statistic (blo_max / ratio_max /
    qres_abs in ops.knn, dlo_max / qres_scale / d_max in ops.maxsim) is an
    fp32-computed norm that enters the SOUND eps bound multiplicatively;
    an unbudgeted computation underestimate there silently shrinks eps.
    Replaces the flat 1.0001 guard of round 3, which the accumulation
    bound outgrows at dim >= ~3500; callers guarding a SUM of n norms
    pass dim + 2n so the sum's own accumulation is budgeted too (both
    r3 review findings)."""
    return 1.0 + (dim + 8) * 2.0 ** -24 * 1.05


def bf16_round(x):
    """Round-to-nearest-even bf16 image of f32 `x`, RETURNED IN f32 and
    computed with integer ops.

    `x.astype(bfloat16).astype(float32)` is NOT safe for residual math
    at the XLA level: XLA's excess-precision simplification (on by
    default) folds the down/up convert pair away, so `x - bf16(x)`
    silently evaluates to ZERO under jit on TPU — measured on v5e, where
    every XLA-level bf16 residual (the certificate stats blo_max /
    ratio_max / dlo_max, the per-query qres bounds, and the
    pre-converted lo operands of the 3-pass screens) came back 0 while
    the same expressions were correct eagerly, on CPU, and inside
    Mosaic kernels. Integer rounding produces the bit-identical RNE
    result (tests/test_screened_engine.py proves it against the real
    conversion) and cannot be folded; downstream
    `bf16_round(x).astype(bfloat16)` / `.astype(float32)` converts are
    exact (the value is already representable), so XLA folding them is
    harmless.

    Non-finite edge: +/-inf map to themselves through the integer path
    (the +0x7FFF carry cannot cross exp=0xFF with a zero mantissa); NaNs
    are passed through UNCHANGED by an explicit guard — the raw integer
    rounding would carry a high-payload NaN's mantissa into the exponent
    and wrap it to a FINITE value (measured: 0x7FFFFFFF -> -0.0,
    0xFFFFFFFF -> +0.0, an all-ones garbage pattern), which would let a
    garbage base row enter the screen as a finite bhi operand instead of
    poisoning it. With the guard, lo = x - bf16_round(x) is NaN for any
    non-finite x and the kernels' isnan(d) sanitize excludes the row
    (the sound direction)."""
    xf = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    lsb = jax.lax.shift_right_logical(bits, jnp.uint32(16)) & jnp.uint32(1)
    rounded = (bits + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    return jnp.where(jnp.isnan(xf), xf,
                     jax.lax.bitcast_convert_type(rounded, jnp.float32))

# default for the software-pipelined kernel variant (_kernel_pipelined):
# epilogue of sub-tile i overlapped with the MXU steps of sub-tile i+1.
# Measured on v5e (10k x 1M x 1536 headline, bit-identical outputs):
# 1-pass 0.508 -> 0.467s, 2-pass 0.562 -> 0.528s. The overlap is partial
# (~30% of the ~0.35s epilogue hides behind the matmuls); the plain
# kernel stays available via screen_candidates(pipelined=False).
PIPELINED_DEFAULT = True

# default for the FUSED-DEPTH kernel variant (_kernel_fused, r5): one
# grid step per sub-tile — no depth-chunk grid dimension, no fp32
# accumulator scratch (the full-D contraction runs as one dot into the
# retire buffer), bf16 query operands (the 1/2-pass tiers never read
# fp32 q in-kernel), tb=512/sub-doubled tiles (IDENTICAL mega/bin
# geometry to tb=1024: bin = sub*(tb/128) rows, so every certificate
# property is unchanged), a 2q-prescaled l2 epilogue (bf16(2q) =
# 2*bf16(q) exactly, killing the 2.0* multiply; max(,0)+abs collapsed
# to abs — identical for true d >= 0, and a rounding-negative packs as
# |d| <= the accumulation eps the certificate already budgets), and a
# selection-network insert (sorted pairs -> odd-even merge -> bitonic
# lowest-4; 22 min/max tile-ops per 4-slice sub-tile vs the sequential
# insert's 28). Measured on v5e (10k x 1M x 1536 1-pass, same-day
# baseline shipped=0.292s): fused 0.2196 -> +2q 0.2167 -> +network
# 0.2111s, vs a 0.1820s epilogue-free ablation floor and a 0.156s MXU
# floor (scripts/fused_probe.py, r5 probes). Gated to passes <= 2 and
# dims where the full-D operands fit VMEM (_fused_ok); the 3-pass tier
# and big dims keep the pipelined dk kernel.
FUSED_DEFAULT = True
FUSED_TB = 512

SCREEN_PRECISIONS = ("default", "medium", "high")
# MXU passes per precision: "default" = one bf16 pass (input rounding
# 2^-7 relative), "medium" = q.bhi via hi+lo q (the base rounding 2^-8
# dominates; + the 2^-16 qlo double rounding — measured 2x the
# certificate margin of "default" at 2/3 the 3-pass matmul cost),
# "high" = bf16x3 (~2^-32, fp32-accurate)
PASSES = {"default": 1, "medium": 2, "high": 3}


def _kernel(qn_ref, bn_ref, q_ref, b_ref, *rest,
            n_dk: int, epilogue: str,
            passes: int, tq: int, sub: int, tb: int = TB):
    # operand layout: b_ref is the PRE-CONVERTED bf16 base (bhi); for the
    # 3-pass tier a second bf16 operand carries the residual blo. Hoisting
    # the base conversion out of the kernel halves the dominant HBM term
    # (the base is re-read per query block) for the 1/2-pass tiers: the
    # kernel only ever consumes bf16(base), so shipping fp32 rows just to
    # round them in VMEM wasted half the bytes. The q-side hi/lo split
    # stays in-kernel (q is tiny and read once per block row).
    if passes >= 3:
        blo_ref, out_ref, acc_ref, mk_ref = rest
    else:
        out_ref, acc_ref, mk_ref = rest
    qi = pl.program_id(0)
    bi = pl.program_id(1)
    dk = pl.program_id(2)
    del qi

    # ---- MXU: accumulate q . b^T over D chunks (bf16 or bf16x3) ----
    q = q_ref[:]
    qhi = q.astype(jnp.bfloat16)
    bhi = b_ref[:]
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    part = dot(qhi, bhi)
    if passes >= 2:
        # 2-pass ~= full-precision q x bf16 base: qhi.bhi + bf16(qlo).bhi,
        # leaving the base rounding error |q.blo| <= 2^-8|q||b| plus the
        # qlo double rounding <= 2^-16|q||b| (budgeted in the cert eps)
        qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        part = part + dot(qlo, bhi)
    if passes >= 3:
        part = part + dot(qhi, blo_ref[:])

    @pl.when(dk == 0)
    def _():
        acc_ref[:] = part

    @pl.when(dk > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    # ---- at mega-tile start: reset the running keys ----
    @pl.when(jnp.logical_and(bi % sub == 0, dk == 0))
    def _():
        # INT32_MAX > any packed key (max real key is the +inf bit
        # pattern 0x7F800000 | pos); every bin takes sub*8 >= KEEP
        # insertions per mega, so the sentinel never reaches the output
        mk_ref[:] = jnp.full(mk_ref.shape, jnp.int32(0x7FFFFFFF))

    # ---- on the last D chunk: distances + packed-key update (VPU) ----
    @pl.when(dk == n_dk - 1)
    def _():
        acc = acc_ref[:]
        bn = bn_ref[:]
        # NaN distances (inf/NaN garbage in a base row) must LOSE every
        # bin: a NaN with its sign bit set bitcasts to a huge negative
        # key that would win unconditionally (r3 review). l2 distances
        # are non-negative, so one abs (a single AND) clears the NaN sign
        # and its key sorts past +inf — the isnan+select variant measured
        # ~10% slower end-to-end here; the signed epilogues need the
        # select (legit negative distances) but are off the headline.
        if epilogue == "l2":          # squared-L2 (sqeuclidean/euclidean)
            d = jnp.abs(jnp.maximum(qn_ref[:] + bn[:] - 2.0 * acc, 0.0))
        elif epilogue == "dot":       # -q.b ordering (metric "dot");
            # bn carries +inf on padding rows, masking them here too
            d = jnp.where(jnp.isinf(bn), jnp.inf, -acc)
            d = jnp.where(jnp.isnan(d), jnp.inf, d)
        else:                         # "rdot": -q.b/|b| == cosine ordering
            d = jnp.where(jnp.isinf(bn), jnp.inf,
                          -acc * jax.lax.rsqrt(jnp.maximum(bn, 1e-30)))
            d = jnp.where(jnp.isnan(d), jnp.inf, d)

        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
        if epilogue != "l2":
            # negative distances possible: flip the magnitude bits of
            # negatives so int32 order matches float order
            neg = jax.lax.shift_right_arithmetic(bits, 31)
            bits = bits ^ (neg & jnp.int32(0x7FFFFFFF))

        ks = [mk_ref[t] for t in range(KEEP)]
        pos0 = (bi % sub) * (tb // LANES)
        for j in range(tb // LANES):
            # pack: quantized distance bits | position-in-bin (scalar
            # per slice: every lane's bin receives exactly one row here)
            kj = (bits[:, j * LANES:(j + 1) * LANES]
                  & jnp.int32(~POS_MASK)) | (pos0 + j)
            # sorted insert via a pure min/max network (7 VPU ops)
            hi = kj
            for t in range(KEEP):
                lo = jnp.minimum(ks[t], hi)
                if t < KEEP - 1:
                    hi = jnp.maximum(ks[t], hi)
                ks[t] = lo
        for t in range(KEEP):
            mk_ref[t] = ks[t]

        # ---- at mega-tile end: flush the keys as this block's candidates --
        @pl.when(bi % sub == sub - 1)
        def _():
            for t in range(KEEP):
                out_ref[:, t * LANES:(t + 1) * LANES] = ks[t]


def _kernel_pipelined(qn_ref, bn_ref, q_ref, b_ref, *rest,
                      n_dk: int, epilogue: str,
                      passes: int, tq: int, sub: int, tb: int = TB):
    """Software-pipelined variant of `_kernel`: the VPU epilogue for
    sub-tile bi-1 runs DURING sub-tile bi's MXU steps.

    The plain kernel serializes ~9us of VPU selection work after every
    sub-tile's matmuls; at 1 MXU pass the epilogue is ~70% of the kernel's
    wall-clock (measured 0.51s screen vs a 0.16s MXU floor on the 10k x 1M
    x 1536 headline). Here the finished accumulator is copied into a
    dedicated RETIRE buffer on each sub-tile's last depth step, and the
    epilogue's lane slices are spread across the NEXT sub-tile's n_dk grid
    steps reading ONLY that retire buffer — so within every step the MXU
    stream (reads q/b, accumulates acc_ref) and the VPU stream (reads
    ret_ref/bn, updates mk_ref) touch disjoint refs with no dynamic
    indexing. (A parity-double-buffered accumulator variant measured the
    SAME 0.467s — the partial overlap is a Mosaic scheduling limit, not
    ref aliasing; this form is kept for the statically-disjoint refs and
    equal VMEM.) The grid gains one
    trailing bi step to retire the last sub-tile (its own dot output is
    never consumed). Body order matters: the epilogue's reads of ret_ref
    precede this step's retire copy, so the dk == n_dk-1 step both
    finishes the old tile's selection and publishes the new tile."""
    if passes >= 3:
        blo_ref, out_ref, acc_ref, ret_ref, mk_ref = rest
    else:
        out_ref, acc_ref, ret_ref, mk_ref = rest
    bi = pl.program_id(1)
    dk = pl.program_id(2)

    # ---- epilogue for the RETIRING sub-tile r = bi - 1 (from ret_ref) ----
    r = bi - 1
    live = r >= 0

    @pl.when(jnp.logical_and(live, jnp.logical_and(r % sub == 0, dk == 0)))
    def _():
        mk_ref[:] = jnp.full(mk_ref.shape, jnp.int32(0x7FFFFFFF))

    n_slices = tb // LANES
    spp = -(-n_slices // n_dk)          # lane slices retired per dk step
    pos0 = (r % sub) * n_slices
    for c in range(n_dk):
        sl = range(c * spp, min(n_slices, (c + 1) * spp))
        if not len(sl):
            continue

        @pl.when(jnp.logical_and(live, dk == c))
        def _(sl=sl):
            ks = [mk_ref[t] for t in range(KEEP)]
            for j in sl:
                cols = slice(j * LANES, (j + 1) * LANES)
                acc = ret_ref[:, cols]
                bn = bn_ref[:, cols]
                # NaN-sign sanitization — see _kernel (r3 review): abs
                # for the non-negative l2, select for the signed metrics
                if epilogue == "l2":
                    d = jnp.abs(jnp.maximum(qn_ref[:] + bn - 2.0 * acc,
                                            0.0))
                elif epilogue == "dot":
                    d = jnp.where(jnp.isinf(bn), jnp.inf, -acc)
                    d = jnp.where(jnp.isnan(d), jnp.inf, d)
                else:                   # "rdot"
                    d = jnp.where(jnp.isinf(bn), jnp.inf,
                                  -acc * jax.lax.rsqrt(jnp.maximum(bn, 1e-30)))
                    d = jnp.where(jnp.isnan(d), jnp.inf, d)
                bits = jax.lax.bitcast_convert_type(d, jnp.int32)
                if epilogue != "l2":
                    neg = jax.lax.shift_right_arithmetic(bits, 31)
                    bits = bits ^ (neg & jnp.int32(0x7FFFFFFF))
                kj = (bits & jnp.int32(~POS_MASK)) | (pos0 + j)
                hi = kj
                for t in range(KEEP):
                    lo = jnp.minimum(ks[t], hi)
                    if t < KEEP - 1:
                        hi = jnp.maximum(ks[t], hi)
                    ks[t] = lo
            for t in range(KEEP):
                mk_ref[t] = ks[t]

    # ---- flush once the retiring sub-tile closes its mega-tile ----
    @pl.when(jnp.logical_and(
        live, jnp.logical_and(r % sub == sub - 1, dk == n_dk - 1)))
    def _():
        for t in range(KEEP):
            out_ref[:, t * LANES:(t + 1) * LANES] = mk_ref[t]

    # ---- MXU: accumulate sub-tile bi into acc_ref ----
    # (bf16 base operands: see _kernel's operand-layout comment)
    q = q_ref[:]
    qhi = q.astype(jnp.bfloat16)
    bhi = b_ref[:]
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    part = dot(qhi, bhi)
    if passes >= 2:
        qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        part = part + dot(qlo, bhi)
    if passes >= 3:
        part = part + dot(qhi, blo_ref[:])

    @pl.when(dk == 0)
    def _():
        acc_ref[:] = part

    @pl.when(dk > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    # ---- publish the finished accumulator for the next bi step ----
    @pl.when(dk == n_dk - 1)
    def _():
        ret_ref[:] = acc_ref[:]


def _cmp(a, b):
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _sort4_bitonic(v):
    """Sort a 4-element BITONIC tile sequence ascending (4 comparators)."""
    a0, a1, a2, a3 = v
    a0, a2 = _cmp(a0, a2)
    a1, a3 = _cmp(a1, a3)
    a0, a1 = _cmp(a0, a1)
    a2, a3 = _cmp(a2, a3)
    return [a0, a1, a2, a3]


def _lowest4_merge(a, b):
    """Lowest 4 of two sorted-ascending 4-lists, sorted (8 comparators):
    the bitonic mins m_i = min(a_i, b_3-i) are exactly the union's 4
    smallest, as a bitonic sequence; one bitonic sort-4 orders them.
    Same selected multiset and order as KEEP sequential inserts (int
    min/max on the packed keys is a total order)."""
    m = [jnp.minimum(a[i], b[3 - i]) for i in range(4)]
    return _sort4_bitonic(m)


def _insert_net(ks, kjs):
    """Merge 4 or 8 new key tiles into the running sorted-KEEP via a
    selection network: 22 min/max tile-ops for 4 new keys (vs 4x7
    sequential), 44 for 8 (vs 56). Output identical to the sequential
    insert (r5 fused_probe: match-verified, 0.2167 -> 0.2111s on the
    headline)."""
    p = []
    for i in range(0, len(kjs), 2):
        lo, hi = _cmp(kjs[i], kjs[i + 1])
        p.append((lo, hi))
    s4 = []
    for i in range(0, len(p), 2):
        (a0, a1), (b0, b1) = p[i], p[i + 1]
        c0, d0 = _cmp(a0, b0)
        c3hi = jnp.maximum(a1, b1)
        c1, c2 = _cmp(jnp.minimum(a1, b1), d0)
        s4.append([c0, c1, c2, c3hi])
    new4 = s4[0] if len(s4) == 1 else _lowest4_merge(s4[0], s4[1])
    return _lowest4_merge(list(ks), new4)


def _kernel_fused(qn_ref, bn_ref, *rest, epilogue: str, passes: int,
                  tq: int, sub: int, tb: int):
    """Fused-depth screen kernel (r5): ONE grid step per base sub-tile.

    The full-D contraction runs as a single dot into the retire buffer
    (no dk grid dimension, no separate fp32 accumulator), and sub-tile
    bi-1's epilogue retires during sub-tile bi's MXU pass — the same
    software pipeline as _kernel_pipelined with 3x fewer grid steps,
    which removes most of the measured ~0.8us/step scalar-core overhead
    (r5 decomposition: epilogue-free ablation 0.204s at 3 dk-steps vs
    0.182s fused). Query operands arrive PRE-CONVERTED bf16 (qhi, and
    qlo at 2 passes); for the l2 epilogue they are PRE-SCALED by 2
    (exact: bf16(2x) = 2*bf16(x)), so the epilogue computes
    |qn + bn - acc| with no multiply and no max-clamp — identical
    distances for true d >= 0, and a rounding-negative packs as |d|
    within the fp32-accumulation eps the certificate already budgets."""
    if passes >= 2:
        qhi_ref, qlo_ref, b_ref, out_ref, ret_ref, mk_ref = rest
    else:
        qhi_ref, b_ref, out_ref, ret_ref, mk_ref = rest
    bi = pl.program_id(1)
    r = bi - 1
    live = r >= 0

    @pl.when(jnp.logical_and(live, r % sub == 0))
    def _():
        mk_ref[:] = jnp.full(mk_ref.shape, jnp.int32(0x7FFFFFFF))

    n_slices = tb // LANES
    pos0 = (r % sub) * n_slices

    @pl.when(live)
    def _():
        ks = [mk_ref[t] for t in range(KEEP)]
        kjs = []
        for j in range(n_slices):
            cols = slice(j * LANES, (j + 1) * LANES)
            acc = ret_ref[:, cols]
            bn = bn_ref[:, cols]
            if epilogue == "l2":
                # 2q-prescaled operands: acc == 2 q.b exactly
                d = jnp.abs(qn_ref[:] + bn - acc)
                bits = jax.lax.bitcast_convert_type(d, jnp.int32)
            else:
                if epilogue == "dot":
                    d = jnp.where(jnp.isinf(bn), jnp.inf, -acc)
                else:       # "rdot"
                    d = jnp.where(jnp.isinf(bn), jnp.inf,
                                  -acc * jax.lax.rsqrt(
                                      jnp.maximum(bn, 1e-30)))
                d = jnp.where(jnp.isnan(d), jnp.inf, d)
                bits = jax.lax.bitcast_convert_type(d, jnp.int32)
                neg = jax.lax.shift_right_arithmetic(bits, 31)
                bits = bits ^ (neg & jnp.int32(0x7FFFFFFF))
            kjs.append((bits & jnp.int32(~POS_MASK)) | (pos0 + j))
        ks = _insert_net(ks, kjs)
        for t in range(KEEP):
            mk_ref[t] = ks[t]

    @pl.when(jnp.logical_and(live, r % sub == sub - 1))
    def _():
        for t in range(KEEP):
            out_ref[:, t * LANES:(t + 1) * LANES] = mk_ref[t]

    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    part = dot(qhi_ref[:], b_ref[:])
    if passes >= 2:
        part = part + dot(qlo_ref[:], b_ref[:])
    ret_ref[:] = part


@partial(jax.jit, static_argnames=("epilogue", "passes", "tq", "sub",
                                   "tb", "interpret"))
def _screen_call_fused(qhi, qlo, bhi, qn, bn, epilogue: str, passes: int,
                       tq: int, sub: int, tb: int, interpret: bool):
    """pallas_call wrapper for the fused-depth kernel: grid (n_q, n_b+1)
    with full-D operand blocks; bn/out follow the retiring sub-tile."""
    Qp, Dp = qhi.shape
    Bp = bn.shape[1]
    n_q = Qp // tq
    n_b = Bp // tb
    n_mega = Bp // (tb * sub)
    b_last = (bhi.shape[0] - 1) // tb
    kernel = partial(_kernel_fused, epilogue=epilogue, passes=passes,
                     tq=tq, sub=sub, tb=tb)
    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    q_spec = pl.BlockSpec((tq, Dp), lambda qi, bi: (qi, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tq, 1), lambda qi, bi: (qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb), lambda qi, bi: (0, jnp.maximum(bi - 1, 0)),
                     memory_space=pltpu.VMEM),
        q_spec,
    ]
    operands = [qn, bn, qhi]
    if passes >= 2:
        in_specs.append(q_spec)
        operands.append(qlo)
    in_specs.append(pl.BlockSpec(
        (tb, Dp), lambda qi, bi: (jnp.minimum(bi, b_last), 0),
        memory_space=pltpu.VMEM))
    operands.append(bhi)
    keys = pl.pallas_call(
        kernel,
        grid=(n_q, n_b + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tq, CAND_PER_MEGA),
            lambda qi, bi: (qi, jnp.maximum(bi - 1, 0) // sub),
            memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tq, tb), jnp.float32),          # retire buffer
            pltpu.VMEM((KEEP, tq, LANES), jnp.int32),    # running keys
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Bp * Dp * passes,
            bytes_accessed=int(Qp * Dp * 2 * passes + Bp * Dp * 2 * n_q),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return _decode_keys(keys, epilogue, tb, sub)


def _fused_ok(passes: int, tq: int, tb: int, d_padded: int) -> bool:
    """VMEM-feasibility gate for the fused-depth kernel: full-D operand
    blocks must fit the ~16MB scoped budget with Pallas double-buffering
    (measured: tq=512/tb=1024 at D=1536 1-pass overflows by 1.4MB;
    tq=512/tb=512 fits). 3-pass needs a second full-D base stream —
    keep it on the pipelined dk kernel."""
    if passes > 2:
        return False
    q_ops = 1 if passes == 1 else 2
    est = (2 * tq * d_padded * 2 * q_ops          # q operand blocks x2buf
           + 2 * tb * d_padded * 2                # base block x2buf
           + tq * tb * 4                          # retire buffer
           + 2 * tq * CAND_PER_MEGA * 4           # out block x2buf
           + KEEP * tq * LANES * 4)               # running keys
    return est <= 14 * (1 << 20)                  # ~2MB headroom


def _pick_dk(d: int, dk_max: int = 384) -> int:
    # 384 (then 256) keeps the double-buffered base block + accumulator +
    # trio inside the 16MB VMEM budget at the default tq/tb (dk=512
    # overflowed by ~3.4MB on v5e); larger dk = fewer grid steps and
    # accumulator round-trips. Bigger tq/tb tiles need a smaller dk cap.
    # The >512 entries are probe-reachable only (r5 epilogue probes:
    # dk=768/1536 at the 1-pass tier measured SLOWER than 512 — see
    # docs/DESIGN.md r5 — so no default requests them).
    for dk in (1536, 1024, 768, 512, 384, 256, 128):
        if dk <= dk_max and d % dk == 0:
            return dk
    raise AssertionError(f"dim {d} not a multiple of 128 after padding")


EPILOGUES = ("l2", "dot", "rdot")


@partial(jax.jit, static_argnames=("epilogue", "passes", "tq", "sub",
                                   "tb", "dk_max", "interpret", "pipelined"))
def _screen_call(q, bhi, blo, qn, bn, epilogue: str, passes: int, tq: int,
                 sub: int, tb: int, dk_max: int, interpret: bool,
                 pipelined: bool = False):
    """`bhi`/`blo` are the base's bf16 hi/lo operands (blo is None below
    the 3-pass tier). q stays fp32; its hi/lo split happens in-kernel."""
    Qp, D = q.shape
    Bp = bn.shape[1]          # virtual (mega-aligned) base rows
    mega = tb * sub
    n_q = Qp // tq
    n_b = Bp // tb
    n_mega = Bp // mega
    dk_size = _pick_dk(D, dk_max)
    n_dk = D // dk_size
    # the grid may extend past the real base rows (ragged tail): a PARTIAL
    # final block is legal, but blocks wholly out of bounds fail at run
    # time (measured FAILED_PRECONDITION), so clamp the base block index —
    # clamped steps re-read the last real block and their +inf bn entries
    # mask every value out of the bins
    b_last = (bhi.shape[0] - 1) // tb

    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    # HBM bytes: the bf16 base operands dominate (re-read per query block)
    b_bytes = 2 * (2 if passes >= 3 else 1)
    flops = 2 * Qp * Bp * D * passes
    if pipelined:
        # one trailing bi step retires the final sub-tile's epilogue; its
        # own dot runs on the clamped last block and is never consumed.
        # bn/out follow the RETIRING sub-tile bi-1 (clamped at bi=0, when
        # no epilogue work fires).
        grid = (n_q, n_b + 1, n_dk)
        kernel = partial(_kernel_pipelined, n_dk=n_dk, epilogue=epilogue,
                         passes=passes, tq=tq, sub=sub, tb=tb)
        bn_spec = pl.BlockSpec(
            (1, tb), lambda qi, bi, dk: (0, jnp.maximum(bi - 1, 0)),
            memory_space=pltpu.VMEM)
        base_spec = pl.BlockSpec(
            (tb, dk_size),
            lambda qi, bi, dk: (jnp.minimum(bi, b_last), dk),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec(
            (tq, CAND_PER_MEGA),
            lambda qi, bi, dk: (qi, jnp.maximum(bi - 1, 0) // sub),
            memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((tq, tb), jnp.float32),          # dot accumulator
            pltpu.VMEM((tq, tb), jnp.float32),          # retire buffer
            pltpu.VMEM((KEEP, tq, LANES), jnp.int32),    # running keys
        ]
    else:
        grid = (n_q, n_b, n_dk)
        kernel = partial(_kernel, n_dk=n_dk, epilogue=epilogue,
                         passes=passes, tq=tq, sub=sub, tb=tb)
        bn_spec = pl.BlockSpec((1, tb), lambda qi, bi, dk: (0, bi),
                               memory_space=pltpu.VMEM)
        base_spec = pl.BlockSpec(
            (tb, dk_size),
            lambda qi, bi, dk: (jnp.minimum(bi, b_last), dk),
            memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((tq, CAND_PER_MEGA),
                                lambda qi, bi, dk: (qi, bi // sub),
                                memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((tq, tb), jnp.float32),          # dot accumulator
            pltpu.VMEM((KEEP, tq, LANES), jnp.int32),    # running keys
        ]
    in_specs = [
        pl.BlockSpec((tq, 1), lambda qi, bi, dk: (qi, 0),
                     memory_space=pltpu.VMEM),            # qn (col vec)
        bn_spec,                                          # bn (row vec)
        pl.BlockSpec((tq, dk_size), lambda qi, bi, dk: (qi, dk),
                     memory_space=pltpu.VMEM),            # q chunk
        base_spec,                                        # bhi chunk
    ]
    operands = [qn, bn, q, bhi]
    if passes >= 3:
        in_specs.append(base_spec)                        # blo chunk
        operands.append(blo)
    keys = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(Qp * D * 4 + Bp * D * b_bytes * n_q),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*operands)

    return _decode_keys(keys, epilogue, tb, sub)


def _decode_keys(keys, epilogue: str, tb: int, sub: int):
    """packed keys -> (quantized distance, exact global row id); shared
    by the dk-chunked and fused-depth call paths (identical packing)."""
    signed = epilogue != "l2"
    vbits = keys & jnp.int32(~POS_MASK)
    if signed:
        neg = jax.lax.shift_right_arithmetic(vbits, 31)
        vbits = vbits ^ (neg & jnp.int32(0x7FFFFFFF))
    cand_d = jax.lax.bitcast_convert_type(vbits, jnp.float32)
    pos = keys & POS_MASK
    col = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    mega_i = col // CAND_PER_MEGA
    lane = col % LANES
    cand_i = (mega_i * (tb * sub) + (pos // (tb // LANES)) * tb
              + (pos % (tb // LANES)) * LANES + lane)
    return cand_d, cand_i


def screen_candidates(q, base, *, n_rows: int | None = None,
                      epilogue: str = "l2",
                      screen_precision: str = "high",
                      tq: int | None = None, sub: int | None = None,
                      tb: int | None = None, dk_max: int | None = None,
                      interpret: bool | None = None,
                      n_valid=None, pipelined: bool | None = None,
                      bn_row=None, bhi=None, fused: bool | None = None):
    """Fused distance+screen: (Q, D) x (B, D) -> (Q, C) candidate
    (distance, global index) lists, C = KEEP*128 per (TB*sub)-row mega-tile.

    Screen-space distances by `epilogue`: "l2" squared-L2, "dot" -q.b,
    "rdot" -q.b/|b| (cosine ordering without prenormalizing the corpus).
    Padding base rows carry +inf norms and never win a bin.
    Returns (cand_d, cand_i, n_mega); the last KEEP-slab of each
    mega-tile's candidates is the certificate slab.

    `tq`/`sub` default adaptively: big query batches use 512-row query
    blocks (half the base HBM re-reads), big bases use 56-sub-tile megas
    (half the candidate width downstream).

    `n_valid` is an optional TRACED row count: rows at index >= n_valid get
    +inf norms and never win a bin. This is what lets the kernel run under
    shard_map, where the real row count of a statically-shaped padded shard
    is a traced scalar (n_rows, by contrast, must be static).

    `bn_row` is an optional TRACED (base_rows,) array of precomputed
    squared base norms (ops.knn.prepare_base) — skips the per-call norm
    pass over the corpus in the repeated-queries-same-base pattern.
    `bhi` likewise skips the per-call bf16 conversion of the corpus (a
    full corpus read+write): a (base_rows, D) bf16 array that MUST equal
    bf16(base) — the 3-pass tier's residual is computed against it."""
    assert screen_precision in SCREEN_PRECISIONS
    assert epilogue in EPILOGUES
    passes = PASSES[screen_precision]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    explicit_pipelined = pipelined is not None
    if pipelined is None:
        pipelined = PIPELINED_DEFAULT

    q = jnp.asarray(q, jnp.float32)
    base = jnp.asarray(base, jnp.float32)
    Q, D = q.shape
    B = base.shape[0] if n_rows is None else n_rows
    assert B <= base.shape[0]
    # fused-depth kernel (r5, FUSED_DEFAULT doc): one grid step per
    # sub-tile at tb=512 (same mega/bin geometry after the sub rescale
    # below). Callers pinning tb or dk_max are asking for the dk-chunked
    # kernels; the VMEM gate falls big dims / 3-pass back to them too.
    if fused is None:
        # an explicit pipelined= request asks for a specific dk-chunked
        # kernel variant (probe sweeps, the plain-kernel escape hatch);
        # honoring it must not silently route to the fused kernel
        # (r5 review finding)
        fused = FUSED_DEFAULT and not explicit_pipelined
    explicit_tb = tb is not None
    if fused and tb is None and dk_max is None:
        dp_est = -(-D // LANES) * LANES
        tq_f = tq if tq is not None else (512 if Q >= 1024 else TQ)
        if tq is None and not _fused_ok(passes, tq_f, FUSED_TB, dp_est):
            tq_f = TQ           # a smaller query block may still fit
        fused = _fused_ok(passes, tq_f, FUSED_TB, dp_est)
        if fused:
            tb = FUSED_TB
            tq = tq_f
    else:
        fused = False
    if tq is None:
        # 512-row query blocks halve the dominant HBM term (the base is
        # re-read once per query block). The old full-tile epilogue
        # overflowed VMEM at tq=512 (~19MB of temporaries > the 16MB
        # budget); the pipelined epilogue works one (tq, 128) lane slice
        # at a time and fits (measured on v5e: 0.377 -> 0.32s 1-pass
        # screen on the 10k x 1M x 1536 headline, before the bf16
        # operand change). Non-pipelined keeps 256.
        tq = 512 if (pipelined and Q >= 1024) else TQ
    if tb is None:
        tb = TB
    if sub is None:
        sub = pick_sub(B)       # callers that know k pass sub explicitly
        if tb != TB:            # keep the mega row count comparable
            sub = max(1, (sub * TB) // tb)
    elif not explicit_tb and tb != TB:
        # the caller's `sub` is in TB(=1024)-row units (pick_sub results
        # from ops.knn's plans/budgets) and the FUSED default picked a
        # smaller tb: rescale so the MEGA row count — and with it the
        # bin size sub*(tb/128), the candidate width, and every
        # certificate property — is IDENTICAL (fused tb=512: sub 112 ->
        # 224, bins stay 896 rows). A caller pinning BOTH tb and sub
        # (probe sweeps) means actual units and is left alone.
        sub = max(1, (sub * TB) // tb)
    # the packed key's POS_BITS field must address every row of a bin
    assert sub * (tb // LANES) <= (1 << POS_BITS), \
        f"sub={sub} x {tb // LANES} lane-slices exceeds {POS_BITS}-bit positions"
    if dk_max is None:
        # bigger tiles need a smaller D chunk to stay inside VMEM; the
        # bf16 base operands halved the base-block bytes, so the 1/2-pass
        # tiers fit dk=512 at tq=512 (measured r4: 0.280 vs 0.297s on the
        # headline — fewer grid steps and accumulator round-trips); the
        # 3-pass tier's second base operand stream keeps it at 384.
        # tb=2048 sub-tiles overflow VMEM at every dk (measured, r4).
        if tb > TB:
            dk_max = 256
        else:
            dk_max = 384 if passes >= 3 else 512
    elif tq >= TQ and tb >= TB and passes >= 3:
        # dk=512 at the default (or larger) tiles overflowed VMEM by
        # ~3.4MB on v5e with fp32 base operands; since the operands went
        # bf16 only the 3-pass tier (TWO base operand streams) still
        # needs the clamp — the 1/2-pass tiers fit dk=512 (measured r4)
        dk_max = min(dk_max, 384)
    mega = tb * sub

    if bhi is not None:
        assert bhi.shape == base.shape, (bhi.shape, base.shape)
        bhi = jnp.asarray(bhi, jnp.bfloat16)
    # pad D to a 128 multiple (zero columns leave distances unchanged)
    Dp = -(-D // LANES) * LANES
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, Dp - D)))
        base = jnp.pad(base, ((0, 0), (0, Dp - D)))
        if bhi is not None:
            bhi = jnp.pad(bhi, ((0, 0), (0, Dp - D)))
    Qp = -(-Q // tq) * tq
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    # the base is NOT row-padded (that would copy the multi-GB corpus);
    # instead the grid covers a virtual mega-aligned row count and the tail
    # blocks read ragged/clamped rows whose +inf padded norms mask them out
    # of every bin (the l2 epilogue's qn + inf - 2*acc can still be NaN
    # when acc is also inf; the kernels' NaN-sign sanitization forces any
    # NaN distance to LOSE every bin — r3 review)
    Bp = -(-B // mega) * mega

    qn = jnp.sum(q * q, axis=1, keepdims=True)              # (Qp, 1)
    bn = (jnp.asarray(bn_row, jnp.float32) if bn_row is not None
          else jnp.sum(base * base, axis=1))[:B]            # (B,)
    if n_valid is not None:
        bn = jnp.where(jnp.arange(B) < n_valid, bn, jnp.inf)
    bn = jnp.pad(bn, (0, Bp - B), constant_values=jnp.inf)[None, :]

    # pre-convert the base to its bf16 operands OUTSIDE the kernel: the
    # screen only ever consumes bf16(base) (plus the bf16 residual at the
    # 3-pass tier), and the kernel re-reads the base once per query
    # block, so shipping fp32 rows doubled the dominant HBM term. The
    # conversion itself is one cheap fused pass per call (hi = bf16(b);
    # lo = bf16(b - hi), exact by Sterbenz), bit-identical to the old
    # in-kernel rounding, and skipped entirely when the caller provides
    # a prepared `bhi` (ops.knn.PreparedBase). bf16_round (not astype):
    # with an astype hi traced in the same jit, XLA folds the convert
    # pair and the 3-pass blo operand below silently becomes ZERO on TPU
    # (see bf16_round).
    if bhi is None:
        bhi_f = bf16_round(base)             # f32 image, fold-proof
        bhi = bhi_f.astype(jnp.bfloat16)
    else:
        # a caller-provided bhi is an opaque (materialized) bf16 input:
        # widening it cannot be folded with anything, so astype is safe
        bhi_f = bhi.astype(jnp.float32)
    blo = ((base - bhi_f).astype(jnp.bfloat16)
           if passes >= 3 else None)
    if fused:
        # bf16 query operands, PRE-SCALED by 2 for the l2 epilogue:
        # bf16(2x) = 2*bf16(x) exactly (power-of-two scale), so the
        # screened distances and every certificate eps term are
        # identical to the dk-chunked kernels' (see _kernel_fused)
        qs = q * 2.0 if epilogue == "l2" else q
        qhi_f = bf16_round(qs)
        qhi_op = qhi_f.astype(jnp.bfloat16)
        qlo_op = ((qs - qhi_f).astype(jnp.bfloat16)
                  if passes >= 2 else None)
        cand_d, cand_i = _screen_call_fused(qhi_op, qlo_op, bhi, qn, bn,
                                            epilogue, passes, tq, sub, tb,
                                            interpret)
    else:
        cand_d, cand_i = _screen_call(q, bhi, blo, qn, bn, epilogue,
                                      passes, tq, sub, tb, dk_max,
                                      interpret, pipelined=pipelined)
    return cand_d[:Q], cand_i[:Q], Bp // mega
