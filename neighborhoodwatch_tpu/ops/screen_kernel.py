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
2. maintains the KEEP smallest (value, index) pairs per VMEM lane in scratch
   across the sub-tiles of a 28672-row mega-tile — a 75x reduction of HBM
   writes vs materializing the distance matrix (the (TQ, 128) trio update
   is pure VPU work, ~18 ops per 128-lane slice);
3. flushes KEEP x 128 candidates per (query row, mega-tile) to HBM.

The KEEP-th minimum doubles as an **exactness certificate**: a lane bin
holds 224 base rows; if m_KEEP >= tau + eps (tau = exact k-th distance after
re-ranking, eps = screening error bound) then at most KEEP-1 bin members can
be < tau and all are in the candidate set, so no true neighbor was lost.
Queries whose certificate fails fall back to the exact engine (ops/knn.py).

Candidate indices are exact global row ids (tile offset + slice + lane),
matching the reference's batch_offset bookkeeping (cu_knn.py:273).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TQ = 256            # query rows per block
TB = 1024           # base rows per sub-tile (8 slices of 128 lanes)
SUB_PER_MEGA = 28   # sub-tiles per mega-tile -> 28672 base rows
MEGA = TB * SUB_PER_MEGA
KEEP = 4            # mins kept per lane bin (the last is the certificate;
                    # with 224-row bins, P(5 of the top-100 sharing a bin
                    # over a 1M base) ~ 1e-6, so the exact-fallback path
                    # almost never fires)
CAND_PER_MEGA = KEEP * LANES

SCREEN_PRECISIONS = ("default", "high")


def _kernel(qn_ref, bn_ref, q_ref, b_ref, out_d_ref, out_i_ref,
            acc_ref, md_ref, mi_ref, *, n_dk: int, epilogue: str,
            passes: int):
    qi = pl.program_id(0)
    bi = pl.program_id(1)
    dk = pl.program_id(2)
    del qi

    # ---- MXU: accumulate q . b^T over D chunks (bf16 or bf16x3) ----
    q = q_ref[:]
    b = b_ref[:]
    qhi = q.astype(jnp.bfloat16)
    bhi = b.astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    part = dot(qhi, bhi)
    if passes == 3:
        qlo = (q - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        blo = (b - bhi.astype(jnp.float32)).astype(jnp.bfloat16)
        part = part + dot(qlo, bhi) + dot(qhi, blo)

    @pl.when(dk == 0)
    def _():
        acc_ref[:] = part

    @pl.when(dk > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    # ---- at mega-tile start: reset the running trio ----
    @pl.when(jnp.logical_and(bi % SUB_PER_MEGA == 0, dk == 0))
    def _():
        md_ref[:] = jnp.full(md_ref.shape, jnp.inf, dtype=jnp.float32)
        mi_ref[:] = jnp.zeros(mi_ref.shape, dtype=jnp.int32)

    # ---- on the last D chunk: distances + trio update (VPU) ----
    @pl.when(dk == n_dk - 1)
    def _():
        acc = acc_ref[:]
        bn = bn_ref[:]
        if epilogue == "l2":          # squared-L2 (sqeuclidean/euclidean)
            d = jnp.maximum(qn_ref[:] + bn[:] - 2.0 * acc, 0.0)
        elif epilogue == "dot":       # -q.b ordering (metric "dot");
            # bn carries +inf on padding rows, masking them here too
            d = jnp.where(jnp.isinf(bn), jnp.inf, -acc)
        else:                         # "rdot": -q.b/|b| == cosine ordering
            d = jnp.where(jnp.isinf(bn), jnp.inf,
                          -acc * jax.lax.rsqrt(jnp.maximum(bn, 1e-30)))

        ms = [md_ref[t] for t in range(KEEP)]
        iv = [mi_ref[t] for t in range(KEEP)]
        col0 = bi * TB
        lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, LANES), 1)
        for j in range(TB // LANES):
            dj = d[:, j * LANES:(j + 1) * LANES]
            ij = lane + (col0 + j * LANES)
            beats = [dj < ms[t] for t in range(KEEP)]
            # sorted-insert dj into the per-lane KEEP smallest
            for t in range(KEEP - 1, 0, -1):
                ms[t] = jnp.where(beats[t - 1], ms[t - 1],
                                  jnp.where(beats[t], dj, ms[t]))
                iv[t] = jnp.where(beats[t - 1], iv[t - 1],
                                  jnp.where(beats[t], ij, iv[t]))
            ms[0] = jnp.where(beats[0], dj, ms[0])
            iv[0] = jnp.where(beats[0], ij, iv[0])
        for t in range(KEEP):
            md_ref[t] = ms[t]
            mi_ref[t] = iv[t]

        # ---- at mega-tile end: flush the mins as this block's candidates --
        @pl.when(bi % SUB_PER_MEGA == SUB_PER_MEGA - 1)
        def _():
            for t in range(KEEP):
                out_d_ref[:, t * LANES:(t + 1) * LANES] = ms[t]
                out_i_ref[:, t * LANES:(t + 1) * LANES] = iv[t]


def _pick_dk(d: int) -> int:
    # 256 keeps the double-buffered base block + accumulator + trio inside
    # the 16MB VMEM budget (512 overflowed by ~3.4MB on v5e)
    for dk in (256, 384, 128):
        if d % dk == 0:
            return dk
    raise AssertionError(f"dim {d} not a multiple of 128 after padding")


EPILOGUES = ("l2", "dot", "rdot")


@partial(jax.jit, static_argnames=("epilogue", "passes", "interpret"))
def _screen_call(q, base, qn, bn, epilogue: str, passes: int,
                 interpret: bool):
    Qp, D = q.shape
    Bp = bn.shape[1]          # virtual (mega-aligned) base rows
    n_q = Qp // TQ
    n_b = Bp // TB
    n_mega = Bp // MEGA
    dk_size = _pick_dk(D)
    n_dk = D // dk_size

    grid = (n_q, n_b, n_dk)
    kernel = partial(_kernel, n_dk=n_dk, epilogue=epilogue, passes=passes)

    out_shape = (
        jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.float32),
        jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32),
    )
    flops = 2 * Qp * Bp * D * passes
    cand_d, cand_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TQ, 1), lambda qi, bi, dk: (qi, 0),
                         memory_space=pltpu.VMEM),            # qn (col vec)
            pl.BlockSpec((1, TB), lambda qi, bi, dk: (0, bi),
                         memory_space=pltpu.VMEM),            # bn (row vec)
            pl.BlockSpec((TQ, dk_size), lambda qi, bi, dk: (qi, dk),
                         memory_space=pltpu.VMEM),            # q chunk
            pl.BlockSpec((TB, dk_size), lambda qi, bi, dk: (bi, dk),
                         memory_space=pltpu.VMEM),            # base chunk
        ],
        out_specs=(
            pl.BlockSpec((TQ, CAND_PER_MEGA),
                         lambda qi, bi, dk: (qi, bi // SUB_PER_MEGA),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, CAND_PER_MEGA),
                         lambda qi, bi, dk: (qi, bi // SUB_PER_MEGA),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TQ, TB), jnp.float32),          # dot accumulator
            pltpu.VMEM((KEEP, TQ, LANES), jnp.float32),  # running mins
            pltpu.VMEM((KEEP, TQ, LANES), jnp.int32),    # their indices
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(Qp * D * 4 + Bp * D * 4 * n_q),
            transcendentals=0),
        interpret=interpret,
    )(qn, bn, q, base)
    return cand_d, cand_i


def screen_candidates(q, base, *, n_rows: int | None = None,
                      epilogue: str = "l2",
                      screen_precision: str = "high",
                      interpret: bool | None = None):
    """Fused distance+screen: (Q, D) x (B, D) -> (Q, C) candidate
    (distance, global index) lists, C = KEEP*128 per 28672-row mega-tile.

    Screen-space distances by `epilogue`: "l2" squared-L2, "dot" -q.b,
    "rdot" -q.b/|b| (cosine ordering without prenormalizing the corpus).
    Padding base rows carry +inf norms and never win a bin.
    Returns (cand_d, cand_i, n_mega); the last KEEP-slab of each
    mega-tile's candidates is the certificate slab."""
    assert screen_precision in SCREEN_PRECISIONS
    assert epilogue in EPILOGUES
    passes = 3 if screen_precision == "high" else 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    q = jnp.asarray(q, jnp.float32)
    base = jnp.asarray(base, jnp.float32)
    Q, D = q.shape
    B = base.shape[0] if n_rows is None else n_rows
    assert B <= base.shape[0]

    # pad D to a 128 multiple (zero columns leave distances unchanged)
    Dp = -(-D // LANES) * LANES
    if Dp != D:
        q = jnp.pad(q, ((0, 0), (0, Dp - D)))
        base = jnp.pad(base, ((0, 0), (0, Dp - D)))
    Qp = -(-Q // TQ) * TQ
    if Qp != Q:
        q = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    # the base is NOT row-padded (that would copy the multi-GB corpus);
    # instead the grid covers a virtual mega-aligned row count and the tail
    # blocks read ragged/clamped rows whose +inf padded norms mask them out
    # of every bin (NaN/garbage distances never win a `<` comparison)
    Bp = -(-B // MEGA) * MEGA

    qn = jnp.sum(q * q, axis=1, keepdims=True)              # (Qp, 1)
    bn = jnp.sum(base * base, axis=1)[:B]                   # (B,)
    bn = jnp.pad(bn, (0, Bp - B), constant_values=jnp.inf)[None, :]

    cand_d, cand_i = _screen_call(q, base, qn, bn, epilogue, passes,
                                  interpret)
    return cand_d[:Q], cand_i[:Q], Bp // MEGA
