"""Fused-depth screen-kernel probe (r5, VERDICT item 1 attack).

The r5 decomposition (scripts/epilogue_probe.py, measured same-day):
shipped 0.292s = noepi 0.204s (MXU+stream+grid infra; MXU floor 0.156)
+ insert network ~0.069s + distance/pack ~0.040s. Three attacks, probed
cumulatively (1-pass l2 headline, 10k x 1M x 1536):

  fused    - ONE grid step per sub-tile: no dk grid dim, no fp32
             accumulator scratch (the K=1536 contraction runs in one
             dot), bf16 q operand (the 1-pass tier never reads fp32 q).
             3x fewer grid steps attacks the ~0.8us/step scalar-core
             overhead measured by noepi.
  fused2q  - + l2 epilogue op cuts: q pre-scaled by 2 outside (bf16(2q)
             = 2*bf16(q), exact — kills the 2.0*acc multiply) and
             max(,0)+abs collapsed to abs (identical for d >= 0; tiny
             rounding-negatives land at |d| <= the accumulation eps the
             certificate already budgets).
  fusednet - + selection-network insert: per sub-tile, sort the 8 slice
             keys into two sorted-4s, take the bitonic lowest-4, and
             merge with the running sorted-4 (44 min/max tile-ops vs the
             sequential insert's 56).

One variant per process:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_probe.py <variant>
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.ops import screen_kernel as sk
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

Q, B, D, KK = 10_000, 1_000_000, 1536, 100
ITERS = 5
sync = jax.jit(jnp.sum)

KEEP, LANES = sk.KEEP, sk.LANES
POS_MASK = sk.POS_MASK
CAND_PER_MEGA = sk.CAND_PER_MEGA


def _cmp(a, b):
    return jnp.minimum(a, b), jnp.maximum(a, b)


def _insert_seq(ks, kj):
    hi = kj
    for t in range(KEEP):
        lo = jnp.minimum(ks[t], hi)
        if t < KEEP - 1:
            hi = jnp.maximum(ks[t], hi)
        ks[t] = lo
    return ks


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
    bitonic mins m_i = min(a_i, b_{3-i}) hold the 4 smallest as a
    bitonic sequence; one bitonic sort-4 orders them."""
    m = [jnp.minimum(a[i], b[3 - i]) for i in range(4)]
    return _sort4_bitonic(m)


def _insert_net(ks, kjs):
    """Merge 4 or 8 new key tiles into the running sorted-4 via a
    selection network (44 min/max tile-ops for 8 vs the sequential
    insert's 56; 22 vs 28 for 4)."""
    # sorted pairs
    p = []
    for i in range(0, len(kjs), 2):
        lo, hi = _cmp(kjs[i], kjs[i + 1])
        p.append((lo, hi))
    # sorted-4s (odd-even merge of two sorted-2s: 3 comparators)
    s4 = []
    for i in range(0, len(p), 2):
        (a0, a1), (b0, b1) = p[i], p[i + 1]
        c0, d0 = _cmp(a0, b0)
        c3hi = jnp.maximum(a1, b1)
        c1, c2 = _cmp(jnp.minimum(a1, b1), d0)
        s4.append([c0, c1, c2, c3hi])
    new4 = s4[0] if len(s4) == 1 else _lowest4_merge(s4[0], s4[1])
    return _lowest4_merge(list(ks), new4)


def _kernel_fused(qn_ref, bn_ref, q_ref, b_ref, out_ref, ret_ref, mk_ref,
                  *, sub: int, tb: int, mode: str):
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
        if mode == "fusednoepi":
            # trivial dependency on ret_ref, no selection work
            mk_ref[0] = jax.lax.bitcast_convert_type(
                ret_ref[:, :LANES], jnp.int32)
            return
        ks = [mk_ref[t] for t in range(KEEP)]
        kjs = []
        for j in range(n_slices):
            cols = slice(j * LANES, (j + 1) * LANES)
            acc = ret_ref[:, cols]
            bn = bn_ref[:, cols]
            if mode == "fused":
                d = jnp.abs(jnp.maximum(qn_ref[:] + bn - 2.0 * acc, 0.0))
            else:           # 2q-prescaled operand + abs-only clamp
                d = jnp.abs(qn_ref[:] + bn - acc)
            bits = jax.lax.bitcast_convert_type(d, jnp.int32)
            kj = (bits & jnp.int32(~POS_MASK)) | (pos0 + j)
            if mode == "fusednet":
                kjs.append(kj)
            else:
                ks = _insert_seq(ks, kj)
        if mode == "fusednet":
            ks = _insert_net(ks, kjs)
        for t in range(KEEP):
            mk_ref[t] = ks[t]

    @pl.when(jnp.logical_and(live, r % sub == sub - 1))
    def _():
        for t in range(KEEP):
            out_ref[:, t * LANES:(t + 1) * LANES] = mk_ref[t]

    dims = (((1,), (1,)), ((), ()))
    ret_ref[:] = jax.lax.dot_general(
        q_ref[:], b_ref[:], dimension_numbers=dims,
        preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("tq", "sub", "tb", "mode"))
def _fused_call(qhi, bhi, qn, bn, tq: int, sub: int, tb: int, mode: str):
    Qp, Dp = qhi.shape
    Bp = bn.shape[1]
    n_q = Qp // tq
    n_b = Bp // tb
    n_mega = Bp // (tb * sub)
    b_last = (bhi.shape[0] - 1) // tb
    grid = (n_q, n_b + 1)
    kernel = partial(_kernel_fused, sub=sub, tb=tb, mode=mode)
    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 1), lambda qi, bi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda qi, bi: (0, jnp.maximum(bi - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, Dp), lambda qi, bi: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, Dp), lambda qi, bi: (jnp.minimum(bi, b_last), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, CAND_PER_MEGA),
            lambda qi, bi: (qi, jnp.maximum(bi - 1, 0) // sub),
            memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tq, tb), jnp.float32),           # retire buffer
            pltpu.VMEM((KEEP, tq, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Bp * Dp,
            bytes_accessed=int(Qp * Dp * 2 + Bp * Dp * 2 * n_q),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qn, bn, qhi, bhi)


# name -> (epilogue mode, tq, tb, sub). tb=512/sub=224 keeps the EXACT
# bin geometry of tb=1024/sub=112 (bin = sub*(tb/LANES) = 896 rows, mega
# = 114688) while fitting the full-D operands in VMEM; tq=384 shrinks
# the query block instead (pads 10k -> 10368 rows).
VARIANTS = {
    "fused": ("fused", 512, 1024, 112),          # VMEM-overflows (kept
                                                 # as the measured record)
    "fused_tb512": ("fused", 512, 512, 224),
    "fused_tq384": ("fused", 384, 1024, 112),
    "fused2q_tb512": ("fused2q", 512, 512, 224),
    "fusednet_tb512": ("fusednet", 512, 512, 224),
    "fused2q_tq384": ("fused2q", 384, 1024, 112),
    "fusednoepi_tb512": ("fusednoepi", 512, 512, 224),
    # taller query blocks: fewer base re-reads (20 -> 16/14 blocks at
    # 10k queries) and fewer grid steps; VMEM-borderline
    "fusednet_tq640": ("fusednet", 640, 512, 224),
    "fusednet_tq768": ("fusednet", 768, 512, 224),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fused"
    mode, tq, tb, sub = VARIANTS[name]
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    log(f"data ready (variant {name}: mode={mode} tq={tq} tb={tb} sub={sub})")

    mega = tb * sub
    Bp = -(-B // mega) * mega
    Qp = -(-Q // tq) * tq
    scale = 1.0 if mode == "fused" else 2.0
    qp = jnp.pad(q, ((0, Qp - Q), (0, 0)))
    qhi = jax.jit(lambda x: sk.bf16_round(scale * x).astype(jnp.bfloat16))(qp)
    qn = jnp.sum(qp * qp, axis=1, keepdims=True)
    bn = jnp.pad(jnp.asarray(prep.bn_row)[:B], (0, Bp - B),
                 constant_values=jnp.inf)[None, :]
    jax.block_until_ready((qhi, bn))

    def run():
        return _fused_call(qhi, prep.bhi, qn, bn, tq, sub, tb, mode)

    out = run()
    probe = out
    _ = float(sync(probe))
    tunnel_gate(sync, probe, f"before {name}")
    t0 = time.perf_counter()
    for _i in range(ITERS - 1):
        run()
    out = run()
    _ = float(sync(out))
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{name} kernel: {dt:.4f}s")

    # sanity: decode + select must reproduce the shipped top-k exactly
    if mode == "fusednoepi":
        return
    keys = out
    vbits = keys & jnp.int32(~POS_MASK)
    cand_d = jax.lax.bitcast_convert_type(vbits, jnp.float32)
    pos = keys & POS_MASK
    col = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    mega_i = col // CAND_PER_MEGA
    lane = col % LANES
    n_slice = tb // LANES
    cand_i = (mega_i * mega + (pos // n_slice) * tb
              + (pos % n_slice) * LANES + lane)
    d_sel, i_sel = K._screened_select(
        q, prep.base, cand_d[:Q], cand_i[:Q], KK, 256, "sqeuclidean", 1,
        block=64, base_stats=prep.stats)[:2]
    ref_d, ref_i = K.knn(q[:64], prep.base, k=KK, metric="sqeuclidean",
                         engine="verified")
    match = np.mean(np.asarray(i_sel)[:64] == np.asarray(ref_i))
    log(f"{name}: top-k id match vs verified engine (64 rows): {match:.4f}")


if __name__ == "__main__":
    main()
