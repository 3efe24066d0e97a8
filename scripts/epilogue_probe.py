"""Screen-kernel epilogue decomposition probe (r5, VERDICT item 1).

The shipped pipelined 1-pass kernel runs 0.280s on the 10k x 1M x 1536
headline vs a 0.156s MXU floor / 0.085s HBM floor; the ~0.12s residual is
attributed to "epilogue scheduling". This probe decomposes it with
ablated kernel variants (NOT exact — measurement only):

  shipped   - the real kernel (baseline)
  noepi     - epilogue removed: MXU + operand streaming + grid/infra
              only. shipped - noepi = total exposed epilogue cost.
  noinsert  - epilogue keeps the distance + pack VPU work and the
              mk_ref/flush traffic but drops the 7-op sorted-insert
              network. shipped - noinsert = pure insert-network cost.
  nodist    - epilogue keeps the insert network + traffic but inserts
              raw accumulator bits (no distance/pack math).
              shipped - nodist = distance+pack cost.

Run each variant in its OWN process (multiple distinct Pallas compiles
per process exhaust device memory on this harness — CLAUDE.md):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/epilogue_probe.py <variant>
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


def _kernel_ablated(qn_ref, bn_ref, q_ref, b_ref, out_ref, acc_ref,
                    ret_ref, mk_ref, *, n_dk: int, tq: int, sub: int,
                    tb: int, mode: str):
    """_kernel_pipelined with the epilogue ablated per `mode` (1-pass l2
    only; mirrors screen_kernel._kernel_pipelined's structure)."""
    bi = pl.program_id(1)
    dk = pl.program_id(2)

    r = bi - 1
    live = r >= 0

    @pl.when(jnp.logical_and(live, jnp.logical_and(r % sub == 0, dk == 0)))
    def _():
        mk_ref[:] = jnp.full(mk_ref.shape, jnp.int32(0x7FFFFFFF))

    n_slices = tb // LANES
    spp = -(-n_slices // n_dk)
    pos0 = (r % sub) * n_slices
    if mode != "noepi":
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
                    if mode == "nodist":
                        # raw accumulator bits, no distance/pack math
                        kj = jax.lax.bitcast_convert_type(acc, jnp.int32)
                    else:
                        bn = bn_ref[:, cols]
                        d = jnp.abs(jnp.maximum(
                            qn_ref[:] + bn - 2.0 * acc, 0.0))
                        bits = jax.lax.bitcast_convert_type(d, jnp.int32)
                        kj = (bits & jnp.int32(~POS_MASK)) | (pos0 + j)
                    if mode == "noinsert":
                        ks[j % KEEP] = kj          # store, no network
                    else:
                        hi = kj
                        for t in range(KEEP):
                            lo = jnp.minimum(ks[t], hi)
                            if t < KEEP - 1:
                                hi = jnp.maximum(ks[t], hi)
                            ks[t] = lo
                for t in range(KEEP):
                    mk_ref[t] = ks[t]

    @pl.when(jnp.logical_and(
        live, jnp.logical_and(r % sub == sub - 1, dk == n_dk - 1)))
    def _():
        if mode == "noepi":
            # keep a data dependency on ret_ref without any VPU work
            for t in range(KEEP):
                out_ref[:, t * LANES:(t + 1) * LANES] = \
                    jax.lax.bitcast_convert_type(
                        ret_ref[:, t * LANES:(t + 1) * LANES], jnp.int32)
        else:
            for t in range(KEEP):
                out_ref[:, t * LANES:(t + 1) * LANES] = mk_ref[t]

    q = q_ref[:]
    qhi = q.astype(jnp.bfloat16)
    bhi = b_ref[:]
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    part = dot(qhi, bhi)

    @pl.when(dk == 0)
    def _():
        acc_ref[:] = part

    @pl.when(dk > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(dk == n_dk - 1)
    def _():
        ret_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("tq", "sub", "tb", "dk", "mode"))
def _ablated_call(q, bhi, qn, bn, tq: int, sub: int, tb: int, dk: int,
                  mode: str):
    Qp, Dp = q.shape
    Bp = bn.shape[1]
    n_q = Qp // tq
    n_b = Bp // tb
    n_dk = Dp // dk
    n_mega = Bp // (tb * sub)
    b_last = (bhi.shape[0] - 1) // tb
    grid = (n_q, n_b + 1, n_dk)
    kernel = partial(_kernel_ablated, n_dk=n_dk, tq=tq, sub=sub, tb=tb,
                     mode=mode)
    out_shape = jax.ShapeDtypeStruct((Qp, n_mega * CAND_PER_MEGA), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, 1), lambda qi, bi, dkk: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb),
                         lambda qi, bi, dkk: (0, jnp.maximum(bi - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, dk), lambda qi, bi, dkk: (qi, dkk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, dk),
                         lambda qi, bi, dkk: (jnp.minimum(bi, b_last), dkk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, CAND_PER_MEGA),
            lambda qi, bi, dkk: (qi, jnp.maximum(bi - 1, 0) // sub),
            memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tq, tb), jnp.float32),
            pltpu.VMEM((tq, tb), jnp.float32),
            pltpu.VMEM((KEEP, tq, LANES), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Qp * Bp * Dp,
            bytes_accessed=int(Qp * Dp * 4 + Bp * Dp * 2 * n_q),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(qn, bn, q, bhi)


def timeit(name, fn, iters=ITERS):
    out = fn()
    probe = jax.tree.leaves(out)[0]
    _ = float(sync(probe))
    tunnel_gate(sync, probe, f"before {name}")
    t0 = time.perf_counter()
    for _i in range(iters - 1):
        fn()
    out = fn()
    _ = float(sync(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt:.4f}s")
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "shipped"
    tq, tb, sub, dk = 512, 1024, 112, 512
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    log(f"data ready (mode {mode})")

    if mode == "shipped":
        screen = partial(sk.screen_candidates, epilogue="l2",
                         screen_precision="default",
                         bn_row=prep.bn_row, bhi=prep.bhi, sub=sub)
        timeit("shipped screen", lambda: screen(q, prep.base)[:2])
        return

    # ablated kernels drive the pallas_call directly on pre-built operands
    mega = tb * sub
    Bp = -(-B // mega) * mega
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    bn = jnp.pad(jnp.asarray(prep.bn_row)[:B], (0, Bp - B),
                 constant_values=jnp.inf)[None, :]
    jax.block_until_ready(bn)
    timeit(f"{mode} kernel",
           lambda: _ablated_call(q, prep.bhi, qn, bn, tq, sub, tb, dk,
                                 mode))


if __name__ == "__main__":
    main()
