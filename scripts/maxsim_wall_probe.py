"""MaxSim kernel wall probe (r5, VERDICT item 2): decompose the high-tier
(3-pass) screen on the 1k x 200k x 32x16 x 128d headline into MXU+stream
vs epilogue, to either find headroom or prove the ~0.46-0.49s screen sits
at its MXU wall (3 x 27.5 TFLOP => ~0.42s floor at 100% of bf16 peak).

  shipped - ops.maxsim_kernel.screen_maxsim at the high tier (timing)
  noepi   - same grid/operands but the max/sum/screen epilogue replaced
            by a trivial dependency write: MXU passes + operand
            streaming + grid overhead only.
  onepass - shipped screen at the "default" (1-pass) tier for the same
            data (the adaptive controller's cheap rung; context row)

One variant per process:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/maxsim_wall_probe.py <variant>
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neighborhoodwatch_tpu.ops import maxsim_kernel as mk
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

QN, DN, TQ, TD, DIM, KK = 1000, 200_000, 32, 16, 128, 100
ITERS = 5
sync = jax.jit(jnp.sum)


def _kernel_noepi(db_ref, qhi_ref, qlo_ref, dhi_ref, dlo_ref, out_ref,
                  mk_ref, m_ref, *, tq, tdc, qb, sub, db, n_tc):
    bi = pl.program_id(1)
    dim = qhi_ref.shape[-1]
    qhi = qhi_ref[:].reshape(tq * qb, dim)
    dhi = dhi_ref[:].reshape(tdc * db, dim)
    dims = (((1,), (1,)), ((), ()))
    dot = partial(jax.lax.dot_general, dimension_numbers=dims,
                  preferred_element_type=jnp.float32)
    sims = dot(qhi, dhi)
    sims = sims + dot(qlo_ref[:].reshape(tq * qb, dim), dhi)
    sims = sims + dot(qhi, dlo_ref[:].reshape(tdc * db, dim))
    # dependency on EVERY sims element: a plain sliced write let Mosaic
    # narrow the dots to the consumed 16x512 window and the "floor" came
    # back at an impossible ~490 TFLOP/s (r5, measured twice — a scratch
    # store of a partial reduce was DCE'd as well). A full-tensor max
    # accumulated across grid steps in scratch AND read by the flush is
    # live by construction; the reduce is ~1/4 of the real epilogue's
    # VPU ops, so this floor slightly overestimates pure MXU+stream.
    red = jnp.full((1, 1), jnp.max(sims))
    @pl.when(bi % sub == 0)
    def _():
        m_ref[0:1, 0:1] = red

    @pl.when(bi % sub != 0)
    def _():
        m_ref[0:1, 0:1] = jnp.maximum(m_ref[0:1, 0:1], red)

    @pl.when(bi % sub == sub - 1)
    def _():
        out_ref[:] = jax.lax.bitcast_convert_type(
            sims[:qb, :mk.CAND_PER_MEGA] + m_ref[0, 0], jnp.int32)
    del mk_ref, db_ref


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "shipped"
    rng = np.random.default_rng(7)
    q = rng.standard_normal((QN, TQ, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    docs = rng.standard_normal((DN, TD, DIM)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    qm = np.ones((QN, TQ), dtype=bool)
    dm = np.ones((DN, TD), dtype=bool)
    qd = jnp.asarray(q)
    dd = jnp.asarray(docs)
    qmd = jnp.asarray(qm)
    dmd = jnp.asarray(dm)
    jax.block_until_ready(dd)
    log(f"data ready ({variant})")

    if variant in ("shipped", "onepass"):
        tier = "high" if variant == "shipped" else "default"
        f = lambda: mk.screen_maxsim(qd, qmd, dd, dmd,
                                     screen_precision=tier)[0]
    else:
        # mirror screen_maxsim's shape plan at this workload
        tqr = 512
        tq = TQ
        qb = tqr // tq                      # 16
        td = tdc = TD
        db = mk.DB if tqr * tdc * mk.DB * 4 <= (1 << 22) else mk.DB // 2
        sub = mk.MEGA_DOCS // db
        Qp = -(-QN // qb) * qb
        Dp = -(-DN // mk.MEGA_DOCS) * mk.MEGA_DOCS
        n_q, n_b, n_tc = Qp // qb, Dp // db, td // tdc
        n_mega = Dp // mk.MEGA_DOCS

        @jax.jit
        def prep(queries, docs):
            queries = jnp.pad(queries, ((0, Qp - QN), (0, 0), (0, 0)))
            docs = jnp.pad(docs, ((0, Dp - DN), (0, 0), (0, 0)))
            qhi_f = mk.bf16_round(queries)
            dhi_f = mk.bf16_round(docs)
            qhi = jnp.swapaxes(qhi_f.astype(jnp.bfloat16), 0, 1)
            dhi = jnp.swapaxes(dhi_f.astype(jnp.bfloat16), 0, 1)
            qlo = jnp.swapaxes((queries - qhi_f).astype(jnp.bfloat16), 0, 1)
            dlo = jnp.swapaxes((docs - dhi_f).astype(jnp.bfloat16), 0, 1)
            bias = jnp.zeros((1, Dp), jnp.float32)
            return qhi, qlo, dhi, dlo, bias

        qhi, qlo, dhi, dlo, bias = prep(qd, dd)
        jax.block_until_ready(dhi)
        kernel = partial(_kernel_noepi, tq=tq, tdc=tdc, qb=qb, sub=sub,
                         db=db, n_tc=n_tc)
        q_spec = pl.BlockSpec((tq, qb, DIM), lambda qi, bi, tc: (0, qi, 0),
                              memory_space=pltpu.VMEM)
        d_spec = pl.BlockSpec((tdc, db, DIM), lambda qi, bi, tc: (tc, bi, 0),
                              memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec((1, db), lambda qi, bi, tc: (0, bi),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((qb, mk.CAND_PER_MEGA),
                                lambda qi, bi, tc: (qi, bi // sub),
                                memory_space=pltpu.VMEM)

        # operands as jit ARGUMENTS — a closure capture becomes a
        # multi-GB lowering constant and the compile hangs for minutes
        # (CLAUDE.md probe rule; re-measured the hard way in r5)
        @jax.jit
        def call(bias, qhi, qlo, dhi, dlo):
            return pl.pallas_call(
                kernel,
                grid=(n_q, n_b, n_tc),
                in_specs=[bias_spec, q_spec, q_spec, d_spec, d_spec],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (Qp, n_mega * mk.CAND_PER_MEGA), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((mk.KEEP, qb, mk.LANES), jnp.int32),
                    pltpu.VMEM((tqr, db), jnp.float32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=2 * Qp * tq * Dp * td * DIM * 3,
                    bytes_accessed=int(Dp * td * DIM * 4 * n_q
                                       + Qp * tq * DIM * 4),
                    transcendentals=0),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary",
                                         "arbitrary")),
            )(bias, qhi, qlo, dhi, dlo)

        f = partial(call, bias, qhi, qlo, dhi, dlo)

    out = f()
    probe = jax.tree.leaves(out)[0]
    _ = float(sync(probe))
    tunnel_gate(sync, probe, f"before {variant}")
    t0 = time.perf_counter()
    for _i in range(ITERS - 1):
        f()
    out = f()
    _ = float(sync(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{variant}: {dt:.4f}s")


if __name__ == "__main__":
    main()
