"""Select-stage breakdown probe for the screened kNN engine (r4 item 2).

Measures, on the headline workload (10k x 1M x 1536, k=100, 1-pass screen,
sub=112, m from the plan), the steady-state cost of each stage the traced
screened path runs: the Pallas screen alone, the key decode, the merge
top_k, the blocked exact re-rank, the certificate reductions, and the
end-to-end screened_knn_traced — so select optimizations target the
measured term, not a guess. Run on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/select_probe.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import screen_kernel
from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

Q, B, D, KK = 10_000, 1_000_000, 1536, 100
PASSES = 1
ITERS = 3

sync = jax.jit(jnp.sum)


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    probe = jax.tree.leaves(out)[0]
    _ = float(sync(probe))
    tunnel_gate(sync, probe, f"before {name}")
    t0 = time.perf_counter()
    # dispatch back-to-back but DROP intermediate refs (still executed in
    # order; holding every output alongside the 9GB corpus operands OOMs)
    for _i in range(iters - 1):
        fn(*args)
    out = fn(*args)
    _ = float(sync(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt:.4f}s")
    return out, dt


def main():
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)   # donate: don't hold 2x the corpus
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    log("data ready")

    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    sub = screen_kernel.pick_sub(B, KK, q_rows=Q)
    cap, m, block = K._screen_plan(B, KK, D, sub, PASSES)
    log(f"sub={sub} cap={cap} m={m} block={block}")

    screen = partial(screen_kernel.screen_candidates, epilogue="l2",
                     screen_precision="default", sub=sub)

    def run_screen(qq):
        cd, ci, _ = screen(qq, prep.base, bn_row=prep.bn_row, bhi=prep.bhi)
        return cd, ci

    (cand_d, cand_i), t_screen = timeit("screen(kernel+decode)", run_screen, q)

    # stage A: slab split + merge top_k + gather of indices
    keep, lanes = screen_kernel.KEEP, screen_kernel.LANES

    @jax.jit
    def merge_stage(cd, ci):
        d4 = cd.reshape(Q, -1, keep, lanes)
        i4 = ci.reshape(Q, -1, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :].reshape(Q, -1)
        merge_i = i4[:, :, : keep - 1, :].reshape(Q, -1)
        neg, sel = jax.lax.top_k(-merge_d, m)
        return -neg, jnp.take_along_axis(merge_i, sel, axis=1)

    (scr, idx_m), t_merge = timeit(f"merge top_k(m={m}) over "
                                   f"{(cand_d.shape[1] // keep) * (keep - 1)}",
                                   merge_stage, cand_d, cand_i)

    # stage B: blocked exact re-rank (the gather + einsum)
    from neighborhoodwatch_tpu.utils.misc import round_up

    @jax.jit
    def rerank_stage(qq, ip, base):
        # base is an ARGUMENT: closing over the 6GB device array captures
        # it as a lowering constant (measured: multi-minute compile)
        q_pad = round_up(Q, block)
        qp = jnp.pad(qq, ((0, q_pad - Q), (0, 0)))
        ipp = jnp.pad(ip, ((0, q_pad - Q), (0, 0)))

        def refine(args):
            qb, ib = args
            return K._exact_pair_dists(qb, base[ib], "sqeuclidean")

        return jax.lax.map(
            refine, (qp.reshape(-1, block, D), ipp.reshape(-1, block, m)),
        ).reshape(q_pad, m)[:Q]

    d_exact, t_rerank = timeit(f"re-rank gather+einsum (block={block})",
                               rerank_stage, q, idx_m, prep.base)

    # stage C: final top_k(k) + certificate reductions
    @jax.jit
    def final_stage(cd, d_ex, s):
        negk, selk = jax.lax.top_k(-d_ex, KK)
        tau = -negk[:, KK - 1]
        d4 = cd.reshape(Q, -1, keep, lanes)
        m_last = d4[:, :, keep - 1, :]
        merge_d = d4[:, :, : keep - 1, :].reshape(Q, -1)
        thresh = tau + 1e-2
        cert_bins = jnp.min(m_last, axis=(1, 2)) >= thresh
        c_all = jnp.sum((merge_d < thresh[:, None]).astype(jnp.int32), axis=1)
        c_sel = jnp.sum((s < thresh[:, None]).astype(jnp.int32), axis=1)
        return negk, selk, cert_bins, c_all == c_sel

    _, t_final = timeit("final top_k + cert reductions", final_stage,
                        cand_d, d_exact, scr)

    # full select as shipped
    def full_select(qq, cd, ci):
        return K._screened_select(qq, prep.base, cd, ci, KK, m,
                                  "sqeuclidean", PASSES, block=block,
                                  base_stats=prep.stats)

    sel_out, t_select = timeit("_screened_select (shipped)", full_select,
                               q, cand_d, cand_i)
    ok = np.asarray(sel_out[2])
    log(f"certificates: {ok.sum()}/{Q} ok")

    # end-to-end traced engine
    def e2e(qq):
        return K.screened_knn_traced(qq, prep.base, B, 0, KK, "sqeuclidean",
                                     "default", base_stats=prep.stats,
                                     bn_row=prep.bn_row, bhi=prep.bhi)

    _, t_e2e = timeit("screened_knn_traced e2e", e2e, q)

    log(f"SUMMARY screen={t_screen:.3f} merge={t_merge:.3f} "
        f"rerank={t_rerank:.3f} final={t_final:.3f} "
        f"select_shipped={t_select:.3f} e2e={t_e2e:.3f} "
        f"(stages sum={t_screen + t_select:.3f})")


if __name__ == "__main__":
    main()
