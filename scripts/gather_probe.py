"""Gather/band probe for the screened select (r4 item 2 follow-up).

Questions answered on hardware:
1. Is the re-rank's row gather byte-bound or descriptor-bound? (bf16 rows
   halve the bytes at the same row count.)
2. Does the lax.map block size matter at m=256?
3. How wide is the certificate band (c_all distribution) under the shipped
   global eps, and how much does a per-lane-bin blo refinement shrink it —
   i.e. how small can m go without count-certificate overflows?

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/gather_probe.py
"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import screen_kernel
from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.utils.misc import round_up
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

Q, B, D, KK = 10_000, 1_000_000, 1536, 100
ITERS = 3
sync = jax.jit(jnp.sum)


def timeit(name, fn, *args, iters=ITERS):
    out = fn(*args)
    probe = jax.tree.leaves(out)[0]
    _ = float(sync(probe))
    tunnel_gate(sync, probe, f"before {name}")
    t0 = time.perf_counter()
    for _i in range(iters - 1):
        fn(*args)
    out = fn(*args)
    _ = float(sync(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt:.4f}s")
    return out, dt


@partial(jax.jit, static_argnames=("block", "m", "dtype"))
def rerank(qq, ip, base, block: int, m: int, dtype: str):
    q_pad = round_up(Q, block)
    qp = jnp.pad(qq, ((0, q_pad - Q), (0, 0)))
    ipp = jnp.pad(ip[:, :m], ((0, q_pad - Q), (0, 0)))

    def refine(args):
        qb, ib = args
        rows = base[ib]
        if dtype == "bf16":
            rows = rows.astype(jnp.float32)
        return jnp.einsum("td,tmd->tm", qb, rows,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)

    return jax.lax.map(
        refine, (qp.reshape(-1, block, D), ipp.reshape(-1, block, m)),
    ).reshape(q_pad, m)[:Q]


def main():
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    log("data ready")

    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    sub = screen_kernel.pick_sub(B, KK, q_rows=Q)
    passes = 1
    cap, m_plan, block = K._screen_plan(B, KK, D, sub, passes)
    log(f"sub={sub} cap={cap} m_plan={m_plan}")

    cand_d, cand_i, _ = screen_kernel.screen_candidates(
        q, prep.base, epilogue="l2", screen_precision="default", sub=sub,
        bn_row=prep.bn_row, bhi=prep.bhi)
    jax.block_until_ready(cand_d)

    keep, lanes = screen_kernel.KEEP, screen_kernel.LANES

    @partial(jax.jit, static_argnames=("m",))
    def merge_stage(cd, ci, m: int):
        d4 = cd.reshape(Q, -1, keep, lanes)
        i4 = ci.reshape(Q, -1, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :].reshape(Q, -1)
        merge_i = i4[:, :, : keep - 1, :].reshape(Q, -1)
        neg, sel = jax.lax.top_k(-merge_d, m)
        return -neg, jnp.take_along_axis(merge_i, sel, axis=1)

    (scr, idx_m), t_m256 = timeit("merge top_k m=256",
                                  lambda: merge_stage(cand_d, cand_i, 256))

    # --- gather variants at m=256 ---
    for blk in (64, 128, 256):
        timeit(f"rerank f32 m=256 block={blk}",
               lambda blk=blk: rerank(q, idx_m, prep.base, blk, 256, "f32"))
    timeit("rerank BF16 m=256 block=128",
           lambda: rerank(q, idx_m, prep.bhi, 128, 256, "bf16"))
    # sorted indices (ascending per row): locality probe
    idx_sorted = jax.jit(lambda x: jnp.sort(x, axis=1))(idx_m)
    timeit("rerank f32 m=256 block=128 SORTED idx",
           lambda: rerank(q, idx_sorted, prep.base, 128, 256, "f32"))
    # narrower m
    timeit("rerank f32 m=192 block=128",
           lambda: rerank(q, idx_m, prep.base, 128, 192, "f32"))
    timeit("rerank f32 m=128 block=128",
           lambda: rerank(q, idx_m, prep.base, 128, 128, "f32"))

    # --- band statistics under the shipped certificate eps ---
    sel_out = K._screened_select(q, prep.base, cand_d, cand_i, KK, 256,
                                 "sqeuclidean", passes, block=128,
                                 base_stats=prep.stats)
    thresh = np.asarray(sel_out[4])          # (Q,) screen-space tau + eps
    ok = np.asarray(sel_out[2])
    log(f"certs ok at m=256: {ok.sum()}/{Q}")

    @jax.jit
    def band_counts(cd, th):
        d4 = cd.reshape(Q, -1, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :].reshape(Q, -1)
        return jnp.sum((merge_d < th[:, None]).astype(jnp.int32), axis=1)

    c_all = np.asarray(band_counts(cand_d, jnp.asarray(thresh)))
    log(f"band c_all: median={np.median(c_all):.0f} "
        f"p95={np.percentile(c_all, 95):.0f} "
        f"p99={np.percentile(c_all, 99):.0f} max={c_all.max()}")

    # per-lane-bin blo refinement: how much would per-bin residual maxima
    # shrink the band? (l2: eps carries 2*qabs*blo_max; replace blo_max by
    # the candidate's own bin max)
    g = screen_kernel.norm_guard(D)
    bhi_f = screen_kernel.bf16_round(prep.base)
    blo_n = jnp.sqrt(jnp.sum((prep.base - bhi_f) ** 2, axis=1)) * g
    mega_rows = screen_kernel.TB * sub
    n_mega = B // mega_rows
    bin_blo = jnp.max(blo_n.reshape(n_mega, -1, lanes), axis=1)  # (mega, ln)
    blo_max = float(jnp.max(blo_n))
    qabs = np.asarray(jnp.sqrt(jnp.sum(q * q, axis=1))) * g

    @jax.jit
    def band_counts_binwise(cd, th, qa):
        d4 = cd.reshape(Q, n_mega, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :]
        # tighter per-bin threshold: subtract the unused blo slack (x2 for
        # the l2 epilogue's factor-2 dot term)
        slack = 2.0 * qa[:, None, None] * (blo_max - bin_blo)[None, :, :]
        thb = th[:, None, None] - slack            # (Q, mega, lanes)
        return jnp.sum((merge_d < thb[:, :, None, :]).astype(jnp.int32),
                       axis=(1, 2, 3))

    c_bin = np.asarray(band_counts_binwise(cand_d, jnp.asarray(thresh),
                                           jnp.asarray(qabs)))
    log(f"band with per-bin blo: median={np.median(c_bin):.0f} "
        f"p95={np.percentile(c_bin, 95):.0f} "
        f"p99={np.percentile(c_bin, 99):.0f} max={c_bin.max()}")
    log(f"blo_max={blo_max:.6f} bin_blo min/median/max="
        f"{float(jnp.min(bin_blo)):.6f}/"
        f"{float(jnp.median(bin_blo)):.6f}/{float(jnp.max(bin_blo)):.6f}")


if __name__ == "__main__":
    main()
