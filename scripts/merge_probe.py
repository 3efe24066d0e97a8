"""Merge + screen tuning probe (r4 item 2): two-level merge top_k, smaller
gather blocks, and bigger query tiles for the screen kernel.
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/merge_probe.py"""

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


def timeit(name, fn, iters=ITERS):
    try:
        out = fn()
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return None, None
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
    return out, dt


def main():
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    sub = screen_kernel.pick_sub(B, KK, q_rows=Q)
    log("data ready")

    screen = partial(screen_kernel.screen_candidates, epilogue="l2",
                     screen_precision="default", sub=sub,
                     bn_row=prep.bn_row, bhi=prep.bhi)
    (cand_d, cand_i), t_s = timeit("screen tq=auto(512) dk=384",
                                   lambda: screen(q, prep.base)[:2])
    # tq=1024 at any dk overflows VMEM (remote-compile HTTP 500) — measured
    # and removed; 512 is the ceiling at TB=1024

    keep, lanes = screen_kernel.KEEP, screen_kernel.LANES
    M = 256

    @partial(jax.jit, static_argnames=("w",))
    def merge_two_level(cd, ci, w: int):
        d4 = cd.reshape(Q, -1, keep, lanes)
        i4 = ci.reshape(Q, -1, keep, lanes)
        n_mega = d4.shape[1]
        md = d4[:, :, : keep - 1, :].reshape(Q, n_mega, -1)
        mi = i4[:, :, : keep - 1, :].reshape(Q, n_mega, -1)
        # level 1: per-mega top-w (SOUND prefilter: the count certificate
        # counts the FULL width, so a mega holding >w band members fails
        # the cert and repairs)
        neg1, sel1 = jax.lax.top_k(-md, w)
        i1 = jnp.take_along_axis(mi, sel1, axis=2)
        # level 2: exact top-M over the n_mega*w survivors
        neg2, sel2 = jax.lax.top_k(neg1.reshape(Q, -1), M)
        return -neg2, jnp.take_along_axis(i1.reshape(Q, -1), sel2, axis=1)

    @jax.jit
    def merge_direct(cd, ci):
        d4 = cd.reshape(Q, -1, keep, lanes)
        i4 = ci.reshape(Q, -1, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :].reshape(Q, -1)
        merge_i = i4[:, :, : keep - 1, :].reshape(Q, -1)
        neg, sel = jax.lax.top_k(-merge_d, M)
        return -neg, jnp.take_along_axis(merge_i, sel, axis=1)

    (s0, i0), _ = timeit("merge direct top_k(256) of 3456",
                         lambda: merge_direct(cand_d, cand_i))
    for w in (192, 128):
        out, _ = timeit(f"merge two-level w={w}",
                        lambda w=w: merge_two_level(cand_d, cand_i, w))
        if out is not None:
            same = np.array_equal(np.asarray(out[1]), np.asarray(i0))
            log(f"  two-level w={w} identical selection: {same}")

    idx_m = i0

    @partial(jax.jit, static_argnames=("block",))
    def rerank(qq, ip, base, block: int):
        q_pad = round_up(Q, block)
        qp = jnp.pad(qq, ((0, q_pad - Q), (0, 0)))
        ipp = jnp.pad(ip, ((0, q_pad - Q), (0, 0)))

        def refine(args):
            qb, ib = args
            return jnp.einsum("td,tmd->tm", qb, base[ib],
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)

        return jax.lax.map(
            refine, (qp.reshape(-1, block, D), ipp.reshape(-1, block, M)),
        ).reshape(q_pad, M)[:Q]

    for blk in (16, 32, 64):
        timeit(f"rerank m=256 block={blk}",
               lambda blk=blk: rerank(q, idx_m, prep.base, blk))


if __name__ == "__main__":
    main()
