"""Band-refinement probe (r4 item 2): does a per-lane-bin blo max (vs the
global corpus max) shrink the certificate band enough to justify a smaller
merge width m?  PYTHONPATH=... python scripts/band_probe.py"""

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import screen_kernel
from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.utils.bench_support import log

Q, B, D, KK = 10_000, 1_000_000, 1536, 100


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

    cand_d, cand_i, _ = screen_kernel.screen_candidates(
        q, prep.base, epilogue="l2", screen_precision="default", sub=sub,
        bn_row=prep.bn_row, bhi=prep.bhi)
    sel_out = K._screened_select(q, prep.base, cand_d, cand_i, KK, 256,
                                 "sqeuclidean", 1, block=64,
                                 base_stats=prep.stats)
    thresh = jnp.asarray(np.asarray(sel_out[4]))
    log(f"certs ok at m=256: {np.asarray(sel_out[2]).sum()}/{Q}")

    keep, lanes = screen_kernel.KEEP, screen_kernel.LANES
    g = screen_kernel.norm_guard(D)
    # fused under jit: no multi-GB temporaries
    blo_n = jax.jit(lambda bb: jnp.sqrt(jnp.sum(
        (bb - screen_kernel.bf16_round(bb)) ** 2, axis=1)) * g)(prep.base)
    mega_rows = screen_kernel.TB * sub
    n_mega = -(-B // mega_rows)          # ragged tail mega included
    pad = n_mega * mega_rows - B
    blo_p = jnp.pad(blo_n, (0, pad))     # pad rows: zero residual
    bin_blo = jnp.max(blo_p.reshape(n_mega, -1, lanes), axis=1)
    blo_max = float(jnp.max(blo_n))
    qabs = jax.jit(lambda qq: jnp.sqrt(jnp.sum(qq * qq, axis=1)) * g)(q)

    @jax.jit
    def bands(cd, th, qa):
        d4 = cd.reshape(Q, n_mega, keep, lanes)
        merge_d = d4[:, :, : keep - 1, :]
        c_glob = jnp.sum((merge_d < th[:, None, None, None]).astype(
            jnp.int32), axis=(1, 2, 3))
        slack = 2.0 * qa[:, None, None] * (blo_max - bin_blo)[None, :, :]
        thb = th[:, None, None] - slack
        c_bin = jnp.sum((merge_d < thb[:, :, None, :]).astype(jnp.int32),
                        axis=(1, 2, 3))
        return c_glob, c_bin

    c_glob, c_bin = (np.asarray(x) for x in bands(cand_d, thresh, qabs))
    for name, c in (("global", c_glob), ("per-bin", c_bin)):
        log(f"band [{name}]: median={np.median(c):.0f} "
            f"p95={np.percentile(c, 95):.0f} "
            f"p99={np.percentile(c, 99):.0f} max={c.max()}")
    log(f"blo_max={blo_max:.6f} bin_blo min/med/max="
        f"{float(jnp.min(bin_blo)):.6f}/{float(jnp.median(bin_blo)):.6f}/"
        f"{float(jnp.max(bin_blo)):.6f}")
    # how much of eps is the query-side term? (l2: eps_s = 2*d_err +
    # (pack+3acc)*scale; d_err = qabs*(blo_max+acc*babs) + qres*1.004*babs)
    qhi = screen_kernel.bf16_round(q)
    qres = np.asarray(jax.jit(lambda qq, qh: jnp.sqrt(jnp.sum(
        (qq - qh) ** 2, axis=1)))(q, qhi)) * g
    acc = K._acc_rel(D)
    log(f"eps terms (medians): q-side 2*qres*1.004={2 * np.median(qres) * 1.004:.6f} "
        f"b-side 2*qabs*blo_max={2 * np.median(np.asarray(qabs)) * blo_max:.6f} "
        f"acc-ish={(screen_kernel.PACK_EPS_REL + 3 * acc) * 2.0:.6f}")


if __name__ == "__main__":
    main()
