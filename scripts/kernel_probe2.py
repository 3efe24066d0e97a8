"""Screen-kernel tile-shape probe (r4): dk=512 with bf16 operands, tb=2048
sub-tiles.  PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_probe2.py"""

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops import screen_kernel
from neighborhoodwatch_tpu.ops import knn as K
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

Q, B, D, KK = 10_000, 1_000_000, 1536, 100
ITERS = 3
sync = jax.jit(jnp.sum)


def timeit(name, fn, iters=ITERS):
    try:
        out = fn()
        probe = jax.tree.leaves(out)[0]
        _ = float(sync(probe))
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}")
        return None
    tunnel_gate(sync, probe, f"before {name}")
    t0 = time.perf_counter()
    for _i in range(iters - 1):
        fn()
    out = fn()
    _ = float(sync(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    log(f"{name}: {dt:.4f}s")
    return out


VARIANTS = {
    "shipped": dict(sub=112),
    "dk1536": dict(sub=112, dk_max=1536),
    "dk768": dict(sub=112, dk_max=768),
    "dk512": dict(sub=112, dk_max=512),
    "dk384": dict(sub=112, dk_max=384),
    "dk256": dict(sub=112, dk_max=256),
    "dk128": dict(sub=112, dk_max=128),
    "tb2048_dk256": dict(sub=56, tb=2048, dk_max=256),
    "tb2048_dk384": dict(sub=56, tb=2048, dk_max=384),
}


def main():
    # ONE variant per process: repeated distinct Pallas compiles in one
    # process exhaust device memory on this harness (measured)
    import sys
    name = sys.argv[1] if len(sys.argv) > 1 else "shipped"
    kw = VARIANTS[name]
    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    norm = jax.jit(lambda x: x / jnp.linalg.norm(x, axis=1, keepdims=True),
                   donate_argnums=0)
    q = norm(jax.random.normal(kq, (Q, D), jnp.float32))
    b = norm(jax.random.normal(kb, (B, D), jnp.float32))
    _ = np.asarray(q[0, 0]), np.asarray(b[0, 0])
    prep = K.prepare_base(b)
    jax.block_until_ready(prep.stats)
    log(f"data ready (variant {name}: {kw})")

    screen = partial(screen_kernel.screen_candidates, epilogue="l2",
                     screen_precision="default",
                     bn_row=prep.bn_row, bhi=prep.bhi)
    out = timeit(f"screen {name}", lambda: screen(q, prep.base, **kw)[:2])
    if out is not None and name != "shipped":
        # exactness guard: candidate sets must cover the same top-k
        d_sel, i_sel = K._screened_select(
            q, prep.base, out[0], out[1], KK, 256, "sqeuclidean", 1,
            block=64, base_stats=prep.stats)[:2]
        log(f"{name}: select ok (first idx row sum "
            f"{int(np.asarray(i_sel[0]).sum())})")


if __name__ == "__main__":
    main()
