"""Screen-kernel tuning probe: time screen_candidates variants on the
attached TPU to attribute the kernel's wall-clock (HBM base re-reads vs
MXU passes vs VPU epilogue) and evaluate tile/precision candidates.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/kernel_probe.py \
        [--queries 10000] [--base 1000000] [--dim 1536] [--iters 3] \
        [--variants default,tq512,...]

Each variant times ONLY the screen (candidate generation), pipelined
dispatch, synced once per iter batch — the same steady-state discipline
as bench.py. Prints one line per variant.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--precision", type=str, default="default",
                    choices=["default", "medium", "high"])
    ap.add_argument("--variants", type=str,
                    default="default,tq512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops import screen_kernel

    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    q = jax.random.normal(kq, (args.queries, args.dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    b = jax.random.normal(kb, (args.base, args.dim), jnp.float32)
    b = b / jnp.linalg.norm(b, axis=1, keepdims=True)
    jax.block_until_ready((q, b))
    print(f"# data ready on {jax.devices()[0]}", flush=True)

    variants = {}
    for name in args.variants.split(","):
        name = name.strip()
        if name == "default":
            variants[name] = dict()
        elif name == "nopipe":
            variants[name] = dict(pipelined=False)
        elif name.startswith("tq"):
            # e.g. tq512 / tq512dk256
            if "dk" in name:
                tq_s, dk_s = name[2:].split("dk")
                variants[name] = dict(tq=int(tq_s), dk_max=int(dk_s))
            else:
                variants[name] = dict(tq=int(name[2:]))
        elif name.startswith("sub"):
            variants[name] = dict(sub=int(name[3:]))
        else:
            raise SystemExit(f"unknown variant {name}")

    for name, kw in variants.items():
        try:
            # ONE jitted dispatch per call, like the production
            # screened_knn_traced path — the unjitted wrapper's eager
            # prelude costs several tunnel roundtrips per call here
            fn = jax.jit(lambda q, b, kw=kw: screen_kernel.screen_candidates(
                q, b, epilogue="l2", screen_precision=args.precision, **kw))
            out = fn(q, b)
            # sync by fetching ONE element (a full-array fetch of the
            # (Q, width) candidates costs ~3s through the remote tunnel
            # and swamps the kernel time)
            _ = np.asarray(out[0][0, 0])
            t0 = time.perf_counter()
            outs = [fn(q, b) for _ in range(args.iters)]
            _ = np.asarray(outs[-1][0][0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name}: {dt:.4f}s  (cand width {out[0].shape[1]})",
                  flush=True)
            # free this variant's candidate buffers before the next one
            # compiles (5 iters x ~740MB of (Q, width) outputs otherwise
            # OOM the 16GB HBM alongside the 6GB corpus)
            del out, outs
        except Exception as e:  # noqa: BLE001 — probe reports and moves on
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
