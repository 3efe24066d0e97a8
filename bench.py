"""Headline benchmark: exact kNN ground-truth generation throughput.

Workload (BASELINE.md milestone config 3 scaled to one chip): 10k queries x
1M base vectors, 1536d (text-embedding-ada-002 dims), k=100, squared-L2
(raft convention), fp32-exact accumulation. Data is generated on device so
the measurement isolates the compute engine (the full-pipeline IO paths are
exercised by tests/CLI).

Baseline model (BASELINE.md): the reference on a p3.8xlarge runs
single-GPU (GPU0 hardcoded, cu_knn.py:64-65) RAFT brute-force kNN on one
V100: 15.7 fp32 TFLOP/s peak; RAFT's fused distance+select achieves ~65%
-> ~10.2e12 effective FLOP/s. For this workload's 2*Q*B*d = 6.14e13
distance FLOPs that is ~6.0 s. vs_baseline = baseline_time / our_time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--queries", type=int, default=10_000)
    parser.add_argument("--base", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=1536)
    parser.add_argument("--k", type=int, default=100)
    parser.add_argument("--precision", type=str, default="highest",
                        choices=["default", "high", "highest"])
    parser.add_argument("--engine", type=str, default="auto",
                        choices=["auto", "exact", "verified"])
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--tile", type=int, default=None)
    parser.add_argument("--small", action="store_true",
                        help="tiny CPU-friendly smoke configuration")
    parser.add_argument("--verify-queries", type=int, default=8,
                        help="queries to cross-check against a float64 CPU "
                             "oracle (0 disables)")
    args = parser.parse_args()

    if args.small:
        args.queries, args.base, args.dim, args.k = 256, 20_000, 384, 10

    import jax
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.core.tuner import plan_knn
    from neighborhoodwatch_tpu.ops.knn import _knn_scan, _select_engine
    from neighborhoodwatch_tpu.utils.misc import round_up

    q_n, b_n, d, k = args.queries, args.base, args.dim, args.k
    engine = _select_engine(args.engine)
    plan = plan_knn(q_n, d, k, base_count=b_n, max_memory_threshold=0.6)
    tile = args.tile or plan.tile_size
    b_pad = round_up(b_n, tile)

    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    query = jax.random.normal(kq, (q_n, d), dtype=jnp.float32)
    query = query / jnp.linalg.norm(query, axis=1, keepdims=True)
    base = jax.random.normal(kb, (b_pad, d), dtype=jnp.float32)
    base = base / jnp.linalg.norm(base, axis=1, keepdims=True)
    base = jnp.where((jnp.arange(b_pad) < b_n)[:, None], base, 0.0)
    _ = np.asarray(query[0, 0]), np.asarray(base[0, 0])  # force materialize
    log(f"data ready: q={query.shape} b={base.shape} tile={tile} engine={engine}")

    def run():
        return _knn_scan(query, base, b_n, 0, k, "sqeuclidean",
                         args.precision, tile, engine)

    # warmup/compile; the final host read forces full completion (the axon
    # tunnel's block_until_ready does not reliably block)
    dist, idx = run()
    _ = np.asarray(dist[0, 0])
    log("compile + first run done")

    # amortize the host<->device roundtrip over chained async dispatches
    t0 = time.perf_counter()
    for _i in range(args.iters):
        dist, idx = run()
    _ = np.asarray(dist[0, 0])
    elapsed = (time.perf_counter() - t0) / args.iters
    log(f"timed {args.iters} iters: {elapsed:.3f}s each")

    # exactness cross-check on a query subsample vs float64 CPU oracle
    recall = None
    if args.verify_queries:
        log("verifying against float64 CPU oracle")
        nv = min(args.verify_queries, q_n)
        qv = np.asarray(query[:nv], dtype=np.float64)
        bv = np.asarray(base[:b_n], dtype=np.float64)
        dmat = (qv * qv).sum(1)[:, None] + (bv * bv).sum(1)[None, :] - 2 * qv @ bv.T
        oracle = np.argsort(dmat, axis=1, kind="stable")[:, :k]
        got = np.asarray(idx[:nv])
        recall = float(np.mean([len(set(got[r]) & set(oracle[r])) / k
                                for r in range(nv)]))

    flops = 2.0 * q_n * b_n * d
    achieved = flops / elapsed
    baseline_flops_per_s = 10.2e12  # single V100 RAFT effective (see header)
    baseline_time = flops / baseline_flops_per_s
    vs_baseline = baseline_time / elapsed

    result = {
        "metric": f"exact_knn_wallclock_q{q_n}_b{b_n}_d{d}_k{k}"
                  + (f"_recall{recall:.3f}" if recall is not None else ""),
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(vs_baseline, 3),
    }
    print(json.dumps(result))
    extra = {
        "achieved_tflops": round(achieved / 1e12, 2),
        "tile_size": tile,
        "engine": engine,
        "precision": args.precision,
        "recall_at_k_subsample": recall,
        "device": str(jax.devices()[0]),
        "baseline_model": "V100 RAFT ~10.2 TFLOP/s effective (p3.8xlarge, single GPU)",
    }
    print("# " + json.dumps(extra))


if __name__ == "__main__":
    main()
