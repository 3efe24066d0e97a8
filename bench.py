"""Headline benchmark: exact kNN ground-truth generation throughput.

Workload (BASELINE.md milestone config 3 scaled to one chip): 10k queries x
1M base vectors, 1536d (text-embedding-ada-002 dims), k=100, squared-L2
(raft convention), exact results. Data is generated on device so the
measurement isolates the compute engine (the full-pipeline IO paths are
exercised by tests/CLI).

Engine: "screened" — the fused Pallas distance+screen kernel (bf16x3 MXU
passes + on-chip bin-trio selection) with certified fp32 re-rank and
exact-engine fallback for unproven queries (ops/screen_kernel.py).

Baseline model (BASELINE.md): the reference on a p3.8xlarge runs
single-GPU (GPU0 hardcoded, cu_knn.py:64-65) RAFT brute-force kNN on one
V100: 15.7 fp32 TFLOP/s peak; RAFT's fused distance+select achieves ~65%
-> ~10.2e12 effective FLOP/s. For this workload's 2*Q*B*d = 3.07e13
distance FLOPs that is ~3.0 s. vs_baseline = baseline_time / our_time.

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
    parser.add_argument("--engine", type=str, default="auto",
                        choices=["auto", "exact", "verified", "screened"])
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--small", action="store_true",
                        help="tiny CPU-friendly smoke configuration")
    parser.add_argument("--verify-queries", type=int, default=256,
                        help="queries to cross-check against the exact "
                             "device engine (0 disables)")
    parser.add_argument("--oracle-queries", type=int, default=0,
                        help="queries to additionally check against a "
                             "float64 CPU oracle (slow: pulls the base to "
                             "host; 0 disables)")
    args = parser.parse_args()

    if args.small:
        args.queries, args.base, args.dim, args.k = 256, 20_000, 384, 10

    import jax
    import jax.numpy as jnp
    from neighborhoodwatch_tpu.ops.knn import knn, _select_engine

    q_n, b_n, d, k = args.queries, args.base, args.dim, args.k
    engine = _select_engine(args.engine, b_n)

    key = jax.random.PRNGKey(0)
    kq, kb = jax.random.split(key)
    query = jax.random.normal(kq, (q_n, d), dtype=jnp.float32)
    query = query / jnp.linalg.norm(query, axis=1, keepdims=True)
    base = jax.random.normal(kb, (b_n, d), dtype=jnp.float32)
    base = base / jnp.linalg.norm(base, axis=1, keepdims=True)
    _ = np.asarray(query[0, 0]), np.asarray(base[0, 0])  # force materialize
    log(f"data ready: q={query.shape} b={base.shape} engine={engine}")

    def run():
        return knn(query, base, k=k, metric="sqeuclidean", engine=engine)

    # warmup/compile; the final host read forces full completion (the axon
    # tunnel's block_until_ready does not reliably block)
    dist, idx = run()
    _ = np.asarray(dist)[0, 0]
    log("compile + first run done")

    times = []
    for _i in range(args.iters):
        t0 = time.perf_counter()
        dist, idx = run()
        _ = np.asarray(dist)[0, 0]
        times.append(time.perf_counter() - t0)
    # median: the axon tunnel adds +-0.1s run-to-run jitter
    elapsed = float(np.median(times))
    log(f"timed {args.iters} iters: median {elapsed:.3f}s "
        f"(min {min(times):.3f}, max {max(times):.3f})")
    idx = np.asarray(idx)

    # exactness cross-check vs the exact device engine (recall of the
    # returned neighbor SET; index-order ties under fp32 are accepted)
    recall = None
    if args.verify_queries:
        nv = min(args.verify_queries, q_n)
        log(f"verifying {nv} queries against the exact device engine")
        d_e, i_e = knn(query[:nv], base, k=k, metric="sqeuclidean",
                       engine="exact")
        i_e = np.asarray(i_e)
        recall = float(np.mean([len(set(idx[r]) & set(i_e[r])) / k
                                for r in range(nv)]))

    if args.oracle_queries:
        nv = min(args.oracle_queries, q_n)
        log(f"verifying {nv} queries against a float64 CPU oracle")
        qv = np.asarray(query[:nv], dtype=np.float64)
        bv = np.asarray(base, dtype=np.float64)
        dmat = (qv * qv).sum(1)[:, None] + (bv * bv).sum(1)[None, :] \
            - 2 * qv @ bv.T
        oracle = np.argsort(dmat, axis=1, kind="stable")[:, :k]
        rec_o = float(np.mean([len(set(idx[r]) & set(oracle[r])) / k
                               for r in range(nv)]))
        log(f"oracle recall@{k}: {rec_o}")

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
        "achieved_effective_tflops": round(achieved / 1e12, 2),
        "engine": engine,
        "recall_at_k_vs_exact_engine": recall,
        "device": str(jax.devices()[0]),
        "baseline_model": "V100 RAFT ~10.2 TFLOP/s effective (p3.8xlarge, single GPU)",
    }
    print("# " + json.dumps(extra))


if __name__ == "__main__":
    main()
