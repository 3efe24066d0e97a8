"""Two-process jax.distributed STREAMED folds (the DCN/multi-host path for
the engines BASELINE config 5 actually uses — VERDICT r3 missing #2): the
one-shot `sharded_knn` was already multihost-tested (test_multihost.py), but
`ShardedStreamingKNN`/`ShardedStreamingMaxSim` fed their batches via a
single-process `jax.device_put` to a global sharding, which is structurally
wrong across processes. Here every process supplies only its PROCESS-LOCAL
shard of each streamed batch (`local_update_range` +
`jax.make_array_from_process_local_data`), the run is killed after a
checkpoint (the worker exits), and a fresh 2-process run restores and
finishes the stream — results must match the single-device oracle exactly.

Runs in subprocesses because jax.distributed can only initialize once per
process. Reference anchor: cu_knn_ds.py:181-239 is the single-device analog
being generalized; SURVEY.md §2 parallelism table (DCN row)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = textwrap.dedent("""
    import sys, os
    pid = int(sys.argv[1]); port = sys.argv[2]; workdir = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from neighborhoodwatch_tpu.parallel.mesh import init_distributed, make_mesh
    init_distributed(coordinator="localhost:" + port,
                     num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    import numpy as np
    from neighborhoodwatch_tpu.parallel.sharded_knn import ShardedStreamingKNN

    rng = np.random.default_rng(0)
    q = rng.standard_normal((24, 32)).astype(np.float32)
    base = rng.standard_normal((1536, 32)).astype(np.float32)
    K = 10
    mesh = make_mesh(8, dp=1)          # mp=8 spans BOTH processes
    ckpt = os.path.join(workdir, "stream_ckpt.npz")

    def feed(acc, lo_row, hi_row, batch):
        for off in range(lo_row, hi_row, batch):
            n = min(batch, hi_row - off)
            chunk_t = np.ascontiguousarray(base[off:off + n].T)  # (d, n)
            lo, hi = acc.local_update_range(n, colmajor=True)
            acc.update_colmajor(chunk_t[:, lo:hi], off, global_rows=n)
            acc.force_state(acc.state)
""").format(repo=_REPO)

_PHASE1 = _COMMON + textwrap.dedent("""
    # phase 1: stream the first 1024 rows in 2 batches, checkpoint, "die"
    acc = ShardedStreamingKNN(q, k=K, mesh=mesh, engine="exact")
    feed(acc, 0, 1024, 512)
    d, i, seen = acc.state_arrays()      # collective: all processes call
    assert seen == 1024
    if pid == 0:
        np.savez(ckpt + ".tmp.npz", dist=d, idx=i, seen=seen)
        os.replace(ckpt + ".tmp.npz", ckpt)
    print("PHASE1_OK", pid)
""")

_PHASE2 = _COMMON + textwrap.dedent("""
    # phase 2 (after the "crash"): restore on BOTH processes, finish the
    # stream with a RAGGED tail batch, verify vs the single-device oracle
    with np.load(ckpt) as z:
        d0, i0, seen = z["dist"], z["idx"], int(z["seen"])
    acc = ShardedStreamingKNN(q, k=K, mesh=mesh, engine="exact")
    acc.restore(d0, i0, seen)
    feed(acc, seen, 1536, 300)           # 300-row batches: ragged + narrower
    dist, idx = acc.finalize()

    from neighborhoodwatch_tpu.ops.knn import knn
    ref_d, ref_i = knn(q, base, k=K)
    np.testing.assert_array_equal(idx, np.asarray(ref_i))
    np.testing.assert_allclose(dist, np.asarray(ref_d), rtol=1e-5, atol=1e-5)

    # ---- MaxSim: process-local doc-tile feed over the same 2-process mesh
    from neighborhoodwatch_tpu.ops.maxsim import maxsim_topk
    from neighborhoodwatch_tpu.parallel.sharded_maxsim import (
        ShardedStreamingMaxSim,
    )
    qt = rng.standard_normal((9, 4, 16)).astype(np.float32)
    qm = np.ones((9, 4), dtype=bool)
    docs = rng.standard_normal((320, 6, 16)).astype(np.float32)
    dm = np.ones((320, 6), dtype=bool)
    macc = ShardedStreamingMaxSim(qt, qm, k=7, mesh=mesh, engine="exact")
    for off, n in ((0, 160), (160, 100), (260, 60)):
        lo, hi = macc.local_update_range(n)
        macc.update(docs[off + lo: off + hi], dm[off + lo: off + hi],
                    off, global_docs=n)
        macc.force_state(macc.state)
    ms, mi = macc.finalize()
    ref_s, ref_i = maxsim_topk(qt, qm, docs, dm, k=7, tile_docs=64)
    np.testing.assert_array_equal(mi, np.asarray(ref_i))
    np.testing.assert_allclose(ms, np.asarray(ref_s), rtol=1e-5, atol=1e-5)

    # ---- screened MaxSim with a FORCED multi-process host repair: plant
    # 6 high-scoring docs into each of THREE lane bins (> REPAIR_BINS, so
    # the in-trace class-A repair declines and the certificate failure
    # reaches the host repair branch — per-process exact partial top
    # lists over LOCAL doc slices, allgathered + merge_partial_topk_desc)
    # with the bins spread across BOTH processes' halves of the doc axis,
    # so a slice bug loses a planted doc and fails the exact-index check.
    # Scores are well separated (planted >> random), making index
    # identity a sound assertion.
    from neighborhoodwatch_tpu.ops import maxsim_kernel as mkk
    nd = mkk.MEGA_DOCS * 8            # one mega per device, mp=8 spans procs
    center = rng.standard_normal((4, 32)).astype(np.float32)
    center *= 3.0 / np.linalg.norm(center, axis=-1, keepdims=True)
    docs2 = rng.standard_normal((nd, 4, 32)).astype(np.float32)
    docs2 /= np.linalg.norm(docs2, axis=-1, keepdims=True)
    planted = []
    for mega, lane in ((0, 7), (3, 50), (7, 99)):
        planted.extend(mega * mkk.MEGA_DOCS + lane + 128 * np.arange(6))
    planted = np.asarray(planted)
    docs2[planted] = center[None] + 0.05 * rng.standard_normal(
        (len(planted), 4, 32)).astype(np.float32)
    dm2 = np.ones((nd, 4), dtype=bool)
    qt2 = (center[None] + 0.05 * rng.standard_normal((3, 4, 32))
           ).astype(np.float32)
    qm2 = np.ones((3, 4), dtype=bool)
    # "auto" = the ADAPTIVE tier (r5): the screened update computes
    # per-query cheap-tier predictions, any-reduced over mp and
    # allgathered ACROSS PROCESSES for the controller — this is the only
    # coverage of that diag path on a mesh spanning hosts. The planted
    # >REPAIR_BINS collisions still force the multi-process host repair
    # (bin-geometry failures are tier-independent).
    sacc = ShardedStreamingMaxSim(qt2, qm2, k=4, mesh=mesh,
                                  engine="screened",
                                  screen_precision="auto")
    assert sacc._adaptive
    lo, hi = sacc.local_update_range(nd)
    sacc.update(docs2[lo:hi], dm2[lo:hi], 0, global_docs=nd)
    ss, si = sacc.finalize()
    ref_s2, ref_i2 = maxsim_topk(qt2, qm2, docs2, dm2, k=4, tile_docs=4096)
    np.testing.assert_array_equal(si, np.asarray(ref_i2))
    np.testing.assert_allclose(ss, np.asarray(ref_s2), rtol=1e-5, atol=1e-5)
    for r in range(si.shape[0]):
        assert set(int(x) for x in si[r]) <= set(int(x) for x in planted)

    # ---- compute_knn_ds over the 2-process mesh (reader feeds each
    # process its column slice; process 0 owns checkpoint + final files)
    import pyarrow as pa
    import pyarrow.parquet as pq
    from jax.experimental import multihost_utils
    from neighborhoodwatch_tpu.core.pipeline import compute_knn_ds
    from neighborhoodwatch_tpu.utils.naming import (
        get_partial_indices_filename,
    )
    _, ref_ds_i = knn(q[:16], base, k=K)
    dsdir = os.path.join(workdir, "ds")
    if pid == 0:
        os.makedirs(os.path.join(dsdir, "partial"), exist_ok=True)
        for fname, mat in (("q.parquet", q[:16]), ("b.parquet", base)):
            pq.write_table(
                pa.table({f"embedding_{j}": np.ascontiguousarray(mat[:, j])
                          for j in range(mat.shape[1])}),
                os.path.join(dsdir, fname))
    multihost_utils.sync_global_devices("ds files written")
    compute_knn_ds(dsdir, 32, "q.parquet", 16, "b.parquet", base.shape[0],
                   k=K, initial_batch_size=80, mesh=mesh,
                   checkpoint_every=2, engine="exact")
    multihost_utils.sync_global_devices("ds done")
    got = pq.read_table(
        get_partial_indices_filename(dsdir, -1)).to_pandas().values
    np.testing.assert_array_equal(got, np.asarray(ref_ds_i))

    # ---- compute_maxsim_knn over the 2-process mesh (doc-tracked token
    # parquet -> tiled process-local feed -> process-0 finals)
    from neighborhoodwatch_tpu.core.colbert_pipeline import compute_maxsim_knn
    from neighborhoodwatch_tpu.ops.maxsim import pad_token_lists
    msdir = os.path.join(workdir, "ms")
    nqd, nbd, tpd, dim_t = 6, 120, 3, 16
    qtok = rng.standard_normal((nqd * tpd, dim_t)).astype(np.float32)
    btok = rng.standard_normal((nbd * tpd, dim_t)).astype(np.float32)
    if pid == 0:
        os.makedirs(os.path.join(msdir, "partial"), exist_ok=True)
        for fname, mat, ndocs in (("q_tok.parquet", qtok, nqd),
                                  ("b_tok.parquet", btok, nbd)):
            cols = {"doc_id": np.repeat(np.arange(ndocs, dtype=np.int32),
                                        tpd)}
            cols.update({f"embedding_{j}": np.ascontiguousarray(mat[:, j])
                         for j in range(dim_t)})
            pq.write_table(pa.table(cols), os.path.join(msdir, fname))
    multihost_utils.sync_global_devices("ms files written")
    compute_maxsim_knn(msdir, os.path.join(msdir, "q_tok.parquet"),
                       os.path.join(msdir, "b_tok.parquet"), k=5,
                       tile_docs=48, batch_rows=100, checkpoint_every=2,
                       mesh=mesh)
    multihost_utils.sync_global_devices("ms done")
    got_i = pq.read_table(
        get_partial_indices_filename(msdir, -1)).to_pandas().values
    qpad, qmsk = pad_token_lists([qtok[i*tpd:(i+1)*tpd] for i in range(nqd)],
                                 dim_t)
    bpad, bmsk = pad_token_lists([btok[i*tpd:(i+1)*tpd] for i in range(nbd)],
                                 dim_t)
    _, ref_ms_i = maxsim_topk(qpad, qmsk, bpad, bmsk, k=5, tile_docs=32)
    np.testing.assert_array_equal(got_i, np.asarray(ref_ms_i))
    print("PHASE2_OK", pid)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_phase(tmp_path, name, code):
    script = tmp_path / f"{name}.py"
    script.write_text(code)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), port, str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=520)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{name} process {pid} failed:\n{out[-4000:]}"
        assert f"{name.upper()}_OK {pid}" in out
    return outs


def test_two_process_streamed_fold_kill_and_resume(tmp_path):
    _run_phase(tmp_path, "phase1", _PHASE1)
    assert (tmp_path / "stream_ckpt.npz").exists()
    _run_phase(tmp_path, "phase2", _PHASE2)


def test_merge_partial_topk_desc_matches_bruteforce():
    """Host-side unit test of the multi-process repair merge (no
    subprocesses): P per-process partial DESC top lists with -inf padding
    -> global top-k, ties by ascending doc id."""
    from neighborhoodwatch_tpu.parallel.sharded_maxsim import (
        merge_partial_topk_desc,
    )
    rng = np.random.default_rng(9)
    P_, rows, kk = 3, 6, 5
    all_s = np.full((P_, rows, kk), -np.inf, dtype=np.float32)
    all_i = np.zeros((P_, rows, kk), dtype=np.int32)
    truth_s, truth_i = [], []
    for r in range(rows):
        pool_s, pool_i = [], []
        for p in range(P_):
            npts = rng.integers(0, kk + 1)
            s = np.sort(rng.choice(
                np.arange(20, dtype=np.float32) / 4.0, npts,
                replace=True))[::-1]          # duplicates -> real ties
            ids = rng.choice(1000, npts, replace=False) + p * 1000
            all_s[p, r, :npts] = s
            all_i[p, r, :npts] = ids
            pool_s.extend(s)
            pool_i.extend(ids)
        order = np.lexsort((np.asarray(pool_i),
                            -np.asarray(pool_s, dtype=np.float32)))[:kk]
        ts = np.full(kk, -np.inf, dtype=np.float32)
        ti = np.zeros(kk, dtype=np.int64)
        ts[: len(order)] = np.asarray(pool_s, dtype=np.float32)[order]
        ti[: len(order)] = np.asarray(pool_i)[order]
        truth_s.append(ts)
        truth_i.append(ti)
    got_s, got_i = merge_partial_topk_desc(all_s, all_i, kk)
    np.testing.assert_array_equal(got_s, np.stack(truth_s))
    # ids only meaningful where scores are finite
    finite = np.isfinite(np.stack(truth_s))
    np.testing.assert_array_equal(got_i[finite],
                                  np.stack(truth_i)[finite].astype(np.int32))
