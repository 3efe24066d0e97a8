"""Multi-chip exact kNN: base-corpus sharding with ICI all_gather top-k merge.

The scalable TPU design for the base-axis streaming the reference does with
single-GPU batch loops (SURVEY.md §2 parallelism table): the base corpus is
sharded row-wise across the "mp" mesh axis; every chip computes an exact
top-k against its shard with *global* indices (shard offset = axis_index *
shard_rows), then the (dist, idx) lists — k rows per chip, not the shard —
are all_gathered over ICI and merged on device. Queries are sharded over
"dp", so the collective payload per chip is only (Q/dp, k) pairs.

Also provides a ring variant (`ring_knn`) that rotates base shards around
the mesh with `jax.lax.ppermute`, computing against one shard at a time —
the ring-attention-shaped dataflow for bases that exceed per-chip HBM when
all-gathered... but here only the *top-k lists* move, so the default
all_gather path is already communication-light; the ring variant instead
overlaps shard compute with neighbor transfers of the running top-k.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from neighborhoodwatch_tpu.ops.distance import pairwise_distance
from neighborhoodwatch_tpu.ops.topk import smallest_k, merge_topk, merge_topk_many
from neighborhoodwatch_tpu.parallel.mesh import DP_AXIS, MP_AXIS


def process_slice(sharding, global_shape, axis: int):
    """[start, stop) range of `axis` whose shards live on THIS process's
    devices under `sharding` — the rows a process must supply to the
    process-local streamed-update paths on a mesh spanning hosts. When the
    axis is replicated across this process's devices (e.g. the "mp" axis
    lives inside each host), the range is the full axis. The range is
    contiguous for every mesh this module builds (make_mesh reshapes
    jax.devices() in order); a non-contiguous device order fails loudly in
    jax.make_array_from_process_local_data downstream."""
    imap = sharding.devices_indices_map(tuple(global_shape))
    lo = hi = None
    for dev, idx in imap.items():
        if dev.process_index != jax.process_index():
            continue
        sl = idx[axis]
        start = sl.start if sl.start is not None else 0
        stop = sl.stop if sl.stop is not None else global_shape[axis]
        lo = start if lo is None else min(lo, start)
        hi = stop if hi is None else max(hi, stop)
    assert lo is not None, "process owns no shard of the array"
    return int(lo), int(hi)


def _force_distinct_shards(arr) -> None:
    """Backpressure sync: fetch one 4-byte element from every DISTINCT
    shard of `arr` addressable on this process. Proves the producing
    computation of each local shard executed (the only reliable bound on
    queued transfers through remote transports), covers every dp group a
    single [0, 0] probe missed (r3 review), and — unlike whole-array
    indexing — works when the array is only partially addressable (a mesh
    spanning processes)."""
    seen = set()
    for s in arr.addressable_shards:
        if s.index in seen:
            continue
        seen.add(s.index)
        _ = np.asarray(s.data[:1, :1])


def _trace_safe_engine(engine: str) -> str:
    """Resolve the engine for shard_map-traced paths. "screened" runs
    fully traced via ops.knn.screened_knn_traced (in-trace certificate
    repair); "auto" picks screened on TPU — per-shard folds still fall back
    to verified/exact when the shard is too small for the kernel. Unknown
    names raise: silently coercing a typo ("screen", "verfied") to auto
    would benchmark a different engine than the caller believes
    (r3 review)."""
    if engine in ("exact", "verified", "screened"):
        return engine
    if engine != "auto":
        raise ValueError(f"unknown engine {engine!r}; expected one of "
                         f"auto/exact/verified/screened")
    return "screened" if jax.default_backend() == "tpu" else "exact"


def _small_shard_engine(engine: str) -> str:
    """Scan/full-tile engine when the shard is too small for the screen
    kernel (or the caller asked for a non-screened engine)."""
    if engine in ("exact", "verified"):
        return engine
    return "verified" if jax.default_backend() == "tpu" else "exact"


def sharded_knn(query, base, k: int, mesh, metric: str = "sqeuclidean",
                precision: str = "highest", tile_size: int = 2048,
                engine: str = "auto", n_valid: int | None = None,
                screen_precision: str = "auto"):
    """Exact kNN over a (dp, mp) mesh. `query` rows must divide the dp axis
    size and `base` rows the mp axis size; pad the base beforehand if
    needed AND pass `n_valid` = the real row count — pad rows are masked
    out per shard (a zero pad row's sqeuclidean distance is ||q||², which
    BEATS true neighbors beyond 1.0 on normalized embeddings — r3 review).

    Returns (distances, indices) with global base indices, sharded over dp.

    Delegates to `_sharded_fold` (one fold against an +inf running state):
    one proven masked/engine-dispatched code path, and one cached jit —
    the old per-call shard_map closure retraced and recompiled on every
    invocation."""
    engine = _trace_safe_engine(engine)
    query = jnp.asarray(query, dtype=jnp.float32)
    base = jnp.asarray(base, dtype=jnp.float32)
    n_base = base.shape[0]
    mp = mesh.shape[MP_AXIS]
    dp = mesh.shape[DP_AXIS]
    if n_valid is None:
        n_valid = n_base
    assert 0 < n_valid <= n_base
    assert query.shape[0] % dp == 0, \
        f"query rows {query.shape[0]} not divisible by dp={dp}"
    assert n_base % mp == 0, \
        f"base rows {n_base} not divisible by mp={mp}"
    shard_rows = n_base // mp
    assert k <= shard_rows, \
        f"k={k} exceeds per-shard base rows {shard_rows}; lower mp or pad base"
    assert k <= n_valid, f"k={k} exceeds valid base rows {n_valid}"

    q_rows = query.shape[0]
    run_d = jnp.full((q_rows, k), jnp.inf, dtype=jnp.float32)
    run_i = jnp.zeros((q_rows, k), dtype=jnp.int32)
    return _sharded_fold(run_d, run_i, query, base, jnp.int32(0),
                         jnp.int32(n_valid), k, metric, precision, engine,
                         tile_size, mesh, screen_precision)


@partial(jax.jit, static_argnames=("k", "metric", "precision", "engine",
                                   "tile_size", "mesh", "screen_precision",
                                   "colmajor", "with_diagnostics"))
def _sharded_fold(run_d, run_i, query, batch, offset, n_valid, k: int,
                  metric: str, precision: str, engine: str, tile_size: int,
                  mesh=None, screen_precision: str = "auto",
                  colmajor: bool = False, with_diagnostics: bool = False):
    """One sharded streaming step: fold an mp-sharded base batch into the
    dp-sharded running top-k. `offset` (global row id of batch row 0) and
    `n_valid` (real rows in the padded batch) are traced scalars so every
    batch reuses one compiled program.

    `colmajor`: the batch arrives TRANSPOSED, (d, rows), sharded over its
    row axis (axis 1) — the host streams column-major buffers (weak-host
    rule: no host-side transposes) and each chip relayouts only its own
    shard on device."""
    from neighborhoodwatch_tpu.ops import screen_kernel
    from neighborhoodwatch_tpu.ops.knn import (
        _knn_scan, _knn_full, screened_knn_traced,
    )

    mp = mesh.shape[MP_AXIS]
    shard_rows = (batch.shape[1] if colmajor else batch.shape[0]) // mp

    def _shard_fn(run_d, run_i, q_local, b_local, offset, n_valid):
        if colmajor:
            b_local = jnp.transpose(b_local)   # per-shard on-device relayout
        my_shard = jax.lax.axis_index(MP_AXIS)
        shard_off = offset + my_shard * shard_rows
        local_valid = jnp.clip(n_valid - my_shard * shard_rows,
                               0, shard_rows)
        diag = jnp.zeros((3,), jnp.int32)
        if engine == "screened" and shard_rows >= screen_kernel.MEGA:
            # the flagship Pallas kernel, fully traced (in-trace certificate
            # repair) — BASELINE config 5 runs with the headline engine
            out = screened_knn_traced(q_local, b_local, local_valid,
                                      shard_off, min(k, shard_rows), metric,
                                      screen_precision=screen_precision,
                                      with_diagnostics=with_diagnostics)
            if with_diagnostics:
                d, i, diag = out
            else:
                d, i = out
        elif shard_rows > tile_size:
            d, i = _knn_scan(q_local, b_local, local_valid, shard_off,
                             min(k, shard_rows), metric, precision,
                             tile_size, _small_shard_engine(engine))
        else:
            d, i = _knn_full(q_local, b_local, local_valid, shard_off,
                             min(k, shard_rows), metric, precision,
                             _small_shard_engine(engine))
        all_d = jax.lax.all_gather(d, MP_AXIS)   # (mp, q_local, <=k)
        all_i = jax.lax.all_gather(i, MP_AXIS)
        md, mi = merge_topk_many(all_d, all_i, min(k, mp * d.shape[1]))
        out = merge_topk(run_d, run_i, md, mi, k)
        if with_diagnostics:
            # WORST shard's counts, replicated (the adaptive tier
            # controller's per-batch signal): a sum diluted one hot
            # shard's repair pressure by the shard count, so localized
            # clustering could never trip the escalation thresholds
            # (r4 review) — budgets are per-shard quantities, so the max
            # compares apples to apples
            diag = jax.lax.pmax(jax.lax.pmax(diag, MP_AXIS), DP_AXIS)
            return out[0], out[1], diag
        return out

    batch_spec = P(None, MP_AXIS) if colmajor else P(MP_AXIS, None)
    out_specs = (P(DP_AXIS, None), P(DP_AXIS, None))
    if with_diagnostics:
        out_specs = out_specs + (P(),)
    return shard_map(
        _shard_fn, mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(DP_AXIS, None),
                  P(DP_AXIS, None), batch_spec, P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )(run_d, run_i, query, batch, offset, n_valid)


class ShardedStreamingKNN:
    """Running top-k over host-streamed base batches, sharded over a mesh.

    The multi-chip generalization of ops.knn.StreamingKNN and the engine
    of BASELINE.md config 5 (100M-row corpora): each streamed batch is
    row-sharded over the "mp" mesh axis (so per-chip HBM only holds
    batch/mp rows), every chip folds its shard with exact global indices,
    and the per-shard top-k lists merge over ICI with `all_gather` — the
    (Q/dp, k) payload is tiny next to the shard compute. Queries and the
    running (dist, idx) state stay dp-sharded on device across batches.
    """

    def __init__(self, query, k: int, mesh, metric: str = "sqeuclidean",
                 precision: str = "highest", tile_size: int = 8192,
                 engine: str = "auto", screen_precision: str = "auto"):
        from jax.sharding import NamedSharding

        self.mesh = mesh
        self.k = k
        self.metric = metric
        self.precision = precision
        self.tile_size = tile_size
        self.engine = _trace_safe_engine(engine)
        self.screen_precision = screen_precision
        self.dp = mesh.shape[DP_AXIS]
        self.mp = mesh.shape[MP_AXIS]
        # adaptive screen-tier controller (screen_precision == "auto"):
        # same ladder/escalation/de-escalation as ops.knn.StreamingKNN,
        # with the diag pmax'd across shards
        from neighborhoodwatch_tpu.ops.knn import ScreenTierController
        self._ctrl = ScreenTierController()
        self._pending_diag = None     # (diag, tier_idx, q_rows, shard_rows)

        qsh = NamedSharding(mesh, P(DP_AXIS, None))
        # zero query pad rows produce junk result rows sliced off in
        # finalize; host-side numpy keeps multi-GB sets off the default
        # device before the sharded placement
        query = np.asarray(query, dtype=np.float32)
        self._q_rows = query.shape[0]
        pad = (-self._q_rows) % self.dp
        if pad:
            query = np.pad(query, ((0, pad), (0, 0)))
        q = query.shape[0]
        if jax.process_count() > 1:
            # every process passes the SAME full query set; each ships
            # only its dp slice
            lo, hi = process_slice(qsh, query.shape, 0)
            self.query = jax.make_array_from_process_local_data(
                qsh, query[lo:hi], query.shape)
            rows = hi - lo
            self.state = (
                jax.make_array_from_process_local_data(
                    qsh, np.full((rows, k), np.inf, dtype=np.float32), (q, k)),
                jax.make_array_from_process_local_data(
                    qsh, np.zeros((rows, k), dtype=np.int32), (q, k)),
            )
        else:
            self.query = jax.device_put(query, qsh)
            self.state = (
                jax.device_put(jnp.full((q, k), jnp.inf, dtype=jnp.float32),
                               qsh),
                jax.device_put(jnp.zeros((q, k), dtype=jnp.int32), qsh),
            )
        self._seen = 0
        self._batch_rows = None

    def update(self, base_batch, offset: int | None = None,
               global_rows: int | None = None) -> None:
        """Fold one base batch. Single-process: `base_batch` is the whole
        (rows, d) batch. On a mesh spanning processes, every process calls
        update with its OWN row-slice of the batch and `global_rows` = the
        batch's total real row count: pass the rows of
        `process_slice(base_sharding(mesh), (padded_rows, d), 0)` clipped
        to the real count (see `local_update_range`). A full global batch
        per process would need every host to decode every row — the
        single-host feed this generalizes (SURVEY.md §2 DCN row;
        cu_knn_ds.py:181-239 is the single-device analog)."""
        from jax.sharding import NamedSharding

        if offset is None:
            offset = self._seen
        assert offset == self._seen, \
            "batches must arrive in ascending contiguous offset order"
        multiproc = jax.process_count() > 1
        if multiproc:
            assert global_rows is not None, \
                ("on a multi-process mesh, update() takes this process's "
                 "row-slice plus global_rows (see local_update_range)")
        n = global_rows if global_rows is not None else base_batch.shape[0]
        if self._batch_rows is None or n > self._batch_rows:
            # pad batches to the widest seen so ragged tails (and trimmed
            # resume chunks) reuse the widest batch's compiled fold
            self._batch_rows = -(-n // self.mp) * self.mp
        pad = self._batch_rows - n
        bsh = NamedSharding(self.mesh, P(MP_AXIS, None))
        if multiproc and not isinstance(base_batch, jax.Array):
            base_batch = self._local_shard(
                np.asarray(base_batch, dtype=np.float32), bsh, 0, n)
        elif isinstance(base_batch, jax.Array):
            # already on device (device-fed benches/tests): jnp ops are fine
            base_batch = jnp.asarray(base_batch, dtype=jnp.float32)
            if pad:
                base_batch = jnp.pad(base_batch, ((0, pad), (0, 0)))
            base_batch = jax.device_put(base_batch, bsh)
        else:
            # host batch (the streaming pipeline): pad on the HOST and ship
            # the numpy array straight to the MP sharding — jnp.asarray +
            # jnp.pad first materialized the batch (twice) on the default
            # device, an ~2x-batch HBM spike on chip 0 that defeats the
            # "per-chip HBM only holds batch/mp rows" contract (r3 review)
            base_batch = np.asarray(base_batch, dtype=np.float32)
            if pad:
                base_batch = np.pad(base_batch, ((0, pad), (0, 0)))
            base_batch = jax.device_put(base_batch, bsh)
        self._fold(base_batch, offset, n)
        self._seen += n

    def _local_shard(self, batch, bsh, axis: int, n: int):
        """Place this process's slice of a host batch into the global
        mp-sharded array (shared by update/update_colmajor): checks the
        slice covers exactly this process's range of the real rows, pads
        the process-local tail, and builds the global array from local
        data."""
        shape = list(batch.shape)
        shape[axis] = self._batch_rows
        lo, hi = process_slice(bsh, tuple(shape), axis)
        expect = max(0, min(hi, n) - min(lo, n))
        assert batch.shape[axis] == expect, \
            (f"process-local batch has {batch.shape[axis]} rows on axis "
             f"{axis}; this process owns [{lo}, {hi}) of the {n}-row batch "
             f"(padded to {self._batch_rows}) -> expected {expect}")
        if batch.shape[axis] < hi - lo:      # tail pad, process-local
            width = [(0, 0)] * batch.ndim
            width[axis] = (0, hi - lo - batch.shape[axis])
            batch = np.pad(batch, width)
        return jax.make_array_from_process_local_data(bsh, batch,
                                                      tuple(shape))

    def _fold(self, batch, offset: int, n: int,
              colmajor: bool = False) -> None:
        """Dispatch one fold at the controller-chosen screen tier and keep
        the repair diagnostics pending for the next call's harvest (the
        adaptive escalation of ops.knn.StreamingKNN, diag pmax'd over the
        mesh — diagnostics are only requested when the screened kernel
        actually engages, so exact/verified folds stay diagnostics-free
        and fully async)."""
        from neighborhoodwatch_tpu.ops import screen_kernel
        from neighborhoodwatch_tpu.ops.knn import SCREEN_TIER_AUTO_LADDER

        shard_rows = self._batch_rows // self.mp
        # self.engine is already resolved (_trace_safe_engine in __init__)
        adaptive = (self.screen_precision == "auto"
                    and self.engine == "screened"
                    and shard_rows >= screen_kernel.MEGA)
        used_tier = self._ctrl.tier_idx
        tier = (SCREEN_TIER_AUTO_LADDER[used_tier]
                if self.screen_precision == "auto"
                else self.screen_precision)
        run_d, run_i = self.state
        out = _sharded_fold(
            run_d, run_i, self.query, batch,
            jnp.int32(offset), jnp.int32(n), self.k, self.metric,
            self.precision, self.engine, self.tile_size, self.mesh,
            tier, colmajor=colmajor, with_diagnostics=adaptive)
        if adaptive:
            self.state = (out[0], out[1])
            new_diag = (out[2], used_tier,
                        self.state[0].shape[0] // self.dp, shard_rows)
        else:
            self.state = out
            new_diag = None
        # harvest the PREVIOUS batch's diagnostics AFTER dispatching this
        # one: the np read blocks until batch b-1 completes, and doing it
        # before the dispatch serialized b's transfer behind b-1's compute
        # (r4 review — tier moves now lag one extra batch, a fine trade)
        if adaptive and self._pending_diag is not None:
            diag, t_idx, q_loc, sh_rows = self._pending_diag
            self._ctrl.observe(np.asarray(diag), t_idx, q_loc, sh_rows,
                               self.k)
        self._pending_diag = new_diag

    @property
    def _tier_idx(self) -> int:
        """Current ladder level (bench/test observability)."""
        return self._ctrl.tier_idx

    def local_update_range(self, n_rows: int, colmajor: bool = False):
        """[start, stop) of the NEXT `n_rows`-row batch this process must
        supply to update()/update_colmajor() on a multi-process mesh,
        clipped to the real rows (stop <= n_rows; an all-pad range is
        empty). Single-process: the whole batch."""
        from jax.sharding import NamedSharding
        if jax.process_count() == 1:
            return 0, n_rows
        rows = self._batch_rows
        if rows is None or n_rows > rows:
            rows = -(-n_rows // self.mp) * self.mp
        if colmajor:
            sh = NamedSharding(self.mesh, P(None, MP_AXIS))
            lo, hi = process_slice(sh, (1, rows), 1)
        else:
            sh = NamedSharding(self.mesh, P(MP_AXIS, None))
            lo, hi = process_slice(sh, (rows, 1), 0)
        return min(lo, n_rows), min(hi, n_rows)

    def update_colmajor(self, batch_t, offset: int | None = None,
                        global_rows: int | None = None) -> None:
        """Fold a host COLUMN-MAJOR (d, rows) batch: ships each chip only
        its row shard (sharded over axis 1) and relayouts on device inside
        the fold — the mesh feed for the streaming pipeline's col-major
        host buffers. Routing them through update() required a host or
        default-device transpose: the former violates the weak-host rule,
        the latter materialized the whole batch (twice) on chip 0
        (r3 review). On a mesh spanning processes, pass this process's
        COLUMN-slice plus `global_rows` (same contract as update())."""
        from jax.sharding import NamedSharding

        if offset is None:
            offset = self._seen
        assert offset == self._seen, \
            "batches must arrive in ascending contiguous offset order"
        multiproc = jax.process_count() > 1
        if multiproc:
            assert global_rows is not None, \
                ("on a multi-process mesh, update_colmajor() takes this "
                 "process's column-slice plus global_rows "
                 "(see local_update_range)")
        n = global_rows if global_rows is not None else batch_t.shape[1]
        if self._batch_rows is None or n > self._batch_rows:
            self._batch_rows = -(-n // self.mp) * self.mp
        bsh = NamedSharding(self.mesh, P(None, MP_AXIS))
        batch_t = np.asarray(batch_t, dtype=np.float32)
        if multiproc:
            batch_t = self._local_shard(batch_t, bsh, 1, n)
        else:
            pad = self._batch_rows - n
            if pad:
                batch_t = np.pad(batch_t, ((0, 0), (0, pad)))
            batch_t = jax.device_put(batch_t, bsh)
        self._fold(batch_t, offset, n, colmajor=True)
        self._seen += n

    @property
    def rows_seen(self) -> int:
        return self._seen

    def force_state(self, state) -> None:
        """Backpressure sync: fetch one 4-byte element from every distinct
        locally-addressable shard of `state` (covers every dp group — a
        single [0, 0] probe only proved group 0's chain, r3 review — and
        works when the mesh spans processes, where whole-array indexing
        of the non-addressable state raises)."""
        _force_distinct_shards(state[0])

    def state_arrays(self):
        """(dist, idx, seen) as host arrays — the streaming checkpoint
        (padded query rows included so restore round-trips exactly). On a
        multi-process mesh the dp-sharded state is allgathered so every
        process returns the FULL arrays (each host can then decide to
        write the checkpoint file; compute_knn_ds writes on process 0)."""
        if jax.process_count() > 1 and not self.state[0].is_fully_addressable:
            from jax.experimental import multihost_utils
            return (np.asarray(
                        multihost_utils.process_allgather(self.state[0],
                                                          tiled=True)),
                    np.asarray(
                        multihost_utils.process_allgather(self.state[1],
                                                          tiled=True)),
                    self._seen)
        return np.asarray(self.state[0]), np.asarray(self.state[1]), self._seen

    def restore(self, dist, idx, seen: int) -> None:
        from jax.sharding import NamedSharding
        # the state includes dp-padded query rows: a checkpoint from a
        # different mesh/pad shape must fail HERE, not inside shard_map
        # with an opaque XLA shape error (r3 review)
        expect = self.state[0].shape
        assert dist.shape == expect and idx.shape == expect, \
            (dist.shape, expect)
        qsh = NamedSharding(self.mesh, P(DP_AXIS, None))
        if jax.process_count() > 1:
            # every process holds the full checkpoint arrays (the
            # state_arrays contract above); each supplies its dp slice
            lo, hi = process_slice(qsh, expect, 0)
            self.state = (
                jax.make_array_from_process_local_data(
                    qsh, np.asarray(dist[lo:hi], dtype=np.float32), expect),
                jax.make_array_from_process_local_data(
                    qsh, np.asarray(idx[lo:hi], dtype=np.int32), expect),
            )
        else:
            self.state = (
                jax.device_put(jnp.asarray(dist, dtype=jnp.float32), qsh),
                jax.device_put(jnp.asarray(idx, dtype=jnp.int32), qsh),
            )
        self._seen = int(seen)

    def finalize(self):
        """(distances, indices) as numpy, original query rows only (full
        arrays on every process when the mesh spans hosts)."""
        assert self._seen >= self.k, \
            f"saw only {self._seen} base rows but k={self.k}"
        dist, idx, _ = self.state_arrays()
        return dist[: self._q_rows], idx[: self._q_rows]


@partial(jax.jit, static_argnames=("k", "metric", "precision", "mesh"))
def _ring_knn_jit(query, base, n_valid, k: int, metric: str, precision: str,
                  mesh=None):
    mp = mesh.shape[MP_AXIS]
    shard_rows = base.shape[0] // mp

    def _shard_fn(q_local, b_local, n_valid):
        my_id = jax.lax.axis_index(MP_AXIS)
        perm = [(i, (i + 1) % mp) for i in range(mp)]

        def fold(carry, step):
            run_d, run_i, shard = carry
            # rotate FIRST (communication overlaps this step's compute
            # under XLA async collectives), compute against the shard we
            # held entering the step. Rotating after the fold wasted a
            # whole shard-sized ICI transfer on the last step — mp
            # rotations where mp-1 suffice (r3 review; collectives in a
            # scan body are not DCE'd).
            nxt = jax.lax.ppermute(shard, MP_AXIS, perm)
            # shard held at step s originated at (my_id - s) % mp
            src = jnp.mod(my_id - step, mp)
            offset = src * shard_rows
            d = pairwise_distance(q_local, shard, metric=metric,
                                  precision=precision)
            # mask pad rows (beyond n_valid): a zero pad row's distance is
            # ||q||^2 and would beat true neighbors (r3 review)
            col_valid = jnp.arange(shard_rows) + offset < n_valid
            d = jnp.where(col_valid[None, :], d, jnp.inf)
            td, ti = smallest_k(d, k)
            # lexicographic (distance, index) merge: order-independent, so
            # every chip keeps the same canonical tied set (see docstring)
            cd = jnp.concatenate([run_d, td], axis=1)
            ci = jnp.concatenate(
                [run_i, (ti + offset).astype(jnp.int32)], axis=1)
            sd, si = jax.lax.sort((cd, ci), dimension=1, num_keys=2)
            return (sd[:, :k], si[:, :k], nxt), None

        def fold_last(carry):
            run_d, run_i, shard = carry
            src = jnp.mod(my_id - (mp - 1), mp)
            offset = src * shard_rows
            d = pairwise_distance(q_local, shard, metric=metric,
                                  precision=precision)
            col_valid = jnp.arange(shard_rows) + offset < n_valid
            d = jnp.where(col_valid[None, :], d, jnp.inf)
            td, ti = smallest_k(d, k)
            cd = jnp.concatenate([run_d, td], axis=1)
            ci = jnp.concatenate(
                [run_i, (ti + offset).astype(jnp.int32)], axis=1)
            sd, si = jax.lax.sort((cd, ci), dimension=1, num_keys=2)
            return sd[:, :k], si[:, :k]

        q_rows = q_local.shape[0]
        init = (jnp.full((q_rows, k), jnp.inf, dtype=jnp.float32),
                jnp.zeros((q_rows, k), dtype=jnp.int32),
                b_local)
        if mp > 1:
            init, _ = jax.lax.scan(fold, init,
                                   jnp.arange(mp - 1, dtype=jnp.int32))
        return fold_last(init)

    return shard_map(
        _shard_fn, mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(MP_AXIS, None), P()),
        out_specs=(P(DP_AXIS, None), P(DP_AXIS, None)),
        check_vma=False,
    )(query, base, n_valid)


def ring_knn(query, base, k: int, mesh, metric: str = "sqeuclidean",
             precision: str = "highest", n_valid: int | None = None):
    """Ring-rotation variant: each chip starts with its own base shard and
    passes it around the "mp" ring with ppermute, folding each visiting
    shard into a running top-k. Communication (shard-sized) overlaps the
    next shard's distance computation under XLA's async collectives; the
    held shard folds BEFORE its replacement is needed, and the final step
    skips the rotation entirely (mp-1 transfers, not mp).

    Pad the base to mp-divisibility if needed and pass `n_valid` = the
    real row count — pad rows are masked at the distance level.

    Exactness and tie-order match `sharded_knn`: every fold merges
    lexicographically on (distance, global index) — a distance-only merge
    drops tied lower-index candidates at the k boundary on chips that
    visit later-offset shards first, and no FINAL re-sort can restore
    them (r3 review, confirmed on duplicated rows: the result both
    violated the lowest-index contract and differed per chip while
    declared replicated)."""
    query = jnp.asarray(query, dtype=jnp.float32)
    base = jnp.asarray(base, dtype=jnp.float32)
    mp = mesh.shape[MP_AXIS]
    dp = mesh.shape[DP_AXIS]
    n_base = base.shape[0]
    if n_valid is None:
        n_valid = n_base
    assert 0 < n_valid <= n_base
    assert query.shape[0] % dp == 0 and n_base % mp == 0
    shard_rows = n_base // mp
    assert k <= shard_rows and k <= n_valid

    return _ring_knn_jit(query, base, jnp.int32(n_valid), k, metric,
                         precision, mesh)
