"""Exact brute-force k-nearest-neighbor engine (TPU-native).

Replaces `pylibraft.neighbors.brute_force.knn` / `cuvs.neighbors.brute_force`
/ the torch matmul+topk engine (reference: cu_knn.py:240-262) with a single
JAX design:

- the distance computation is one large MXU matmul per base tile with fp32
  accumulation (see ops/distance.py);
- per-tile top-k candidates are selected on device and merged into a running
  (distance, index) accumulator carried through `jax.lax.scan` — no
  data-dependent shapes, everything compiles to one XLA program;
- base tiles are streamed, so the full (Q, B) distance matrix never
  materializes in HBM: peak memory is O(Q*tile + Q*k).

The same running-top-k update is reused by the multi-chip path
(parallel/sharded_knn.py) and by the streaming pipeline (core/pipeline.py).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.ops.distance import pairwise_distance
from neighborhoodwatch_tpu.ops.topk import smallest_k, merge_topk
from neighborhoodwatch_tpu.utils.misc import round_up

DEFAULT_TILE = 8192


def _pad_rows(x: np.ndarray | jax.Array, multiple: int):
    n = x.shape[0]
    padded = round_up(max(n, 1), multiple)
    if padded == n:
        return x, n
    pad = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), n


@partial(jax.jit, static_argnames=("k", "metric", "precision", "tile_size"))
def _knn_scan(query, base_padded, n_valid, base_offset, k: int, metric: str,
              precision: str, tile_size: int):
    """Scan base tiles, carrying a running top-k. `n_valid` masks padding
    rows; `base_offset` maps tile-local to global base indices
    (reference: cu_knn.py:273)."""
    q_count = query.shape[0]
    n_tiles = base_padded.shape[0] // tile_size
    tiles = base_padded.reshape(n_tiles, tile_size, base_padded.shape[1])
    k_tile = min(k, tile_size)
    local_idx = jnp.arange(tile_size, dtype=jnp.int32)

    init = (jnp.full((q_count, k), jnp.inf, dtype=jnp.float32),
            jnp.zeros((q_count, k), dtype=jnp.int32))

    def step(carry, xs):
        run_d, run_i = carry
        tile, tile_start = xs
        d = pairwise_distance(query, tile, metric=metric, precision=precision)
        valid = (tile_start + local_idx) < n_valid
        d = jnp.where(valid[None, :], d, jnp.inf)
        td, ti = smallest_k(d, k_tile)
        ti = ti + tile_start + base_offset
        return merge_topk(run_d, run_i, td, ti.astype(jnp.int32), k), None

    tile_starts = jnp.arange(n_tiles, dtype=jnp.int32) * tile_size
    (dist, idx), _ = jax.lax.scan(step, init, (tiles, tile_starts))
    return dist, idx


@partial(jax.jit, static_argnames=("k", "metric", "precision"))
def _knn_full(query, base, n_valid, base_offset, k: int, metric: str,
              precision: str):
    """Single-tile variant: full (Q, B) distance matrix + one top_k."""
    d = pairwise_distance(query, base, metric=metric, precision=precision)
    valid = jnp.arange(base.shape[0], dtype=jnp.int32) < n_valid
    d = jnp.where(valid[None, :], d, jnp.inf)
    dist, idx = smallest_k(d, k)
    return dist, (idx + base_offset).astype(jnp.int32)


def knn(query, base, k: int, metric: str = "sqeuclidean",
        precision: str = "highest", tile_size: int | None = None,
        base_offset: int = 0):
    """Exact k nearest neighbors of `query` rows among `base` rows.

    Returns (distances, indices) of shape (Q, k), distances ascending per
    row, indices global (tile-local + `base_offset`). Drop-in capability
    match for the reference's three engines (cu_knn.py:240-262)."""
    query = jnp.asarray(query, dtype=jnp.float32)
    base = jnp.asarray(base, dtype=jnp.float32)
    n_base = base.shape[0]
    assert k <= n_base, f"k={k} exceeds base row count {n_base} (reference cu_knn.py:237)"
    assert query.shape[1] == base.shape[1], \
        f"dimension mismatch: query {query.shape[1]} vs base {base.shape[1]}"

    if tile_size is None:
        tile_size = DEFAULT_TILE
    if n_base <= tile_size:
        base_p, _ = _pad_rows(base, 128)
        return _knn_full(query, base_p, n_base, base_offset, k, metric, precision)
    base_p, _ = _pad_rows(base, tile_size)
    return _knn_scan(query, base_p, n_base, base_offset, k, metric, precision,
                     tile_size)


class StreamingKNN:
    """Running top-k accumulator over host-streamed base batches.

    TPU-native replacement for the reference's per-batch partial parquet
    files + CPU merge (cu_knn.py:193-289 + merge.py): batches are fed in
    ascending offset order, the (dist, idx) state lives on device, and no
    partial results ever hit the filesystem.
    """

    def __init__(self, query, k: int, metric: str = "sqeuclidean",
                 precision: str = "highest", tile_size: int = DEFAULT_TILE):
        self.query = jnp.asarray(query, dtype=jnp.float32)
        self.k = k
        self.metric = metric
        self.precision = precision
        self.tile_size = tile_size
        q = self.query.shape[0]
        self.state = (jnp.full((q, k), jnp.inf, dtype=jnp.float32),
                      jnp.zeros((q, k), dtype=jnp.int32))
        self._seen = 0

    def update(self, base_batch, offset: int | None = None) -> None:
        if offset is None:
            offset = self._seen
        assert offset == self._seen, \
            "batches must arrive in ascending contiguous offset order"
        n = base_batch.shape[0]
        d, i = knn(self.query, base_batch, k=min(self.k, n),
                   metric=self.metric, precision=self.precision,
                   tile_size=self.tile_size, base_offset=offset)
        self.state = merge_topk(self.state[0], self.state[1], d, i, self.k)
        self._seen += n

    def finalize(self):
        """Return (distances, indices) as numpy, ascending per row."""
        assert self._seen >= self.k, \
            f"saw only {self._seen} base rows but k={self.k}"
        dist, idx = self.state
        return np.asarray(dist), np.asarray(idx)
