"""Device-side top-k selection and (distance, index) list merging.

Replaces both the CUDA engines' select-k and the reference's CPU
argsort-based partial merge (reference: merge.py:73-101) with
`jax.lax.top_k` over concatenated candidate lists on device.

Tie-breaking: `lax.top_k` is stable in the input order, so concatenating
[running, new] with running entries originating from earlier (smaller) base
offsets reproduces the "lowest index wins" order of a stable CPU argsort.

Contract scope (r3 review): the canonical lowest-index tie-break holds for
the EXACT engine and every merge built from these primitives. The verified
and screened engines prove a true k-smallest multiset via tie-tolerant
count certificates — when more rows tie exactly at the k-th distance than
fit in k, WHICH tied subset they return is arbitrary (the guarantee
RAFT/cuVS give). fp32 distances make exact cross-row ties vanishingly rare
on real embeddings.
"""

from functools import partial

import jax
import jax.numpy as jnp


def smallest_k(distances, k: int):
    """Per-row k smallest values of a (Q, N) matrix -> ((Q, k) dist, (Q, k) idx).

    Implemented as lax.top_k on negated distances (top_k selects largest)."""
    neg_d, idx = jax.lax.top_k(-distances, k)
    return -neg_d, idx


@partial(jax.jit, static_argnames=("k",))
def merge_topk(dist_a, idx_a, dist_b, idx_b, k: int):
    """Merge two (Q, ka)/(Q, kb) candidate lists into the k best.

    On ties, entries from list `a` win (list `a` must hold the earlier /
    lower-index candidates for argsort-compatible ordering)."""
    cat_d = jnp.concatenate([dist_a, dist_b], axis=1)
    cat_i = jnp.concatenate([idx_a, idx_b], axis=1)
    d, sel = smallest_k(cat_d, k)
    return d, jnp.take_along_axis(cat_i, sel, axis=1)


@partial(jax.jit, static_argnames=("k",))
def merge_topk_many(dists, idxs, k: int):
    """Tree-merge F candidate lists: (F, Q, k) -> (Q, k).

    Lists must be ordered by ascending base offset for tie stability."""
    f = dists.shape[0]
    q = dists.shape[1]
    cat_d = jnp.transpose(dists, (1, 0, 2)).reshape(q, -1)
    cat_i = jnp.transpose(idxs, (1, 0, 2)).reshape(q, -1)
    # transpose+reshape keeps per-row candidates grouped by source list in
    # ascending order, preserving lowest-index-wins tie-breaks
    d, sel = smallest_k(cat_d, k)
    return d, jnp.take_along_axis(cat_i, sel, axis=1)


def sort_topk(dist, idx):
    """Ensure a (Q, k) candidate list is sorted ascending by distance
    (stable on ties by list position)."""
    order = jnp.argsort(dist, axis=1, stable=True)
    return (jnp.take_along_axis(dist, order, axis=1),
            jnp.take_along_axis(idx, order, axis=1))


def check_monotonic(dist) -> bool:
    """Host-side monotonic nondecreasing assertion used after merges
    (reference: merge.py:104, parquet_to_format.py:419-421)."""
    import numpy as np
    dist = np.asarray(dist)
    return bool(np.all(np.diff(dist, axis=1) >= -1e-6))
