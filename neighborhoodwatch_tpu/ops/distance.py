"""Pairwise distance kernels (JAX/XLA, MXU-targeted).

TPU-native replacement for cuVS `pairwise_distance` and the distance cores of
`pylibraft.neighbors.brute_force.knn` (reference: cu_knn.py:243-262,
parquet_to_format.py:427-433). All metrics are expressed as a single large
matmul (MXU) plus cheap VPU epilogues that XLA fuses, with fp32 accumulation
(`preferred_element_type`) for exactness.

Distance conventions match the reference engines ("smaller is better"):

- ``sqeuclidean`` — squared L2, the raft brute-force default. On normalized
  vectors d == 2*(1-cos), which is the `1-sim == distance/2` relation the
  reference validator checks (parquet_to_format.py:373).
- ``euclidean``   — sqrt of the above.
- ``cosine``      — 1 - cos(q, b), the cuvs engine convention
  (cu_knn.py:247-248; validator parquet_to_format.py:417-425).
- ``dot``         — 1 - <q, b>, the torch engine convention (cu_knn.py:256).
"""

from functools import partial

import jax
import jax.numpy as jnp

METRICS = ("sqeuclidean", "euclidean", "cosine", "dot")

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,    # bf16 inputs on MXU — fastest
    "high": jax.lax.Precision.HIGH,          # bf16x3 — near-fp32
    "highest": jax.lax.Precision.HIGHEST,    # bf16x6 — full fp32 accuracy
}


def resolve_precision(precision):
    if isinstance(precision, str):
        return _PRECISIONS[precision]
    return precision


def _safe_normalize(x, axis=-1):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.where(norm == 0.0, 1.0, norm)


@partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise_distance(query, base, metric: str = "sqeuclidean",
                      precision: str = "highest"):
    """(Q, d) x (B, d) -> (Q, B) distance matrix."""
    prec = resolve_precision(precision)
    query = query.astype(jnp.float32)
    base = base.astype(jnp.float32)
    if metric == "cosine":
        query = _safe_normalize(query)
        base = _safe_normalize(base)
    dots = jax.lax.dot_general(
        query, base,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    if metric in ("sqeuclidean", "euclidean"):
        qn = jnp.sum(query * query, axis=1, keepdims=True)
        bn = jnp.sum(base * base, axis=1, keepdims=True)
        d = jnp.maximum(qn + bn.T - 2.0 * dots, 0.0)
        if metric == "euclidean":
            d = jnp.sqrt(d)
    elif metric in ("cosine", "dot"):
        d = 1.0 - dots
    else:
        raise ValueError(f"unknown metric {metric!r}; must be one of "
                         f"{METRICS}")
    # a non-finite distance is never meaningful: NaN (inf - inf in the l2
    # epilogue, inf/inf in cosine) WINS lax.top_k, and -inf (a +inf base
    # row under `dot`, where d = 1 - inf) would beat every real neighbor —
    # the NaN-only sanitize let that row win the exact/verified engines
    # while the screen kernel's isinf(bn) mask excluded it, so the engines
    # disagreed on the same corpus (r3 review). Sanitize all of them to
    # "infinitely far" so garbage rows lose in every engine.
    return jnp.where(jnp.isfinite(d), d, jnp.inf)


def similarity_from_distance(distance, metric: str):
    """Invert a distance back to dot/cosine similarity, where defined —
    used by the validators (reference: parquet_to_format.py:373,417)."""
    if metric == "sqeuclidean":
        return 1.0 - distance / 2.0  # valid for normalized vectors
    if metric in ("cosine", "dot"):
        return 1.0 - distance
    raise ValueError(f"no similarity inversion for metric {metric!r}")
