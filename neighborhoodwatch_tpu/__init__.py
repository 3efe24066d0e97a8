"""neighborhoodwatch_tpu — TPU-native exact-kNN ground-truth dataset generator.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
phact/neighborhoodwatch (CUDA/cuDF/RAFT): embed text corpora with a registry
of embedding models, run exact brute-force k-nearest-neighbor search of query
vectors against large base corpora on TPU, merge partial top-k results on
device, and export bit-compatible fvec/ivec/hdf5 ground-truth files for
downstream ANN benchmarks.

Layers (bottom-up):
- io/        bit-compatible binary/parquet/hdf5 formats + naming scheme
- ops/       exact kNN engines (XLA scan + Pallas fused kernel), distances,
             device top-k merge, ColBERT MaxSim
- parallel/  jax.sharding Mesh scale-out: base-sharded kNN with ICI
             allgather top-k merge
- core/      streaming pipeline, HBM tile auto-tuner
- models/    embedding model registry: local Flax encoders (e5 BERT,
             ColBERT) on TPU + remote API generators
- data/      source dataset pipeline (wikipedia/squad, sentencizer)
- cli        `nw` and `ck` entry points with reference flag parity
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persist XLA compilations across processes (first BERT compile costs
    tens of seconds; cached reruns are milliseconds). Override the location
    with NWTPU_COMPILATION_CACHE; set it empty to disable."""
    cache_dir = _os.environ.get("NWTPU_COMPILATION_CACHE",
                                _os.path.join(_os.path.dirname(__file__),
                                              "..", ".jax_cache"))
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

from neighborhoodwatch_tpu.ops.knn import knn, StreamingKNN  # noqa: F401
from neighborhoodwatch_tpu.ops.distance import pairwise_distance  # noqa: F401
