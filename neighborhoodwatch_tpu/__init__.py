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

from neighborhoodwatch_tpu.ops.knn import knn, StreamingKNN  # noqa: F401
from neighborhoodwatch_tpu.ops.distance import pairwise_distance  # noqa: F401
