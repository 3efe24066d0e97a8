#!/usr/bin/env bash
# Bootstrap neighborhoodwatch-tpu on a fresh Cloud TPU VM (v5e/v5p/v6e).
#
# The TPU analog of the reference's bare-metal installer
# (bash/install_baremetal_env.sh:18-44, which installs CUDA/cuDNN/NCCL):
# a TPU VM already carries the accelerator driver, so setup is only a
# pinned Python env + this package + optional HF checkpoint priming.
#
# Usage:  bash scripts/install_tpu_vm.sh [--prime-hf-cache]
set -euo pipefail

PRIME=0
[[ "${1:-}" == "--prime-hf-cache" ]] && PRIME=1

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
VENV="${NW_TPU_VENV:-$HOME/.nw-tpu-venv}"

JAX_VERSION=0.9.0
FLAX_VERSION=0.12.3
TRANSFORMERS_VERSION=4.57.6

echo "== python venv: $VENV"
python3 -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --upgrade pip -q

echo "== pinned jax[tpu] stack"
pip install -q \
    "jax[tpu]==${JAX_VERSION}" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    "flax==${FLAX_VERSION}" \
    "transformers==${TRANSFORMERS_VERSION}" \
    numpy pandas pyarrow h5py datasets requests pytest
# torch (CPU) reads the pretrained checkpoints for the torch->Flax
# conversion; without it the encoders fall back to random init
pip install -q torch --index-url https://download.pytorch.org/whl/cpu

echo "== install neighborhoodwatch-tpu + native IO engine"
pip install -q "$REPO_DIR"
python -m neighborhoodwatch_tpu.native.build

if [[ "$PRIME" == "1" ]]; then
    echo "== priming HF cache (e5 + colbertv2.0 checkpoints)"
    python - <<'EOF'
from huggingface_hub import snapshot_download
for repo in ("intfloat/e5-small-v2", "intfloat/e5-base-v2",
             "intfloat/e5-large-v2", "colbert-ir/colbertv2.0"):
    print(" ->", repo)
    snapshot_download(repo)
EOF
fi

echo "== smoke: TPU visibility"
python -c 'import jax; ds = jax.devices(); print(ds); assert ds[0].platform == "tpu", "no TPU visible - check the VM runtime"'

echo "== smoke: hermetic test suite (CPU, 8 virtual devices)"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest "$REPO_DIR/tests" -q -x

echo
echo "Done. Activate with:  source $VENV/bin/activate"
echo "Then e.g.:            nw 1000 10000 -k 100 -m intfloat/e5-small-v2 --synthetic --yes"
