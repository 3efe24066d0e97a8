"""Encoder follow-up probe (VERDICT r4 item 8): e5-large %-of-peak
accounting and the flash-vs-XLA attention comparison at >512-token
sequences (the flash kernel's claimed advantage — substantiate or retire).
Random-init params (perf only).
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/encoder_probe.py"""

import time
from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from neighborhoodwatch_tpu.models.bert_flax import (
    E5_CONFIGS, BertEncoder, init_params,
)
from neighborhoodwatch_tpu.utils.bench_support import log, tunnel_gate

PEAK_BF16 = 197e12   # v5e
sync = jax.jit(jnp.sum)


def flops_per_token(cfg, seq):
    # per layer: QKVO 4h^2 + MLP 2*h*inter MACs; attention scores/probs
    # 2*seq*h MACs per token; x2 flops/MAC
    per_layer = (4 * cfg.hidden_size ** 2
                 + 2 * cfg.hidden_size * cfg.intermediate_size
                 + 2 * seq * cfg.hidden_size)
    return 2 * per_layer * cfg.num_layers


def bench(cfg, name, seq, tokens=131072, iters=3):
    batch = max(8, tokens // seq)
    model = BertEncoder(cfg)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 20000, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    fwd = jax.jit(lambda p, i, m: model.apply(p, i, m))
    try:
        out = fwd(params, ids, mask)
        _ = float(sync(out))
    except Exception as e:
        log(f"{name} seq={seq}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return
    tunnel_gate(sync, out, f"before {name} seq={seq}")
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fwd(params, ids, mask)
    out = fwd(params, ids, mask)
    _ = float(sync(out))
    dt = (time.perf_counter() - t0) / iters
    tok_s = batch * seq / dt
    tflops = tok_s * flops_per_token(cfg, seq) / 1e12
    log(f"{name} seq={seq} batch={batch}: {dt:.4f}s/call, "
        f"{tok_s / 1e6:.3f} Mtok/s, {tflops:.1f} TFLOP/s "
        f"({100 * tflops * 1e12 / PEAK_BF16:.0f}% bf16 peak)")


def main():
    large = E5_CONFIGS["intfloat/e5-large-v2"]
    for seq in (256, 512, 1024):
        bench(large, "e5-large XLA", seq)
        bench(replace(large, attention_impl="flash"), "e5-large FLASH", seq)
    base = E5_CONFIGS["intfloat/e5-base-v2"]
    for seq in (512, 1024):
        bench(base, "e5-base XLA", seq)
        bench(replace(base, attention_impl="flash"), "e5-base FLASH", seq)


if __name__ == "__main__":
    main()
