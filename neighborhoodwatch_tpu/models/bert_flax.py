"""Flax BERT-family encoder running on TPU.

TPU-native replacement for the reference's torch-CUDA embedding inference:
e5 models are plain BERT encoders + mean pooling + L2 normalization served
via SentenceTransformer (reference: model_generator.py:273-287), and
ColBERT is BERT + a 128-d per-token linear head (model_generator.py:392-439).
Here both run as one Flax module, jit-compiled per (batch, seq) bucket with
static shapes, bf16 matmuls on the MXU with fp32 layernorm/softmax.

Weights load from a locally cached HuggingFace torch checkpoint when
available (zero-egress environments fall back to deterministic random
init — useful for pipeline testing, not for real ground truth).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "bfloat16"  # activation/matmul dtype; params stay fp32
    # "auto"/"xla": the einsum+softmax path — measured FASTER than the
    # fused Pallas flash kernel at EVERY encoder shape on v5e, including
    # long sequences (scripts/encoder_probe.py, r4: e5-large seq 1024 =
    # 106 vs 41 TFLOP/s, seq 512 = 123 vs 62; e5-base seq 1024 = 94 vs
    # 34). At BERT sizes the (B, H, T, T) logits tensor tiles fine
    # through XLA's fusions and the flash kernel's segment-id masking
    # overhead dominates; the hypothesized >512-token flash advantage is
    # retired by measurement. "flash" remains an explicit experiment
    # knob only.
    attention_impl: str = "auto"
    # GELU flavor: "auto" resolves to the tanh approximation under bf16
    # activations and to exact erf-GELU under fp32. Measured on v5e
    # (512x256 batches): tanh+bf16-logits lifts e5-base 0.562 -> 0.743
    # Mtok/s (+32%), e5-small 1.054 -> 1.377, e5-large 0.187 -> 0.228,
    # while the end-to-end embedding drift (max|d| 4.7e-4, mean cosine
    # 0.999997) sits below the bf16-activation noise floor — the
    # approximation is only enabled where its error is already dominated
    # by the activation dtype. fp32 stays bit-faithful to torch's
    # erf-GELU (tests/test_torch_parity.py).
    gelu: str = "auto"  # "auto" | "exact" | "tanh"


E5_CONFIGS = {
    "intfloat/e5-small-v2": BertConfig(hidden_size=384, num_layers=12,
                                       num_heads=12, intermediate_size=1536),
    "intfloat/e5-base-v2": BertConfig(hidden_size=768, num_layers=12,
                                      num_heads=12, intermediate_size=3072),
    "intfloat/e5-large-v2": BertConfig(hidden_size=1024, num_layers=24,
                                       num_heads=16, intermediate_size=4096),
}

COLBERT_BASE_CONFIG = BertConfig()  # bert-base-uncased backbone


def _gelu_approximate(cfg: BertConfig) -> bool:
    """Resolve the config's GELU flavor (see BertConfig.gelu)."""
    if cfg.gelu == "auto":
        return jnp.dtype(cfg.dtype) == jnp.bfloat16
    return cfg.gelu == "tanh"


def _use_flash(cfg: BertConfig, seq: int) -> bool:
    """Fused attention is a pure perf choice (same math, logits in fp32
    inside the kernel) and an explicit opt-in (`attention_impl="flash"`):
    measured on v5e the XLA path wins at every supported e5 shape (see
    BertConfig), so "auto" resolves to XLA. Requires TPU backend, a
    128-multiple sequence length, and a lane-aligned head dim."""
    if cfg.attention_impl != "flash":
        return False
    head_dim = cfg.hidden_size // cfg.num_heads
    return (jax.default_backend() == "tpu" and seq % 128 == 0
            and head_dim % 64 == 0)


class BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        head_dim = cfg.hidden_size // cfg.num_heads
        dense = partial(nn.DenseGeneral, features=(cfg.num_heads, head_dim),
                        axis=-1, dtype=dtype)
        q = dense(name="query")(hidden)
        k = dense(name="key")(hidden)
        v = dense(name="value")(hidden)
        if _use_flash(cfg, hidden.shape[1]):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention,
            )
            # padding tokens get segment 0, valid tokens segment 1: valid
            # queries never attend across; padding rows' outputs are
            # discarded by the pooling mask downstream
            seg = mask.astype(jnp.int32)
            ctx = flash_attention(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=float(1.0 / np.sqrt(head_dim)))
            ctx = jnp.swapaxes(ctx, 1, 2).astype(dtype)    # (B, T, H, D)
        else:
            # (B, H, T, T) logits in fp32 for a stable softmax
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits / np.sqrt(head_dim)
            logits = jnp.where(mask[:, None, None, :], logits, -1e9)
            if dtype == jnp.bfloat16:
                # store the materialized (B, H, T, T) tensor bf16 (halves
                # its HBM traffic; bf16 keeps fp32's exponent range so the
                # -1e9 mask survives) and upcast for a stable softmax —
                # measured e5-base 0.706 -> 0.743 Mtok/s on top of tanh
                # GELU, embedding drift within the bf16 noise floor
                logits = logits.astype(dtype)
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = nn.DenseGeneral(features=cfg.hidden_size, axis=(-2, -1),
                              dtype=dtype, name="out")(ctx)
        return out


class BertLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, hidden, mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        attn = BertSelfAttention(cfg, name="attention")(hidden, mask)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="attention_ln")(hidden + attn)
        hidden = hidden.astype(dtype)
        mlp = nn.Dense(cfg.intermediate_size, dtype=dtype, name="intermediate")(hidden)
        mlp = nn.gelu(mlp, approximate=_gelu_approximate(cfg))
        mlp = nn.Dense(cfg.hidden_size, dtype=dtype, name="output")(mlp)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="output_ln")(hidden + mlp)
        return hidden.astype(dtype)


class BertEncoder(nn.Module):
    """Token ids -> last hidden states (B, T, H)."""
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        emb = (nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings",
                        dtype=jnp.float32)(input_ids)
               + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                          name="position_embeddings", dtype=jnp.float32)(pos_ids)
               + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                          name="token_type_embeddings", dtype=jnp.float32)(
                   jnp.zeros_like(input_ids)))
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                              name="embeddings_ln")(emb).astype(dtype)
        mask = attention_mask.astype(bool)
        for i in range(cfg.num_layers):
            hidden = BertLayer(cfg, name=f"layer_{i}")(hidden, mask)
        return hidden.astype(jnp.float32)


def mean_pool_normalize(hidden, attention_mask):
    """Masked mean pooling + L2 normalization — the e5 embedding head
    (what SentenceTransformer's `normalize_embeddings=True` encode does,
    reference: model_generator.py:285-287)."""
    mask = attention_mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * mask, axis=1)
    counts = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    pooled = summed / counts
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.where(norm == 0, 1.0, norm)


def init_params(config: BertConfig, seed: int = 0, seq_len: int = 16):
    model = BertEncoder(config)
    dummy = jnp.zeros((1, seq_len), dtype=jnp.int32)
    return model.init(jax.random.PRNGKey(seed), dummy, jnp.ones_like(dummy))


# --------------------------------------------------------------------------
# HuggingFace torch checkpoint -> Flax param conversion (local cache only)
# --------------------------------------------------------------------------

def load_hf_weights(model_name: str, config: BertConfig):
    """Convert a locally cached HF torch BERT checkpoint to this module's
    param tree. Returns None when no local checkpoint is available
    (zero-egress environment)."""
    import os
    os.environ.setdefault("HF_HUB_OFFLINE", "0")
    try:
        from transformers import AutoModel
        from transformers.utils import hub as _hub
        if not _hub.try_to_load_from_cache(model_name, "config.json"):
            raise FileNotFoundError(f"{model_name} not in local HF cache")
        hf = AutoModel.from_pretrained(model_name, local_files_only=True)
    except Exception as e:
        print(f"   [warn] no local checkpoint for {model_name} ({e}); "
              f"falling back to random init")
        return None
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return convert_torch_state_dict(sd, config)


def convert_torch_state_dict(sd: dict, config: BertConfig, prefix: str = ""):
    """Pure torch-BERT state_dict -> BertEncoder param-tree conversion.

    `sd` maps HF BERT key names (``embeddings.word_embeddings.weight``,
    ``encoder.layer.{i}.attention.self.query.weight``, ...) to numpy arrays.
    `prefix` strips a leading scope (ColBERT checkpoints nest the backbone
    under ``bert.``). Numerical parity with torch is asserted by
    tests/test_torch_parity.py against a live torch BertModel.
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    h, nh = config.hidden_size, config.num_heads
    hd = h // nh

    def attn_in(prefix):  # (h, h) -> (h, nh, hd)
        return {"kernel": sd[f"{prefix}.weight"].T.reshape(h, nh, hd),
                "bias": sd[f"{prefix}.bias"].reshape(nh, hd)}

    params = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(config.num_layers):
        b = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": attn_in(f"{b}.attention.self.query"),
                "key": attn_in(f"{b}.attention.self.key"),
                "value": attn_in(f"{b}.attention.self.value"),
                "out": {"kernel": sd[f"{b}.attention.output.dense.weight"].T
                        .reshape(nh, hd, h),
                        "bias": sd[f"{b}.attention.output.dense.bias"]},
            },
            "attention_ln": ln(f"{b}.attention.output.LayerNorm"),
            "intermediate": lin(f"{b}.intermediate.dense"),
            "output": lin(f"{b}.output.dense"),
            "output_ln": ln(f"{b}.output.LayerNorm"),
        }
    return {"params": jax.tree.map(jnp.asarray, params)}
