"""Embedding model registry: supported model names, dimension tables, and
the generator factory.

Capability parity with the reference registry (model_generator.py:26-153):
same 15 model names, same default/effective dimension rules (OpenAI v3
reduced dims, Voyage 256/512/1024/2048), same factory dispatch. Local
models (e5 family, ColBERT) are served by Flax/JAX encoders on TPU instead
of torch-CUDA SentenceTransformer/colbert-ai; remote API models are plain
HTTP clients.
"""

from enum import Enum


class EmbeddingModelName(Enum):
    OPENAI_ADA_002 = "text-embedding-ada-002"
    OPENAI_V3_SMALL = "text-embedding-3-small"
    OPENAI_V3_LARGE = "text-embedding-3-large"
    GOOGLE_TEXT_GECKO_003 = "textembedding-gecko@003"
    GOOGLE_TEXT_EMBEDDING_004 = "text-embedding-004"
    GOOGLE_TEXT_EMBEDDING_005 = "text-embedding-005"
    INTFLOAT_E5_LARGE_V2 = "intfloat/e5-large-v2"
    INTFLOAT_E5_BASE_V2 = "intfloat/e5-base-v2"
    INTFLOAT_E5_SMALL_V2 = "intfloat/e5-small-v2"
    NVIDIA_NEMO = "nvidia-nemo"
    COHERE_ENGLISH_V3 = "cohere/embed-english-v3.0"
    COHERE_ENGLISH_LIGHT_V3 = "cohere/embed-english-light-3.0"
    VOYAGE_3_LARGE = "voyage-3-large"
    VOYAGE_3_LITE = "voyage-3-lite"
    # per-token embedding model
    COLBERT_V2 = "colbertv2.0"


_DEFAULT_DIMENSIONS = {
    EmbeddingModelName.OPENAI_ADA_002: 1536,
    EmbeddingModelName.OPENAI_V3_SMALL: 1536,
    EmbeddingModelName.OPENAI_V3_LARGE: 3072,
    EmbeddingModelName.GOOGLE_TEXT_GECKO_003: 768,
    EmbeddingModelName.GOOGLE_TEXT_EMBEDDING_004: 768,
    EmbeddingModelName.GOOGLE_TEXT_EMBEDDING_005: 768,
    EmbeddingModelName.INTFLOAT_E5_LARGE_V2: 1024,
    EmbeddingModelName.INTFLOAT_E5_BASE_V2: 768,
    EmbeddingModelName.INTFLOAT_E5_SMALL_V2: 384,
    EmbeddingModelName.NVIDIA_NEMO: 1024,
    EmbeddingModelName.COHERE_ENGLISH_V3: 1024,
    EmbeddingModelName.COHERE_ENGLISH_LIGHT_V3: 384,
    EmbeddingModelName.VOYAGE_3_LARGE: 1024,
    EmbeddingModelName.VOYAGE_3_LITE: 512,
    EmbeddingModelName.COLBERT_V2: 128,
}


def get_valid_model_name_list():
    return [model.value for model in EmbeddingModelName]


def get_valid_model_names_string() -> str:
    return ", ".join(get_valid_model_name_list())


def is_valid_model_name(model_name) -> bool:
    return model_name is not None and model_name in get_valid_model_name_list()


def get_default_model_dimension_size(model_name: str) -> int:
    """(reference: model_generator.py:61-96)"""
    assert is_valid_model_name(model_name)
    return _DEFAULT_DIMENSIONS[EmbeddingModelName(model_name)]


def get_effective_embedding_size(model_name: str,
                                 output_dimension_size: int | None = None) -> int:
    """Models supporting reduced output dims: OpenAI v3 (any <= default) and
    Voyage-3-large (256/512/1024/2048); everyone else ignores the request
    (reference: model_generator.py:99-113)."""
    default_dimension_size = get_default_model_dimension_size(model_name)
    if output_dimension_size is None:
        return default_dimension_size
    if model_name in (EmbeddingModelName.OPENAI_V3_SMALL.value,
                      EmbeddingModelName.OPENAI_V3_LARGE.value):
        assert output_dimension_size <= default_dimension_size
        return output_dimension_size
    if model_name == EmbeddingModelName.VOYAGE_3_LARGE.value:
        assert output_dimension_size in (256, 512, 1024, 2048)
        return output_dimension_size
    return default_dimension_size


def get_embedding_generator_for_model(model_name, output_dimension=None,
                                      dataset_type=None, output_dtype=None):
    """Factory (reference: model_generator.py:116-153). Imported lazily so
    remote-client modules aren't required for local compute paths."""
    from neighborhoodwatch_tpu.models import generators as g

    assert is_valid_model_name(model_name)
    m = EmbeddingModelName(model_name)
    if m == EmbeddingModelName.OPENAI_ADA_002:
        return g.OpenAIEmbeddingGenerator(model_name=model_name)
    if m in (EmbeddingModelName.OPENAI_V3_SMALL, EmbeddingModelName.OPENAI_V3_LARGE):
        return g.OpenAIEmbeddingGenerator(model_name=model_name,
                                          output_dimension_size=output_dimension)
    if m in (EmbeddingModelName.GOOGLE_TEXT_GECKO_003,
             EmbeddingModelName.GOOGLE_TEXT_EMBEDDING_004,
             EmbeddingModelName.GOOGLE_TEXT_EMBEDDING_005):
        return g.VertexAIEmbeddingGenerator(model_name=model_name)
    if m in (EmbeddingModelName.INTFLOAT_E5_SMALL_V2,
             EmbeddingModelName.INTFLOAT_E5_BASE_V2,
             EmbeddingModelName.INTFLOAT_E5_LARGE_V2):
        from neighborhoodwatch_tpu.models.e5_flax import E5FlaxEmbeddingGenerator
        return E5FlaxEmbeddingGenerator(model_name=model_name)
    if m == EmbeddingModelName.COLBERT_V2:
        from neighborhoodwatch_tpu.models.colbert_flax import ColbertFlaxEmbeddingGenerator
        return ColbertFlaxEmbeddingGenerator()
    if m == EmbeddingModelName.NVIDIA_NEMO:
        return g.NvidiaNemoEmbeddingGenerator(model_name=model_name)
    if m in (EmbeddingModelName.COHERE_ENGLISH_V3,
             EmbeddingModelName.COHERE_ENGLISH_LIGHT_V3):
        return g.CohereEmbeddingV3Generator(model_name=model_name)
    if m == EmbeddingModelName.VOYAGE_3_LARGE:
        return g.VoyageAIEmbeddingGenerator(model_name=model_name,
                                            input_type=dataset_type,
                                            output_dtype=output_dtype,
                                            output_dimension_size=output_dimension)
    if m == EmbeddingModelName.VOYAGE_3_LITE:
        return g.VoyageAIEmbeddingGenerator(model_name=model_name,
                                            input_type=dataset_type,
                                            output_dtype=output_dtype)
    return None


def colbert_weight_status(head_pretrained: bool,
                          backbone_pretrained: bool) -> str:
    """Provenance string from a ColBERT generator's LIVE load flags."""
    if head_pretrained:
        return "pretrained (colbertv2.0 backbone + projection head)"
    if backbone_pretrained:
        return ("pretrained backbone + RANDOM projection head "
                "— NOT ground truth")
    return "RANDOM INIT (no local checkpoint) — NOT ground truth"


def local_weight_status(model_name: str) -> str:
    """Weight provenance for the CLI banner. Local Flax models (e5, ColBERT)
    silently fall back to deterministic random init in zero-egress
    environments — that is pipeline-valid but NOT ground truth, so the CLIs
    surface it loudly up front.

    Checks what a load would ACTUALLY use: the weights file itself (not
    just config.json) AND the loader's import needs — e5 converts through
    transformers+torch, while ColBERT reads model.safetensors via
    safetensors.numpy with no torch at all (torch only for .bin caches)."""
    def cached(repo, fname="config.json"):
        try:
            from transformers.utils import hub
            return isinstance(hub.try_to_load_from_cache(repo, fname), str)
        except Exception:
            return False

    def weights_cached(repo):
        # single-file checkpoints plus the sharded-layout index files
        # (a repo cached as shards would otherwise read RANDOM INIT)
        return (cached(repo, "model.safetensors")
                or cached(repo, "pytorch_model.bin")
                or cached(repo, "model.safetensors.index.json")
                or cached(repo, "pytorch_model.bin.index.json"))

    def torch_ok():
        try:
            import torch  # noqa: F401
            return True
        except Exception:
            return False

    if "e5" in model_name:
        # load_hf_weights (bert_flax.py) requires config.json IN ADDITION
        # to the weights file — a partial cache (weights, no config) falls
        # back to random init at load time, so the banner must not say
        # "pretrained" for it (r3 review)
        if weights_cached(model_name) and cached(model_name):
            if torch_ok():
                return f"pretrained ({model_name}, local HF cache)"
            return ("cached checkpoint but torch unavailable -> "
                    "RANDOM INIT — NOT ground truth")
        return "RANDOM INIT (no local checkpoint) — NOT ground truth"
    def safetensors_ok():
        try:
            import safetensors  # noqa: F401
            return True
        except Exception:
            return False

    if model_name == EmbeddingModelName.COLBERT_V2.value:
        # load_colbert_hf_weights reads model.safetensors WITHOUT torch
        # (safetensors.numpy); torch is needed only for a .bin-only cache.
        # The banner must match what the load actually uses (r3 review:
        # it claimed RANDOM INIT for a torch-free safetensors cache the
        # run loads fine).
        def colbert_loadable(repo):
            if cached(repo, "model.safetensors") and safetensors_ok():
                return True
            return weights_cached(repo) and torch_ok()
        head = colbert_loadable("colbert-ir/colbertv2.0")
        if not head and weights_cached("colbert-ir/colbertv2.0"):
            return ("cached checkpoint but torch/safetensors unavailable "
                    "-> RANDOM INIT — NOT ground truth")
        # the bert-base-uncased backbone fallback converts through
        # transformers+torch (load_hf_weights), so it needs torch AND
        # config.json (r3 review: weights-only partial caches random-init)
        return colbert_weight_status(
            head_pretrained=head,
            backbone_pretrained=weights_cached("bert-base-uncased")
            and cached("bert-base-uncased") and torch_ok())
    return "remote API (weights server-side)"
