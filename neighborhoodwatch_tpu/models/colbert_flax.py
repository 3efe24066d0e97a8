"""ColBERT v2 per-token embedding generator on TPU.

Replaces the reference's colbert-ai/torch-CUDA CollectionEncoder
(reference: model_generator.py:392-439: downloads the Stanford colbertv2.0
tarball, encodes passages into per-token 128-d embeddings, returns the
flattened tensor + per-passage token counts) with a Flax BERT-base backbone
plus the 128-d linear projection head, per-token L2 normalization, run
jit-compiled on TPU. Checkpoint weights load from a local HF cache when
present; zero-egress environments fall back to deterministic random init.

`generate_embedding(texts)` returns `([flat_token_embeddings], token_counts)`
— the same contract colbert_knn.process_source_dataset consumes
(reference: colbert_knn.py:51-63).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from neighborhoodwatch_tpu.models.bert_flax import (
    BertEncoder, COLBERT_BASE_CONFIG, load_hf_weights,
)
from neighborhoodwatch_tpu.models.generators import EmbeddingGenerator
from neighborhoodwatch_tpu.models.registry import EmbeddingModelName
from neighborhoodwatch_tpu.models.tokenizer import load_tokenizer

COLBERT_DIM = 128


class ColbertModel(nn.Module):
    """BERT backbone + linear 128-d per-token head + L2 normalize."""

    config: object = COLBERT_BASE_CONFIG

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        hidden = BertEncoder(self.config, name="bert")(
            input_ids, attention_mask)
        proj = nn.Dense(COLBERT_DIM, use_bias=False, name="linear")(hidden)
        norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return proj / jnp.where(norm == 0, 1.0, norm)


class ColbertFlaxEmbeddingGenerator(EmbeddingGenerator):
    def __init__(self, model_name=EmbeddingModelName.COLBERT_V2.value,
                 chunk_size: int = 300_000, max_length: int = 220,
                 params=None, seed: int = 0, hf_backbone="bert-base-uncased",
                 config=COLBERT_BASE_CONFIG):
        super().__init__(model_name, chunk_size=chunk_size,
                         output_dimension=COLBERT_DIM)
        self.max_length = max_length
        self.config = config
        self.tokenizer = load_tokenizer(hf_backbone)
        self.model = ColbertModel(config)
        if params is None:
            backbone = load_hf_weights(hf_backbone, self.config)
            if backbone is not None:
                # graft the pretrained backbone under this module's scope;
                # the projection head stays random without the ColBERT ckpt
                rng_params = self._random_params(seed)
                rng_params["params"]["bert"] = backbone["params"]
                params = rng_params
                self.pretrained = True
            else:
                params = self._random_params(seed)
                self.pretrained = False
        else:
            self.pretrained = True
        self.params = params

        @partial(jax.jit, static_argnums=())
        def _forward(params, input_ids, attention_mask):
            return self.model.apply(params, input_ids, attention_mask)

        self._forward = _forward

    def _random_params(self, seed):
        dummy = jnp.zeros((1, 16), dtype=jnp.int32)
        return self.model.init(jax.random.PRNGKey(seed), dummy,
                               jnp.ones_like(dummy))

    def _call_model_api(self, text_list, *args, **kwargs):
        raise NotImplementedError("ColBERT uses generate_embedding directly")

    def encode_passages(self, texts, batch_size: int = 64):
        """(total_tokens, 128) embeddings + per-passage token counts —
        the CollectionEncoder.encode_passages contract. All batches are
        dispatched before the first device->host read so tokenization of
        batch i+1 overlaps the encode of batch i (jax dispatch is async)."""
        pending = []
        for s in range(0, len(texts), batch_size):
            batch = texts[s:s + batch_size]
            ids, mask = self.tokenizer(batch, max_length=self.max_length)
            dev = self._forward(self.params, jnp.asarray(ids),
                                jnp.asarray(mask))
            pending.append((dev, mask))
        all_tokens, counts = [], []
        for dev, mask in pending:
            emb = np.asarray(dev, dtype=np.float32)
            for row_emb, row_mask in zip(emb, mask):
                n = int(row_mask.sum())
                all_tokens.append(row_emb[:n])
                counts.append(n)
        if not all_tokens:
            return np.empty((0, COLBERT_DIM), dtype=np.float32), []
        return np.concatenate(all_tokens, axis=0), counts

    def generate_embedding(self, text, *args, **kwargs):
        """Returns ([flat_token_embeddings], token_counts)
        (reference: model_generator.py:433-439)."""
        if isinstance(text, str):
            text = [text]
        token_embeddings, token_cnt = self.encode_passages(text)
        return [token_embeddings.flatten()], token_cnt
