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
    BertEncoder, COLBERT_BASE_CONFIG, convert_torch_state_dict, load_hf_weights,
)
from neighborhoodwatch_tpu.models.generators import EmbeddingGenerator
from neighborhoodwatch_tpu.models.registry import EmbeddingModelName
from neighborhoodwatch_tpu.models.tokenizer import load_tokenizer

COLBERT_DIM = 128
COLBERT_HF_REPO = "colbert-ir/colbertv2.0"
# bert-base-uncased [unused1] — colbert-ai's "[D]" document marker, inserted
# after [CLS] by its DocTokenizer before encoding.
DOC_MARKER_ID = 2


def colbert_params_from_state_dict(sd: dict, config=COLBERT_BASE_CONFIG):
    """Map a ColBERT torch state_dict (BERT backbone under ``bert.`` + the
    128-d ``linear.weight`` projection, no bias — the checkpoint layout of
    colbert-ir/colbertv2.0, which the reference downloads as the Stanford
    tarball, model_generator.py:410-427) onto :class:`ColbertModel` params."""
    backbone = convert_torch_state_dict(sd, config, prefix="bert.")
    head = np.asarray(sd["linear.weight"])
    assert head.shape == (COLBERT_DIM, config.hidden_size), head.shape
    return {"params": {"bert": backbone["params"],
                       "linear": {"kernel": jnp.asarray(head.T)}}}


def load_colbert_hf_weights(model_name: str = COLBERT_HF_REPO,
                            config=COLBERT_BASE_CONFIG):
    """Full pretrained ColBERT params (backbone + projection head) from a
    locally cached HF checkpoint; None when unavailable (zero egress)."""
    try:
        from transformers.utils import hub as _hub
        sd = None
        path = _hub.try_to_load_from_cache(model_name, "model.safetensors")
        if isinstance(path, str):
            try:
                from safetensors.numpy import load_file
                sd = load_file(path)
            except Exception as e:
                # fall THROUGH to the .bin checkpoint: bailing out here
                # left a loadable pytorch_model.bin unused while
                # registry.local_weight_status (which probes both files)
                # still claimed "pretrained" — a random head behind a
                # pretrained banner (r3 review)
                print(f"   [warn] cached safetensors unreadable ({e}); "
                      f"trying pytorch_model.bin")
        if sd is None:
            path = _hub.try_to_load_from_cache(model_name, "pytorch_model.bin")
            if isinstance(path, str):
                import torch
                raw = torch.load(path, map_location="cpu", weights_only=True)
                sd = {k: v.numpy() for k, v in raw.items()}
        if sd is None:
            raise FileNotFoundError(f"{model_name} not in local HF cache")
        return colbert_params_from_state_dict(sd, config)
    except Exception as e:
        print(f"   [warn] no local ColBERT checkpoint ({e})")
        return None


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
        # prefer the real ColBERT tokenizer config when cached; the backbone
        # tokenizer is identical (bert-base-uncased vocab) as a fallback
        self.tokenizer = load_tokenizer(COLBERT_HF_REPO, quiet=True)
        if self.tokenizer.is_hashed:
            self.tokenizer = load_tokenizer(hf_backbone)
        self.tokens_seen = 0       # pipeline-level tokens/s accounting
        self.model = ColbertModel(config)
        self.head_pretrained = False
        if params is None:
            params = load_colbert_hf_weights(config=self.config)
            if params is not None:
                # full checkpoint: backbone + real 128-d projection head
                self.pretrained = self.head_pretrained = True
            else:
                backbone = load_hf_weights(hf_backbone, self.config)
                if backbone is not None:
                    # graft the pretrained backbone under this module's
                    # scope; projection head stays random — NOT ground truth
                    params = self._random_params(seed)
                    params["params"]["bert"] = backbone["params"]
                    self.pretrained = True
                else:
                    params = self._random_params(seed)
                    self.pretrained = False
        else:
            self.pretrained = self.head_pretrained = True
        self.params = params
        # doc-encoding fidelity with colbert-ai's CollectionEncoder: insert
        # the "[D]" marker after [CLS] and drop punctuation tokens from the
        # output stream. Only meaningful with real vocab + real weights.
        self.use_doc_marker = self.head_pretrained and not self.tokenizer.is_hashed
        self._skiplist = self._punctuation_ids() if self.use_doc_marker else frozenset()

        @partial(jax.jit, static_argnums=())
        def _forward(params, input_ids, attention_mask):
            return self.model.apply(params, input_ids, attention_mask)

        self._forward = _forward

    def _random_params(self, seed):
        dummy = jnp.zeros((1, 16), dtype=jnp.int32)
        return self.model.init(jax.random.PRNGKey(seed), dummy,
                               jnp.ones_like(dummy))

    def _punctuation_ids(self):
        """Token ids colbert-ai's CollectionEncoder masks out of document
        streams (its `skiplist`: every punctuation symbol's token id)."""
        import string
        ids = set()
        for ch in string.punctuation:
            ids.update(self.tokenizer._tok.encode(ch, add_special_tokens=False))
        return frozenset(ids)

    def _call_model_api(self, text_list, *args, **kwargs):
        raise NotImplementedError("ColBERT uses generate_embedding directly")

    def encode_passages(self, texts, batch_size: int = 64,
                        max_in_flight: int = 16):
        """(total_tokens, 128) embeddings + per-passage token counts —
        the CollectionEncoder.encode_passages contract. Batches are
        dispatched ahead of the device->host reads so tokenization of
        batch i+1 overlaps the encode of batch i (jax dispatch is async),
        but at most `max_in_flight` device outputs stay live: unbounded
        dispatch held EVERY batch's output in HBM, ~7 MB per 64-passage
        batch, which OOMs a chip at the generator's advertised 300k-chunk
        scale (r3 review). Since r5 the live window drains as ONE
        device-concatenated fetch — per-batch np.asarray cost a full
        device->host roundtrip each (the measured dominant term of the
        e5 pipeline, e5_flax.generate_embedding), and 16 x 7 MB of
        pending outputs is trivial HBM.

        With real weights + real vocab this matches colbert-ai's document
        encoding: "[D]" marker after [CLS], punctuation tokens dropped."""
        marker = DOC_MARKER_ID if self.use_doc_marker else None
        skip = np.fromiter(self._skiplist, dtype=np.int64) if self._skiplist \
            else None
        all_tokens, counts = [], []

        def drain_group(items):
            if not items:
                return
            # one device_get over the whole window: the fetches issue
            # together instead of one blocking roundtrip per batch. (A
            # device-side concatenate was tried first and REGRESSED the
            # ck e2e 157 -> 221s: batches pad to varying token buckets,
            # so every distinct shape combination recompiled the concat
            # through the remote-compile tunnel.)
            hosts = jax.device_get([d for d, _, _ in items])
            for (dev, ids, mask), emb in zip(items, hosts):
                emb = np.asarray(emb, dtype=np.float32)
                keep = mask.astype(bool)
                if skip is not None:
                    keep &= ~np.isin(ids, skip)
                for row_emb, row_keep in zip(emb, keep):
                    all_tokens.append(row_emb[row_keep])
                    counts.append(int(row_keep.sum()))
            items.clear()

        pending = []
        for s in range(0, len(texts), batch_size):
            batch = texts[s:s + batch_size]
            ids, mask = self.tokenizer(batch, max_length=self.max_length,
                                       insert_after_cls=marker)
            self.tokens_seen += int(mask.sum())
            dev = self._forward(self.params, jnp.asarray(ids),
                                jnp.asarray(mask))
            pending.append((dev, ids, mask))
            if len(pending) >= max_in_flight:
                drain_group(pending)
        drain_group(pending)
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
