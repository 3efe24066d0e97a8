"""ColBERT (`ck`) pipeline: per-token embedding streaming + token kNN.

Capability parity with reference colbert_knn.py:31-126: streams source
rows, sentencizes, encodes passages to per-token 128-d embeddings, writes
embedding-only parquet rows until the requested token count, then runs the
token-vs-token kNN (the reference's flat approximation of ColBERT retrieval;
the proper MaxSim scoring lives in ops/maxsim.py as the TPU generalization).
"""

import numpy as np

from neighborhoodwatch_tpu.core.pipeline import compute_knn_ds
from neighborhoodwatch_tpu.data.sources import split_into_sentences


def process_source_dataset(streamer, generator, dataset, input_dimensions,
                           token_count, column_to_embed, logger=None):
    """Stream per-token embeddings to parquet until `token_count` tokens
    (reference: colbert_knn.py:31-81). Returns
    (rows_read, sentence_count, token_count_written, zero_embedding_count)."""
    processed_tokens = 0
    zero_text_embeddings = 0
    total_sentences = 0
    cur_row = 0
    token_rows: list[np.ndarray] = []

    for cur_row, row in enumerate(dataset, start=1):
        sentence_list = split_into_sentences(row[column_to_embed])
        if not sentence_list:
            continue
        embeddings, counts = generator.generate_embedding(sentence_list)
        for flat in embeddings:
            flat = np.asarray(flat)
            if not np.any(flat):
                zero_text_embeddings += 1
                continue
            tokens = flat.reshape(-1, input_dimensions)
            take = min(len(tokens), token_count - processed_tokens)
            token_rows.append(tokens[:take])
            processed_tokens += take
            total_sentences += 1
            if processed_tokens >= token_count:
                break
        # flush periodically to bound memory
        if sum(len(t) for t in token_rows) >= 100_000:
            streamer.stream_to_parquet_without_src_metadata(
                np.concatenate(token_rows, axis=0))
            token_rows = []
        if processed_tokens >= token_count:
            break

    if token_rows:
        if logger is not None:
            logger.info(f"[final] processed_token_embedding_cnt: {processed_tokens}")
        streamer.stream_to_parquet_without_src_metadata(
            np.concatenate(token_rows, axis=0))
    return cur_row, total_sentences, processed_tokens, zero_text_embeddings


def process_knn_computation(data_dir, base_filename, base_count, query_filename,
                            query_count, mem_tune=False,
                            initial_batch_size=1_000_000,
                            max_memory_threshold=0.1, k=100,
                            metric="dot", precision="highest"):
    """Token-vs-token exact kNN (reference: colbert_knn.py:84-126, which
    defaults to the torch `1 - matmul` engine — metric='dot' here).

    Uses the streaming dataset path: no partial files, device-merged finals."""
    return compute_knn_ds(data_dir, 128, query_filename, query_count,
                          base_filename, base_count, mem_tune=mem_tune, k=k,
                          initial_batch_size=initial_batch_size,
                          max_memory_threshold=max_memory_threshold,
                          metric=metric, precision=precision)


def print_dataset_info(source_dataset_name, token_count, actual_row_cnt,
                       actual_sentence_cnt, actual_token_embedding_counter,
                       detected_zero_embedding_cnt):
    """(reference: colbert_knn.py:129-143)"""
    print("=================================================")
    print(f"== '{source_dataset_name}' source dataset stats")
    print("== ----------------------------------------------")
    print(f"== Expected total count of source data tokens: {token_count}")
    print(f"== Total count of source data rows: {actual_row_cnt}")
    print(f"== Total count of sentences: {actual_sentence_cnt}")
    print(f"== Total count of token-embeddings: {actual_token_embedding_counter}")
    print(f"== Total count of detected zero sentence-embeddings: {detected_zero_embedding_cnt}")
    print("=================================================")
