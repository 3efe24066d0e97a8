"""Small shared utilities (capability parity with reference nw_utils.py)."""

from collections import OrderedDict

import numpy as np


def remove_duplicate_embeddings(source_array):
    """Order-preserving dedup; returns (unique_rows, removed_count)
    (reference: nw_utils.py:41-49)."""
    cnt1 = len(source_array)
    unique_array = list(OrderedDict.fromkeys(map(tuple, source_array)))
    return unique_array, cnt1 - len(unique_array)


def is_zero_embedding(embedding) -> bool:
    """True if every component is zero (reference: nw_utils.py:52-53).

    Zero vectors mark failed embedding-API calls and are skipped downstream.
    """
    return not np.any(np.asarray(embedding))


def normalize_vector(vector: np.ndarray) -> np.ndarray:
    """L2-normalize; asserts the vector is nonzero (reference: nw_utils.py:56-59)."""
    vector = np.asarray(vector)
    assert not is_zero_embedding(vector), "Zero vector found!"
    norm = np.linalg.norm(vector)
    return (vector / norm).astype(np.float32)


def output_dimension_validity_check(model_name: str, given_dimension: int,
                                    actual_dimension: int) -> bool:
    """Binary-packed Voyage embeddings store 8 dims per output byte
    (reference: nw_utils.py:157-164)."""
    pass_check = actual_dimension == given_dimension
    if model_name == "voyage-3-large":
        pass_check = pass_check or given_dimension == 8 * actual_dimension
    return pass_check


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
