"""Vectorized tokenization primitives shared by the text stages.

Tokenization semantics are pinned to `re.findall('[a-z0-9]+', text.lower())`
(and its SQL twin `regexp_extract_all`): implemented here as an Arrow
split-on-complement + empty-filter, which produces the identical token
sequence at C speed, plus flat/segment views for per-doc reductions without
Python loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tokenize(texts: pa.ChunkedArray | pa.Array):
    """-> (flat_tokens: pa.Array[str], doc_idx: np.int64[], n_tokens: np.int64[])

    flat_tokens are all docs' tokens concatenated; doc_idx maps each token to
    its document row; n_tokens is per-document token count. Null/empty docs
    yield zero tokens."""
    low = pc.utf8_lower(pc.fill_null(texts, ""))
    lists = pc.split_pattern_regex(low, "[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # drop the empty-string artifacts split leaves at punctuation boundaries
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    keep = pc.not_equal(flat, "")
    if isinstance(keep, pa.ChunkedArray):
        keep = keep.combine_chunks()
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    doc_idx = doc_idx[keep_np]
    n_tokens = np.zeros(len(lens), dtype=np.int64)
    np.add.at(n_tokens, doc_idx, 1)
    return flat, doc_idx, n_tokens


def per_doc_sum(values: np.ndarray, doc_idx: np.ndarray, n_docs: int) -> np.ndarray:
    out = np.zeros(n_docs, dtype=np.float64)
    np.add.at(out, doc_idx, values)
    return out


def stop_hits(flat_tokens: pa.Array, doc_idx: np.ndarray, n_docs: int, stopwords) -> np.ndarray:
    """Per-doc count of tokens in the stopword set (vectorized is_in)."""
    vs = pa.array(sorted(stopwords), type=pa.string())
    hit = pc.is_in(flat_tokens, value_set=vs).to_numpy(zero_copy_only=False)
    out = np.zeros(n_docs, dtype=np.int64)
    np.add.at(out, doc_idx, hit.astype(np.int64))
    return out


def punct_count(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """len(text) - len(regexp_replace(text, '[^\\w\\s]', '')) — identical to
    the SQL oracle's formulation."""
    filled = pc.fill_null(texts, "")
    total = pc.utf8_length(filled)
    stripped = pc.utf8_length(pc.replace_substring_regex(filled, r"[^\w\s]", ""))
    return pc.subtract(total, stripped).to_numpy(zero_copy_only=False).astype(np.int64)
