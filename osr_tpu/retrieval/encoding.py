"""Query-batch encoding shared by the single-device and sharded engines.

Queries become fixed-shape (B, Q) int32/float32 arrays: B from the engine's
batch-size menu, Q from a fixed width menu so the fused search program
compiles once per (B, Q, k) and is reused — arbitrary Q widths would
recompile the whole multi-scan program on every new maximum term count.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from osr_tpu.index.tokenizer import Tokenizer

# Padded unique-term widths. Queries are short; 128+ steps cover outliers.
QUERY_WIDTH_MENU = (8, 16, 32, 64, 128)


def pad_query_width(n_terms: int) -> int:
    for w in QUERY_WIDTH_MENU:
        if n_terms <= w:
            return w
    return ((n_terms + 127) // 128) * 128


def encode_query_batch(
    tokenizer: Tokenizer,
    texts: Sequence[str],
    batch_size: int,
    vocab_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize + pad up to ``batch_size`` query strings to (B, Q) arrays.

    Padding uses the out-of-bounds id ``vocab_size + 1``, which the
    query-matrix scatter drops — keeping (term, query) update pairs unique
    (see osr_tpu/ops/bm25.py:build_query_matrix).
    """
    if len(texts) > batch_size:
        raise ValueError(
            f"{len(texts)} queries exceed the engine batch size "
            f"{batch_size}; chunk the batch first"
        )
    encoded = tokenizer.encode_batch(texts)
    q = pad_query_width(max((len(e) for e in encoded), default=1) or 1)
    tids = np.full((batch_size, q), vocab_size + 1, dtype=np.int32)
    wts = np.zeros((batch_size, q), dtype=np.float32)
    for row, pairs in enumerate(encoded):
        for col, (tid, cnt) in enumerate(pairs):
            tids[row, col] = tid
            wts[row, col] = cnt
    return tids, wts
