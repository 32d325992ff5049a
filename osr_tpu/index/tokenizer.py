"""Tokenization matching the reference pipeline exactly.

The reference tokenizes with ``re.findall(r'\\b\\w+\\b', text.lower())``
everywhere (reference rag_system/core/retrieval.py:148,236;
rag_system/pipeline/evaluate_rag_pipeline.py:223,356). Retrieval-quality
parity (nDCG/recall on BEIR datasets) depends entirely on reproducing this
tokenization, so it is centralized here and covered by tests.

An optional native (C++) fast path is used when the compiled extension is
available and the text is pure ASCII; it produces identical tokens to the
regex on ASCII input (property-tested in tests/test_tokenizer.py).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

_TOKEN_RE = re.compile(r"\b\w+\b")

try:  # optional native fast tokenizer (see native/)
    from osr_tpu.native import ascii_tokenize as _native_tokenize

    _NATIVE_AVAILABLE = True
except Exception:  # pragma: no cover - native lib optional
    _native_tokenize = None
    _NATIVE_AVAILABLE = False


def tokenize(text: str, *, use_native: bool = True) -> List[str]:
    """Lowercase word tokenization, identical to the reference pipeline."""
    if not text:
        return []
    if use_native and _NATIVE_AVAILABLE and text.isascii():
        return _native_tokenize(text)
    return _TOKEN_RE.findall(text.lower())


def term_counts(text: str) -> Counter:
    """Unique-term counts of a text (the reference's ``Counter(tokens)``)."""
    return Counter(tokenize(text))


class Tokenizer:
    """Stateful tokenizer bound to a vocabulary.

    Converts raw query/document strings into (term_id, count) pairs against a
    fixed vocabulary, which is the only form the device-side engine consumes:
    queries never materialize dense |V|-sized vectors on the host.
    """

    def __init__(self, vocabulary: Dict[str, int]):
        self.vocabulary = vocabulary

    @classmethod
    def build(cls, texts: Iterable[str]) -> Tuple["Tokenizer", List[List[str]]]:
        """Build a sorted vocabulary over ``texts``.

        Matches the reference's vocabulary construction (sorted set of all
        tokens, reference retrieval.py:155). Returns the tokenizer and the
        token lists so callers don't tokenize twice.
        """
        token_lists: List[List[str]] = []
        vocab_set: set = set()
        for text in texts:
            toks = tokenize(text)
            token_lists.append(toks)
            vocab_set.update(toks)
        vocab = {term: idx for idx, term in enumerate(sorted(vocab_set))}
        return cls(vocab), token_lists

    def __len__(self) -> int:
        return len(self.vocabulary)

    def encode_counts(self, text: str) -> List[Tuple[int, float]]:
        """Tokenize and map to sorted (term_id, count) pairs.

        Out-of-vocabulary terms are dropped (the reference does the same when
        building the query TF vector, reference retrieval.py:244-249).
        """
        pairs = [
            (self.vocabulary[term], float(count))
            for term, count in term_counts(text).items()
            if term in self.vocabulary
        ]
        pairs.sort()
        return pairs

    def encode_batch(
        self, texts: Sequence[str]
    ) -> List[List[Tuple[int, float]]]:
        return [self.encode_counts(t) for t in texts]
