import re

from osr_tpu.index.tokenizer import Tokenizer, term_counts, tokenize

SAMPLES = [
    "What is the best ETF for long-term investing?",
    "Hello, World! 123 foo_bar  baz...",
    "Ünïcödé wörds and MixedCASE tokens",
    "",
    "   ",
    "a",
    "don't stop-me now (parentheses) [brackets] {braces}",
]


def test_matches_reference_regex():
    for text in SAMPLES:
        assert tokenize(text) == re.findall(r"\b\w+\b", text.lower())


def test_term_counts():
    assert term_counts("a b a c a") == {"a": 3, "b": 1, "c": 1}


def test_tokenizer_build_and_encode():
    tok, lists = Tokenizer.build(["b a c", "c d"])
    assert lists == [["b", "a", "c"], ["c", "d"]]
    # sorted vocabulary
    assert tok.vocabulary == {"a": 0, "b": 1, "c": 2, "d": 3}
    # duplicate terms counted; OOV dropped; pairs sorted by id
    assert tok.encode_counts("c a a zebra") == [(0, 2.0), (2, 1.0)]
    assert tok.encode_counts("") == []
