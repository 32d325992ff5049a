"""Unit tests for the shared vectorized result-dict assembler
(osr_tpu/retrieval/results.py) against a per-element oracle."""

import numpy as np

from osr_tpu.retrieval.results import as_object_names, assemble_result_dicts


def _oracle(doc_ids, ids, scores, mask):
    out = []
    for row in range(ids.shape[0]):
        d = {}
        for i, s, m in zip(ids[row], scores[row], mask[row]):
            if m:
                d[doc_ids[int(i)]] = float(s)
        out.append(d)
    return out


def test_matches_oracle_random():
    rng = np.random.default_rng(42)
    n, b, k = 200, 17, 10
    doc_ids = [f"doc{i}" for i in range(n)]
    ids = rng.integers(0, n, (b, k)).astype(np.int32)
    scores = rng.standard_normal((b, k)).astype(np.float32)
    mask = scores > 0
    got = assemble_result_dicts(as_object_names(doc_ids), ids, scores, mask)
    assert got == _oracle(doc_ids, ids, scores, mask)


def test_empty_mask_rows_and_all_masked():
    doc_ids = ["a", "b", "c"]
    ids = np.array([[0, 1], [2, 2]], dtype=np.int32)
    scores = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    none = np.zeros((2, 2), dtype=bool)
    assert assemble_result_dicts(
        as_object_names(doc_ids), ids, scores, none
    ) == [{}, {}]
    all_on = np.ones((2, 2), dtype=bool)
    got = assemble_result_dicts(as_object_names(doc_ids), ids, scores, all_on)
    assert got == [{"a": 1.0, "b": 2.0}, {"c": 4.0}]  # later dup wins


def test_insertion_order_is_row_major():
    doc_ids = ["x", "y", "z"]
    ids = np.array([[2, 0, 1]], dtype=np.int32)
    scores = np.array([[9.0, 8.0, 7.0]], dtype=np.float32)
    mask = np.ones((1, 3), dtype=bool)
    (d,) = assemble_result_dicts(as_object_names(doc_ids), ids, scores, mask)
    assert list(d.items()) == [("z", 9.0), ("x", 8.0), ("y", 7.0)]


def test_float_conversion_matches_tolist():
    # f32 -> Python float must equal np.float32.tolist() semantics.
    doc_ids = ["a"]
    s = np.array([[np.float32(0.1)]], dtype=np.float32)
    ids = np.zeros((1, 1), dtype=np.int32)
    (d,) = assemble_result_dicts(
        as_object_names(doc_ids), ids, s, np.ones((1, 1), bool)
    )
    assert d["a"] == s.tolist()[0][0]


def test_as_object_names_passthrough():
    arr = np.array(["a", "b"], dtype=object)
    assert as_object_names(arr) is arr
    lst = as_object_names(["a", "b"])
    assert lst.dtype == object and lst.tolist() == ["a", "b"]
