"""Sliding-window chunking (operators/chunking.py): coverage, overlap,
and edge-case properties."""

import pytest

from ubw_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk=10, overlap=3):
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(
            df, "doc_id", "text", chunk_chars=chunk, overlap=overlap
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    return rows


def test_reconstruction_covers_original(spark):
    text = "abcdefghijklmnopqrstuvwxyz0123456789"
    rows = _chunks(spark, text, chunk=10, overlap=3)
    rebuilt = rows[0].chunk_text + "".join(
        r.chunk_text[3:] for r in rows[1:]
    )
    assert rebuilt == text


def test_consecutive_chunks_share_overlap(spark):
    text = "x" * 5 + "abcdefghij" * 5
    rows = _chunks(spark, text, chunk=10, overlap=3)
    for a, b in zip(rows, rows[1:]):
        assert b.chunk_start == a.chunk_start + 7  # stride = 10 - 3
        shared = min(3, b.chunk_len)
        assert a.chunk_text[7 : 7 + shared] == b.chunk_text[:shared]


def test_short_and_empty_docs_single_chunk(spark):
    assert len(_chunks(spark, "short", chunk=10, overlap=3)) == 1
    rows = _chunks(spark, "", chunk=10, overlap=3)
    assert len(rows) == 1 and rows[0].chunk_text == ""
    exact = _chunks(spark, "0123456789", chunk=10, overlap=3)
    assert len(exact) == 1 and exact[0].chunk_text == "0123456789"


def test_last_chunk_may_be_short_but_reaches_end(spark):
    text = "a" * 25
    rows = _chunks(spark, text, chunk=10, overlap=3)
    assert rows[-1].chunk_start + rows[-1].chunk_len == 25
    assert all(r.chunk_len == 10 for r in rows[:-1])


def test_overlap_must_be_smaller_than_chunk(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="must be <"):
        chunk_documents(df, "doc_id", "text", chunk_chars=5, overlap=5)


def _py_chunks(text, chunk, overlap):
    stride = chunk - overlap
    n = len(text)
    m = max(1, -(-(n - overlap) // stride)) if n > overlap else 1
    return [
        (i, i * stride, text[i * stride : i * stride + chunk])
        for i in range(m)
    ]


def test_random_params_match_python_reference(spark):
    """Random (text, chunk, overlap) combinations vs a direct Python
    reference of the chunk math — boundary-heavy inputs (lengths at
    exact multiples of the stride) included deliberately."""
    import random

    rng = random.Random(77)
    alphabet = "abcdefghij "
    for chunk, overlap in [(10, 3), (7, 6), (20, 0), (5, 1), (12, 11)]:
        stride = chunk - overlap
        lengths = [0, 1, overlap, chunk, chunk + 1, 3 * stride + overlap,
                   rng.randrange(1, 200)]
        docs = [
            (i, "".join(rng.choice(alphabet) for _ in range(n)))
            for i, n in enumerate(lengths)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_text)
            for r in chunk_documents(
                df, "doc_id", "text", chunk_chars=chunk, overlap=overlap
            ).collect()
        }
        want = {
            (i, idx, start, txt)
            for i, text in docs
            for idx, start, txt in _py_chunks(text, chunk, overlap)
        }
        assert got == want, (chunk, overlap)
