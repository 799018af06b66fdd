"""BPE vocabulary induction (operators/bpe.py)."""

import os

import pytest
from pyspark.sql import functions as F

from ubw_spark.operators.bpe import (
    apply_merge,
    bpe_train_merges,
    bpe_train_merges_py,
    sym_pairs,
    word_freqs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).where(F.col("lang") == "en")


def test_sym_pairs_guard_and_order(spark):
    df = spark.createDataFrame(
        [(["a"],), (["a", "b", "b", "a"],), ([],)], "sym array<string>"
    )
    got = [r[0] for r in df.select(sym_pairs(F.col("sym"))).collect()]
    assert got[0] == [] and got[2] == []
    assert [(p["left"], p["right"]) for p in got[1]] == [
        ("a", "b"),
        ("b", "b"),
        ("b", "a"),
    ]


def test_apply_merge_greedy_leftmost(spark):
    rows = [
        (["a", "a", "a"],),          # overlap: leftmost wins
        (["a", "b", "a", "a"],),     # merge at the tail
        (["x"],),                    # untouched singles
        ([],),
    ]
    df = spark.createDataFrame(rows, "sym array<string>")
    got = [
        r[0]
        for r in df.select(apply_merge(F.col("sym"), "a", "a")).collect()
    ]
    assert got == [["aa", "a"], ["a", "b", "aa"], ["x"], []]


def test_train_matches_python_reference(docs):
    """The distributed trainer reproduces the sequential reference
    merge-for-merge (same greedy convention, same tiebreak)."""
    freqs = {
        r["word"]: r["n"] for r in word_freqs(docs, "text").collect()
    }
    want = bpe_train_merges_py(freqs, 8)
    got = bpe_train_merges(docs, "text", 8)
    assert got == want
    assert len(got) == 8  # the corpus has at least 8 rounds of pairs
    with pytest.raises(ValueError, match="k must be"):
        bpe_train_merges(docs, "text", 0)


def test_train_early_stop(spark):
    """Single-char vocabulary: no adjacent pairs, trainer stops at 0."""
    df = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_train_merges(df, "text", 5) == []


def test_bpe_query_green(spark, sf_dir):
    from ubw_spark.queries import REGISTRY

    out = REGISTRY["bpe_top_pairs"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 20
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_encode_matches_spark_folds(docs, spark):
    """bpe_encode (Python mapInPandas) reproduces the training-side
    Spark fold pipeline symbol-for-symbol: train k merges, apply them
    as k apply_merge folds to every distinct word, compare against the
    encoder's segmentation of the same words."""
    from ubw_spark.operators.bpe import apply_merge, bpe_encode

    merges = bpe_train_merges(docs, "text", 6)
    wf = word_freqs(docs, "text").withColumn("sym", F.split("word", ""))
    for a, b in merges:
        wf = wf.withColumn("sym", apply_merge(F.col("sym"), a, b))
    want = {r["word"]: r["sym"] for r in wf.collect()}

    enc = bpe_encode(
        docs.select("doc_id", F.col("text")), "text", merges
    )
    row = enc.where(F.col("doc_id") == docs.first()["doc_id"]).first()
    # cross-check one full document: concatenating its subwords in
    # order must equal the whitespace-normalized text, and each word's
    # segmentation must match the fold pipeline's
    text_words = row["text"].strip().lower().split()
    toks = list(row["bpe_tokens"])
    for w in text_words:
        seg = want[w]
        assert toks[: len(seg)] == seg, (w, seg, toks[:5])
        assert "".join(seg) == w
        toks = toks[len(seg) :]
    assert toks == []


def test_encode_null_and_unknown(spark):
    from ubw_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "ab xyz"), (2, None)], "id bigint, text string"
    )
    out = {r["id"]: r["bpe_tokens"] for r in
           bpe_encode(df, "text", [("a", "b")]).collect()}
    assert out[1] == ["ab", "x", "y", "z"]  # merged + untouched unknown
    assert out[2] is None


def test_encode_is_map_only(docs):
    from ubw_spark.operators.bpe import bpe_encode
    from ubw_spark.plans.inspect import shuffle_count

    assert shuffle_count(bpe_encode(docs, "text", [("a", "b")])) == 0
