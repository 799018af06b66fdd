"""examples/rag_ingest.py end-to-end: chunk → embed → IVF index →
probe, with self-retrieval as the correctness check (a query that IS a
chunk's text must retrieve that chunk at cos_sim ~1.0)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


def test_rag_ingest_and_self_retrieval(spark, sf_dir, tmp_path):
    from rag_ingest import ingest, search

    out = str(tmp_path / "rag")
    stats = ingest(spark, sf_dir, out, chunk_chars=256, overlap=32, dim=32)
    assert stats["n_docs"] == 500
    assert stats["n_chunks"] >= stats["n_docs"], "every doc yields >=1 chunk"
    assert len(stats["centroids"]) == 8

    # take two real chunks' texts as queries — the embedder is
    # deterministic, so the identical-content chunk must come back
    # as the top hit with cosine ~1.0
    from ubw_spark.operators.versioned import resolve_root

    sample = (
        spark.read.parquet(resolve_root(os.path.join(out, "chunks")))
        .orderBy("chunk_id")
        .limit(2)
        .collect()
    )
    # qid 0 deliberately COLLIDES with chunk_id 0 (doc 0, chunk 0):
    # the probe-id namespace separation must keep that chunk reachable
    queries = [(i * 100, r.chunk_text) for i, r in enumerate(sample)]
    hits = search(spark, out, stats["centroids"], queries, dim=32, k=3)
    rows = hits.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    for i, src in enumerate(sample):
        got = sorted(by_q[i * 100], key=lambda r: -r.cos_sim)
        assert got, "probe returned no candidates"
        assert got[0].vec_id == src.chunk_id, "self-chunk must rank first"
        assert got[0].cos_sim >= 0.9999


def test_rag_incremental_update_and_retire(spark, sf_dir, tmp_path):
    """The maintenance loop: a newly appended document becomes
    retrievable (self-query at cosine ~1), then retiring it compacts
    its chunks out of the index and the same query stops returning
    them — all through the versioned store, no re-ingest."""
    from rag_ingest import ingest, search, update

    from ubw_spark.operators.versioned import current_version

    out = str(tmp_path / "rag")
    stats = ingest(spark, sf_dir, out, chunk_chars=256, overlap=32, dim=32)

    new_doc_text = (
        "zephyr quokka paradox lantern mosaic " * 12
    )  # distinctive content, > one chunk
    new_docs = spark.createDataFrame(
        [(700001, new_doc_text)], "doc_id bigint, text string"
    )
    up = update(spark, out, stats["centroids"], new_docs)
    assert up["n_new_chunks"] >= 1 and up["n_dropped_chunks"] == 0
    assert current_version(os.path.join(out, "ivf")) == 0  # append, no flip

    hits = search(
        spark, out, stats["centroids"], [(0, new_doc_text[:256])], dim=32, k=3
    ).collect()
    assert hits and hits[0].doc_id == 700001
    assert hits[0].cos_sim >= 0.9999

    empty_new = spark.createDataFrame([], "doc_id bigint, text string")
    deleted = spark.createDataFrame([(700001,)], "doc_id bigint")
    up2 = update(spark, out, stats["centroids"], empty_new, deleted)
    assert up2["n_dropped_chunks"] == up["n_new_chunks"]
    assert current_version(os.path.join(out, "ivf")) == 1  # compaction flip

    after = search(
        spark, out, stats["centroids"], [(0, new_doc_text[:256])], dim=32, k=3
    ).collect()
    assert all(r.doc_id != 700001 for r in after)

    # idempotent replay: re-deleting reports 0 dropped (live-index count)
    up3 = update(spark, out, stats["centroids"], empty_new, deleted)
    assert up3["n_dropped_chunks"] == 0

    # replace-in-one-call: same doc_id deleted AND re-ingested — the
    # replacement text must be retrievable and the old text gone
    v2_text = "granite harbor whisper falcon meadow " * 12
    doc5 = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") == 5
    )
    old5 = doc5.select("text").first()["text"]
    up4 = update(
        spark,
        out,
        stats["centroids"],
        spark.createDataFrame([(5, v2_text)], "doc_id bigint, text string"),
        spark.createDataFrame([(5,)], "doc_id bigint"),
    )
    assert up4["n_dropped_chunks"] >= 1 and up4["n_new_chunks"] >= 1
    got = search(
        spark, out, stats["centroids"], [(0, v2_text[:256])], dim=32, k=3
    ).collect()
    assert got and got[0].doc_id == 5 and got[0].cos_sim >= 0.9999
    stale = search(
        spark, out, stats["centroids"], [(0, old5[:256])], dim=32, k=3
    ).collect()
    assert all(r.doc_id != 5 for r in stale)


def test_rag_snapshot_sync(spark, sf_dir, tmp_path):
    """Dump-to-dump maintenance with NO per-doc bookkeeping: ingest
    snapshot A, sync to snapshot B (one doc edited, one removed, one
    added).  The edited doc's new text and the added doc must retrieve;
    the removed doc and the edited doc's OLD text must not."""
    from rag_ingest import ingest, search, sync

    out = str(tmp_path / "rag")
    stats = ingest(spark, sf_dir, out, chunk_chars=256, overlap=32, dim=32)

    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    ids = [r["doc_id"] for r in base.orderBy("doc_id").limit(3).collect()]
    edited_id, removed_id = ids[0], ids[1]
    v2_text = "orchid tundra velvet quasar bramble " * 12
    added_text = "saffron glacier mandolin pepper nimbus " * 12
    new_snapshot = (
        base.where(~F.col("doc_id").isin([edited_id, removed_id]))
        .unionByName(
            spark.createDataFrame(
                [(edited_id, v2_text), (900001, added_text)],
                "doc_id bigint, text string",
            )
        )
    )
    up = sync(spark, out, stats["centroids"], base, new_snapshot)
    assert up["diff_counts"]["changed"] == 1
    assert up["diff_counts"]["removed"] == 1
    assert up["diff_counts"]["added"] == 1
    assert up["n_dropped_chunks"] >= 1 and up["n_new_chunks"] >= 2

    hits = search(
        spark, out, stats["centroids"],
        [(0, v2_text[:256]), (1, added_text[:256])], dim=32, k=3,
    ).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r.qid, []).append(r)
    assert by_q[0][0].doc_id == edited_id and by_q[0][0].cos_sim >= 0.9999
    assert by_q[1][0].doc_id == 900001 and by_q[1][0].cos_sim >= 0.9999
    # the removed doc's chunks are gone from the index
    assert all(
        r.doc_id != removed_id for rs in by_q.values() for r in rs
    )


def test_rag_hybrid_search_fuses_and_tracks_updates(spark, sf_dir, tmp_path):
    """Hybrid RRF over the example's two indexes: a query that IS a
    chunk's text must surface that chunk through BOTH lists (top fused
    hit), and after retiring its document the chunk disappears from
    hybrid results — the term index is maintained in the same
    update() call as the IVF index."""
    from rag_ingest import hybrid_search, ingest, update

    out = str(tmp_path / "rag")
    stats = ingest(spark, sf_dir, out, chunk_chars=256, overlap=32, dim=32)

    from ubw_spark.operators.versioned import resolve_root

    src = (
        spark.read.parquet(resolve_root(os.path.join(out, "chunks")))
        .orderBy("chunk_id")
        .limit(1)
        .collect()[0]
    )
    hits = hybrid_search(
        spark, out, stats["centroids"], src.chunk_text, k=5
    ).collect()
    assert hits, "hybrid search returned nothing"
    top = max(hits, key=lambda r: (r.rrf, -r.chunk_id))
    assert top.chunk_id == src.chunk_id, "self-chunk must win the fusion"
    # present in BOTH lists: identical text is a lexical and dense match
    assert top.lex_rank is not None and top.dense_rank is not None

    # retire the chunk's document; the hybrid result must forget it
    gone = spark.createDataFrame([(src.doc_id,)], "doc_id bigint")
    st = update(
        spark, out, stats["centroids"],
        new_docs=spark.createDataFrame([], "doc_id bigint, text string"),
        deleted_doc_ids=gone,
        chunk_chars=256, overlap=32, dim=32,
    )
    assert st["n_dropped_chunks"] >= 1
    after = hybrid_search(
        spark, out, stats["centroids"], src.chunk_text, k=5
    ).collect()
    assert all(r.doc_id != src.doc_id for r in after)
