"""Persisted MinHash-LSH index + incremental probe — the production
shape of dedup at 100 TB.

Re-banding a 100 TB corpus for every incoming batch is the dominant
cost of naive incremental dedup: signatures are ~1000× smaller than the
documents, and they don't change.  So band the corpus ONCE
(:func:`write_minhash_index`), persist the banded keys as a
band-partitioned parquet layout plus a compact shingle store, and dedup
/ decontaminate each incoming batch against the index
(:func:`probe_minhash_index`) without touching corpus text again.

Scale posture:

- the index write is map-only over the corpus (shingle → sign → band)
  plus one repartition so each band lands in O(1) files — no
  partitionBy small-file explosion;
- probing reads ONLY the probed bands' partitions: ``probe_bands=b``
  becomes a static partition filter (PartitionFilters in the plan,
  asserted in tests), scanning b/bands of the index.  Fewer bands
  trades recall for IO exactly like IVF's nprobe — a pair with Jaccard
  j survives with prob 1-(1-j^r)^b, so at j≥0.9, 8 of 32 bands still
  catches >99.9% of true near-dups;
- the incoming batch is small relative to the corpus, so its banded
  keys broadcast by default (``broadcast_probe=False`` switches to a
  shuffled join for batch-sized probes, mirroring
  dedup.minhash_contamination_pairs(large_probe=True));
- the verify join fetches shingles for candidate pairs only.

Naming: persisted columns are ``band``/``key`` (not the in-memory
``__band``/``__key``) because Spark's file listing hides paths starting
with underscores — a ``__band=0`` partition directory would be
invisible on read.

Reference parity: this extends the reference's CRUD/upsert surface
(documentation/doc-01.md:136-158) the way a training-data lake needs —
the index IS the long-lived table, batches are the writes.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.operators.dedup import (
    DEFAULT_MAX_BUCKET,
    banded_minhash,
    cap_buckets,
)


def _bands_path(path: str) -> str:
    return posixpath.join(path, "bands")


def _docs_path(path: str) -> str:
    return posixpath.join(path, "docs")


def write_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    rows_per_band: int = 2,
    parallelism: int | None = None,
) -> None:
    """Materialize the corpus LSH index at ``path``: banded signature
    keys partitioned by band (``path/bands``) and the shingle store for
    candidate verification (``path/docs``).

    ``repartition("band")`` before ``partitionBy("band")`` coalesces
    each band into O(1) files instead of (num_tasks × bands) — same
    rationale as ivf.write_ivf_index."""
    sh, banded = banded_minhash(
        df, id_col, text_col, id_alias="corpus_id", sh_name="sh",
        k=k, num_hashes=num_hashes, bands=bands, rows_per_band=rows_per_band,
        parallelism=parallelism,
    )
    (
        banded.withColumnRenamed("__band", "band")
        .withColumnRenamed("__key", "key")
        .repartition("band")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(_bands_path(path))
    )
    sh.write.mode("overwrite").parquet(_docs_path(path))


def append_minhash_batch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    rows_per_band: int = 2,
) -> None:
    """Fold a new batch INTO the index (after probing it): append its
    banded keys and shingles, so the next batch dedups against corpus +
    this batch.  Probe-then-append per batch is the incremental-dedup
    loop — see tests/test_streaming.py for the foreachBatch wiring.

    Append-only by design: rewriting a 100 TB index per batch is the
    thing this module exists to avoid.  Ids must be unique across
    appends (standard lakehouse contract); removals go through a
    compaction rewrite, not this path."""
    sh, banded = banded_minhash(
        df, id_col, text_col, id_alias="corpus_id", sh_name="sh",
        k=k, num_hashes=num_hashes, bands=bands, rows_per_band=rows_per_band,
    )
    (
        banded.withColumnRenamed("__band", "band")
        .withColumnRenamed("__key", "key")
        .repartition("band")
        .write.mode("append")
        .partitionBy("band")
        .parquet(_bands_path(path))
    )
    sh.write.mode("append").parquet(_docs_path(path))


def probe_minhash_index(
    spark: SparkSession,
    path: str,
    probe: DataFrame,
    id_col: str,
    text_col: str,
    *,
    probe_bands: int | None = None,
    threshold: float = 0.4,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    broadcast_probe: bool = True,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    rows_per_band: int = 2,
    parallelism: int | None = None,
) -> DataFrame:
    """Near-dup pairs between a written index and an incoming batch:
    (corpus_id, probe_id, jaccard ≥ threshold).

    ``probe_bands`` limits the sweep to the first N bands — a STATIC
    partition filter on the index scan (recall/IO knob; None = all).
    The banding parameters must match the ones the index was written
    with (they are part of the layout contract, like IVF centroids)."""
    p_sh, p_banded = banded_minhash(
        probe, id_col, text_col, id_alias="probe_id", sh_name="sh_probe",
        k=k, num_hashes=num_hashes, bands=bands, rows_per_band=rows_per_band,
        parallelism=parallelism,
    )
    p_banded = p_banded.withColumnRenamed("__band", "band").withColumnRenamed(
        "__key", "key"
    )
    idx = spark.read.parquet(_bands_path(path))
    if probe_bands is not None:
        idx = idx.where(F.col("band") < probe_bands)
        p_banded = p_banded.where(F.col("band") < probe_bands)
    if max_bucket is not None:
        idx = cap_buckets(idx, ["band", "key"], max_bucket)
    maybe_bc = broadcast if broadcast_probe else (lambda d: d)
    cands = (
        idx.join(maybe_bc(p_banded), ["band", "key"])
        .select("corpus_id", "probe_id")
        .distinct()
    )
    c_sh = spark.read.parquet(_docs_path(path))
    inter = F.size(F.array_intersect("sh", "sh_probe"))
    union = F.size(F.array_union("sh", "sh_probe"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        cands.join(c_sh, "corpus_id")
        .join(maybe_bc(p_sh), "probe_id")
        .where(jac >= threshold)
        .select("corpus_id", "probe_id", F.round(jac, 4).alias("jaccard"))
    )


def compact_minhash_index(
    spark: SparkSession,
    path: str,
    drop_ids: DataFrame,
    id_col: str = "corpus_id",
) -> None:
    """Rewrite the index without ``drop_ids`` (one column of ids) — the
    removal half of the append-only contract: after canonical selection
    kills near-dup losers, compaction stops their signatures from
    matching future batches.

    Cost model: one anti-join pass over each store, band partitioning
    preserved.  At 100 TB run it at the same cadence as any lakehouse
    table compaction (per N appends, not per batch); the band store
    rewrite shuffles only (id, band, key) rows, never documents.  The
    rewrite stages to a sibling directory first and swaps via rename —
    overwriting a parquet dir while reading it races the scan."""
    import shutil as _sh

    drops = drop_ids.select(F.col(drop_ids.columns[0]).alias(id_col))
    bands_new = _bands_path(path) + ".compact"
    docs_new = _docs_path(path) + ".compact"
    (
        spark.read.parquet(_bands_path(path))
        .join(broadcast(drops), id_col, "left_anti")
        .repartition("band")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(bands_new)
    )
    (
        spark.read.parquet(_docs_path(path))
        .join(broadcast(drops), id_col, "left_anti")
        .write.mode("overwrite")
        .parquet(docs_new)
    )
    for cur, new in ((_bands_path(path), bands_new), (_docs_path(path), docs_new)):
        _sh.rmtree(cur)
        _sh.move(new, cur)
