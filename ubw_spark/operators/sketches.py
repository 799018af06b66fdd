"""Count-min sketch: fixed-size frequency tracking for unbounded streams.

At 100 TB the exact token-frequency table is itself huge (billions of
distinct n-grams); a count-min sketch (Cormode & Muthukrishnan 2005)
bounds the state at ``depth x width`` counters REGARDLESS of corpus
size, at the price of one-sided error: estimates never undercount,
and overcount by at most eps*N with probability 1-delta
(width ~ e/eps, depth ~ ln(1/delta)).  The production uses: heavy-
hitter screening before an exact pass, frequency features for quality
scoring, and cross-dump frequency drift without re-reading old dumps
(sketches MERGE by cell-wise addition — ``cms_merge``).

Spark shape: building is one explode (depth rows per item, map-only)
plus one map-side-combining groupBy whose key space is AT MOST
depth*width — the shuffle is bounded by the sketch size, not the data.
Estimation is MAP-ONLY on the probe side: ``depth`` broadcast joins
(one per sketch row) and a ``least`` across the looked-up cells — no
explode, no groupBy, zero probe-side exchanges (plan-asserted).
Hashes are the portable md5 recipe so every cell is oracle-checkable
in SQL.

The sketch's (width, depth) ride in the ``cnt`` column's METADATA
(zero runtime cost, survives projection/union/parquet), and both
``cms_merge`` and ``cms_estimate`` fail loudly on a shape mismatch —
merging or probing across shapes would silently UNDERCOUNT, breaking
the module's one invariant (the Bloom store's m-mismatch rule).

Reference parity: extends the reference's aggregate vocabulary
(SURVEY.md §2.4; no sketch surface exists there) with the LLM-pipeline
frequency primitive, same pattern as the Bloom decontamination family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.dedup import portable_hash


def _cell_bucket(item_col: Column, i: int, width: int) -> Column:
    """Row i's bucket for an item — THE hash recipe (md5 salted with
    ``cms:{i}:``), shared by build and estimate and mirrored literally
    by the SQL oracles."""
    return portable_hash(F.concat(F.lit(f"cms:{i}:"), item_col)) % width


def _validate(width: int, depth: int) -> None:
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1; got {width}x{depth}")


def _shape(sketch: DataFrame) -> tuple[int | None, int | None]:
    m = sketch.schema["cnt"].metadata
    return m.get("cms_width"), m.get("cms_depth")


def _check_shape(sketch: DataFrame, where: str) -> tuple[int, int]:
    w, d = _shape(sketch)
    if w is None or d is None:
        raise ValueError(
            f"{where}: input is not a cms_build sketch "
            "(missing cms_width/cms_depth metadata on `cnt`)"
        )
    return w, d


def cms_pairs(item_col: Column, width: int, depth: int) -> Column:
    """``array<struct<i,bucket>>`` — the depth hash cells of an item."""
    _validate(width, depth)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _cell_bucket(item_col, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Sketch a column of items into ``(i, bucket, cnt)`` cells —
    at most depth*width rows however large ``df`` is; (width, depth)
    are pinned in the ``cnt`` column metadata.

    ``weight_col`` counts each row with a weight (e.g. token counts
    pre-aggregated per document) instead of 1."""
    cols = [F.explode(cms_pairs(F.col(item_col), width, depth)).alias("p")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("__w"))
    w = F.col("__w") if weight_col is not None else F.lit(1).cast("long")
    return (
        df.select(*cols)
        .groupBy(F.col("p.i").alias("i"), F.col("p.bucket").alias("bucket"))
        .agg(
            F.sum(w).alias(
                "cnt", metadata={"cms_width": width, "cms_depth": depth}
            )
        )
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches — sketch(A ∪ B) exactly (tested);
    the cross-dump merge needs no access to either dump's rows.

    Raises on a (width, depth) mismatch: cross-shape cells don't align,
    and the merged estimates would silently UNDERCOUNT."""
    sa, sb = _check_shape(a, "cms_merge"), _check_shape(b, "cms_merge")
    if sa != sb:
        raise ValueError(
            f"cms_merge: shape mismatch {sa[0]}x{sa[1]} vs {sb[0]}x{sb[1]}"
        )
    return (
        a.unionByName(b)
        .groupBy("i", "bucket")
        .agg(
            F.sum("cnt").alias(
                "cnt", metadata={"cms_width": sa[0], "cms_depth": sa[1]}
            )
        )
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimated count per probe ROW (``est`` appended to the probe's
    columns): min over the item's depth cells, missing cell = 0.
    Callers wanting one row per distinct item pass distinct probes.

    MAP-ONLY on the probe side: one broadcast join per sketch row —
    each is bounded at ``width`` cells BY CONSTRUCTION, so these are
    the rare broadcasts safe at any corpus scale — then ``least``
    across the looked-up counts (coalesced to 0 FIRST: least skips
    NULLs).  No explode, no distinct, no groupBy: probes stream
    through without a single exchange, so estimation composes into
    map-side filter pipelines (heavy-hitter screening) at 100 TB.

    Raises if (width, depth) don't match the sketch's pinned shape —
    probing with the wrong shape would undercount silently."""
    _validate(width, depth)
    shape = _check_shape(sketch, "cms_estimate")
    if shape != (width, depth):
        raise ValueError(
            f"cms_estimate: sketch is {shape[0]}x{shape[1]}, "
            f"probed as {width}x{depth}"
        )
    out = probes
    for i in range(depth):
        row_i = sketch.where(F.col("i") == i).select(
            F.col("bucket").alias(f"__b{i}"), F.col("cnt").alias(f"__c{i}")
        )
        out = out.withColumn(
            f"__b{i}", _cell_bucket(F.col(item_col), i, width)
        ).join(F.broadcast(row_i), f"__b{i}", "left")
    cells = [
        F.coalesce(F.col(f"__c{i}"), F.lit(0).cast("long"))
        for i in range(depth)
    ]
    est = cells[0] if depth == 1 else F.least(*cells)
    return out.withColumn("est", est).drop(
        *[f"__b{i}" for i in range(depth)],
        *[f"__c{i}" for i in range(depth)],
    )
