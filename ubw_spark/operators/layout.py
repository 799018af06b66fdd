"""Multi-dimensional data layout: Z-order (Morton) clustering for
scan pruning.

The 100 TB problem this solves: parquet row-group and file pruning
works off per-file min/max statistics, and a table laid out by ONE
sort key prunes only on that key.  Interleaving the bits of several
normalized sort keys (the Z-order / Morton curve — Morton 1966;
the technique behind Delta Lake's OPTIMIZE ZORDER BY and Iceberg's
sort-order z-ordering) makes every file's bounding box narrow in ALL
the interleaved dimensions, so selective predicates on any of them
skip most files.  At 100 TB the difference between "scan 3 files" and
"scan 30 000 files" IS the query time.

Shapes:

- :func:`bucketize` / :func:`zvalue` are pure JVM bit arithmetic —
  map-only, codegen'd, no Python.
- Column normalization needs per-column stats: ONE tiny one-row
  aggregate, broadcast back via crossJoin — the plan stays lazy and
  the lint-visible shape is the repo-standard "crossJoin broadcasts a
  one-row aggregate".  Two bucketing kernels: uniform (min, max) —
  exact and oracle-portable — and ``cutpoints="quantile"`` (approx-
  percentile equal-mass buckets, the Delta OPTIMIZE choice) for
  skewed columns, where uniform buckets would park most rows in one
  bucket and degrade the curve to a sort on the other dims.
- :func:`zorder_write` lays files out with ``repartitionByRange`` on
  the z-value + an intra-partition sort.  RangePartitioning samples
  the z-value to pick balanced cut points — that sampling pass is
  Spark's own machinery and exactly what a 1000-executor OPTIMIZE job
  runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default bits per dimension (2 dims × 8 bits = 16-bit z-values).
DEFAULT_BITS = 8

#: Max paths per read call in :func:`read_pruned` (batched-union above).
_READ_BATCH = 1000


def bucketize(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Uniform bucket index in [0, 2^bits) from (min, max) bounds.

    The expression order — subtract, divide by (range + 1e-9), multiply
    by 2^bits, floor, clamp — is part of the contract: the DuckDB
    oracle mirrors it token for token, and IEEE doubles make the result
    engine-identical only when the operation ORDER is identical.
    NULLs land in bucket 0 (they sort first, same as NULLS FIRST)."""
    nb = 1 << bits
    raw = F.floor(
        (col.cast("double") - mn) / (mx - mn + F.lit(1e-9)) * F.lit(nb)
    )
    # coalesce BEFORE least: Spark's least() SKIPS nulls (least(NULL,
    # 255) = 255), so clamping first would silently send NULLs to the
    # TOP bucket — and engines disagree on least-with-NULL semantics,
    # so this ordering is also what keeps the SQL twin portable.
    return F.least(
        F.coalesce(raw, F.lit(0)), F.lit(nb - 1)
    ).cast("long")


def bucketize_by_cutpoints(col: Column, cuts: Column, bits: int) -> Column:
    """Bucket index in [0, 2^bits) from an ARRAY of ascending cutpoints
    (length 2^bits - 1): bucket = number of cutpoints <= value.

    This is the quantile-bucketing kernel — with cutpoints at the
    1/2^bits .. (2^bits-1)/2^bits approximate quantiles, every bucket
    holds ~equal row mass regardless of the column's distribution,
    which is what Delta's OPTIMIZE ZORDER uses instead of uniform
    (min, max) ranges.  Cost: one pass over the cutpoint array per row
    (2^bits - 1 comparisons), all codegen'd JVM — at the default 8 bits
    that is 255 integer compares, far below the per-row hash work any
    shuffle already does.  NULLs land in bucket 0 (each comparison is
    NULL → contributes 0), matching the uniform kernel.

    The count is clamped to 2^bits - 1, so the [0, 2^bits) contract
    holds even for an OVERSIZED cutpoint array (e.g. cuts built for 32
    buckets fed to bits=4) — without the clamp, interleave() would read
    only the low ``bits`` bits and silently alias high buckets onto low
    ones, scrambling the curve with no error anywhere."""
    v = col.cast("double")
    return F.least(
        F.aggregate(
            cuts,
            F.lit(0).cast("long"),
            lambda acc, c: acc
            + F.coalesce(F.when(v >= c, F.lit(1)), F.lit(0)).cast("long"),
        ),
        F.lit((1 << bits) - 1).cast("long"),
    )


def exact_quantile_cuts(df: DataFrame, col: str, nb: int) -> DataFrame:
    """ONE-row frame with the exact nb-quantile cutpoints of ``col`` as
    a sorted array ``__cuts`` (length nb - 1) — the oracle-parity twin
    of the ``approx_percentile`` path in :func:`with_zvalue`.

    Definition (pure counting, NO interpolation, so any engine
    reproduces it exactly): cutpoint i (i = 1..nb-1) is the smallest
    value whose cumulative count reaches ``ceil(i * n / nb)``.  Built
    from a groupBy on the value (distinct-value cardinality, not raw
    rows) + a cumulative window over that aggregate + a broadcast of
    the nb-1 target ranks; the result is nb-1 doubles, broadcast back
    wherever the caller crossJoins it.  Use for oracled bucketing and
    tests; production layout uses the approx path (one pass, no
    distinct-value shuffle)."""
    vc = (
        df.groupBy(F.col(col).cast("double").alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select("__v", F.sum("__c").over(w).alias("__cc"))
    n1 = df.agg(F.count(F.lit(1)).alias("__n"))
    ranks = (
        df.sparkSession.range(1, nb)
        .select(F.col("id").alias("__i"))
        .crossJoin(F.broadcast(n1))
        .select("__i", F.ceil(F.col("__i") * F.col("__n") / nb).alias("__r"))
    )
    cuts = (
        cum.crossJoin(F.broadcast(ranks))
        .where(F.col("__cc") >= F.col("__r"))
        .groupBy("__i")
        .agg(F.min("__v").alias("__cut"))
    )
    return cuts.agg(F.array_sort(F.collect_list("__cut")).alias("__cuts"))


def interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave: bit j of dimension i → z bit ``j*ndims + i``.
    Pure shift/mask/or chain — ``ndims * bits`` terms, all codegen'd.
    Requires ``ndims * bits <= 63`` (signed BIGINT)."""
    ndims = len(buckets)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds 63 z-bits")
    z = F.lit(0).cast("long")
    for i, b in enumerate(buckets):
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, j).bitwiseAND(F.lit(1)),
                    j * ndims + i,
                )
            )
    return z


def zvalue_sql(cols: list[str], bits: int = DEFAULT_BITS) -> str:
    """The DuckDB/ANSI twin of :func:`interleave` over pre-bucketized
    integer columns ``cols`` — used by oracles and by generated-SQL
    consumers (jsonquery-style).  Token-mirrors the Spark expression."""
    terms = [
        f"((({c} >> {j}) & 1) << {j * len(cols) + i})"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return " | ".join(terms)


def with_zvalue(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    out_col: str = "__z",
    *,
    cutpoints: str = "uniform",
) -> DataFrame:
    """Append the z-value of ``cols`` (numeric) as ``out_col``.

    One one-row stats aggregate broadcast back via crossJoin;
    everything else is map-side bit math.

    ``cutpoints`` picks the bucketing kernel:

    - ``"uniform"`` — equal-width (min, max) buckets; exact, cheap,
      engine-portable (the DuckDB oracle mirrors it token for token),
      but skew-sensitive: a power-law column parks most rows in one
      bucket and the curve degenerates to a sort on the other dims.
    - ``"quantile"`` — approximate-quantile cutpoints
      (``approx_percentile``, same one-row aggregate), equal row mass
      per bucket regardless of skew — the Delta OPTIMIZE choice.  The
      stats pass is approximate, so this mode is for LAYOUT, not for
      oracle-parity arithmetic."""
    if cutpoints not in ("uniform", "quantile"):
        raise ValueError(f"cutpoints must be uniform|quantile: {cutpoints}")
    nb = 1 << bits
    aggs = []
    for c in cols:
        if cutpoints == "uniform":
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        else:
            probs = [i / nb for i in range(1, nb)]
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), probs, 10_000
                ).alias(f"__qs_{c}")
            )
    stats = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(stats))
    if cutpoints == "uniform":
        buckets = [
            bucketize(
                F.col(c), F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits
            )
            for c in cols
        ]
    else:
        buckets = [
            bucketize_by_cutpoints(F.col(c), F.col(f"__qs_{c}"), bits)
            for c in cols
        ]
    keep = [f for f in df.columns]
    # Buckets land as NAMED columns and the interleave is one parsed
    # zvalue_sql expression over them (round 13): the Column-composed
    # interleave() references each bucket subtree ``bits`` times — no
    # CSE inside an expression tree, so bucketize re-ran per reference
    # — and cost ndims×bits py4j round trips at plan-build time.  The
    # named projection evaluates each bucket once; the SQL text mirrors
    # interleave token for token (``>>`` ≡ shiftrightunsigned for the
    # non-negative bucket ids), CAST to BIGINT matching interleave's
    # long accumulator.
    bnames = [f"__bk_{i}" for i in range(len(buckets))]
    named = j.select(
        *keep, *[b.alias(n) for b, n in zip(buckets, bnames)]
    )
    z = F.expr(f"CAST(({zvalue_sql(bnames, bits)}) AS BIGINT)")
    return named.select(*keep, z.alias(out_col))


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = DEFAULT_BITS,
    num_files: int = 8,
    extra_partition_cols: list[str] | tuple[str, ...] = (),
    cutpoints: str = "uniform",
) -> DataFrame:
    """The layout core shared by :func:`zorder_write` and
    ``sources.writers.write_table(zorder_by=...)``: range-partition on
    (extra partition cols, z-value) — balanced cuts via Spark's range
    sampler — sort within each partition, drop the helper column.

    The projection dropping ``__z`` sits ABOVE the sort and does not
    reorder rows, so file contents stay curve-ordered and parquet
    min/max stats come out tight in every interleaved dimension."""
    z = with_zvalue(df, list(cols), bits, cutpoints=cutpoints)
    parts = [F.col(c) for c in extra_partition_cols]
    return (
        z.repartitionByRange(num_files, *parts, F.col("__z"))
        .sortWithinPartitions(*parts, F.col("__z"))
        .drop("__z")
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    *,
    bits: int = DEFAULT_BITS,
    num_files: int = 8,
    max_records_per_file: int | None = None,
    cutpoints: str = "uniform",
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``
    (see :func:`zorder_layout`); ``cutpoints="quantile"`` switches to
    skew-robust equal-mass buckets (see :func:`with_zvalue`)."""
    out = zorder_layout(
        df, cols, bits=bits, num_files=num_files, cutpoints=cutpoints
    )
    w = out.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def footer_bounds(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file bounding boxes from parquet FOOTER statistics only —
    no data pages are read.

    (file, n_row_groups, n_rows, min_<col>, max_<col> ...), numeric
    columns only (min/max surface as double).

    This is what a pruning planner / OPTIMIZE job consults: at 100 TB
    the footers are ~10^-5 of the bytes, so layout-quality reports and
    skip-index construction must come from metadata, not scans.  The
    file LIST is collected on the driver (bounded: one string per
    file, the same listing every Spark scan performs); footer reads
    are distributed — each task opens only its files' metadata via
    pyarrow.  Local-path scheme only (file:); object stores go through
    the FS-aware pyarrow filesystem at deployment."""
    from urllib.parse import unquote, urlparse

    import pandas as pd

    # inputFiles() returns URIs (file:/...%20...): decode the path part
    # or files under directories with spaces/percent chars fail to open.
    files = [
        unquote(urlparse(f).path)
        for f in spark.read.parquet(path).inputFiles()
    ]
    if files and cols:
        # Validate on the DRIVER against one real footer: a misspelled
        # or partition column (present in the Spark schema, absent from
        # footers) would otherwise surface as an opaque executor-side
        # KeyError stack dump.
        import pyarrow.parquet as pq

        md = pq.ParquetFile(files[0]).metadata
        present = {
            md.schema.column(i).name for i in range(md.num_columns)
        }
        missing = [c for c in cols if c not in present]
        if missing:
            raise ValueError(
                f"columns {missing} not in parquet footers of {path} "
                "(partition columns live in directory names, not "
                "footers)"
            )
    schema = ", ".join(
        ["file string", "n_row_groups long", "n_rows long"]
        + [f"min_{c} double, max_{c} double" for c in cols]
    )
    files_df = spark.createDataFrame([(f,) for f in files], "path string")

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                rec = {
                    "file": p,
                    "n_row_groups": md.num_row_groups,
                    "n_rows": md.num_rows,
                }
                for c in cols:
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx[c]).statistics
                        if st is not None and st.has_min_max:
                            mins.append(float(st.min))
                            maxs.append(float(st.max))
                    rec[f"min_{c}"] = min(mins) if mins else None
                    rec[f"max_{c}"] = max(maxs) if maxs else None
                rows.append(rec)
            yield pd.DataFrame(rows)

    return files_df.mapInPandas(read_footers, schema)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    *,
    target_mb: int = 128,
    zorder_by: list[str] | None = None,
) -> dict:
    """Compact a small-file parquet directory into ~``target_mb`` files
    — the OPTIMIZE-compaction half of lake maintenance (the other half,
    clustering, is :func:`zorder_write`; pass ``zorder_by`` to do both
    in the single rewrite they should share).

    Sizing comes from the filesystem METADATA (one Hadoop FS listing —
    no data read), so the plan cost is known before any scan.  Without
    z-ordering the rewrite uses ``coalesce`` — a NARROW dependency, no
    shuffle: each output task concatenates whole input files, which is
    exactly what compaction wants (skewed input-file sizes average out
    over many files; a z-ordered rewrite shuffles anyway).

    Writes to ``dst`` (must differ from ``src``); the caller owns the
    atomic swap — same contract as every staged rewrite here.  Returns
    {files_before, bytes_before, target_files, rows}."""
    if src.rstrip("/") == dst.rstrip("/"):
        raise ValueError("dst must differ from src (staged rewrite)")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(src)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    # Recursive listing: a non-recursive listStatus on a PARTITIONED
    # layout sees only the partition directories, sizes to total=0, and
    # would silently coalesce terabytes into one file.  Nested files
    # mean a partitioned layout — refuse it outright: a flat rewrite
    # would also silently drop the partition structure; compact each
    # partition directory instead.
    it = fs.listFiles(p, True)
    sizes, nested = [], False
    src_uri = fs.makeQualified(p).toString().rstrip("/")
    while it.hasNext():
        s = it.next()
        if not s.getPath().getName().endswith(".parquet"):
            continue
        sizes.append(s.getLen())
        if s.getPath().getParent().toString().rstrip("/") != src_uri:
            nested = True
    if nested:
        raise ValueError(
            f"{src} is a partitioned layout (parquet files in "
            "subdirectories); compact each partition directory"
        )
    if not sizes:
        raise ValueError(f"no parquet files under {src}")
    total = sum(sizes)
    n = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if zorder_by:
        zorder_write(df, zorder_by, dst, num_files=n)
    else:
        df.coalesce(n).write.mode("overwrite").parquet(dst)
    # Row count from the output's FOOTERS — a data-pass count() over
    # the freshly written files would be a second full read.
    rows = (
        footer_bounds(spark, dst, [])
        .agg(F.sum("n_rows"))
        .first()[0]
    )
    return {
        "files_before": len(sizes),
        "bytes_before": total,
        "target_files": n,
        "rows": int(rows),
    }


def read_pruned(
    spark,
    path: str,
    ranges: dict[str, tuple[float, float]],
) -> tuple[DataFrame, dict]:
    """Read only the files whose footer bounding box intersects every
    ``col: (lo, hi)`` range — manual file skipping, the read-side
    payoff of :func:`zorder_write` (this is what a lakehouse log does
    with its per-file stats; plain parquet directories get it here).

    Returns ``(df, stats)`` where df carries the files' rows with the
    range predicates REAPPLIED (bounding boxes admit false positives —
    a file intersecting the box may still hold no matching row; the
    residual filter restores exactness), and stats =
    {files_total, files_read}.

    The skip test WIDENS each box by a few ulps: footer stats come
    back through float64 (footer_bounds), and an int64 column with
    values above 2^53 rounds — an unwidened ``mx < lo`` could then
    skip a file that really contains matching rows, and the residual
    filter can only drop rows, never restore unread ones.  False
    positives are safe; false negatives are data loss.

    The candidate file list is collected on the driver — bounded: one
    row per file, the same cardinality every Spark scan's file index
    holds.  A file with no stats for some column (all-NULL row group)
    is conservatively KEPT.

    Large kept lists are read in batches of ``_READ_BATCH`` paths
    unioned together: ``spark.read.parquet(*paths)`` marshals every
    path through the py4j varargs call in one go, which is the kind of
    driver argv-style API that degrades at 10^5 files; per-batch
    ``load(list)`` keeps each call bounded while the union stays a
    metadata-only plan node (each branch is its own file-index scan,
    no shuffle)."""

    def pad(v: float) -> float:
        # >= 4x the float64 representation error |v|*2^-53 of any
        # int64 coerced through double
        return abs(v) * 2.0**-50

    cols = list(ranges)
    bounds = footer_bounds(spark, path, cols).collect()
    keep = []
    for r in bounds:
        ok = True
        for c, (lo, hi) in ranges.items():
            mn, mx = r[f"min_{c}"], r[f"max_{c}"]
            if (
                mn is not None
                and mx is not None
                and (mx + pad(mx) < lo or mn - pad(mn) > hi)
            ):
                ok = False
                break
        if ok:
            keep.append(r["file"])
    stats = {"files_total": len(bounds), "files_read": len(keep)}
    if not keep:
        df = spark.read.parquet(path).limit(0)
    else:
        batches = [
            spark.read.format("parquet").load(keep[i : i + _READ_BATCH])
            for i in range(0, len(keep), _READ_BATCH)
        ]
        df = batches[0]
        for b in batches[1:]:
            df = df.union(b)
    for c, (lo, hi) in ranges.items():
        df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
    return df, stats


def file_bounds(df_with_files: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file bounding boxes: (file, min/max of each col) — the
    pruning-quality report.  Input must carry ``__file`` (use
    ``spark.read.parquet(path).withColumn('__file',
    F.input_file_name())``).  Sum of normalized box volumes ≈ expected
    fraction of files a random point predicate must touch."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df_with_files.groupBy("__file").agg(*aggs)
