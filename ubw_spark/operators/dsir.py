"""DSIR — data selection via importance resampling over hashed n-grams.

Spark-native re-expression of DSIR (Xie et al., 2023,
arXiv:2302.03169, "Data Selection for Language Models via Importance
Resampling"), hashed-ngram variant: model the target corpus (the data
you wish you had more of) and the raw source pool as multinomials over
hashed n-gram buckets, weight every source document by the
log-likelihood ratio of its features, and resample with Gumbel top-k —
documents that "look like" the target are kept in proportion to how
much more likely the target model finds them.

This is the selection member of the curation family (quota/mix/A-ES
sampling live in curation.py and splits.py); unlike a quality SCORE it
is distribution-matching: the weights depend on a target corpus, not
on fixed heuristics.

100 TB shape:

- Featurization is map-only (split → n-gram transform → portable md5
  hash mod buckets); the bucket tables are ``buckets`` rows (10^3-10^5
  — the paper uses 10k), a broadcast-sized model no matter the corpus.
- The per-document weight needs one groupBy (doc, bucket) — map-side
  combinable — and a join against the broadcast log-ratio table; no
  shuffle keyed on raw text ever happens.
- Selection is one global top-k (TakeOrderedAndProject) or, for
  per-group quotas, the A-ES window shape.

Determinism/oracle: bucket hashing is the repo's portable md5 hash,
the Gumbel uniform is hash-derived in (0, 1) exclusive, and ranking
keys are rounded to 12 dp on both engine sides (repo convention, see
operators/splits.py) so a 1-ulp libm divergence cannot flip an order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ubw_spark.functions.text import tokens
from ubw_spark.operators.dedup import portable_hash

#: Hash-uniform denominator: portable_hash yields 32-bit values.
_HASH_SPAN = float(1 << 32)


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    buckets: int = 1024,
    carry: list[tuple[str, "F.Column"]] | None = None,
) -> DataFrame:
    """(id, __bucket) — one row per n-gram OCCURRENCE, bucketed by the
    portable md5 hash.  n=2 (bigrams) is the paper's default feature
    class; docs shorter than n tokens contribute nothing.

    ``carry``: extra (name, expression-over-``df``) columns replicated
    onto every feature row — lets one featurization pass serve several
    downstream aggregates (e.g. a target-membership flag) instead of
    tokenizing the corpus once per consumer."""
    extra = carry or []
    toks = tokens(F.col(text_col))
    d = df.select(
        F.col(id_col), toks.alias("__toks"), *[c.alias(a) for a, c in extra]
    ).where(F.size("__toks") >= n)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at("__toks", i + j + 1) for j in range(n)]
        ),
    )
    return d.select(
        F.col(id_col),
        F.explode(grams).alias("__gram"),
        *[F.col(a) for a, _ in extra],
    ).select(
        id_col,
        (portable_hash(F.col("__gram")) % buckets).alias("__bucket"),
        *[F.col(a) for a, _ in extra],
    )


def _bucket_counts(feats: DataFrame, name: str) -> DataFrame:
    return feats.groupBy("__bucket").agg(F.count(F.lit(1)).alias(name))


def dsir_log_weights(
    source: DataFrame,
    target: DataFrame | None,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
    buckets: int = 1024,
    smoothing: float = 1.0,
    checkpoint: str | None = "local",
    target_predicate: "F.Column | None" = None,
    include_featureless: bool = True,
) -> DataFrame:
    """Per-source-document importance log-weight:
    (id, n_feats, log_weight) with
    log_weight = Σ_features [ln p_target(b) - ln p_source(b)] under
    add-``smoothing`` multinomials over the hash buckets.

    Documents with no features (shorter than n tokens) are reported
    with n_feats = 0 and log_weight = 0 — the neutral weight; a
    selection policy can exclude them explicitly.

    The log-ratio table has ``buckets`` rows and is broadcast; the
    (T, V)-style totals are a one-row broadcast.  The only shuffle
    keyed by document id is the final per-doc aggregate.

    ``target_predicate``: when the target corpus is a SUBSET of the
    source pool selected by a row predicate (the common DSIR setup —
    "docs that look like Wikipedia/English/..."), pass the predicate
    instead of a ``target`` frame (``target=None``) and the target
    bucket counts roll up from the SAME featurization pass as the
    source counts — the tokenize→n-gram→hash→explode kernel runs once
    over the pool instead of once per corpus.  Numerically identical:
    counting a doc's feature rows then filtering by membership commutes
    with filtering the doc first.

    ``include_featureless=False`` skips the left join back onto the
    source id table that reports never-featurized docs as (id, 0, 0.0)
    rows — callers that immediately drop n_feats = 0 (dsir_select)
    save a full source-id scan and a shuffle."""
    if target_predicate is not None:
        if target is not None:
            raise ValueError(
                "dsir_log_weights: pass target=None with target_predicate "
                "— the predicate DEFINES the target subset"
            )
        s_feats = hashed_ngram_features(
            source, id_col, text_col, n=n, buckets=buckets,
            carry=[("__is_t", target_predicate)],
        )
        # Membership is constant per document, so max() over its
        # feature rows is the flag itself; counting target occurrences
        # via the flagged rows equals featurizing the filtered corpus.
        per_doc_bucket = s_feats.groupBy(id_col, "__bucket").agg(
            F.count(F.lit(1)).alias("__k"),
            F.max("__is_t").alias("__is_t"),
        )
        t_feats = None
    else:
        s_feats = hashed_ngram_features(
            source, id_col, text_col, n=n, buckets=buckets
        )
        t_feats = hashed_ngram_features(
            target, id_col, text_col, n=n, buckets=buckets
        )
        # The (doc, bucket) aggregate is the ONE pass over the pool's
        # features; the source bucket counts roll up FROM it (sum of __k)
        # rather than re-aggregating s_feats — numerically identical, and
        # the expensive tokenize/hash/explode lineage is shared instead of
        # executing twice.
        per_doc_bucket = s_feats.groupBy(id_col, "__bucket").agg(
            F.count(F.lit(1)).alias("__k")
        )
    # Materialize the two feature aggregates (round 13): the source
    # (doc, bucket) frame feeds BOTH the bucket-count rollup and the
    # final per-doc join, and the target counts feed both the ratio
    # and the totals — without truncation each reference re-executes
    # the whole tokenize→hash→explode lineage (Catalyst has no
    # cross-branch CSE).  Both frames are bounded: (doc, distinct
    # buckets ≤ 1024) and exactly ``buckets`` rows.
    if checkpoint is not None:
        from ubw_spark.operators.iterate import truncate

        per_doc_bucket = truncate(per_doc_bucket, checkpoint, eager=False)
    sc = per_doc_bucket.groupBy("__bucket").agg(F.sum("__k").alias("__cs"))
    if t_feats is None:
        # Subset-target path: target counts roll up from the shared
        # (doc, bucket) aggregate — no second corpus featurization.
        tc = (
            per_doc_bucket.where(F.col("__is_t"))
            .groupBy("__bucket")
            .agg(F.sum("__k").alias("__ct"))
        )
    else:
        tc = _bucket_counts(t_feats, "__ct")
        if checkpoint is not None:
            tc = truncate(tc, checkpoint, eager=False)
    totals = sc.agg(F.sum("__cs").alias("__ts")).crossJoin(
        tc.agg(F.sum("__ct").alias("__tt"))
    )
    # A FEATURELESS target (empty corpus, or every doc shorter than n
    # tokens) makes __tt NULL, every log-ratio NULL, and the final
    # coalesce would silently hand back the neutral weight for every
    # document — dsir_select would then rank on pure Gumbel noise while
    # the caller believes it importance-resampled.  A broken target
    # model is a loud error, not a uniform sample.
    tt = F.when(
        F.col("__tt").isNull(),
        F.raise_error(
            F.lit(
                "dsir_log_weights: target corpus has NO features (empty, "
                f"or every document shorter than n={n} tokens) — the "
                "target multinomial is undefined; fix the target "
                "selection instead of sampling uniformly"
            )
        ).cast("bigint"),
    ).otherwise(F.col("__tt"))
    # Full outer over the two count tables: a bucket seen only in one
    # corpus still gets its smoothed probability in the other.
    ratio = (
        sc.join(tc, "__bucket", "full_outer")
        .crossJoin(broadcast(totals))
        .select(
            "__bucket",
            (
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(smoothing))
                    / (tt + F.lit(smoothing * buckets))
                )
                - F.log(
                    (F.coalesce(F.col("__cs"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("__ts") + F.lit(smoothing * buckets))
                )
            ).alias("__lr"),
        )
    )
    weights = (
        per_doc_bucket.join(broadcast(ratio), "__bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__k").alias("n_feats"),
            F.sum(F.col("__k") * F.col("__lr")).alias("log_weight"),
        )
    )
    if not include_featureless:
        # Every weights row aggregates ≥1 feature occurrence, so
        # n_feats ≥ 1 > 0 by construction — this is exactly the frame a
        # ``where(n_feats > 0)`` consumer sees after the left join.
        return weights.select(id_col, "n_feats", "log_weight")
    base = source.select(F.col(id_col))
    return base.join(weights, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
    )


def gumbel_key(id_col: str, salt: str = "dsir") -> F.Column:
    """Deterministic Gumbel(0,1) noise from the id hash: u in (0, 1)
    EXCLUSIVE (the +0.5 offset keeps both endpoints out — u = 1 would
    make -ln(-ln(u)) = +inf and hijack the sample, the same failure
    mode splits.py documents for u = 1 in A-ES)."""
    u = (portable_hash(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))) + F.lit(0.5)) / F.lit(_HASH_SPAN)
    return -F.log(-F.log(u))


def dsir_select(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    *,
    n: int = 2,
    buckets: int = 1024,
    smoothing: float = 1.0,
    salt: str = "dsir",
    target_predicate: "F.Column | None" = None,
) -> DataFrame:
    """Gumbel top-k importance resampling: keep the k source documents
    with the largest (log_weight + Gumbel noise) — a without-
    replacement sample from softmax(log_weight), per the Gumbel-max
    trick the paper uses.  Deterministic and engine-reproducible:
    noise is hash-derived, the ranking key is rounded to 12 dp, ties
    break on id.  Featureless documents are excluded (their neutral
    weight would otherwise compete on pure noise).

    Returns (id, n_feats, log_weight, sel_key, rank), rank 1..k.

    Numerics: the two addends are rounded to 6 dp BEFORE the sum —
    log_weight is a multi-term float sum whose reduction ORDER differs
    across engines (drift ~1e-15, which a 12-dp rounding of the sum
    could land on a boundary of); rounded at 6 dp each side first, the
    addends are identical doubles everywhere and the summed key is
    bit-identical.  6-dp noise granularity is far below the key
    spacing of any realistic corpus (~1/N)."""
    lw = dsir_log_weights(
        source, target, id_col, text_col,
        n=n, buckets=buckets, smoothing=smoothing,
        target_predicate=target_predicate,
        # This .where(n_feats > 0) drops exactly the rows the
        # featureless left-join would add back — skip both the base
        # id scan and its shuffle.
        include_featureless=False,
    ).where(F.col("n_feats") > 0)
    keyed = lw.withColumn(
        "sel_key",
        F.round(
            F.round(F.col("log_weight"), 6) + F.round(gumbel_key(id_col, salt), 6),
            12,
        ),
    )
    # Global top-k as orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps, no global sort/window over all documents); the rank window
    # then runs over k rows only.
    top = keyed.orderBy(F.desc("sel_key"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("sel_key"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col,
        "n_feats",
        F.round("log_weight", 4).alias("log_weight"),
        F.round("sel_key", 4).alias("sel_key"),
        "rank",
    )
