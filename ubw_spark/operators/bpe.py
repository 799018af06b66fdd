"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

Byte-pair encoding trains a subword vocabulary by repeatedly merging
the corpus's most frequent adjacent symbol pair.  The classical
algorithm is sequential, but its per-round work is two corpus-shaped
primitives Spark does well:

1. **pair counting** — explode each distinct WORD's adjacent symbol
   pairs weighted by word frequency, one map-side-combining groupBy.
   The state is the distinct-word table (vocab-sized, not
   corpus-sized: 100 TB of text is ~10^7 distinct words), so every
   round costs a scan of the word table, never the corpus;
2. **merge application** — a map-only greedy left-to-right fold over
   each word's symbol array (``F.aggregate``), no shuffle.

The driver loop collects ONE row per round (the argmax pair —
bounded, like the connected-components convergence scalar) and
truncates lineage each round so round k doesn't replan rounds 1..k-1.

No end-of-word marker: pairs never cross word boundaries, and the
merge list is defined over in-word adjacency only (the SQL oracle
mirrors exactly this).  Tested against a pure-Python reference
implementation of the same convention.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ubw_spark.operators.iterate import TruncateSlot, truncate

from ubw_spark.functions.text import tokens


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the shared tokenizer — BPE's working set.  One
    explode + one map-side-combining groupBy; output is vocab-sized."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sym_pairs(sym_col: Column) -> Column:
    """Adjacent (left, right) symbol structs of one symbol array —
    empty for single-symbol words (guarded: an unguarded
    ``sequence(1, size-1)`` DESCENDS when size is 1)."""
    n = F.size(sym_col)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(
            F.element_at(sym_col, i).alias("left"),
            F.element_at(sym_col, i + 1).alias("right"),
        ),
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<left:string,right:string>>")
    )


def pair_counts(
    words: DataFrame,
    sym_col: str = "sym",
    pairs_col: str | None = None,
) -> DataFrame:
    """(left, right, cnt) weighted by word frequency — a pair occurring
    twice inside one word counts twice, the BPE convention.

    ``pairs_col`` names an already-computed pair array (callers that
    let-bind the symbol split); otherwise pairs derive from
    ``sym_col``.

    The pair array is FENCED before the explode: Catalyst's
    InferFiltersFromGenerate plants a ``size(e) > 0`` Filter below the
    Generate, and without the fence it substitutes the whole HOF
    pipeline into that predicate — re-evaluated per row, interpreted
    (the hazard the registry-wide lint exists for)."""
    from ubw_spark.functions.hof import fence

    p = (
        F.col(pairs_col)
        if pairs_col is not None
        else sym_pairs(F.col(sym_col))
    )
    return (
        words.select(F.col("n"), fence(p).alias("__pairs"))
        .select(F.col("n"), F.explode("__pairs").alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").alias("cnt"))
    )


def apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — the BPE replacement step as a map-only ``F.aggregate``
    fold: the accumulator carries (built array, pending symbol); a
    pending ``left`` followed by ``right`` emits the merged symbol and
    clears the pending slot, so overlaps resolve leftmost-first
    ('aaa' under (a,a) → ['aa','a'])."""
    merged = F.lit(left + right)
    acc0 = F.struct(
        F.array().cast("array<string>").alias("arr"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["arr"].alias("arr"), s.alias("prev")),
            )
            .when(
                (acc["prev"] == F.lit(left)) & (s == F.lit(right)),
                F.struct(
                    F.array_append(acc["arr"], merged).alias("arr"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.array_append(acc["arr"], acc["prev"]).alias("arr"),
                    s.alias("prev"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["arr"]).otherwise(
            F.array_append(acc["arr"], acc["prev"])
        )

    return F.aggregate(sym_col, acc0, step, finish)


def bpe_train_merges(
    df: DataFrame, text_col: str, k: int, *, checkpoint: str = "local"
) -> list[tuple[str, str]]:
    """The first ``k`` BPE merges of the corpus, most-frequent first
    (ties: lexicographic (left, right) — deterministic across engines
    and partitionings).  Stops early when no pair remains.

    Driver loop cost per round: one vocab-sized aggregate + a ONE-ROW
    collect + a map-only fold; per-round truncation keeps round k from
    replanning rounds 1..k-1 (the connected-components pattern), with
    ``checkpoint="reliable"`` for durable executor-loss-safe rounds on
    a cluster (operators/iterate.py)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _slot = TruncateSlot()  # the cur chain: round k frees round k-1
    cur = truncate(
        word_freqs(df, text_col).withColumn("sym", F.split("word", "")),
        checkpoint,
        slot=_slot,
    )
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        cur = truncate(
            cur.withColumn("sym", apply_merge(F.col("sym"), left, right)),
            checkpoint,
            slot=_slot,
        )
    return merges


def bpe_train_merges_py(freqs: dict[str, int], k: int) -> list[tuple[str, str]]:
    """Pure-Python reference of the SAME convention (greedy leftmost
    merge, (cnt desc, pair asc) argmax) — the parity oracle for
    :func:`bpe_train_merges`."""
    words: dict[tuple[str, ...], int] = {
        tuple(w): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _encode_word(
    word: str, merges: list[tuple[str, str]]
) -> list[str]:
    """Encode ONE word by replaying the merges in TRAINING ORDER, each
    greedy-leftmost — exactly the convention ``bpe_train_merges``
    applied while learning, so encoding a training word reproduces its
    final training segmentation by construction (pinned against the
    ``apply_merge`` Spark fold in tests)."""
    sym = list(word)
    for a, b in merges:
        if len(sym) < 2:
            break
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Subword-tokenize a text column under a trained merge list —
    the inference half of BPE, feeding token counts / packing /
    sharding with REAL subword lengths instead of whitespace counts.

    Per-character merge loops don't decompose into Catalyst array
    expressions (data-dependent iteration count), so this is the
    repo's sanctioned Python path: Arrow-batched ``mapInPandas``, the
    merge-rank dict built ONCE per partition, zero shuffles — the plan
    is a single streaming pass, embarrassingly parallel at any scale.
    Tokenization mirrors ``functions/text.py::tokens`` (trim, lower,
    ASCII whitespace — Java's \\s, not Python's Unicode \\s)."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    mlist = list(merges)
    # NOT df.schema.add(...): StructType.add MUTATES, and df.schema is
    # the DataFrame's cached instance — mutating it makes mapInPandas
    # see a phantom input column
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(StringType()))]
    )

    def encode_batches(batches):
        cache: dict[str, list[str]] = {}  # per-task: corpora repeat words

        def enc(text):
            if text is None:
                return None
            out: list[str] = []
            for w in _ASCII_WS.split(text.strip().lower()):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, mlist)
                out.extend(got)
            return out

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)
