"""BPE vocabulary-induction queries (operators/bpe.py).

The pair-counting round — BPE's distributed primitive — is fully
oracled: DuckDB replays the char-pair explosion and weighted counts.
The k-round trainer itself returns a Python merge list (driver loop,
like connected components) and is pinned against a pure-Python
reference in tests/test_bpe.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ubw_spark.functions.hof import let
from ubw_spark.operators.bpe import pair_counts, sym_pairs, word_freqs
from ubw_spark.queries.registry import register, table


@register(
    "bpe_top_pairs",
    oracle=r"""
    WITH w AS (
      SELECT word, count(*)::BIGINT AS n
      FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
              AS word
            FROM documents WHERE lang = 'en')
      GROUP BY word),
    p AS (
      SELECT w.n, word[i] AS lft, word[i+1:i+1] AS rgt
      FROM w, unnest(generate_series(1, length(word) - 1)) u(i))
    SELECT lft AS left, rgt AS right, sum(n)::BIGINT AS cnt
    FROM p GROUP BY 1, 2
    ORDER BY cnt DESC, "left", "right" LIMIT 20
    """,
    tags=("bpe", "text", "llm"),
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 1 of BPE training: the 20 most frequent adjacent char
    pairs over the English vocabulary, weighted by word frequency
    (a pair twice inside one word counts twice).

    Scale: the working set is the DISTINCT-word table (one explode +
    map-side-combining groupBy gets there), so pair counting scans the
    vocabulary, never the corpus; the top-k plans as
    TakeOrderedAndProject.  The char split is let-bound — Catalyst has
    no CSE inside HOF lambdas, and sym_pairs references its input four
    times."""
    d = table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    wf = word_freqs(d, "text")
    pc = pair_counts(
        wf.select(
            "n",
            let(F.split("word", ""), sym_pairs).alias("__pairs"),
        ),
        pairs_col="__pairs",
    )
    return pc.orderBy(F.desc("cnt"), "left", "right").limit(20)
