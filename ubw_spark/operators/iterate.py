"""Lineage truncation for iterative operators (connected components,
PageRank, BPE training) — one shared policy switch.

Every driver-loop operator here must cut its plan per round or round k
replans rounds 1..k-1 (quadratic planning, unbounded lineage).  Two
ways to cut, with different failure semantics:

- ``"local"`` (default): ``DataFrame.localCheckpoint`` — blocks live in
  executor storage memory, no external write, fastest.  But the cut
  DELETES the lineage needed to recompute a lost block: on a real
  cluster an executor loss mid-iteration kills the job.  Right for
  local mode, tests, and short loops.
- ``"reliable"``: ``DataFrame.checkpoint`` to the context's configured
  checkpoint directory (HDFS/S3) — each round's state is durably
  materialized, so executor loss costs a re-read, not the job.  The
  100 TB posture for anything iterating more than a couple of rounds:
  at 1000 executors the probability of losing one during a 20-round
  loop is not small.  Requires
  ``spark.sparkContext.setCheckpointDir(...)`` up front — enforced
  here with a clear error instead of Spark's late one.

The `checkpoint=` parameter on the iterative operators takes exactly
these two strings.  (Structured Streaming state is separate — its
checkpointLocation is already per-query and reliable.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Valid values for the operators' ``checkpoint=`` parameter.
MODES = ("local", "reliable")


def truncate(df: DataFrame, mode: str = "local", *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and cut its lineage under the given policy."""
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            raise ValueError(
                "checkpoint='reliable' requires a checkpoint directory: "
                "call spark.sparkContext.setCheckpointDir('<hdfs/s3 path>') "
                "before running the operator"
            )
        return df.checkpoint(eager=eager)
    raise ValueError(
        f"unknown checkpoint mode {mode!r}: expected one of {MODES}"
    )
