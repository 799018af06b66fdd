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
- ``"reliable"``: durable materialization under the context's
  configured checkpoint directory (HDFS/S3) — each round's state
  survives executor loss, so a lost node costs a re-read, not the job.
  The 100 TB posture for anything iterating more than a couple of
  rounds: at 1000 executors the probability of losing one during a
  20-round loop is not small.  Requires
  ``spark.sparkContext.setCheckpointDir(...)`` up front — enforced
  here with a clear error instead of Spark's late one.

Reliable mode is a parquet round-trip rather than
``DataFrame.checkpoint``: identical durability and lineage-cut, but
the round state is a plain directory THIS module garbage-collects —
``DataFrame.checkpoint`` files are only ever cleaned by Spark's
reference-tracking GC behind a non-default conf, so a 20-round loop
would otherwise leave 20 full copies of the working set in the bucket.
Each mutable chain passes a :class:`TruncateSlot`; when round k's
state is safely on disk, round k-1's directory (no longer referenced
by any plan) is deleted through the Hadoop FileSystem API (works for
file://, hdfs://, s3a:// alike).  The LAST round's directory survives
until the slot is reused or the checkpoint dir is retired — the same
contract as Spark's own checkpoint files.

The ``checkpoint=`` parameter on the iterative operators takes exactly
the two mode strings.  (Structured Streaming state is separate — its
checkpointLocation is already per-query and reliable.)
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

#: Valid values for the operators' ``checkpoint=`` parameter.
MODES = ("local", "reliable")


class TruncateSlot:
    """One mutable state chain's current durable directory.  Passing a
    slot to :func:`truncate` in reliable mode makes each new round's
    write delete the previous round's directory — bounded storage
    (≤ 2 round states per chain in flight) instead of one directory
    per round forever."""

    def __init__(self) -> None:
        self.path: str | None = None

    def swap(self, spark, new_path: str) -> None:
        old, self.path = self.path, new_path
        if old is not None:
            _fs_delete(spark, old)


def _fs_delete(spark, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _checkpoint_dir(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    jdir = sc._jsc.sc().getCheckpointDir()
    if jdir.isEmpty():
        raise ValueError(
            "checkpoint='reliable' requires a checkpoint directory: "
            "call spark.sparkContext.setCheckpointDir('<hdfs/s3 path>') "
            "before running the operator"
        )
    return jdir.get()


def truncate(
    df: DataFrame,
    mode: str = "local",
    *,
    eager: bool = True,
    slot: TruncateSlot | None = None,
) -> DataFrame:
    """Materialize ``df`` and cut its lineage under the given policy.

    In reliable mode, pass the chain's :class:`TruncateSlot` so the
    previous round's directory is reclaimed once this round is durable;
    without a slot the directory is simply left for the caller's
    checkpoint-dir retention policy (right for state that must live for
    the whole loop, like the edge list)."""
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        spark = df.sparkSession
        base = _checkpoint_dir(df)
        path = f"{base.rstrip('/')}/ubw-truncate-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        if slot is not None:
            slot.swap(spark, path)
        return out
    raise ValueError(
        f"unknown checkpoint mode {mode!r}: expected one of {MODES}"
    )
