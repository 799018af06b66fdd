"""Stage composition — the Channel / DataPileContent analog (C1-C6).

A reference ``InputChannel`` is a validated function from a schema tree
to a result; channels compose monadically into multi-stage pipelines
(Channel.scala:5-57, PileSyntax.scala:8-206).  In Spark a stage is just
``DataFrame → DataFrame`` and composition is ``df.transform`` — this
module adds the two things Spark doesn't give for free:

- pre-flight schema validation per stage with accumulated errors
  (C1/U2: declare ``requires=[...]`` columns; every missing column across
  every stage is reported at once, before any job runs), and
- ``observe``-based result-set summaries attached to a stage
  (A2/C4 ``withFilter``/``afterResult`` — PileFilter.scala:11-41): the
  summary is computed by the SAME job that produces the rows, not a
  second scan.

Stages stay lazy end-to-end; ``Pipeline.run`` builds one logical plan so
Catalyst optimizes across stage boundaries (filter pushdown through
earlier stages, column pruning into the scan) exactly as if the user had
written one expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql.observation import Observation

from ubw_spark.core.errors import ErrorAccumulator

Stage = Callable[[DataFrame], DataFrame]


@dataclass
class PipelineStage:
    fn: Stage
    name: str = "stage"
    requires: tuple[str, ...] = ()
    # A2/C4: named summary aggregates computed alongside the stage output.
    observe: dict[str, Column] = field(default_factory=dict)


class Pipeline:
    """An ordered list of stages applied with ``.transform`` semantics."""

    def __init__(self, stages: list[PipelineStage | Stage] | None = None):
        self.stages: list[PipelineStage] = []
        for s in stages or []:
            self.append(s)
        self._observations: dict[str, Observation] = {}

    def append(
        self,
        fn: PipelineStage | Stage,
        name: str | None = None,
        requires: list[str] | None = None,
        observe: dict[str, Column] | None = None,
    ) -> "Pipeline":
        if isinstance(fn, PipelineStage):
            stage = fn
        else:
            stage = PipelineStage(
                fn,
                name or f"stage{len(self.stages)}",
                tuple(requires or ()),
                dict(observe or {}),
            )
        # Stage names key the _observations dict AND Spark's
        # CollectMetrics names: a duplicate (trivially hit via
        # PipelineStage's default name) silently drops the earlier
        # stage's summary and is rejected by Spark at action time —
        # refuse at construction, where the fix is obvious.
        if any(s.name == stage.name for s in self.stages):
            raise ValueError(
                f"duplicate stage name {stage.name!r} — stage names key "
                "the per-stage summaries; pass a distinct name"
            )
        self.stages.append(stage)
        return self

    def then(self, other: "Pipeline") -> "Pipeline":
        """Sequential composition (C2 ``IOChannel.next``)."""
        return Pipeline(self.stages + other.stages)

    def validate(self, df: DataFrame) -> None:
        """Error-accumulating pre-flight: walk stages against the evolving
        schema WITHOUT executing (schemas resolve lazily on the driver)."""
        acc = ErrorAccumulator()
        cur = df
        for st in self.stages:
            missing = [c for c in st.requires if c not in cur.columns]
            for c in missing:
                acc.add(f"stage '{st.name}' requires missing column '{c}'")
            if not missing:
                try:
                    cur = st.fn(cur)
                except Exception as e:  # analysis error inside the stage
                    acc.add(f"stage '{st.name}' failed to build: {e}")
                    break
        acc.raise_if_any()

    def run(self, df: DataFrame, *, validate: bool = True) -> DataFrame:
        if validate:
            self.validate(df)
        self._observations = {}
        cur = df
        for st in self.stages:
            cur = st.fn(cur)
            if st.observe:
                obs = Observation(st.name)
                cur = cur.observe(obs, *[
                    c.alias(k) for k, c in st.observe.items()
                ])
                self._observations[st.name] = obs
        return cur

    def summaries(self) -> dict[str, dict[str, Any]]:
        """Observed per-stage summaries; available after an action has run
        on the result (observe computes during the main job — no rescan)."""
        return {name: obs.get for name, obs in self._observations.items()}
