"""Zero-cost pipeline accounting via Spark's ``observe`` API.

Curation pipelines need a ledger — how many rows entered each stage,
how many a filter dropped, how much a dedup removed — but running
``.count()`` per stage re-executes the plan once per number. Spark's
observations attach aggregate metrics to the EXISTING action: the
accumulators ride along with the one job that produces the output, so
the ledger is free at any scale (the same mechanism Structured
Streaming surfaces per micro-batch as ``observedMetrics``).

Usage::

    ledger = PipelineLedger()
    df = ledger.checkpoint(df, "raw")
    df = df.filter(...)
    df = ledger.checkpoint(df, "after_quality",
                           extra={"chars": F.sum("n_chars")})
    df.write.parquet(...)          # ONE job
    ledger.report()                # {'raw': {'rows': ...}, ...}

Batch frames only (``pyspark.sql.Observation`` registers a listener and
blocks until the action completes); for streaming plans pass plain
string names to ``DataFrame.observe`` and read
``query.lastProgress['observedMetrics']`` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class PipelineLedger:
    """Collects named per-stage observations over one DataFrame plan."""

    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def checkpoint(
        self,
        df: DataFrame,
        name: str,
        *,
        extra: dict[str, Column] | None = None,
        persist: bool = False,
    ) -> DataFrame:
        """Attach a row-count observation (plus optional named aggregate
        expressions, e.g. ``{"bytes": F.sum(F.length("text"))}``) at
        this point in the plan. Returns the observed frame — keep
        building on it.

        Observation accumulators fire once per EXECUTION of their
        subtree: if the next stage scans this frame more than once
        (LSH dedup, decontaminate, any self-join), a bare observation
        multi-counts. Pass ``persist=True`` there — the observed frame
        is cached, so the metrics node executes exactly once at
        materialization and every downstream scan reads the cache
        (which is also what you want computationally between heavy
        curation stages)."""
        if name in self._obs:
            raise ValueError(f"duplicate ledger stage: {name}")
        obs = Observation(name)
        self._obs[name] = obs
        cols = [F.count(F.lit(1)).alias("rows")]
        for alias, expr in (extra or {}).items():
            cols.append(expr.alias(alias))
        out = df.observe(obs, *cols)
        return out.persist() if persist else out

    def report(self) -> dict[str, dict]:
        """Metrics recorded by the action that ran the observed plan —
        call AFTER an action (write / collect / count), which is when
        ``Observation.get`` unblocks."""
        return {name: obs.get for name, obs in self._obs.items()}


def observed_counts(df: DataFrame, name: str = "stage") -> tuple[DataFrame, Observation]:
    """One-off convenience: observe the row count at this point.
    Returns (observed_frame, observation) — read ``obs.get['rows']``
    after an action (see :class:`PipelineLedger` for multi-stage use)."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs
