"""Event-time windowed aggregation helpers — the streaming surface the
reference lacks entirely (SURVEY §2.6: stateless only, "no watermarks,
no event-time, no windows").

Each helper builds the exact groupBy plan Structured Streaming expects:
the same call works on a batch frame (windows become plain group keys)
and on a streaming frame (watermark bounds state and admits late data up
to the bound). State size per window-key group is what survives a
100 TB/day stream — the watermark is mandatory on unbounded sources.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.query import StreamingQuery  # noqa: F401  (re-export convenience)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: dict[str, Column],
    *,
    by: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping event-time windows:
    ``groupBy(window(ts, duration), *by).agg(...)`` with window start/end
    flattened to ``win_start``/``win_end``.

    ``watermark`` (e.g. ``"30 minutes"``) is required for append-mode
    streaming sinks; on batch frames it is a no-op.
    """
    return _windowed(df, F.window(ts_col, duration), ts_col, aggs, by, watermark)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: dict[str, Column],
    *,
    by: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping (hopping) windows of ``duration`` every ``slide``.
    Each row lands in duration/slide windows — the plan explodes rows by
    that factor, so keep the ratio small at scale."""
    return _windowed(
        df, F.window(ts_col, duration, slide), ts_col, aggs, by, watermark
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    *,
    by: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows via ``F.session_window`` — the built-in
    twin of streaming/stateful.py's GroupState sessionizer (use that one
    when per-session logic goes beyond aggregation)."""
    return _windowed(
        df, F.session_window(ts_col, gap), ts_col, aggs, by, watermark
    )


def _windowed(
    df: DataFrame,
    window_col: Column,
    ts_col: str,
    aggs: dict[str, Column],
    by: list[str] | None,
    watermark: str | None,
) -> DataFrame:
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(window_col.alias("_w"), *(by or [])).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        F.col("_w.start").alias("win_start"),
        F.col("_w.end").alias("win_end"),
        *(by or []),
        *aggs.keys(),
    )
