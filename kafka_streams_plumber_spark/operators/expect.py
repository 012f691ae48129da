"""Declarative data-quality checks compiled into ONE aggregate pass.

The Deequ-style guardrail a pipeline runs before publishing a table:
every rule (completeness, uniqueness, value bounds, pattern
conformance, cross-column invariants) contributes one aggregate
expression, all rules ride a single ``df.agg(...)`` — so a 50-rule
suite over a 100 TB table costs exactly one scan with map-side partial
aggregation, never one job per rule. The one-row result is then
unpivoted to a tidy ``(check, metric, lo, hi, ok)`` frame (a constant-
size projection).

Rules are plain dicts so suites serialize to config:

    run_checks(df, [
        {"name": "qty_not_null", "metric": not_null_rate("l_quantity"),
         "lo": 1.0},
        {"name": "qty_in_range", "metric": in_range_rate("l_quantity",
         1, 50), "lo": 0.99},
        {"name": "key_unique", "metric": distinct_ratio("l_orderkey",
         "l_linenumber"), "lo": 1.0},
    ])

Metric builders return AGGREGATE Columns; bring your own for anything
not covered (any expression valid inside ``agg`` works). Metrics are
rounded to 6 dp (cross-engine double parity); rates over an EMPTY frame
are NULL and fail any bound — an empty publish should never pass a
quality gate silently.

Reference scope: beyond-reference surface (the reference validates
per-record schema conformance only — TypeConversions.scala:12-51; this
is the dataset-level counterpart).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null_rate(col: str) -> Column:
    """Fraction of rows with a non-null value."""
    return F.count(F.col(col)) / F.count(F.lit(1))


def in_range_rate(col: str, lo: float, hi: float) -> Column:
    """Fraction of NON-NULL values inside [lo, hi]."""
    c = F.col(col)
    return F.count(F.when((c >= lo) & (c <= hi), 1)) / F.count(c)


def matches_rate(col: str, pattern: str) -> Column:
    """Fraction of non-null values fully matching the regex."""
    c = F.col(col)
    return F.count(F.when(c.rlike(pattern), 1)) / F.count(c)


def distinct_ratio(*cols: str) -> Column:
    """distinct(cols) / rows — 1.0 means the columns form a key."""
    return F.count_distinct(*[F.col(c) for c in cols]) / F.count(F.lit(1))


def accepted_values_rate(col: str, values: list) -> Column:
    """Fraction of non-null values inside the accepted set."""
    c = F.col(col)
    return F.count(F.when(c.isin(values), 1)) / F.count(c)


def mean_of(col: str) -> Column:
    """Scaled-long mean (aggregation-order-proof across engines)."""
    sv = F.round(F.col(col) * 1_000_000).cast("bigint")
    return F.sum(sv) / 1_000_000.0 / F.count(sv)


_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float", "decimal")


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profile: ``(column, dtype, null_rate, n_distinct,
    min, max, mean)`` — the exploration twin of :func:`run_checks`.

    Every statistic is an aggregate expression in ONE ``df.agg`` (exact
    distinct counts via the Expand-based multi-distinct plan — still a
    single scan). min/max are stringified so mixed-type tables fit one
    tidy frame; ``mean`` is scaled-long (order-proof) and NULL for
    non-numeric columns. NULL-rate of an empty frame is NULL, matching
    :func:`run_checks`'s fail-closed stance.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(
            (1 - F.count(col) / F.count(F.lit(1))).alias(f"_null{i}")
        )
        aggs.append(F.count_distinct(col).alias(f"_nd{i}"))
        aggs.append(F.min(col).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max{i}"))
        if dtypes[c].startswith(_NUMERIC):
            sv = F.round(col * 1_000_000).cast("bigint")
            aggs.append(
                (F.sum(sv) / 1_000_000.0 / F.count(sv)).alias(f"_mean{i}")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_mean{i}"))
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.lit(dtypes[c]).alias("dtype"),
            F.round(F.col(f"_null{i}"), 6).alias("null_rate"),
            F.col(f"_nd{i}").alias("n_distinct"),
            F.col(f"_min{i}").alias("min"),
            F.col(f"_max{i}").alias("max"),
            F.round(F.col(f"_mean{i}"), 6).alias("mean"),
        )
        for i, c in enumerate(cols)
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.column", "r.dtype", "r.null_rate", "r.n_distinct",
        "r.min", "r.max", "r.mean",
    )


def run_checks(df: DataFrame, checks: list[dict]) -> DataFrame:
    """Evaluate every rule in ONE aggregate pass.

    Each rule dict: ``name`` (unique), ``metric`` (aggregate Column),
    and at least one of ``lo`` / ``hi`` (inclusive bounds). Returns
    ``(check, metric, lo, hi, ok)`` — ``ok`` is false when the metric
    is NULL or outside its bounds.
    """
    if not checks:
        raise ValueError("run_checks needs at least one rule")
    names = [c["name"] for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("duplicate check names")
    aggs = [
        F.round(c["metric"].cast("double"), 6).alias(f"_m{i}")
        for i, c in enumerate(checks)
    ]
    one = df.agg(*aggs)

    rows = []
    for i, c in enumerate(checks):
        lo = c.get("lo")
        hi = c.get("hi")
        if lo is None and hi is None:
            raise ValueError(f"check {c['name']!r} has no lo/hi bound")
        m = F.col(f"_m{i}")
        ok = m.isNotNull()
        if lo is not None:
            ok = ok & (m >= float(lo))
        if hi is not None:
            ok = ok & (m <= float(hi))
        rows.append(
            F.struct(
                F.lit(c["name"]).alias("check"),
                m.alias("metric"),
                F.lit(None if lo is None else float(lo))
                .cast("double")
                .alias("lo"),
                F.lit(None if hi is None else float(hi))
                .cast("double")
                .alias("hi"),
                ok.alias("ok"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.check", "r.metric", "r.lo", "r.hi", "r.ok")


def functional_dependency(
    df: DataFrame, lhs: list[str] | str, rhs: str
) -> DataFrame:
    """Does ``lhs`` functionally determine ``rhs``? The schema-profiling
    primitive behind key discovery and denormalization checks (Deequ's
    uniqueness family): a dependency holds iff every lhs value maps to
    exactly one rhs value.

    One map-combinable aggregate on the (lhs, rhs)-distinct grain, then
    an O(distinct lhs) rollup: ``violating_keys`` (lhs values seen with
    >1 rhs), ``n_keys``, ``holds``. NULL rhs counts as a value (a key
    mapping to both NULL and x is a violation — the surprising case
    profilers exist to surface).
    """
    lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
    per_pair = df.groupBy(
        *lhs_cols, F.col(rhs).alias("_rhs")
    ).agg(F.count(F.lit(1)).alias("_c"))
    per_key = per_pair.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).alias("_n_rhs")
    )
    return per_key.agg(
        F.sum(F.when(F.col("_n_rhs") > 1, 1).otherwise(0))
        .cast("long")
        .alias("violating_keys"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        (F.max("_n_rhs") <= 1).alias("holds"),
    )
