"""Distribution-statistics operators.

``exact_percentiles`` replaces ``F.percentile`` for grouped exact
quantiles: the builtin aggregates a per-group hashmap of distinct
values (slow when values are mostly unique, e.g. prices), while this
formulation is one partition sort + conditional aggregation — ~2.5x
faster at sf0.1 and bit-identical (it reproduces the builtin's
``lo*(hiIdx-pos) + hi*(pos-loIdx)`` interpolation, which is also
DuckDB's ``quantile_cont``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame,
    group_cols: str | list[str],
    value_col: str,
    percentiles: dict[str, float],
) -> DataFrame:
    """Exact linear-interpolated percentiles per group.

    ``percentiles`` maps output column name -> p in [0, 1]. Plan: one
    shuffle-sort on (group, value) for the row_number window; group
    sizes come from a separate tiny aggregate broadcast-joined back
    (NOT a count-over-unbounded-window, which would buffer each full
    group a second time inside the window exec), then an ordinary
    partial+final aggregation — no per-group value map, no collect.
    Rows with NULL ``value_col`` are excluded (builtin semantics).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    src = df.filter(F.col(value_col).isNotNull())
    counts = src.groupBy(*groups).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(*groups).orderBy("_v")

    r = (
        src.select(*groups, F.col(value_col).alias("_v"))
        .withColumn("_i", F.row_number().over(w) - 1)
        .join(F.broadcast(counts), groups)
    )
    agg_cols = []
    for name, p in percentiles.items():
        idx = F.lit(float(p)) * (F.col("_n") - 1)
        fl, cl = F.floor(idx), F.ceil(idx)
        r = (
            r.withColumn(f"_lo_{name}", F.when(F.col("_i") == fl, F.col("_v")))
            .withColumn(f"_hi_{name}", F.when(F.col("_i") == cl, F.col("_v")))
            .withColumn(f"_w_lo_{name}", cl.cast("double") - idx)
            .withColumn(f"_w_hi_{name}", idx - fl.cast("double"))
            .withColumn(f"_int_{name}", fl == cl)
        )
        agg_cols += [
            F.max(f"_lo_{name}").alias(f"_alo_{name}"),
            F.max(f"_hi_{name}").alias(f"_ahi_{name}"),
            F.max(f"_w_lo_{name}").alias(f"_awlo_{name}"),
            F.max(f"_w_hi_{name}").alias(f"_awhi_{name}"),
            F.max(f"_int_{name}").alias(f"_aint_{name}"),
        ]
    out = r.groupBy(*groups).agg(*agg_cols)
    return out.select(
        *groups,
        *[
            F.when(F.col(f"_aint_{name}"), F.col(f"_alo_{name}"))
            .otherwise(
                F.col(f"_alo_{name}") * F.col(f"_awlo_{name}")
                + F.col(f"_ahi_{name}") * F.col(f"_awhi_{name}")
            )
            .alias(name)
            for name in percentiles
        ],
    )
