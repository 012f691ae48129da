"""Differentially-private release aggregates (seeded Laplace mechanism).

The release-side companion of ``stats.k_anonymity``: where k-anonymity
AUDITS a grouped release, this PERTURBS it — per-group counts and
bounded sums with Laplace noise calibrated to (sensitivity / epsilon),
the standard mechanism for publishing aggregate corpus statistics
(per-domain doc counts, per-source token totals) without exposing any
single contributor.

Noise is DETERMINISTIC given ``seed``: the per-group uniform comes from
an md5 of (group key, seed) — the repo-wide replayable-hash idiom — fed
through the Laplace inverse CDF. That makes releases reproducible and
oracle-checkable. The privacy caveat is explicit: a PUBLIC seed lets
anyone recompute the noise, so production releases must treat the seed
as a secret and rotate it per release; determinism here is a
correctness feature (same release twice = same numbers), not a license
to publish the seed.

Plan shape: clipping is a pure projection, the release is ONE
map-combinable grouped aggregate, and the noise terms are scalar
expressions on the aggregated (group-cardinality-sized) frame — nothing
touches the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def _uniform(group_key: Column, seed: int, tag: str) -> Column:
    """Deterministic uniform in (0, 1) from the group key + seed + tag
    (tag decorrelates the count and sum noise draws)."""
    h = F.md5(F.concat_ws("|", group_key, F.lit(str(seed)), F.lit(tag)))
    # 8 hex chars -> [0, 2^32); +0.5 keeps u strictly inside (0, 1)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 0.5) / _U32


def _laplace(u: Column, b: Column | float) -> Column:
    """Inverse-CDF Laplace(0, b) from a uniform in (0, 1)."""
    centered = u - 0.5
    return (
        -F.lit(1.0)
        * b
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )


def dp_release(
    df: DataFrame,
    *,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: int = 0,
    sum_col: str | None = None,
    sum_bound: float | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Release per-group counts (and optionally a bounded sum) under the
    Laplace mechanism.

    Returns ``group_cols + (n_dp [, sum_dp])``:

    - ``n_dp``  = count + Laplace(1/epsilon) — count sensitivity is 1;
    - ``sum_dp`` = sum(clip(value, 0, sum_bound)) + Laplace(sum_bound /
      epsilon) — clipping enforces the declared per-row contribution
      bound that the noise scale depends on (``sum_bound`` is required
      with ``sum_col``). When both metrics are released, each draw uses
      half the budget (standard sequential composition), so the whole
      release satisfies epsilon overall.

    Noisy values are rounded to ``round_to`` places (release hygiene +
    cross-engine double parity); they are NOT clamped to be
    non-negative — post-processing is the caller's choice and does not
    affect the privacy guarantee.
    """
    if sum_col is not None and sum_bound is None:
        raise ValueError("sum_col requires an explicit sum_bound (sensitivity)")
    eps_each = epsilon / 2.0 if sum_col is not None else epsilon

    aggs = [F.count(F.lit(1)).cast("double").alias("_n")]
    if sum_col is not None:
        clipped = F.greatest(
            F.lit(0.0), F.least(F.col(sum_col).cast("double"), F.lit(float(sum_bound)))
        )
        # scaled-long sum: aggregation-order-proof across engines
        aggs.append(
            (F.sum(F.round(clipped * 1_000_000).cast("bigint")) / 1_000_000.0).alias(
                "_s"
            )
        )
    grouped = df.groupBy(*group_cols).agg(*aggs)

    gkey = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in group_cols])
    out_cols: list[Column] = [F.col(c) for c in group_cols]
    out_cols.append(
        F.round(
            F.col("_n") + _laplace(_uniform(gkey, seed, "n"), 1.0 / eps_each),
            round_to,
        ).alias("n_dp")
    )
    if sum_col is not None:
        out_cols.append(
            F.round(
                F.col("_s")
                + _laplace(
                    _uniform(gkey, seed, "s"), float(sum_bound) / eps_each
                ),
                round_to,
            ).alias("sum_dp")
        )
    return grouped.select(*out_cols)


def dp_release_oracle_sql(
    inner_sql: str,
    *,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: int = 0,
    sum_expr: str | None = None,
    sum_bound: float | None = None,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`dp_release` over ``inner_sql`` (which must
    expose ``group_cols`` and, when summing, ``sum_expr`` as a value
    column expression)."""
    eps_each = epsilon / 2.0 if sum_expr is not None else epsilon
    gl = ", ".join(group_cols)
    gkey = (
        "concat_ws(chr(31), "
        + ", ".join(f"CAST({c} AS VARCHAR)" for c in group_cols)
        + ")"
    )

    def u(tag: str) -> str:
        return (
            f"((('0x' || substr(md5(concat_ws('|', {gkey}, '{seed}', '{tag}')), 1, 8))"
            f"::BIGINT + 0.5) / 4294967296.0)"
        )

    def lap(tag: str, b: float) -> str:
        uu = u(tag)
        return (
            f"(-{b} * sign({uu} - 0.5) * ln(1.0 - 2.0 * abs({uu} - 0.5)))"
        )

    cols = [gl, f"round(CAST(count(*) AS DOUBLE) + {lap('n', 1.0 / eps_each)}, {round_to}) AS n_dp"]
    if sum_expr is not None:
        clip = f"greatest(0.0, least(CAST({sum_expr} AS DOUBLE), {float(sum_bound)}))"
        ssum = (
            f"CAST(sum(CAST(round({clip} * 1000000, 0) AS BIGINT)) AS BIGINT)"
            f" / 1000000.0"
        )
        cols.append(
            f"round({ssum} + {lap('s', float(sum_bound) / eps_each)}, {round_to}) AS sum_dp"
        )
    return (
        f"SELECT {', '.join(cols)} FROM ({inner_sql}) GROUP BY {gl}"
    )


def generalize_to_k(
    df: DataFrame,
    ladders: list[list[Column]],
    k: int,
    *,
    out_cols: list[str] | None = None,
) -> DataFrame:
    """k-anonymity by FULL-DOMAIN generalization: pick one GLOBAL
    level — the smallest j at which EVERY equivalence class at level j
    holds at least ``k`` rows — and publish all rows at that level.

    ``ladders[i]`` is a generalization ladder — Column expressions from
    finest to coarsest (e.g. ``[nation_name, region_name, lit("ALL")]``).
    Level j uses ``ladders[i][min(j, len(ladder)-1)]`` for every
    ladder, i.e. all ladders coarsen in lockstep. The level is chosen
    globally (NOT per row): a per-row choice would let rows at
    different levels publish tuples whose RELEASED classes hold fewer
    than k rows, silently defeating the guarantee (local recoding sold
    as full-domain). When even the coarsest level misses k for some
    class, that level is still used and the per-class ``k_ok`` flag
    marks the undersized classes so callers can suppress them.

    Where ``stats.k_anonymity`` AUDITS a release, this REPAIRS one.

    Plan shape: one TINY aggregate per level (each level-count frame is
    class-cardinality-sized) plus one single-row min-count frame per
    level, all broadcast back; a CASE ladder over the broadcast mins
    picks the level — the fact table is scanned once, no window, no
    per-row Python. Generalization ladders are short (2-4 rungs), so
    the broadcast count is bounded.
    """
    n_levels = max(len(ladder) for ladder in ladders)
    n_q = len(ladders)
    out_names = out_cols or [f"qi{i}" for i in range(n_q)]
    sep = chr(31)  # US control char: unambiguous compound-key separator

    def exprs_at(j: int) -> list[Column]:
        return [ladder[min(j, len(ladder) - 1)] for ladder in ladders]

    def key_at(j: int) -> Column:
        return F.concat_ws(sep, *[e.cast("string") for e in exprs_at(j)])

    work = df
    mins = None  # one-row frame of per-level MIN class counts
    for j in range(n_levels):
        counts = (
            df.select(key_at(j).alias("_k"))
            .groupBy("_k")
            .agg(F.count(F.lit(1)).alias(f"_n{j}"))
        )
        work = work.withColumn(f"_k{j}", key_at(j)).join(
            F.broadcast(counts.withColumnRenamed("_k", f"_k{j}")),
            f"_k{j}",
            "left",
        )
        mj = counts.agg(F.min(f"_n{j}").alias(f"_m{j}"))
        mins = mj if mins is None else mins.crossJoin(mj)

    # Global full-domain level: smallest j whose WORST class reaches k.
    work = work.crossJoin(F.broadcast(mins))
    level = F.lit(n_levels - 1)
    for j in range(n_levels - 2, -1, -1):
        level = F.when(F.col(f"_m{j}") >= k, F.lit(j)).otherwise(level)
    work = work.withColumn("gen_level", level)

    for i, name in enumerate(out_names):
        col = exprs_at(n_levels - 1)[i]
        for j in range(n_levels - 2, -1, -1):
            col = F.when(F.col("gen_level") == j, exprs_at(j)[i]).otherwise(col)
        work = work.withColumn(name, col)

    # Per-class k_ok AT THE PUBLISHED LEVEL: since every row shares
    # gen_level, _n{gen_level} IS the released class size.
    k_ok = F.lit(False)
    for j in range(n_levels):
        k_ok = F.when(F.col("gen_level") == j, F.col(f"_n{j}") >= k).otherwise(
            k_ok
        )
    work = work.withColumn("k_ok", k_ok)
    drop = [f"_k{j}" for j in range(n_levels)] + [
        f"_n{j}" for j in range(n_levels)
    ] + [f"_m{j}" for j in range(n_levels)]
    return work.drop(*drop)


def forget_subjects(
    tables: dict[str, DataFrame],
    subjects: DataFrame,
    key_cols: dict[str, str],
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Right-to-be-forgotten cascade: purge every row keyed to a data
    subject across a set of tables, with a per-table audit trail.

    ``subjects`` is a one-column frame of subject keys (deduplicated
    here); ``key_cols`` maps each table name to its subject-key column.
    Returns ``(purged, audit)``: ``purged[name]`` is the table with all
    subject rows removed (broadcast anti-join — the subject list is
    tiny next to the data, the fact tables never shuffle), and
    ``audit`` is one row per table
    ``(table, rows_before, rows_purged, rows_after)`` — the evidence a
    deletion request was honored, computed in the same single scan per
    table as the purge decision (one broadcast left join + one
    map-combinable aggregate; no second pass, no driver-side counts).

    NULL keys are never purged (a NULL subject key matches no request)
    and count toward ``rows_after``.
    """
    scol = subjects.columns[0]
    subj = subjects.select(F.col(scol).alias("_s")).distinct()

    purged: dict[str, DataFrame] = {}
    audits = []
    for name, df in tables.items():
        kc = key_cols[name]
        purged[name] = df.join(
            F.broadcast(subj), df[kc] == F.col("_s"), "left_anti"
        )
        marked = df.join(F.broadcast(subj), df[kc] == F.col("_s"), "left")
        audits.append(
            marked.agg(
                F.lit(name).alias("table"),
                F.count(F.lit(1)).alias("rows_before"),
                F.coalesce(
                    F.sum(F.col("_s").isNotNull().cast("long")), F.lit(0)
                ).alias("rows_purged"),
            ).select(
                "table",
                "rows_before",
                "rows_purged",
                (F.col("rows_before") - F.col("rows_purged")).alias(
                    "rows_after"
                ),
            )
        )
    audit = audits[0]
    for ad in audits[1:]:
        audit = audit.unionByName(ad)
    return purged, audit
