"""Deterministic global ordering — the "shuffle the corpus before
training" primitive.

Training pipelines need every example assigned a stable global position
(epoch order, resumable from any step, identical across reruns and
engines). ``rand()`` fails all three; a hash of the row id fails none:
order by ``md5(seed || id)`` is uniform, reproducible, and replayable in
any SQL dialect.

The global rank itself is the scale problem: ``row_number() OVER
(ORDER BY ...)`` funnels the entire table through ONE task. Here the
rank is assembled the way ``operators.stats.exact_percentiles`` does it
— a fully parallel range-partitioned sort, per-partition local ordinals,
and a tiny (num_partitions rows) offset table broadcast back. No stage
ever holds more than one partition of data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(id_col: Column | str, *, seed: int = 42) -> Column:
    """The deterministic sort key: lowercase-hex ``md5("<seed>:<id>")``.
    Identical in Spark and DuckDB (both emit standard lowercase MD5), so
    the oracle replays the exact permutation."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string")))


def global_order(
    df: DataFrame,
    id_col: str,
    *,
    seed: int = 42,
    pos_col: str = "pos",
) -> DataFrame:
    """Assign every row a stable 0-based global position in a
    pseudo-random (seeded) permutation of the table.

    Scale design — no single-task window:

      1. range-repartition on (key, id) + sortWithinPartitions: a fully
         parallel distributed sort (the same machinery as
         ``df.orderBy``, minus the final single-stream requirement);
      2. ``monotonically_increasing_id`` gives consecutive local
         ordinals within each sorted partition in one narrow pass;
      3. per-partition (count, min_id) — num_partitions rows — rolls
         into cumulative offsets with one tiny window and broadcasts
         back: pos = offset + (local_id - local_min).

    The id tiebreak makes the order total even under (astronomically
    unlikely) md5 collisions, keeping replays bit-identical.
    """
    key = shuffle_key(id_col, seed=seed)
    return rank_by(
        df.withColumn("_k", key), ["_k", id_col], pos_col=pos_col
    ).drop("_k")


def rank_by(
    df: DataFrame,
    order_cols: list[str],
    *,
    pos_col: str = "pos",
) -> DataFrame:
    """0-based global ordinal under ``ORDER BY *order_cols`` — the
    parallel ``row_number() OVER (ORDER BY ...)`` (same machinery as
    :func:`global_order`, which delegates here with a hash key; pass a
    trailing unique id to make the order total). Range-repartition +
    local sort + per-partition ordinal + an O(P)-row broadcast offset
    table — no stage holds more than one partition."""
    ranked = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
    )
    part_stats = ranked.groupBy("_pid").agg(
        F.count("*").alias("_c"), F.min("_mid").alias("_m0")
    )
    # num_partitions rows total: the single-task window is O(P), not O(N)
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_stats.select(
        "_pid",
        "_m0",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
    )
    out = ranked.join(F.broadcast(offsets), "_pid").withColumn(
        pos_col, F.col("_off") + (F.col("_mid") - F.col("_m0"))
    )
    return out.drop("_pid", "_mid", "_m0", "_off")


def rank_many(
    df: DataFrame,
    metric_cols: list[str],
    tiebreak_col: str,
    *,
    rank_suffix: str = "_rank",
) -> DataFrame:
    """Global 0-based rank of EVERY metric column in ONE range
    exchange — the fused form of calling :func:`rank_by` once per
    metric (which pays one full range shuffle of the wide frame per
    signal; the r4 plan audit measured q_rfm's three sequential passes
    at 58 exchanges).

    The frame is melted to (metric_idx, value, tiebreak) long form —
    M*N narrow rows — range-partitioned ONCE on (metric, value,
    tiebreak), ranked with the same per-partition-ordinal + broadcast
    offset device as :func:`rank_by` except offsets accumulate per
    (metric, partition) so each metric's rank restarts at 0, then
    pivoted back to one row per tiebreak key. Two shuffles of narrow
    rows total, independent of how many metrics are ranked.

    Metric values are compared as LONG (cast here) with the tiebreak
    column breaking ties, exactly like per-metric ``rank_by(df,
    [metric, tiebreak])``. Returns (tiebreak_col,
    <metric><rank_suffix> ...).
    """
    melted = df.select(
        tiebreak_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("_m"),
                        F.col(c).cast("long").alias("_v"),
                    )
                    for i, c in enumerate(metric_cols)
                ]
            )
        ).alias("_e"),
    ).select(tiebreak_col, F.col("_e._m").alias("_m"), F.col("_e._v").alias("_v"))
    ranked = (
        melted.repartitionByRange("_m", "_v", tiebreak_col)
        .sortWithinPartitions("_m", "_v", tiebreak_col)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
    )
    # O(P * M) rows; the single-task window is per-metric O(P), not O(N)
    part_stats = ranked.groupBy("_pid", "_m").agg(
        F.count("*").alias("_c"), F.min("_mid").alias("_m0")
    )
    woff = (
        Window.partitionBy("_m")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = part_stats.select(
        "_pid",
        "_m",
        "_m0",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
    )
    out_long = ranked.join(F.broadcast(offsets), ["_pid", "_m"]).withColumn(
        "_r", F.col("_off") + (F.col("_mid") - F.col("_m0"))
    )
    aggs = [
        F.max(F.when(F.col("_m") == i, F.col("_r"))).alias(
            f"{c}{rank_suffix}"
        )
        for i, c in enumerate(metric_cols)
    ]
    return out_long.groupBy(tiebreak_col).agg(*aggs)


def rank_normalize(
    df: DataFrame,
    id_col: str,
    signal_cols: list[str],
    *,
    out_col: str = "quality",
) -> DataFrame:
    """Blend heterogeneous quality signals into one comparable score:
    each signal is rank-normalized to [0, 1] (exact global percentile
    rank, id tie-break) and the composite is their mean — the standard
    way to ensemble curation signals whose scales differ (length vs
    log-odds vs repetition fractions).

    Per signal one :func:`rank_by` pass (parallel sort, no single-task
    window), then equi-joins on the id — (id, rank) pairs only, the
    wide row never re-shuffles. Returns (id, <signal>_rank ...,
    out_col); rows with any NULL signal are excluded (rank undefined).
    """
    base = df.select(id_col, *signal_cols)
    for s in signal_cols:
        base = base.filter(F.col(s).isNotNull())
    # floor at 1: a single-row input would divide 0/0 -> NULL quality
    # (rank 0 / n1 1 = 0.0 is the sensible degenerate score instead)
    n1 = base.agg(
        F.greatest(F.count("*") - 1, F.lit(1)).cast("double").alias("_n1")
    )
    acc = base.select(id_col)
    for s in signal_cols:
        r = rank_by(base.select(id_col, s), [s, id_col], pos_col=f"{s}_rank")
        acc = acc.join(r.select(id_col, f"{s}_rank"), id_col)
    acc = acc.crossJoin(F.broadcast(n1))
    comp = None
    for s in signal_cols:
        term = F.col(f"{s}_rank") / F.col("_n1")
        comp = term if comp is None else comp + term
    return acc.withColumn(out_col, comp / len(signal_cols)).drop("_n1")


def epoch_shards(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 42,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> DataFrame:
    """Deal a seeded permutation round-robin across ``n_shards`` worker
    shards: shard = pos mod n, position-in-shard = pos div n (the
    data-parallel reader pattern: trainer rank *i* streams shard *i* in
    order and the interleaving reconstructs the global permutation).

    Pure arithmetic on top of :func:`global_order` — no per-shard
    window, no extra shuffle, and shard sizes are balanced to ±1 row by
    construction rather than by hash luck.
    """
    ordered = global_order(df, id_col, seed=seed, pos_col="_gpos")
    return (
        ordered.withColumn(
            shard_col, F.pmod(F.col("_gpos"), F.lit(n_shards)).cast("int")
        )
        .withColumn(pos_col, (F.col("_gpos") / n_shards).cast("long"))
        .drop("_gpos")
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    *,
    n_shards: int,
    seed: int = 42,
    token_col: str | None = None,
) -> DataFrame:
    """Materialize a training-ready corpus layout: a seeded global
    permutation dealt round-robin into ``n_shards`` directories
    (``shard=K/``), each shard's rows stored IN READ ORDER, plus a
    ``_manifest`` directory the data loader bootstraps from.

    Layout contract (what a multi-rank loader needs and nothing more):

    - ``out_dir/shard=K/*.parquet`` — rank K streams its shard
      sequentially; ``pos_in_shard`` is explicit in the data, so
      resume-from-step is a pushdown filter (``pos_in_shard >= s``),
      not a skip-scan.
    - interleaving ranks by position reconstructs the global
      permutation exactly (epoch_shards round-robin contract).
    - ``out_dir/_manifest/*.parquet`` — one row per shard: ``shard,
      n_rows, n_tokens`` (NULL if no ``token_col``), ``max_pos``. The
      loader sizes epochs/steps without listing or scanning data
      files.

    Determinism: same inputs + seed => identical shard membership and
    order on any cluster (id-hash permutation, no sampling). Shard
    sizes are balanced to +-1 row by construction.

    Scale: one range exchange for the permutation (global_order's
    parallel rank — no single-task window), one hash exchange on the
    shard id for the partitioned write, and an O(n_shards) manifest
    aggregate. ``sortWithinPartitions(pos)`` makes parquet row order =
    read order within every file.

    Returns the manifest DataFrame (also written), so callers can gate
    on it (e.g. expect.run_checks over shard balance).
    """
    sharded = epoch_shards(
        df, id_col, n_shards=n_shards, seed=seed
    )
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("pos_in_shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(f"{out_dir}/data")
    )
    tok = (
        F.sum(F.col(token_col)).cast("long")
        if token_col is not None
        else F.lit(None).cast("long")
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            tok.alias("n_tokens"),
            F.max("pos_in_shard").alias("max_pos"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    return manifest


def running_agg(
    df: DataFrame,
    order_cols: list,
    specs: list,
    *,
    pos_col: str | None = None,
) -> DataFrame:
    """Fused distributed prefix pass: every spec rides ONE range
    exchange. ``specs`` is a list of ``(kind, value_col, out_col)``
    with ``kind`` one of:

    - ``"sum"`` — prefix sum of ``value_col``;
    - ``"min"`` / ``"max"`` — prefix min/max of ``value_col``;
    - ``"min_of_sum"`` — prefix min OF the prefix sum of ``value_col``
      (the CUSUM closed-form shape ``min_{j<=i} P_j`` — previously two
      stacked passes range-partitioning the SAME keys twice).

    ``pos_col`` additionally emits the 0-based global ordinal
    (:func:`rank_by`'s output) from the same pass.

    The scale-correct ``agg() OVER (ORDER BY ...)``: a bare
    unpartitioned window funnels the WHOLE dataset through one task.
    Here: range-repartition on the order keys + local sort, local
    running aggregates per partition (windows partitioned by the
    physical partition id — bounded by partition size), and an
    O(P)-row offset table broadcast back — the same machinery as
    :func:`rank_by`, so no stage holds more than one partition.
    Cross-partition combines per kind: exclusive prefix-sum of
    partition sums; exclusive prefix-min/max of partition extrema;
    for ``min_of_sum``, the exclusive prefix-min of each earlier
    partition's global prefix-sum minimum (its sum-offset + its local
    prefix-sum minimum) — all O(P)-row arithmetic on the tiny table.
    """
    from pyspark.sql import functions as F

    kinds = {k for k, _, _ in specs}
    bad = kinds - {"sum", "min", "max", "min_of_sum"}
    if bad:
        raise ValueError(f"unknown running_agg kinds: {sorted(bad)}")

    ranked = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .select(
            "*",
            F.spark_partition_id().alias("_pid"),
            F.monotonically_increasing_id().alias("_mid"),
        )
    )
    wloc = (
        Window.partitionBy("_pid")
        .orderBy("_mid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Pass 1 of local columns: running sums/minima/maxima of the RAW
    # values (min_of_sum needs its running sum materialized first so a
    # second chained window can take its running min).
    loc1 = []
    for i, (kind, vc, _oc) in enumerate(specs):
        if kind == "sum":
            loc1.append(F.sum(vc).over(wloc).alias(f"_loc{i}"))
        elif kind == "min":
            loc1.append(F.min(vc).over(wloc).alias(f"_loc{i}"))
        elif kind == "max":
            loc1.append(F.max(vc).over(wloc).alias(f"_loc{i}"))
        else:  # min_of_sum: local prefix sum now, its prefix min next
            loc1.append(F.sum(vc).over(wloc).alias(f"_ls{i}"))
    local = ranked.select("*", *loc1)
    loc2 = [
        F.min(f"_ls{i}").over(wloc).alias(f"_loc{i}")
        for i, (kind, _vc, _oc) in enumerate(specs)
        if kind == "min_of_sum"
    ]
    if loc2:
        local = local.select("*", *loc2)

    # Per-partition aggregates (O(P) rows after map-side combine).
    paggs = [F.count("*").alias("_c"), F.min("_mid").alias("_m0")]
    for i, (kind, vc, _oc) in enumerate(specs):
        if kind == "sum":
            paggs.append(F.sum(vc).alias(f"_ps{i}"))
        elif kind == "min":
            paggs.append(F.min(vc).alias(f"_pm{i}"))
        elif kind == "max":
            paggs.append(F.max(vc).alias(f"_pm{i}"))
        else:  # min_of_sum: partition total AND min of local prefix sums
            paggs.append(F.sum(vc).alias(f"_ps{i}"))
            paggs.append(F.min(f"_ls{i}").alias(f"_pm{i}"))
    part_stats = local.groupBy("_pid").agg(*paggs)

    # O(P) rows: the single-task windows are over partition summaries
    # only. Two selects because min_of_sum's cross-partition min is
    # over a column derived from the sum offsets.
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off1 = ["_pid", "_m0"]
    off1.append(F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_roff"))
    for i, (kind, _vc, _oc) in enumerate(specs):
        if kind in ("sum", "min_of_sum"):
            off1.append(
                F.coalesce(F.sum(f"_ps{i}").over(woff), F.lit(0)).alias(
                    f"_off{i}"
                )
            )
        if kind == "min":
            off1.append(F.min(f"_pm{i}").over(woff).alias(f"_offm{i}"))
        elif kind == "max":
            off1.append(F.max(f"_pm{i}").over(woff).alias(f"_offm{i}"))
        elif kind == "min_of_sum":
            off1.append(F.col(f"_pm{i}").alias(f"_pm{i}"))
    offsets = part_stats.select(*off1)
    mos = [
        i for i, (kind, _vc, _oc) in enumerate(specs) if kind == "min_of_sum"
    ]
    if mos:
        offsets = offsets.select(
            "*",
            *[
                # min over earlier partitions of THEIR global prefix-sum
                # minimum: each partition k contributes _off_k + _pm_k.
                F.min(F.col(f"_off{i}") + F.col(f"_pm{i}"))
                .over(woff)
                .alias(f"_offm{i}")
                for i in mos
            ],
        ).drop(*[f"_pm{i}" for i in mos])

    out_exprs = []
    for i, (kind, _vc, oc) in enumerate(specs):
        if kind == "sum":
            out_exprs.append((F.col(f"_off{i}") + F.col(f"_loc{i}")).alias(oc))
        elif kind == "min":
            # least() skips NULLs, so the first partition keeps _loc
            out_exprs.append(
                F.least(F.col(f"_loc{i}"), F.col(f"_offm{i}")).alias(oc)
            )
        elif kind == "max":
            out_exprs.append(
                F.greatest(F.col(f"_loc{i}"), F.col(f"_offm{i}")).alias(oc)
            )
        else:  # min_of_sum: this partition's global running-sum min vs
            # the best over all earlier partitions
            out_exprs.append(
                F.least(
                    F.col(f"_off{i}") + F.col(f"_loc{i}"),
                    F.col(f"_offm{i}"),
                ).alias(oc)
            )
    out = local.join(F.broadcast(offsets), "_pid").select(
        "*",
        *out_exprs,
        *(
            [(F.col("_roff") + (F.col("_mid") - F.col("_m0"))).alias(pos_col)]
            if pos_col
            else []
        ),
    )
    drop = ["_pid", "_mid", "_m0", "_roff"]
    for i, (kind, _vc, _oc) in enumerate(specs):
        drop.append(f"_loc{i}")
        if kind in ("sum", "min_of_sum"):
            drop.append(f"_off{i}")
        if kind in ("min", "max", "min_of_sum"):
            drop.append(f"_offm{i}")
        if kind == "min_of_sum":
            drop.append(f"_ls{i}")
    return out.drop(*drop)


def running_total(
    df: DataFrame,
    order_cols: list,
    value_col: str | list,
    *,
    out_col: str | list = "running_total",
    pos_col: str | None = None,
) -> DataFrame:
    """Distributed prefix sum: adds ``out_col`` = sum of ``value_col``
    over all rows at-or-before this row under ``ORDER BY *order_cols``
    (make the order total — pass a unique tiebreak column — or ties get
    an arbitrary but consistent serialization).

    ``value_col``/``out_col`` may be LISTS (same length): every
    cumulative column rides the SAME range exchange — the fused form of
    stacking calls, each of which would pay its own repartitionByRange
    of the identical keys (the r5 plan audit counted q_ks at 49
    exchanges from exactly that stacking). ``pos_col`` additionally
    emits the 0-based global ordinal (:func:`rank_by`'s output) from
    the same pass, for callers that need rank + prefix sums together.
    Thin wrapper over :func:`running_agg` (all-``sum`` specs); mix in
    prefix min/max there when the caller needs them in the same pass.
    """
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError(
            f"value_col/out_col length mismatch: {value_cols} vs {out_cols}"
        )
    return running_agg(
        df,
        order_cols,
        [("sum", vc, oc) for vc, oc in zip(value_cols, out_cols)],
        pos_col=pos_col,
    )


def running_min(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    *,
    out_col: str = "running_min",
) -> DataFrame:
    """Distributed prefix MIN: ``out_col`` = min of ``value_col`` over
    all rows at-or-before this row under ``ORDER BY *order_cols`` —
    :func:`running_total`'s min sibling (one ``("min", ...)`` spec of
    :func:`running_agg` — same range exchange, per-partition local
    window, O(P) offsets; the cross-partition combine is the exclusive
    prefix-min of partition minima instead of a sum). Order by a DESC
    key to get a suffix-min (the Benjamini-Hochberg q-value shape).
    Fusing with other reducers on the same keys? Call
    :func:`running_agg` once instead of stacking passes."""
    return running_agg(df, order_cols, [("min", value_col, out_col)])
