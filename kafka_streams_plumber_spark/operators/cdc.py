"""Change-data-capture application and dataset versioning.

Beyond-reference surface: a 100 TB training corpus is not rebuilt from
scratch per run — it is maintained. Upstream fixes arrive as change
logs (new crawls, takedown/deletion requests, re-annotations); the
pipeline needs (a) `apply_changes` — produce the next snapshot by
folding a change log into the previous one (latest-wins upsert +
delete), and (b) `scd2_history` — turn the change log into validity
intervals (slowly-changing-dimension type 2) so any past snapshot can
be reconstructed ("as-of" dataset versioning for reproducible
training runs).

Scale design: the latest-change-per-key reduction is a single
map-side-combinable ``groupBy(key).agg(max_by(payload, version))`` —
one shuffle carrying one row per (partition, touched key), NOT a
per-key window over the raw log. The fold into the snapshot is one
full-outer equi-join on the key; with AQE on, a small change set
broadcasts automatically. Nothing ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    changes: DataFrame,
    key_cols: str | list[str],
    version_col: str,
) -> DataFrame:
    """One row per key: the change with the highest version.

    ``(key, version)`` must be unique (a CDC log property; enforce
    upstream). ``max_by`` keeps the whole payload struct of the
    winning row in one map-combinable aggregation.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in changes.columns if c not in keys]
    return (
        changes.groupBy(*keys)
        .agg(
            F.max_by(F.struct(*payload), F.col(version_col)).alias("_p"),
        )
        .select(*keys, "_p.*")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: str | list[str],
    version_col: str,
    *,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Fold a change log into a snapshot: latest change per key wins;
    a winning delete removes the key; anything else upserts the
    payload columns; untouched snapshot rows pass through.

    Output schema = snapshot schema (op/version are log metadata and
    are dropped). Payload columns are matched by name; the change log
    must carry every snapshot column except the keys.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    latest = latest_changes(changes, keys, version_col)
    payload = [
        c for c in snapshot.columns if c not in keys
    ]
    chg = latest.select(
        *keys,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_new_{c}") for c in payload],
    )
    joined = snapshot.join(chg, keys, "full_outer")
    merged = joined.filter(
        F.col("_op").isNull() | (F.col("_op") != delete_op)
    )
    return merged.select(
        *keys,
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_new_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )


def scd2_history(
    changes: DataFrame,
    key_cols: str | list[str],
    version_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: every change becomes a
    versioned record with ``valid_from`` = its version and
    ``valid_to`` = the next change's version for the same key (NULL on
    the current record), plus ``is_current``.

    One window shuffle partitioned by key — keys are high-cardinality
    entity ids, so no single-task hot partition; state per task is one
    row of lookahead (``lead``), not the whole history.

    Reconstructing the corpus as of version V is then a plain filter:
    ``valid_from <= V AND (valid_to IS NULL OR valid_to > V)`` — a
    pushdown-friendly predicate, no recomputation of the fold.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col))
    return (
        changes.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
