"""CSV/TSV corpus I/O with dead-letter triage — the tabular sibling of
``sources/jsonl.py`` (same contract: schema-mandatory reads, corrupt
lines captured not fatal, deterministic sharded writes).

Reading goes through Spark's native CSV source (JVM-side univocity
parsing, splittable compressed files via the codec layer):

- ALWAYS pass a schema: CSV inference runs a full extra scan and
  guesses types from dirty data (a single stray string silently turns
  a numeric column into strings corpus-wide).
- malformed lines (wrong column count, uncastable values) land in
  ``_corrupt_record`` with the data columns null — the standard
  triage (count, dead-letter, continue) is one
  :func:`...sources.jsonl.split_corrupt` away, shared verbatim with
  the JSONL path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_plumber_spark.sources.jsonl import CORRUPT_COL


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    delimiter: str = ",",
    header: bool = True,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read CSV/TSV with an explicit schema. Malformed lines land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE);
    ``keep_corrupt=False`` drops them at the scan (DROPMALFORMED).
    Pass ``delimiter="\\t"`` for TSV."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    base = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(bool(header)).lower())
        # columns beyond the schema are malformed, not silently dropped
        .option("enforceSchema", "false")
    )
    if not keep_corrupt:
        return base.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        base.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    *,
    delimiter: str = ",",
    header: bool = True,
    shards: int | None = None,
    shard_by: str | None = None,
    compression: str | None = None,
) -> None:
    """Write CSV, optionally compressed and deterministically sharded
    (``shard_by`` pins shard MEMBERSHIP to hash(id) % shards — stable
    across reruns and cluster sizes, the resumable-loader property)."""
    if shard_by is not None and shards is None:
        raise ValueError(
            "write_csv: shard_by requires shards — without a shard "
            "count there is no hash(id) %% shards layout to promise"
        )
    out = df
    if shards is not None:
        out = (
            out.repartition(shards, F.col(shard_by))
            if shard_by
            else out.repartition(shards)
        )
    w = (
        out.write.mode("overwrite")
        .option("delimiter", delimiter)
        .option("header", str(bool(header)).lower())
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)
