"""JSONL (newline-delimited JSON) corpus I/O — the lingua franca of
LLM training-data interchange.

Reading goes through Spark's native JSON source (JVM-side Jackson
parsing, splittable .gz/.zst files handled by the codec layer):

- ALWAYS pass a schema: schema inference runs a full extra scan of
  100 TB before the first real job, and silently widens types on dirty
  data. ``read_jsonl`` requires one (build it once with
  ``infer_jsonl_schema`` on a SAMPLE if you must).
- corrupt lines are captured, not fatal: PERMISSIVE mode with a
  ``_corrupt_record`` column, so the standard triage — count bad rows,
  route them to a dead-letter path, continue — is one filter.

Writing shards deterministically: ``repartition(n)`` by id so reruns
produce identical shard contents (modulo Spark's task file naming),
with optional gzip for interchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    keep_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL with an explicit schema. Malformed lines land in
    ``_corrupt_record`` (all data columns null) instead of failing the
    job; pass ``keep_corrupt=False`` to drop them at the scan
    (DROPMALFORMED — they never become rows)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if not keep_corrupt:
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    # copy the fields: StructType.add mutates in place, and the
    # caller's schema object must not grow a corrupt column per call
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): rows that parsed vs raw lines that did not — the
    dead-letter triage split.

    Caches the parsed frame first: Spark refuses plans that reference
    ONLY the internal corrupt column of a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN — its documented fix is to
    persist the parsed result), and both halves re-read the scan
    anyway, so the cache is also the efficient choice."""
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad


def infer_jsonl_schema(
    spark: SparkSession, path: str, *, sample_lines: int = 10_000
) -> T.StructType:
    """Infer a schema from the FIRST ``sample_lines`` lines only (one
    bounded scan, not the full-corpus inference pass spark.read.json
    would run). Pin the result in code afterwards."""
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r.value)).schema


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    shards: int | None = None,
    shard_by: str | None = None,
    compression: str | None = None,
) -> None:
    """Write JSONL, optionally gzip-compressed and deterministically
    sharded: with ``shard_by`` rows are repartitioned by that id column
    so shard MEMBERSHIP is stable across reruns/cluster sizes (shard =
    hash(id) % shards — the property downstream resumable loaders
    want)."""
    if shard_by is not None and shards is None:
        raise ValueError(
            "write_jsonl: shard_by requires shards — without a shard "
            "count there is no hash(id) %% shards layout to promise"
        )
    out = df
    if shards is not None:
        out = (
            out.repartition(shards, F.col(shard_by))
            if shard_by
            else out.repartition(shards)
        )
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
