"""Wire serdes: the bridge between Kafka's binary (key, value) and typed
columns — parity with the reference's MappingType serde layer
(TypeConversions.scala:12-35, GenericAvroSerializer.scala:9-73).

Four wire types (SURVEY.md §1.2): long (8-byte big-endian), string
(UTF-8), avro (Confluent-framed, schema from .avsc), void (always NULL).
All decode/encode paths are pure column expressions.

Type strings parse exactly like the reference CLI (`string`,
`long`, `avro=file.avsc`, `avro`, `void` — TypeConversions.scala:42-51):
``parse_type("avro=out.avsc")``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.conform import spark_type
from kafka_streams_plumber_spark.sources.avsc import parse_avsc

_U64 = 1 << 64
_I64_MAX = (1 << 63) - 1


@dataclass(frozen=True)
class WireType:
    kind: str  # long | string | avro | void
    avsc: str | None = None  # schema text for avro

    @property
    def model(self):
        return parse_avsc(self.avsc) if self.avsc else None


def parse_type(spec: str) -> WireType:
    """'long' | 'string' | 'void' | 'avro=file.avsc' | 'avro'
    (TypeConversions.scala:42-51). Plain 'avro' (registry-resolved
    schema) is only valid on the input side with framing+registry;
    prefer explicit .avsc."""
    spec = spec.strip()
    if spec in ("long", "string", "void"):
        return WireType(spec)
    if spec == "avro":
        return WireType("avro")
    if spec.startswith("avro="):
        path = spec[len("avro=") :]
        with open(path) as f:
            return WireType("avro", f.read())
    raise ValueError(f"unknown wire type {spec!r}")


def decode(col: Column, wt: WireType, *, confluent_framing: bool = False) -> Column:
    """binary column -> typed column."""
    if wt.kind == "void":
        return F.lit(None)
    if wt.kind == "string":
        return col.cast("string")
    if wt.kind == "long":
        # 8-byte big-endian two's complement. hex -> unsigned decimal
        # (as DECIMAL(20,0), which holds 2^64) -> signed wrap. 2^64
        # exceeds a py4j long, so it rides in as a decimal literal.
        u = F.conv(F.hex(col), 16, 10).cast("decimal(20,0)")
        wrap = F.lit(str(_U64)).cast("decimal(21,0)")
        signed = F.when(u > _I64_MAX, u - wrap).otherwise(u)
        return signed.cast("long")
    if wt.kind == "avro":
        if wt.avsc is None:
            raise ValueError(
                "avro without =file.avsc needs a schema registry; "
                "pass avro=file.avsc"
            )
        payload = col
        if confluent_framing:
            # Confluent wire format: magic byte 0x00 + 4-byte schema id
            # (GenericAvroSerializer.scala:30-40) — strip the 5-byte header
            payload = F.expr(f"substring({_name(col)}, 6, length({_name(col)}) - 5)")
        if _jvm_avro_available():
            from pyspark.sql.avro.functions import from_avro

            return from_avro(payload, wt.avsc)
        return _py_avro_decode(payload, wt)
    raise AssertionError(wt.kind)


def encode(col: Column, wt: WireType, *, confluent_framing: bool = False,
           schema_id: int = 0) -> Column:
    """typed column -> binary column for the Kafka sink."""
    if wt.kind == "void":
        return F.lit(None).cast("binary")
    if wt.kind == "string":
        return col.cast("string").cast("binary")
    if wt.kind == "long":
        # hex() of a long is already 16-digit two's complement for
        # negatives; lpad for small positives, then unhex -> 8 bytes
        return F.unhex(F.lpad(F.hex(col.cast("long")), 16, "0"))
    if wt.kind == "avro":
        if wt.avsc is None:
            raise ValueError("avro output needs an explicit schema (avro=file.avsc)")
        if _jvm_avro_available():
            from pyspark.sql.avro.functions import to_avro

            body = to_avro(col, wt.avsc)
        else:
            body = _py_avro_encode(col, wt)
        if confluent_framing:
            header = F.unhex(F.lpad(F.hex(F.lit(schema_id)), 8, "0"))
            return F.concat(F.unhex(F.lit("00")), header, body)
        return body
    raise AssertionError(wt.kind)


def spark_type_of(wt: WireType):
    from pyspark.sql import types as T

    if wt.kind == "void":
        return T.NullType()
    if wt.kind == "string":
        return T.StringType()
    if wt.kind == "long":
        return T.LongType()
    return spark_type(wt.model)


def _name(col: Column) -> str:
    # column name for embedding in a SQL expr fragment
    return col._jc.toString()  # noqa: SLF001


_JVM_AVRO: bool | None = None


def _jvm_avro_available() -> bool:
    """True when the spark-avro datasource module is on the JVM classpath
    (the AVRO_NOT_LOADED error only surfaces at analysis time, so probe
    the class eagerly and cache). This pyspark build ships without it;
    real clusters usually add org.apache.spark:spark-avro via packages."""
    global _JVM_AVRO
    if _JVM_AVRO is None:
        try:
            from pyspark.sql import SparkSession
            from pyspark.sql.avro.functions import to_avro

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False  # don't cache a session-less probe
            # the only reliable probe is evaluating the function once:
            # AVRO_NOT_LOADED surfaces at analysis, not at class load
            spark.range(1).select(
                to_avro(F.struct(F.lit(1).alias("a")))
            ).collect()
            _JVM_AVRO = True
        except Exception:
            _JVM_AVRO = False
    return _JVM_AVRO


def _py_avro_decode(payload: Column, wt: WireType) -> Column:
    """Fallback when the JVM spark-avro module is absent (this container):
    spec-correct pure-Python codec (sources/avro_codec.py) as a
    row-at-a-time UDF. Prefer the JVM path on real clusters."""
    from kafka_streams_plumber_spark.sources.avro_codec import decode_record

    model = wt.model
    out_type = spark_type(model)

    def _dec(b, _model=model):
        return None if b is None else decode_record(b, _model)

    return F.udf(_dec, out_type)(payload)


def _py_avro_encode(col: Column, wt: WireType) -> Column:
    from pyspark.sql import types as T

    from kafka_streams_plumber_spark.sources.avro_codec import encode_record

    model = wt.model

    def _enc(v, _model=model):
        return None if v is None else encode_record(v, _model)

    return F.udf(_enc, T.BinaryType())(col)
