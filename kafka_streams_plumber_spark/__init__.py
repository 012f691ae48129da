"""kafka_streams_plumber_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of rollulus/kafka-streams-plumber.

The reference (see /root/reference, SURVEY.md) is a stateless Kafka->Kafka
(key, value) record transformer: a chain of filter/map/mapValues steps, a
schema-conforming output stage, pluggable wire serdes, and a golden-test
pre-flight gate. Here those become:

- :class:`Pipeline` — a builder producing a ``DataFrame -> DataFrame``
  function from chained filter/map/mapValues steps (Column expressions on
  the fast path, Python UDFs as the escape hatch).
- :func:`conform` — schema-driven output projection with the reference's
  drop-extra / null-fill / coerce / union-resolution semantics
  (LuaMapper.scala:99-127).
- ``sources.kafka`` — Structured Streaming Kafka source/sink with
  long/string/avro/void serdes and Confluent registry framing.
- ``testing.verify`` — the golden-test pre-flight gate
  (Plumber.scala:41-50): refuse to start streaming if the pipeline does
  not reproduce declared fixtures.

Beyond reference parity, the ``operators`` package provides the
large-scale training-data-pipeline surface — ``dedup`` (exact/MinHash/
SimHash/span/incremental), ``similarity`` (ANN, quantization,
matryoshka), ``text`` (quality, LM scoring, sentences, BPE via
``bpe``), ``classify`` (NB train/score), ``web`` (URL canon, blocklist,
HTML->text), ``sampling`` (splits, importance, negatives, weighted A-ES), ``packing``
/ ``ordering`` / ``stats`` / ``sketches`` (CMS, bloom-pruned joins) /
``clustering`` / ``diff`` / ``graph`` (components, PageRank, triangle
counts) / ``retrieval`` (BM25, overlap, RRF fusion, recall/MRR/nDCG
evaluation) / ``cdc`` (upsert fold, SCD2) / ``linkage`` (blocked fuzzy
join) / ``behavior`` (funnel, cohort retention, gap fill, rolling
z-score, Markov transitions) / ``setsim`` (exact prefix-filtered
similarity join, source-overlap matrix) / ``collocate`` (PMI) /
``multimodal`` — plus ``sources`` (kafka/avro/
registry/jsonl/warc), ``streaming`` (stateful ops, continual ingestion,
aggregates, CDC-upsert sink), and ``plans`` (session, scale, observe,
inspect). See the
README coverage map for the operator -> contract-query index. All of it
is designed for 100 TB scale: no driver-side collects, broadcast for
small sides, JVM-side expressions in hot paths, Arrow-batched pandas
UDFs where Python is unavoidable.
"""

from kafka_streams_plumber_spark.operators.pipeline import Pipeline, from_kv, to_kv
from kafka_streams_plumber_spark.operators.conform import conform, conform_column
from kafka_streams_plumber_spark.plans.session import (
    get_spark,
    load_tables,
    register_views,
)

__all__ = [
    "Pipeline",
    "conform",
    "conform_column",
    "from_kv",
    "get_spark",
    "load_tables",
    "register_views",
    "to_kv",
]

__version__ = "0.1.0"
