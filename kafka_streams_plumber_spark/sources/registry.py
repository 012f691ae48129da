"""Confluent Schema Registry client — the missing piece of plain ``avro``
wire types (reference: GenericAvroSerializer.scala:9-73, which resolves
the writer schema by the 4-byte id embedded in every Confluent-framed
message, and TypeConversions.scala:22, which admits ``avro`` with no
``=file.avsc``).

Spark needs a FIXED column type per DataFrame, so resolution happens at
two levels:

- **Driver side, once per job**: :func:`resolve_reader_schema` fetches
  the subject's latest schema (Confluent TopicNameStrategy:
  ``{topic}-value`` / ``{topic}-key``) and pins it as the READER schema —
  this is what types the column.
- **Executor side, per schema id**: heterogeneous topics (old producers
  still writing previous versions) carry different writer ids; the
  pure-Python decode path resolves each id through the same client
  (per-worker LRU-cached — one registry round-trip per (worker, id),
  NOT per record) and reconciles writer records onto the reader schema
  by field name. The JVM ``from_avro`` path has no per-record schema
  hook, so it is only used when the topic is homogeneous.

The HTTP client is stdlib ``urllib`` (the registry API is plain
JSON-over-HTTP); :class:`FakeSchemaRegistry` is the injectable in-memory
double for tests and offline runs. Both are picklable so either can ride
into executor closures.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


class SchemaNotFound(KeyError):
    """Raised when the registry has no schema for an id or subject."""


class SchemaRegistryClient:
    """Interface: resolve schemas by id (decode path) and by subject
    (reader-schema pinning / encode path)."""

    def schema_by_id(self, schema_id: int) -> str:
        """Avro schema JSON text for a registered schema id."""
        raise NotImplementedError

    def latest_schema(self, subject: str) -> tuple[int, str]:
        """(schema_id, schema_text) of the subject's latest version."""
        raise NotImplementedError


@dataclass
class FakeSchemaRegistry(SchemaRegistryClient):
    """In-memory registry double: deterministic ids, same lookup
    contract as the HTTP client. Also usable as a local registry for
    fully-offline pipelines."""

    _by_id: dict[int, str] = field(default_factory=dict)
    _subjects: dict[str, list[int]] = field(default_factory=dict)
    _next_id: int = 1

    def register(self, subject: str, schema_text: str) -> int:
        """Register a schema under a subject, returning its id
        (idempotent on identical text, like the real registry)."""
        canon = json.dumps(json.loads(schema_text), sort_keys=True)
        for sid, txt in self._by_id.items():
            if txt == canon and sid in self._subjects.get(subject, []):
                return sid
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = canon
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    def schema_by_id(self, schema_id: int) -> str:
        try:
            return self._by_id[schema_id]
        except KeyError:
            raise SchemaNotFound(f"schema id {schema_id}") from None

    def latest_schema(self, subject: str) -> tuple[int, str]:
        ids = self._subjects.get(subject)
        if not ids:
            raise SchemaNotFound(f"subject {subject!r}")
        return ids[-1], self._by_id[ids[-1]]


class HttpSchemaRegistryClient(SchemaRegistryClient):
    """Confluent Schema Registry REST client (GET /schemas/ids/{id},
    GET /subjects/{subject}/versions/latest) with a per-process cache:
    ids are immutable, so cache hits never revalidate; subjects cache
    only within this client instance's lifetime."""

    def __init__(self, base_url: str, *, timeout: float = 10.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self._id_cache: dict[int, str] = {}

    def __getstate__(self):
        # ship the cache to executors too: warm ids never re-fetch there
        return {
            "base_url": self.base_url,
            "timeout": self.timeout,
            "_id_cache": dict(self._id_cache),
        }

    def __setstate__(self, state):
        self.__dict__.update(state)

    def _get(self, path: str) -> dict:
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(
                self.base_url + path, timeout=self.timeout
            ) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise SchemaNotFound(path) from None
            raise

    def schema_by_id(self, schema_id: int) -> str:
        if schema_id not in self._id_cache:
            self._id_cache[schema_id] = self._get(f"/schemas/ids/{schema_id}")[
                "schema"
            ]
        return self._id_cache[schema_id]

    def latest_schema(self, subject: str) -> tuple[int, str]:
        doc = self._get(f"/subjects/{subject}/versions/latest")
        sid, schema = int(doc["id"]), doc["schema"]
        self._id_cache[sid] = schema
        return sid, schema


def check_reader_compatibility(
    client: SchemaRegistryClient, subject: str, reader_schema: str
) -> list[str]:
    """Pre-flight a consumer deploy against a live subject: fetch the
    subject's latest registered (writer) schema and return every
    schema-resolution incompatibility (empty = safe to deploy). The
    registry-side complement of the refuse-to-start golden-test gate —
    run both before attaching a streaming job to a production topic.
    """
    from kafka_streams_plumber_spark.sources.avsc import (
        schema_incompatibilities,
    )

    _, writer_schema = client.latest_schema(subject)
    return schema_incompatibilities(reader_schema, writer_schema)
