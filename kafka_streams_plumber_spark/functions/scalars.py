"""Scalar helpers mirroring the Lua-stdlib idioms the reference's examples
rely on (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tonumber(col: Column | str) -> Column:
    """Lua ``tonumber``: numeric parse, NULL on failure (the reference's
    drop-unparsable idiom, examples/time/example.lua:8,
    examples/csv/example.lua:18). Legacy cast gives exactly this."""
    return _c(col).cast("double")


def toint(col: Column | str) -> Column:
    """Lua ``toint`` semantics: tonumber then truncate toward zero
    ("3.2" -> 3), NULL on failure."""
    d = _c(col).cast("double")
    return F.when(d.isNull(), F.lit(None).cast("long")).otherwise(
        d.cast("long")
    )


def parse_csv_line(col: Column | str, n_fields: int, sep: str = ",") -> Column:
    """Split a CSV line into an array of exactly ``n_fields`` fields, or
    NULL if the line doesn't have that many — the engine's version of the
    csv example's Lua pattern match-or-drop
    (examples/csv/example.lua:1-20, FIXTURES.md F3).

    Follow with ``.isNotNull()`` as the drop filter and element_at() for
    field access. Pure expressions; no UDF.
    """
    parts = F.split(_c(col), sep, -1)
    return F.when(F.size(parts) == n_fields, parts)
