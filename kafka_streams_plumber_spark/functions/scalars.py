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


def money_sum(col: Column | str, decimals: int = 2) -> Column:
    """Exact sum of fixed-point values (money, quantities) as a DOUBLE —
    the fast twin of ``sum(CAST(x AS DECIMAL(p, decimals)))::DOUBLE``.

    Each value is rounded HALF_UP to ``decimals`` places and summed as a
    scaled long (integer arithmetic: exact and partition-order
    insensitive, like decimal, but ~2x faster — no 128-bit decimal in
    the aggregation loop). The single final division is correctly
    rounded, so the result is bit-identical to the decimal formulation
    while the scaled sum stays below 2^53 (e.g. 9e10 rows of 6-digit
    prices at 2dp); the sum itself is exact up to 2^63. Past that,
    use the decimal cast.
    """
    scale = 10 ** decimals
    return F.sum(F.round(_c(col) * scale, 0).cast("long")) / F.lit(float(scale))


def money_product_sum(
    a: Column | str, b: Column | str, a_decimals: int = 2, b_decimals: int = 2
) -> Column:
    """Exact ``sum(CAST(a AS DECIMAL(.,da)) * CAST(b AS DECIMAL(.,db)))``
    as a DOUBLE: factors are rounded to their scales independently (the
    decimal-cast semantics), multiplied as longs — exact — and summed.
    Same 2^53 bit-parity bound as :func:`money_sum` on the scaled sum.
    """
    scale = 10 ** (a_decimals + b_decimals)
    prod = F.round(_c(a) * 10 ** a_decimals, 0).cast("long") * F.round(
        _c(b) * 10 ** b_decimals, 0
    ).cast("long")
    return F.sum(prod) / F.lit(float(scale))
