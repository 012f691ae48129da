"""Collocation mining: pointwise mutual information over adjacent pairs.

The corpus-statistics companion to operators/text.py — PMI(a, b) =
ln( P(ab) / (P(a) P(b)) ) over adjacent token pairs, the classic
collocation / multi-word-expression detector (Church & Hanks 1990).
Used in pipeline curation to find boilerplate phrases, named entities,
and tokenizer-merge candidates from corpus counts alone.

Everything is expression-only and partial-aggregatable: bigrams are
built INSIDE the token array with ``transform`` over an index
``sequence`` (no posexplode self-join — adjacency never crosses rows,
so it never needs a shuffle), then three map-combinable counts
(bigrams, unigrams, totals) and two vocabulary-sized equi-joins that
AQE broadcasts. The only large shuffle carries (w1, w2) count pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.text import tokens_lower as _toks


def pmi_bigrams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """PMI-scored adjacent bigrams with frequency >= min_count.

    Returns ``(w1, w2, pairs, pmi)``; ``pmi`` uses corpus probabilities
    P(ab) = pairs/T2, P(w) = count(w)/T1 where T2 = total bigrams and
    T1 = total tokens, computed as one double expression
    ``ln(pairs * T1 * T1 / (T2 * c1 * c2))`` (single rounding at the
    end, so both engines agree bit-for-bit) and rounded to 6 places.
    ``min_count`` keeps the output at phrase-table scale; the unigram
    and scalar frames are vocabulary-sized / one-row broadcasts.
    """
    toks = docs.select(_toks(F.col(text_col)).alias("w"))
    # adjacency needs >= 2 tokens; the guard also keeps sequence() from
    # running backwards (Spark's sequence(0, -2) would yield [0,-1,-2])
    grams = toks.where(F.size("w") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.struct(
                    F.col("w")[i].alias("w1"), F.col("w")[i + 1].alias("w2")
                ),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")

    big = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pairs"))
    big = big.where(F.col("pairs") >= min_count)
    uni = (
        toks.select(F.explode("w").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = toks.agg(
        F.sum(F.size("w")).cast("double").alias("t1"),
        F.sum(F.greatest(F.size("w") - 1, F.lit(0))).cast("double").alias("t2"),
    )
    return (
        big.join(F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))), "w1")
        .join(F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "pairs",
            F.round(
                F.log(
                    F.col("pairs")
                    * F.col("t1")
                    * F.col("t1")
                    / (F.col("t2") * F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def pmi_oracle_sql(*, min_count: int = 5, table: str = "documents") -> str:
    """DuckDB oracle: positions via generate_subscripts, bigrams via a
    (doc, pos+1) self-join — same counts, same single-rounding PMI."""
    return f"""
    WITH pos AS (
      SELECT doc_id AS doc,
             unnest(string_split(lower(text), ' ')) AS tok,
             generate_subscripts(string_split(lower(text), ' '), 1) AS p
      FROM {table}
    ),
    t AS (
      SELECT doc, tok,
             row_number() OVER (PARTITION BY doc ORDER BY p) AS p
      FROM pos WHERE tok <> ''
    ),
    grams AS (
      SELECT a.tok AS w1, b.tok AS w2
      FROM t a JOIN t b ON a.doc = b.doc AND b.p = a.p + 1
    ),
    big AS (
      SELECT w1, w2, count(*) AS pairs FROM grams GROUP BY w1, w2
      HAVING count(*) >= {min_count}
    ),
    uni AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    tot AS (
      SELECT CAST(count(*) AS DOUBLE) AS t1,
             CAST(count(*) - count(DISTINCT doc) AS DOUBLE) AS t2
      FROM t
    )
    SELECT w1, w2, pairs,
           round(ln(pairs * t1 * t1 / (t2 * u1.c * u2.c)), 6) AS pmi
    FROM big
    JOIN uni u1 ON u1.tok = w1
    JOIN uni u2 ON u2.tok = w2, tot
    """
