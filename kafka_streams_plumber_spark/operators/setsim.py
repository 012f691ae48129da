"""Exact set-similarity self-join via prefix filtering (PPJoin-lite).

Complements operators/dedup.py: MinHash-LSH finds near-dup pairs
PROBABILISTICALLY; this finds every pair with Jaccard >= t EXACTLY,
using the prefix-filtering principle (Chaudhuri et al., "A Primitive
Operator for Similarity Joins", ICDE 2006; Xiao et al., PPJoin) instead
of the quadratic all-pairs join.

Why it scales: order each doc's token set by ascending global frequency
(rarest first). If J(x, y) >= t, then x and y must share at least one
token among the first ``|x| - ceil(t * |x|) + 1`` tokens of x (same for
y). So candidate generation joins only PREFIX tokens — and because
prefixes are the rarest tokens, the per-token candidate lists stay
short; stop-word-sized posting lists never enter the join. Verification
then computes exact overlap for candidates only.

All stages are DataFrame-native: two groupBys (doc-term distinct, global
term frequency), one per-doc window for prefix ranking (partitioned by
doc_id — millions of small groups, never a hot key), an equi-join on the
prefix token, and a candidate-only verify join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_streams_plumber_spark.operators.text import tokens_lower as _tok


def jaccard_prefix_join(
    docs: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with token-set Jaccard >= threshold, exactly.

    Returns ``(doc_a, doc_b, inter, jaccard)`` with ``doc_a < doc_b``
    and ``jaccard`` rounded to 6 places (the threshold compare happens
    BEFORE rounding, on the raw double division, so both engines cut at
    the same pairs).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    t = F.lit(float(threshold))

    toks = (
        docs.select(F.col(id_col).alias("doc"), F.explode(_tok(F.col(text_col))).alias("tok"))
        .distinct()
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    sz = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    # rank tokens per doc, rarest first (freq, then tok for a total order
    # shared by every doc); keep only the prefix
    ranked = (
        toks.join(freq, "tok")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("freq", "tok")
            ),
        )
        .join(sz, "doc")
        .where(F.col("r") <= F.col("sz") - F.ceil(t * F.col("sz")) + 1)
        .select("doc", "tok", "sz")
    )

    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.sz").alias("sz1"),
            F.col("b.sz").alias("sz2"),
        )
        # length filter: |y| must lie in [t|x|, |x|/t] for J >= t
        .where(
            (F.col("sz2") >= F.ceil(t * F.col("sz1")))
            & (F.col("sz1") >= F.ceil(t * F.col("sz2")))
        )
        .distinct()
    )

    # exact overlap for candidates only: re-join both token sets
    ta = toks.select(F.col("doc").alias("d1"), "tok")
    tb = toks.select(F.col("doc").alias("d2"), "tok")
    inter = (
        cand.join(ta, "d1")
        .join(tb, ["d2", "tok"])
        .groupBy("d1", "d2", "sz1", "sz2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.where(jac >= t)
        .select(
            F.col("d1").alias("doc_a"),
            F.col("d2").alias("doc_b"),
            F.col("inter"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def jaccard_oracle_sql(*, threshold: float, table: str = "documents") -> str:
    """Quadratic exact-Jaccard oracle (DuckDB) — ground truth for
    :func:`jaccard_prefix_join` at test scale."""
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id AS doc, tok FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM {table}
      ) WHERE tok <> ''
    ),
    sz AS (SELECT doc, count(*) AS sz FROM toks GROUP BY doc),
    inter AS (
      SELECT a.doc AS d1, b.doc AS d2, count(*) AS inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT d1 AS doc_a, d2 AS doc_b, inter,
           round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc = d1
    JOIN sz sb ON sb.doc = d2
    WHERE inter / (sa.sz + sb.sz - inter) >= {threshold!r}
    """


def source_overlap_matrix(
    docs: DataFrame,
    *,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source near-duplicate overlap matrix.

    For every unordered source pair, counts the near-duplicate document
    pairs (exact Jaccard >= threshold via :func:`jaccard_prefix_join`)
    that span them — the curation diagnostic for "how much of source A
    is already in source B" before mixing corpora. Returns
    ``(source_a, source_b, dup_pairs, docs_a, docs_b)`` with
    ``source_a <= source_b`` and docs_a/docs_b the distinct documents
    of each side involved in those pairs (for a given row, docs_a
    counts docs from source_a, docs_b from source_b; on the diagonal
    both count the same pool).

    The expensive part is the similarity join itself; this adds two
    id-keyed joins against an O(docs) two-column frame and a
    source-pair groupBy (vocabulary-sized output).
    """
    pairs = jaccard_prefix_join(
        docs, threshold=threshold, id_col=id_col, text_col=text_col
    )
    src = docs.select(
        F.col(id_col).alias("_id"), F.col(source_col).alias("_src")
    )
    tagged = (
        pairs.join(src.withColumnRenamed("_id", "doc_a").withColumnRenamed("_src", "src_a"), "doc_a")
        .join(src.withColumnRenamed("_id", "doc_b").withColumnRenamed("_src", "src_b"), "doc_b")
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            # keep the doc on the canonical side it belongs to
            F.when(F.col("src_a") <= F.col("src_b"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("da"),
            F.when(F.col("src_a") <= F.col("src_b"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("db"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("dup_pairs"),
        F.countDistinct("da").alias("docs_a"),
        F.countDistinct("db").alias("docs_b"),
    )


def source_overlap_oracle_sql(
    *, threshold: float, table: str = "documents"
) -> str:
    """DuckDB oracle for :func:`source_overlap_matrix` on top of the
    quadratic exact-Jaccard ground truth."""
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id AS doc, tok FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM {table}
      ) WHERE tok <> ''
    ),
    sz AS (SELECT doc, count(*) AS sz FROM toks GROUP BY doc),
    inter AS (
      SELECT a.doc AS d1, b.doc AS d2, count(*) AS inter
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc < b.doc
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT d1, d2
      FROM inter
      JOIN sz sa ON sa.doc = d1
      JOIN sz sb ON sb.doc = d2
      WHERE inter / (sa.sz + sb.sz - inter) >= {threshold!r}
    ),
    tagged AS (
      SELECT least(ma.source, mb.source) AS source_a,
             greatest(ma.source, mb.source) AS source_b,
             CASE WHEN ma.source <= mb.source THEN d1 ELSE d2 END AS da,
             CASE WHEN ma.source <= mb.source THEN d2 ELSE d1 END AS db
      FROM pairs
      JOIN {table} ma ON ma.doc_id = d1
      JOIN {table} mb ON mb.doc_id = d2
    )
    SELECT source_a, source_b, count(*) AS dup_pairs,
           count(DISTINCT da) AS docs_a, count(DISTINCT db) AS docs_b
    FROM tagged GROUP BY 1, 2
    """


def _containment_candidates(
    docs: DataFrame,
    *,
    threshold: float,
    k: int,
    id_col: str,
    text_col: str,
    block_col: str | None,
) -> tuple[DataFrame, DataFrame]:
    """The prefix-filter candidate stage of :func:`containment_join`,
    split out so the filter's PRUNING POWER is directly measurable
    (tools/zipf_probe.py counts candidate pairs per corpus shape):
    returns ``(toks, cand)`` where ``cand`` is the distinct
    ``(d1, d2, sz1)`` candidate set the verify stage will intersect."""
    t = F.lit(float(threshold))

    from kafka_streams_plumber_spark.operators.text import shingles as _sh
    from kafka_streams_plumber_spark.plans.scale import (
        ensure_parallelism,
        reuse_barrier,
    )

    # The shingle explode multiplies each document into hundreds of
    # (doc, tok) rows; widen the source first so a single-split corpus
    # file doesn't serialize the whole tokenization (guide §2.5).
    docs = ensure_parallelism(docs)

    cols = [F.col(id_col).alias("doc"), F.explode(_sh(F.col(text_col), k=k)).alias("tok")]
    if block_col is not None:
        cols.insert(1, F.col(block_col).alias("blk"))
    toks = docs.select(*cols).distinct()
    # Pruning barrier (plans.scale.reuse_barrier): toks feeds several
    # consumers (freq, sz, the positional window, the verify sets) and
    # per-consumer column pruning was specializing copies of the whole
    # scan+explode+distinct subtree, so the exchange materialized more
    # than once at runtime. Behind the barrier each consumer's subtree
    # is canonically identical and AQE stage reuse runs ONE explode +
    # ONE distinct exchange for all of them.
    toks = reuse_barrier(toks)
    grp = ["blk", "tok"] if block_col is not None else ["tok"]
    freq = toks.groupBy(*grp).agg(F.count(F.lit(1)).alias("freq"))
    sz = toks.groupBy(*(["doc", "blk"] if block_col else ["doc"])).agg(
        F.count(F.lit(1)).alias("sz")
    )

    # POSITIONAL prefix filtering (PPJoin-style; r12). Every token of
    # every doc gets its 1-based rank r under the global
    # rarest-frequency-first total order (freq, tok) — ONE windowed
    # frame shared by both join sides (the b side previously skipped
    # the window and freq join, which made its subtree different from
    # a's and cost an extra materialization of the toks exchange).
    part = Window.partitionBy("doc").orderBy("freq", "tok")
    pos = (
        toks.join(freq, grp)
        .withColumn("r", F.row_number().over(part))
        .join(sz, ["doc", "blk"] if block_col else ["doc"])
        .select("doc", *(["blk"] if block_col else []), "tok", "r", "sz")
    )
    prefix = pos.where(F.col("r") <= F.col("sz") - F.ceil(t * F.col("sz")) + 1)

    a, b = prefix.alias("a"), pos.alias("b")
    on = (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc") != F.col("b.doc"))
    if block_col is not None:
        on = on & (F.col("a.blk") == F.col("b.blk"))
    cand = (
        a.join(b, on)
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.sz").alias("sz1"),
            F.col("b.sz").alias("sz2"),
            F.col("a.r").alias("ra"),
            F.col("b.r").alias("rb"),
        )
        # b must hold at least ceil(t*|S_a|) of a's shingles
        .where(F.col("sz2") >= F.ceil(t * F.col("sz1")))
        # positional filter: for a TRUE pair, its minimal common token
        # (under the shared total order) is inside a's prefix — the
        # standard prefix argument — and every other common token ranks
        # strictly after it in BOTH docs, so the overlap is at most
        # 1 + min(sz1 - ra, sz2 - rb). Requiring that bound to reach
        # ceil(t*sz1) can therefore never drop a true pair (the bound
        # is valid at the minimal match, which always passes), while
        # non-minimal matches only ever ADD candidates. Measured at
        # sf0.1: 206,240 -> a few thousand candidates for 512 true
        # pairs — the verify stage was 99.75% wasted work before
        # (guide §1.2: don't compute things you throw away).
        .where(
            F.lit(1)
            + F.least(
                F.col("sz1") - F.col("ra"), F.col("sz2") - F.col("rb")
            )
            >= F.ceil(t * F.col("sz1"))
        )
        .select("d1", "d2", "sz1", "sz2")
        # Pinned-width exchange feeding the dedup AND the verify stage:
        # hashpartitioning(d1, d2) satisfies the distinct's clustered
        # distribution (subset of its grouping keys), so this REPLACES
        # the ENSURE_REQUIREMENTS exchange rather than adding one. AQE
        # coalesces exchanges by INPUT BYTES, and candidate pairs are
        # ~30 bytes/row while the downstream set-intersection verify is
        # compute-bound per byte by orders of magnitude — measured at
        # sf0.1 the verify stage was coalesced to 5 tasks carrying
        # 1.7-3.5 s of array_intersect work (and the 2-33 s bench
        # swings tracked this stage under host pressure). Width is
        # 2 x defaultParallelism, UNCAPPED — it scales with the
        # cluster, never down, and a pinned exchange is what AQE may
        # not coalesce (the _pair_join device).
        .repartition(
            2 * docs.sparkSession.sparkContext.defaultParallelism,
            "d1",
            "d2",
        )
        .distinct()
    )
    return toks, cand


def containment_join(
    docs: DataFrame,
    *,
    threshold: float,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
) -> DataFrame:
    """Directed shingle-containment pairs: every ordered pair (a, b)
    with ``C(a -> b) = |S_a n S_b| / |S_a| >= threshold``, exactly.

    Containment is the ASYMMETRIC companion to Jaccard: a short document
    quoted whole inside a long one has containment ~1 while its Jaccard
    is tiny, so symmetric near-dup passes (minhash_lsh_pairs,
    jaccard_prefix_join) never see it. This is the "is A substantially
    a quote/subset of B" detector a curation pipeline runs after the
    symmetric dedup stages.

    Exact via asymmetric prefix filtering: order each doc's word
    ``k``-shingle set rarest-global-frequency-first. If C(a -> b) >= t
    then b misses fewer than ``ceil(t*|S_a|)`` of a's shingles, so a and
    b must agree on one of a's first ``|S_a| - ceil(t*|S_a|) + 1``
    (rarest) shingles — the candidate join probes only a's prefix
    against b's full set. Rarest-first ordering keeps the probed posting
    lists short; ``block_col`` (e.g. source) bounds them further the
    same way ngram_jaccard_pairs blocks. Verification computes the
    exact intersection for candidates only.

    Returns ``(doc_a, doc_b, inter, containment)`` with ``doc_a != doc_b``
    (both directions may appear), containment compared raw and rounded
    to 6 places for output.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    toks, cand = _containment_candidates(
        docs,
        threshold=threshold,
        k=k,
        id_col=id_col,
        text_col=text_col,
        block_col=block_col,
    )
    t = F.lit(float(threshold))

    # Verification via per-doc shingle SETS and one array_intersect per
    # candidate pair, instead of re-exploding every candidate's full
    # token list through two joins and a (d1, d2) count aggregate. The
    # intersection cardinality is identical (toks is distinct at
    # (doc, tok), and every candidate pair shares >= 1 prefix token so
    # no pair can drop to an empty join); what changes is the shuffle
    # grain — O(candidates) array rows instead of O(candidates x |S_a|)
    # token rows plus their groupBy (guide §2.3: aggregate before you
    # shuffle / move sets, not exploded rows). Set size is bounded by
    # document length, the same contract the prefix window already
    # relies on.
    sets = toks.groupBy("doc").agg(F.collect_list("tok").alias("_set"))
    inter = (
        cand.select("d1", "d2", "sz1")
        .join(
            sets.select(F.col("doc").alias("d1"), F.col("_set").alias("_s1")),
            "d1",
        )
        .join(
            sets.select(F.col("doc").alias("d2"), F.col("_set").alias("_s2")),
            "d2",
        )
        .select(
            "d1",
            "d2",
            "sz1",
            F.size(F.array_intersect("_s1", "_s2")).cast("long").alias("inter"),
        )
    )
    cont = F.col("inter") / F.col("sz1")
    return inter.where(cont >= t).select(
        F.col("d1").alias("doc_a"),
        F.col("d2").alias("doc_b"),
        F.col("inter"),
        F.round(cont, 6).alias("containment"),
    )


def containment_oracle_sql(
    *, threshold: float, k: int = 3, table: str = "documents",
    block_col: str | None = None,
) -> str:
    """Quadratic exact-containment oracle (DuckDB) — ground truth for
    :func:`containment_join` at test scale. Mirrors text.shingles'
    construction (k-gram over lowercased space tokens, empties kept —
    string_split semantics; documents shorter than k fall back to the
    whole token string)."""
    blk = f"AND a.{block_col} = b.{block_col}" if block_col else ""
    return f"""
    WITH w AS (
      SELECT *, string_split(lower(text), ' ') AS wt
      FROM {table}
    ),
    d AS (
      SELECT doc_id, {block_col + "," if block_col else ""}
             CASE WHEN len(wt) >= {k} THEN
               list_distinct(list_transform(range(len(wt)-{k - 1}),
                 i -> {" || ' ' || ".join(f"wt[i+{j + 1}]" for j in range(k))}))
             ELSE [array_to_string(wt, ' ')] END AS sh
      FROM w
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh)) AS inter,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh), 6)
             AS containment
    FROM d a JOIN d b ON a.doc_id <> b.doc_id {blk}
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh)
          >= {threshold!r}
    """
