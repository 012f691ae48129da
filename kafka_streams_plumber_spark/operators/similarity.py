"""Similarity search over embedding columns (array<float>), designed for
100 TB / billion-vector scale.

- :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot products as JVM-side ``zip_with`` /
  ``aggregate`` expressions, per-query top-k via window rank. One
  broadcast, one shuffle (on query id for the rank) — the corpus is
  never shuffled.
- :func:`rp_lsh_topk` — approximate top-k via random-hyperplane
  (sign-random-projection) LSH: bucket vectors by sign-pattern over
  ``n_planes`` seeded hyperplanes (multiple tables to boost recall),
  join queries to their buckets only, rank within candidates. The
  hyperplanes are deterministic literals — no fitted model, no driver
  state, no collect.
- :func:`embedding_dup_pairs` — near-duplicate vector pairs (cosine >=
  threshold) via the same LSH bucketing, verified exactly.

All dot products cast float->double before multiplying and fold
left-to-right, so results are deterministic and reproducible across
engines.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    exclude_self: bool = True,
    broadcast_threshold: int | None = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors of every query vector.

    Returns (query_id, neighbor_id, sim, rank). Norms are computed once
    per side before the join.

    The query side is broadcast ONLY while it is provably small: search
    workloads usually carry a handful of queries, but this operator is
    also reachable with a large query frame (e.g. corpus-vs-corpus
    scoring), where a forced broadcast would OOM the driver. Like
    ``dedup_clusters``, the hint is size-gated: applied when a cheap
    ``count()`` of the query side is at most ``broadcast_threshold``
    rows (~100k × a-few-hundred-byte vectors ≈ tens of MB), otherwise
    the cross join is left to Spark's partitioned cartesian strategy
    (each side stays distributed). Pass ``None`` to never broadcast.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    if broadcast_threshold is not None and q.count() <= broadcast_threshold:
        q = F.broadcast(q)
    joined = c.join(q, F.lit(True))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
    sims = joined.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias("_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("_sim", 6).alias("sim"),
            "rank",
        )
    )


def _hyperplanes(n_planes: int, dim: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rp_signature(vec: Column | str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id (long) for one LSH table.

    When ``vec`` is a column NAME the whole signature is built as ONE
    SQL string handed to a single ``F.expr`` call. The Column-algebra
    form costs ~70 py4j round-trips per plane (one per literal weight
    plus the lambda plumbing), which at production table counts
    (n_planes x n_tables ~ 60+) is multiple SECONDS of driver-side
    plan construction per query — measured 6.7 s of the semantic-dedup
    wall clock before any task ran. ``repr(w) + "D"`` round-trips every
    IEEE double exactly (verified against the Column-built signature:
    0 mismatches over random vectors), so the parsed plan is
    bit-identical to the old one.
    """
    if isinstance(vec, str):
        # Escape embedded backticks (ADVICE r11): internal callers only
        # pass clean names today, but a user-supplied column named
        # "a`b" would otherwise break out of the quoted identifier.
        return F.expr(_rp_signature_sql("`" + vec.replace("`", "``") + "`", planes))
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in p]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseXOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def _rp_signature_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL text of the sign-LSH bucket id — same expression tree the
    Column algebra in :func:`rp_signature` builds, parsed in one shot."""
    terms = ["0L"]
    for i, p in enumerate(planes):
        # repr() of inf/nan would emit invalid SQL; plane weights come
        # from rng.gauss today, so this is a guard, not a code path.
        assert all(math.isfinite(w) for w in p), "non-finite plane weight"
        arr = "array(" + ",".join(repr(w) + "D" for w in p) + ")"
        proj = (
            f"aggregate(zip_with({vec_sql}, {arr},"
            " (x, w) -> CAST(x AS DOUBLE) * w),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN shiftleft(1L, {i}) ELSE 0L END)")
    return "(" + " ^ ".join(terms) + ")"


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: rank only candidates that share an LSH bucket
    with the query in at least one table.

    Scale shape: corpus is scanned once per table projection (stacked via
    explode of table signatures — still one pass), shuffled on compact
    (table, bucket) keys; the quadratic part is confined to buckets.
    Recall grows with n_tables; at 1000 executors the bucket join is an
    ordinary shuffled equi-join, no broadcast of the corpus anywhere.
    """
    tables = [
        _hyperplanes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)
    ]

    def sig_array(vec: str) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    rp_signature(vec, tables[t]).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
        F.explode(sig_array(vec_col)).alias("sig"),
    ).select("neighbor_id", "_cv", "_cn", "sig.table", "sig.bucket")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
        F.explode(sig_array(vec_col)).alias("sig"),
    ).select("query_id", "_qv", "_qn", "sig.table", "sig.bucket")

    cand = c.join(F.broadcast(q), ["table", "bucket"])
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sims = (
        cand.select(
            "query_id",
            "neighbor_id",
            (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias("_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("_sim").alias("_sim"))  # dedup across tables
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def embedding_dup_pairs_exact(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (a_id < b_id). Quadratic —
    the ground-truth baseline for validating the LSH variant; block or
    sample before calling this at scale."""
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cos", cosine(F.col("_va"), F.col("_vb")))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", F.round("cos", 6).alias("cos"))
    )


def auto_n_planes(n_rows: int, target_bucket_size: int) -> int:
    """The data-sized sign-LSH plane count:
    ``clamp(ceil(log2(n / target)), 4, 24)`` — holds expected bucket
    occupancy ~constant so candidate volume stays linear in the
    corpus. Shared by :func:`embedding_dup_pairs` and the scale
    probes (tools/zipf_probe.py) so a sizing change cannot silently
    diverge from what the probes measure."""
    import math

    return min(
        24,
        max(4, math.ceil(math.log2(max(2.0, n_rows / target_bucket_size)))),
    )


def embedding_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 7,
    max_bucket_size: int = 2000,
    target_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (a_id < b_id, cosine >= threshold) via
    multi-table sign-LSH candidates + exact verification. High cosine
    pairs collide in some table with high probability; buckets are
    size-capped against skew.

    SIZE THE TABLES TO THE DATA for scale runs: with a FIXED
    ``n_planes``, bucket count is constant, so expected bucket
    occupancy grows linearly with the corpus and candidate pairs grow
    QUADRATICALLY (n^2 / 2^planes) — the scale probe measured 16x on a
    10x step at 10 planes. Pass ``target_bucket_size`` instead:
    ``n_planes = clamp(ceil(log2(n / target)), 4, 24)`` keeps expected
    occupancy ~constant, making candidate volume ~n * target — linear.
    Costs one count() job (aggregate-only, same device as
    repartition_by_media_size). Fixed ``n_planes`` remains the
    default because the bit-exact SQL oracle must inline a STATIC
    hyperplane set (q_semantic_keep_lsh pins 10)."""
    if target_bucket_size is not None:
        n_planes = auto_n_planes(df.count(), target_bucket_size)
    from kafka_streams_plumber_spark.plans.scale import ensure_parallelism

    # The signature projection (n_tables x n_planes dot products per
    # row) plus the table-fanout explode is the operator's hot loop; a
    # narrow source (one small parquet file) would run it on 1-3 cores.
    # No-op whenever the input already has >= defaultParallelism
    # partitions (any real-scale scan).
    df = ensure_parallelism(df)
    tables = [_hyperplanes(n_planes, dim, seed + 1000 * t) for t in range(n_tables)]
    sig_array = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                rp_signature(vec_col, tables[t]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), F.explode(sig_array).alias("sig")
    ).select("_id", "_v", "sig.table", "sig.bucket")

    buckets = (
        base.groupBy("table", "bucket")
        .agg(F.collect_list(F.struct("_id", "_v")).alias("items"), F.count("*").alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket_size))
    )
    pairs = (
        buckets.select(F.explode("items").alias("a"), "items")
        .select("a", F.explode("items").alias("b"))
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            cosine(F.col("a._v"), F.col("b._v")).alias("cos"),
        )
        .distinct()
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", F.round("cos", 6).alias("cos"))
    )
    return pairs


def _cells_row(
    corpus: DataFrame, *, id_col: str, vec_col: str, n_cells: int
) -> DataFrame:
    """One-row DataFrame holding the IVF cell table:
    ``cells: array<struct<cell:int, cv:array<double>>>`` with unit-norm
    centroid vectors.

    Centroids are ``n_cells`` deterministic random pivots — the corpus
    ordered by the engine's Knuth id hash (sampling.split_bucket, the
    same replayable pivot device as clustering.kmeans_fit), lowest
    first (TakeOrderedAndProject: no global sort shuffle). Random
    pivots are the zero-iteration special case of k-means and preserve
    IVF's search shape; swap in fitted centroids for tighter cells
    without touching the search path.
    """
    from kafka_streams_plumber_spark.operators.sampling import split_bucket

    pivots = (
        corpus.select(F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv"))
        .orderBy(split_bucket("_pid"), F.col("_pid"))
        .limit(n_cells)
    )
    unit = F.transform(
        F.col("_pv"), lambda x: x.cast("double") / norm(F.col("_pv"))
    )
    return (
        pivots.select(unit.alias("_uv"))
        .select(
            F.collect_list("_uv").alias("_vs"),
        )
        .select(
            F.transform(
                F.col("_vs"),
                lambda v, i: F.struct(i.alias("cell"), v.alias("cv")),
            ).alias("cells")
        )
    )


def _best_cells(vec: Column, cells: Column, n: int) -> Column:
    """The ``n`` cell ids whose (unit) centroid has the highest dot
    product with ``vec`` — array<int>, deterministic tie-break on id."""
    scored = F.transform(
        cells,
        lambda c: F.struct(dot(vec, c["cv"]).alias("s"), c["cell"].alias("cell")),
    )
    ranked = F.reverse(F.array_sort(scored))  # by (s, cell) desc
    return F.transform(F.slice(ranked, 1, n), lambda x: x["cell"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    assign: int = 2,
    exclude_self: bool = True,
    broadcast_threshold: int | None = 100_000,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning: index
    every corpus vector under its ``assign`` nearest centroid cells,
    search only the query's ``nprobe`` closest cells.

    Scale shape: the cell table is one broadcast row (n_cells unit
    vectors); corpus assignment is a pure projection — the corpus is
    never shuffled and scanned once (exploded ×assign, the usual IVF
    multi-assignment recall lever for boundary vectors). Queries explode
    to nprobe (query, cell) rows into the cell-equi candidate join, so
    the candidate set is ~corpus×assign/n_cells × nprobe per query,
    ranked with the same exact-cosine window as :func:`cosine_topk`.

    The query side of the candidate join is broadcast only while small
    (size-gated exactly like :func:`cosine_topk`: a cheap ``count()``
    vs ``broadcast_threshold``; ``None`` = never force). Above the gate
    the cell key makes this a plain shuffled equi-join — the corpus
    side shuffles 12-byte (cell, id) keyed rows, still scale-sane.
    """
    cells = _cells_row(corpus, id_col=id_col, vec_col=vec_col, n_cells=n_cells)

    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            norm(F.col(vec_col)).alias("_cn"),
        )
        .join(F.broadcast(cells), F.lit(True))
        .select(
            "neighbor_id",
            "_cv",
            "_cn",
            F.explode(_best_cells(F.col("_cv"), F.col("cells"), assign)).alias("cell"),
        )
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            norm(F.col(vec_col)).alias("_qn"),
        )
        .join(F.broadcast(cells), F.lit(True))
        .select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(_best_cells(F.col("_qv"), F.col("cells"), nprobe)).alias("cell"),
        )
    )

    # gate on the raw query count (pre-explode: xnprobe rows is a
    # constant factor, and counting the input frame is the cheaper job)
    if broadcast_threshold is not None and queries.count() <= broadcast_threshold:
        q = F.broadcast(q)
    cand = c.join(q, "cell")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    sims = (
        cand.select(
            "query_id",
            "neighbor_id",
            (dot(F.col("_cv"), F.col("_qv")) / (F.col("_cn") * F.col("_qn"))).alias("_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("_sim").alias("_sim"))  # dedup across probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_sim", 6).alias("sim"), "rank")
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    *,
    value_scale: int = 10**6,
) -> DataFrame:
    """Per-label centroid of an embedding column: (label, centroid, n).

    Plan: posexplode to (label, pos, component) rows, partial+final agg
    per (label, pos), reassemble with a sorted collect_list — rows
    shuffled are labels x dim, independent of corpus size after the
    map-side partial agg. No Python, no driver collect.

    Components are summed as scaled longs (``value_scale`` decimal places) so
    the centroid is partition-order-insensitive and engine-exact — the
    same trick as functions.money_sum, which float summation needs even
    more: a 1000-executor reduce reorders every addition.
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "_v"),
    )
    per_pos = exploded.groupBy("label", "pos").agg(
        F.sum(F.round(F.col("_v").cast("double") * value_scale, 0).cast("long")).alias("_s"),
        F.count("*").alias("_n"),
    )
    return (
        per_pos.withColumn("_c", F.col("_s") / F.lit(float(value_scale)) / F.col("_n"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_c"))), lambda x: x["_c"]
            ).alias("centroid"),
            F.max("_n").alias("n"),
        )
    )


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding column
    — the standard 4x (int8) memory/IO cut for billion-vector ANN
    serving; codes reconstruct as ``code * scale``.

    Returns (id, scale, codes, code_sum, code_min, code_max): per-vector
    ``scale = max(|x|) / (2^(bits-1) - 1)`` (1.0 for all-zero vectors so
    codes are well-defined) and ``codes[i] = round(x[i] / scale)`` in
    [-qmax, qmax]. Pure expressions — float->double casts and
    half-away-from-zero rounding are engine-reproducible, so the scalar
    summaries hash-match a DuckDB oracle exactly.
    """
    from kafka_streams_plumber_spark.operators.text import let_

    qmax = (1 << (bits - 1)) - 1

    def body(e: Column) -> Column:
        maxabs = F.array_max(F.transform(e, lambda x: F.abs(x)))
        scale = F.when(maxabs > 0.0, maxabs / qmax).otherwise(F.lit(1.0))
        return let_(
            scale,
            lambda s: F.struct(
                s.alias("scale"),
                F.transform(e, lambda x: F.round(x / s).cast("int")).alias("codes"),
            ),
        )

    q = df.select(
        F.col(id_col),
        let_(
            F.transform(F.col(emb_col), lambda x: x.cast("double")), body
        ).alias("_q"),
    )
    return q.select(
        id_col,
        F.col("_q.scale").alias("scale"),
        F.col("_q.codes").alias("codes"),
        F.aggregate(
            "_q.codes", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("code_sum"),
        F.array_min("_q.codes").alias("code_min"),
        F.array_max("_q.codes").alias("code_max"),
    )


def matryoshka_truncate(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    dims: int = 8,
    renormalize: bool = True,
) -> DataFrame:
    """Matryoshka-style dimension truncation (Kusupati et al. 2022):
    keep the first ``dims`` components and L2-renormalize — the
    standard cheap-retrieval trick for MRL-trained embedders (a 16x
    dim cut is a 16x ANN memory/IO cut; rerank survivors at full dim).

    Returns (id, full_norm, trunc: array<double>, trunc_norm). All
    arithmetic in double with a fixed evaluation order (in-array-order
    sums, one sqrt, one division per element), so scalar summaries of
    the output are bit-reproducible against a SQL oracle. Pure
    projection — no shuffle, codegen end-to-end.
    """
    from kafka_streams_plumber_spark.operators.text import let_

    def body(e: Column) -> Column:
        head = F.slice(e, 1, dims)
        return let_(
            norm(head),
            lambda tn: F.struct(
                norm(e).alias("full_norm"),
                tn.alias("trunc_norm"),
                (
                    F.transform(head, lambda x: x / tn)
                    if renormalize
                    else head
                ).alias("trunc"),
            ),
        )

    out = df.select(
        F.col(id_col),
        let_(
            F.transform(F.col(emb_col), lambda x: x.cast("double")), body
        ).alias("_m"),
    )
    return out.select(
        id_col,
        F.col("_m.full_norm").alias("full_norm"),
        F.col("_m.trunc").alias("trunc"),
        F.col("_m.trunc_norm").alias("trunc_norm"),
    )


def hash_embed(
    text_col: Column | str, *, dim: int = 64, normalize: bool = True
) -> Column:
    """Model-free text embedding via the hashing trick (Weinberger et
    al. 2009): each token adds ±1 to the md5-hashed bucket of a
    ``dim``-length vector, which is then L2-normalized — the
    no-model-required featurizer that lets any text column flow into
    the similarity stack (cosine_topk, kmeans, embedding_dup_pairs)
    when no learned embedder exists. Signed hashing keeps the inner
    product an unbiased kernel estimate.

    Pure expressions, O(tokens x dim) inside codegen. The hash is an
    md5-hex-prefix integer — replayable in any SQL dialect (DuckDB:
    ``('0x' || substr(md5(t),1,8))::BIGINT``), so the whole embedding
    is oracle-exact; bucket counts are integers until the one final
    normalization divide.
    """
    from kafka_streams_plumber_spark.operators.text import WS_RE, let_

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(F.lower(c), WS_RE), lambda x: x != "")

    def add_token(acc: Column, t: Column) -> Column:
        # md5 is let-bound: bucket index and sign both read it, and the
        # fold evaluates this per token on the embedding hot path
        return let_(
            F.md5(t),
            lambda m: F.transform(
                acc,
                lambda x, i: x
                + F.when(
                    i
                    == F.pmod(
                        F.conv(F.substring(m, 1, 8), 16, 10).cast("long"),
                        F.lit(dim),
                    ).cast("int"),
                    (F.conv(F.substring(m, 9, 1), 16, 10).cast("long") % 2)
                    * 2
                    - 1,
                ).otherwise(0),
            ),
        )

    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), dim),
        add_token,
    )
    if not normalize:
        return counts  # exact integer bucket counts (oracle-friendly)

    def unit_scale(v: Column) -> Column:
        return let_(
            norm(v),
            lambda n: F.transform(
                v,
                lambda x: F.when(n > 0.0, x.cast("double") / n).otherwise(
                    F.lit(0.0)
                ),
            ),
        )

    return let_(counts, unit_scale)


# =====================================================================
# PCA top component — power iteration, engine-exact
# =====================================================================


def pca_top_component(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    iterations: int = 6,
    value_scale: int = 10**6,
) -> DataFrame:
    """Leading principal component of an embedding column by power
    iteration: ``v <- normalize(sum_i xc_i (xc_i . v))`` with
    ``xc = x - mean``, starting from ``e_1``, a FIXED iteration count.

    Returns ``dim`` rows ``(pos, loading, eigenvalue)`` — the unit
    component vector plus the converged Rayleigh estimate
    ``lambda = |sum_i xc_i (xc_i . v)| / n`` (variance along the
    component). Sign is pinned by the deterministic ``e_1`` start.

    The standard embedding-pipeline primitive this feeds: dominant-
    direction removal / whitening (all-but-the-top postprocessing) and
    drift monitoring of embedding spaces.

    Scale design — the corpus is NEVER shuffled, mirroring kmeans:
    the mean and each iteration's ``sum xc*(xc.v)`` are posexplode +
    map-combinable per-position aggregates whose shuffles carry
    ``dim`` rows per partition; mean and v ride along as ONE broadcast
    row. Engine-exact arithmetic: per-term products are rounded to
    ``value_scale`` decimals and summed as longs (partition-order-
    insensitive, like label_centroids); the per-row projection ``p``
    is rounded to 9 dp before re-expansion so both engines round the
    identical double. ``localCheckpoint`` truncates lineage per round.
    """
    from kafka_streams_plumber_spark.operators.text import let_

    x = df.select(
        F.transform(F.col(vec_col), lambda c: c.cast("double")).alias("x")
    )
    x = x.localCheckpoint(eager=True)

    expl = x.select(F.posexplode("x").alias("pos", "_v"))
    mu_rows = expl.groupBy("pos").agg(
        (
            F.sum(F.round(F.col("_v") * value_scale, 0).cast("long")).cast("double")
            / value_scale
            / F.count("*")
        ).alias("m"),
        F.count("*").alias("n"),
    )
    mu = mu_rows.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("mu"),
        F.max("n").alias("n"),
    )

    v = mu.select(
        F.array(
            *[F.lit(1.0 if j == 0 else 0.0) for j in range(dim)]
        ).alias("v"),
        "mu",
        "n",
    ).localCheckpoint(eager=True)

    for _ in range(int(iterations)):
        centered = x.crossJoin(F.broadcast(v)).select(
            F.zip_with("x", "mu", lambda a, b: a - b).alias("xc"), "v", "n"
        )
        proj = centered.select(
            "xc", F.round(dot(F.col("xc"), F.col("v")), 9).alias("p"), "n"
        )
        s_rows = (
            proj.select(F.posexplode("xc").alias("pos", "_c"), "p", "n")
            .groupBy("pos")
            .agg(
                F.sum(
                    F.round(F.col("_c") * F.col("p") * value_scale, 0).cast("long")
                ).alias("_s"),
                F.max("n").alias("n"),
            )
        )
        sv = s_rows.agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", (F.col("_s").cast("double") / value_scale).alias("sval")))
                ),
                lambda s: s["sval"],
            ).alias("sv"),
            F.max("n").alias("n"),
        )
        v = (
            sv.crossJoin(F.broadcast(mu.select("mu")))
            .select(
                let_(
                    norm(F.col("sv")),
                    lambda nn: F.transform(F.col("sv"), lambda e: e / nn),
                ).alias("v"),
                (norm(F.col("sv")) / F.col("n")).alias("eig"),
                "mu",
                "n",
            )
            .localCheckpoint(eager=True)
        )

    return v.select(
        F.posexplode("v").alias("pos", "loading"), F.col("eig").alias("eigenvalue")
    ).select("pos", "loading", "eigenvalue")


def pca_oracle_sql(
    *,
    table: str = "embeddings",
    vec_col: str = "embedding",
    dim: int,
    iterations: int = 6,
    value_scale: int = 10**6,
    round_to: int = 6,
) -> str:
    """DuckDB oracle for :func:`pca_top_component`: identical rounds
    unrolled as chained CTEs, identical scaled-long sums and 9-dp
    projection rounding, so the result hash-matches bit for bit."""
    rng = f"range(1, {dim + 1})"
    e1 = "[" + ", ".join("1.0" if j == 0 else "0.0" for j in range(dim)) + "]"
    parts = [
        f"WITH x AS (SELECT list_transform({vec_col}, c -> CAST(c AS DOUBLE)) AS x FROM {table}),",
        f"""mupos AS (
          SELECT pos, CAST(sum(CAST(round(v * {value_scale}) AS BIGINT)) AS DOUBLE)
                        / {value_scale} / count(*) AS m, count(*) AS n
          FROM (SELECT unnest(x) AS v, generate_subscripts(x, 1) - 1 AS pos FROM x)
          GROUP BY pos
        ),""",
        "mu AS (SELECT list(m ORDER BY pos) AS mu, max(n) AS n FROM mupos),",
        f"v0 AS (SELECT {e1}::DOUBLE[] AS v, 0.0 AS eig),",
        f"xc AS (SELECT list_transform({rng}, j -> x.x[j] - mu.mu[j]) AS xc, mu.n AS n FROM x, mu),",
    ]
    for i in range(int(iterations)):
        parts.append(
            f"""p{i} AS (
              SELECT xc, round(list_sum(list_transform({rng}, j -> xc[j] * v{i}.v[j])), 9) AS p, n
              FROM xc, v{i}
            ),
            s{i} AS (
              SELECT pos, sum(CAST(round(c * p * {value_scale}) AS BIGINT)) AS s, max(n) AS n
              FROM (SELECT unnest(xc) AS c, generate_subscripts(xc, 1) - 1 AS pos, p, n FROM p{i})
              GROUP BY pos
            ),
            sv{i} AS (
              SELECT list(CAST(s AS DOUBLE) / {value_scale} ORDER BY pos) AS sv, max(n) AS n FROM s{i}
            ),
            v{i + 1} AS (
              SELECT list_transform(sv, e -> e / sqrt(list_sum(list_transform(sv, q -> q * q)))) AS v,
                     sqrt(list_sum(list_transform(sv, q -> q * q))) / n AS eig
              FROM sv{i}
            ),"""
        )
    parts[-1] = parts[-1].rstrip().rstrip(",")
    parts.append(
        f"""SELECT generate_subscripts(v, 1) - 1 AS pos,
               round(unnest(v), {round_to}) AS loading,
               round(eig, {round_to}) AS eigenvalue
        FROM v{int(iterations)}"""
    )
    return "\n".join(parts)


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    *,
    value_scale: int = 10**6,
    threshold: float = 0.05,
) -> DataFrame:
    """Embedding-distribution drift monitor between two corpus
    snapshots: per-dimension mean shift plus a drift flag.

    The training-data use case: embeddings of a reference crawl vs the
    current one — a per-dimension shift above ``threshold`` flags a
    pipeline regression (encoder change, corpus contamination, domain
    mix moving) before it reaches training. Output grain is scalar —
    (pos, mean_ref, mean_cur, shift, drifted) — one row per dimension.

    Plan: union the two snapshots with a side tag, posexplode, ONE
    partial+final agg keyed (pos, side) — shuffled rows are dim x 2
    after map-side combine, independent of corpus size — then a pivot
    to the per-dimension pair. Means come from scaled-long component
    sums (the label_centroids device) so both snapshots' moments are
    partition-order-exact on any engine.
    """
    tagged = ref.select(
        F.lit("r").alias("_side"), F.posexplode(F.col(vec_col)).alias("pos", "_v")
    ).unionByName(
        cur.select(
            F.lit("c").alias("_side"),
            F.posexplode(F.col(vec_col)).alias("pos", "_v"),
        )
    )
    per = tagged.groupBy("pos", "_side").agg(
        F.sum(F.round(F.col("_v").cast("double") * value_scale, 0).cast("long")).alias("_s"),
        F.count("*").alias("_n"),
    )
    wide = per.groupBy("pos").agg(
        F.max(F.when(F.col("_side") == "r", F.col("_s"))).alias("_sr"),
        F.max(F.when(F.col("_side") == "r", F.col("_n"))).alias("_nr"),
        F.max(F.when(F.col("_side") == "c", F.col("_s"))).alias("_sc"),
        F.max(F.when(F.col("_side") == "c", F.col("_n"))).alias("_nc"),
    )
    mean_r = F.col("_sr") / F.lit(float(value_scale)) / F.col("_nr")
    mean_c = F.col("_sc") / F.lit(float(value_scale)) / F.col("_nc")
    return wide.select(
        "pos",
        F.round(mean_r, 6).alias("mean_ref"),
        F.round(mean_c, 6).alias("mean_cur"),
        F.round(F.abs(mean_c - mean_r), 6).alias("shift"),
        (F.abs(mean_c - mean_r) > threshold).alias("drifted"),
    )


def embedding_diversity(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
    threshold: float = 0.95,
    value_scale: int = 10**9,
) -> DataFrame:
    """Embedding-collapse probe: ONE row
    ``(n_pairs, mean_cos, high_share)`` — the mean cosine and the
    fraction of pairs at cosine >= ``threshold`` over a SEEDED random
    pairing of the corpus (each vector used at most once).

    A healthy, diverse embedding space puts random pairs near 0; a
    collapsing encoder (undertrained, over-normalized, mode-collapsed)
    or a near-duplicate-flooded corpus drags the random-pair cosine
    up — this is the cheap early-warning you run BEFORE paying for
    semantic dedup or ANN indexing, and the drift twin of
    embedding_drift (which needs two snapshots; this needs one).

    The pairing is deterministic: ids ranked by md5(seed|id) (the
    repo's replayable-uniform device) via ordering.rank_by (range
    exchange, no single-task window), then rank 2k pairs with rank
    2k+1 — an unbiased simple random pairing, reproducible across
    engines and retries; the odd vector out is dropped. Cosines use
    the same fixed-order fold as cosine_topk; the mean is a
    scaled-long sum (9 dp). O(n) total — never a self-join.
    """
    from kafka_streams_plumber_spark.operators.ordering import rank_by

    h = F.md5(
        F.concat_ws(
            "|", F.lit(str(int(seed))), F.col(id_col).cast("string")
        )
    )
    ranked = rank_by(
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), h.alias("_h")),
        ["_h", "_id"],
        pos_col="_p",
    )
    key = F.floor(F.col("_p") / 2).cast("long").alias("_k")
    a = ranked.where(F.col("_p") % 2 == 0).select(key, F.col("_v").alias("_va"))
    b = ranked.where(F.col("_p") % 2 == 1).select(key, F.col("_v").alias("_vb"))
    # zero-norm vectors (all-zero embeddings from an upstream bug) would
    # make the cosine NaN — which Spark's long cast silently zeroes and
    # an ANSI engine refuses to cast at all; drop those pairs instead
    # (they carry no direction to compare)
    pairs = (
        a.join(b, "_k")
        .where((norm(F.col("_va")) > 0) & (norm(F.col("_vb")) > 0))
        .select(cosine(F.col("_va"), F.col("_vb")).alias("_cos"))
    )
    t = F.lit(float(threshold))
    out = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.sum(F.round(F.col("_cos") * value_scale, 0).cast("long")).cast(
                "double"
            )
            / value_scale
        ).alias("_s"),
        F.coalesce(
            F.sum((F.col("_cos") >= t).cast("long")), F.lit(0)
        ).alias("_hi"),
    )
    return out.select(
        "n_pairs",
        F.round(F.col("_s") / F.col("n_pairs"), 6).alias("mean_cos"),
        F.round(F.col("_hi") / F.col("n_pairs"), 6).alias("high_share"),
    )


def centroid_similarity(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    dim: int = 64,
) -> DataFrame:
    """Corpus map: pairwise cosine between per-group hashing-trick
    centroid vectors — ``(group_a, group_b, dot, cosine)`` for every
    unordered group pair (group_a < group_b).

    "Which sources/languages/buckets speak similar text" in one
    O(groups^2) frame: the embedding-space complement of
    diff.jsd_matrix (JSD compares distributions value-by-value; this
    compares them through the hashed-kernel inner product, so it
    tolerates huge vocabularies). High off-diagonal cosine flags
    redundant sources before mixing — the cross-source twin of
    setsim.source_overlap_matrix at a fraction of its cost.

    Exactness: the group centroid is the UNNORMALIZED signed-bucket
    sum (exact longs — same md5 bucket/sign device as hash_embed, so
    the oracle replays it verbatim); pair dots are integer sums; the
    one cosine division runs on two sqrt doubles at the end.

    Scale design: one token explode + one (group, bucket) aggregate
    (map-combinable, output O(groups x dim)); the pair frame is a
    bucket-keyed self-join of that TINY frame. The corpus is scanned
    once and never self-joined.
    """
    from kafka_streams_plumber_spark.operators.text import WS_RE

    c = F.col(text_col)
    toks = df.select(
        F.col(group_col).alias("_g"),
        F.explode(
            F.filter(F.split(F.lower(c), WS_RE), lambda x: x != "")
        ).alias("_t"),
    )
    m = F.md5(F.col("_t"))
    idx = F.pmod(
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long"), F.lit(dim)
    )
    sign = (F.conv(F.substring(m, 9, 1), 16, 10).cast("long") % 2) * 2 - 1
    sparse = (
        toks.select("_g", idx.alias("_i"), sign.alias("_s"))
        .groupBy("_g", "_i")
        .agg(F.sum("_s").alias("_v"))
    )
    norms = sparse.groupBy("_g").agg(
        F.sum(F.col("_v") * F.col("_v")).alias("_n2")
    )

    a = sparse.select(
        F.col("_g").alias("group_a"), "_i", F.col("_v").alias("_va")
    )
    b = sparse.select(
        F.col("_g").alias("group_b"), "_i", F.col("_v").alias("_vb")
    )
    dots = (
        a.join(b, "_i")
        .where(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("dot"))
    )
    groups = norms.select("_g")
    spine = (
        groups.select(F.col("_g").alias("group_a"))
        .crossJoin(F.broadcast(groups.select(F.col("_g").alias("group_b"))))
        .where(F.col("group_a") < F.col("group_b"))
    )
    na = norms.select(F.col("_g").alias("group_a"), F.col("_n2").alias("_na2"))
    nb = norms.select(F.col("_g").alias("group_b"), F.col("_n2").alias("_nb2"))
    out = (
        spine.join(dots, ["group_a", "group_b"], "left")
        .join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
    )
    d = F.coalesce(F.col("dot"), F.lit(0)).cast("long")
    cos = d / (
        F.sqrt(F.col("_na2").cast("double"))
        * F.sqrt(F.col("_nb2").cast("double"))
    )
    return out.select(
        "group_a",
        "group_b",
        d.alias("dot"),
        F.round(cos, 6).alias("cosine"),
    )
