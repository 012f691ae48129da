"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The missing piece between :mod:`similarity`'s IVF search (which uses
random pivots as zero-iteration centroids — ``_cells_row``) and a real
fitted index: a few Lloyd iterations tighten the cells. Also the
standard tool for topic-balanced corpus sampling (cluster, then sample
per cluster).

Scale shape per iteration — the corpus is NEVER shuffled:

- centroids live in ONE broadcast row (``k`` vectors + their squared
  norms), so assignment is a pure projection: ``argmin_c(c·c - 2 x·c)``
  evaluated as JVM array expressions (the ``x·x`` term is constant per
  row and dropped);
- the update step is :func:`similarity.label_centroids` — posexplode to
  (cluster, pos, component), map-side partial sums of scaled longs, so
  the shuffle carries k x dim rows regardless of corpus size and the
  means are partition-order-insensitive (bit-reproducible across runs,
  retries, and cluster sizes);
- ``localCheckpoint`` on the k-row centroid frame between iterations
  truncates the growing lineage (same device as graph.connected
  components).

Everything is deterministic: hash-ordered init pivots, order-insensitive
sums, struct-min assignment with an id tie-break. Two runs on different
partitionings produce identical clusters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.plans.scale import truncate_lineage

from kafka_streams_plumber_spark.operators.sampling import split_bucket
from kafka_streams_plumber_spark.operators.similarity import (
    dot,
    label_centroids,
)


def _pack_row(centroids: DataFrame) -> DataFrame:
    """(cluster, centroid) rows -> ONE row
    ``cells: array<struct<cluster:int, cv:array<double>, cc:double>>``
    with ``cc`` the centroid's squared norm (precomputed once per
    centroid instead of once per corpus row)."""
    return centroids.select(
        F.collect_list(
            F.struct(
                F.col("cluster").cast("int").alias("cluster"),
                F.col("centroid").alias("cv"),
                dot(F.col("centroid"), F.col("centroid")).alias("cc"),
            )
        ).alias("cells")
    )


def _nearest(vec: Column, cells: Column) -> Column:
    """Cluster id minimizing squared Euclidean distance to ``vec``.
    ``x·x`` is constant across candidates, so rank by ``c·c - 2 x·c``;
    struct-min breaks score ties on the lower cluster id."""
    scored = F.transform(
        cells,
        lambda c: F.struct(
            (c["cc"] - 2.0 * dot(vec, c["cv"])).alias("s"),
            c["cluster"].alias("cluster"),
        ),
    )
    return F.array_min(scored)["cluster"]


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fit k-means; returns the centroid table
    ``(cluster, centroid: array<double>, n)``.

    Init: the ``k`` corpus vectors with the lowest
    ``sampling.split_bucket(id)`` (id tie-break) — deterministic random
    pivots via TakeOrdered, no global sort, and the same Knuth hash the
    whole engine uses, so the DuckDB oracle can replay pivot selection
    (q_kmeans unrolls all Lloyd iterations in SQL and hash-matches the
    fitted centroids). ``checkpoint_dir``: reliable (executor-loss-
    tolerant) between-iteration checkpointing — see
    :func:`...plans.scale.truncate_lineage`. A cluster that captures no points in some
    iteration drops out (standard Lloyd behavior); callers needing
    exactly ``k`` cells should treat ``k`` as an upper bound.
    """
    pivots = (
        df.select(F.col(id_col).alias("_pid"), F.col(vec_col).alias("_pv"))
        .orderBy(split_bucket("_pid"), F.col("_pid"))
        .limit(k)
    )
    w = F.transform(F.col("_pv"), lambda x: x.cast("double"))
    centroids = (
        pivots.select(w.alias("centroid"))
        .select(
            F.monotonically_increasing_id().alias("cluster"),
            "centroid",
            F.lit(1).alias("n"),
        )
    )
    centroids = truncate_lineage(centroids, checkpoint_dir)
    # limit(k) collapses to one partition, so the ids above are 0..k-1.

    for _ in range(iters):
        assigned = kmeans_assign(df, centroids, vec_col=vec_col)
        centroids = (
            label_centroids(assigned, vec_col=vec_col, label_col="cluster")
            .withColumnRenamed("label", "cluster")
        )
        centroids = truncate_lineage(centroids, checkpoint_dir)
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Add a ``cluster`` column: each row's nearest centroid. One
    broadcast of the packed k-row cell table; no shuffle of ``df``."""
    packed = _pack_row(centroids)
    out = df.join(F.broadcast(packed), F.lit(True))
    return out.withColumn(
        cluster_col, _nearest(F.col(vec_col), F.col("cells"))
    ).drop("cells")


def kmeans_inertia(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row frame with the total within-cluster sum of squared
    distances — the quantity Lloyd monotonically decreases (tested in
    test_clustering.py). Rounded to 6 dp for cross-run comparability."""
    packed = _pack_row(centroids)
    x = df.join(F.broadcast(packed), F.lit(True))
    xx = dot(F.col(vec_col), F.col(vec_col))
    best = F.array_min(
        F.transform(
            F.col("cells"),
            lambda c: F.struct(
                (c["cc"] - 2.0 * dot(F.col(vec_col), c["cv"])).alias("s"),
                c["cluster"].alias("cluster"),
            ),
        )
    )["s"]
    return x.select((xx + best).alias("_d")).agg(
        F.round(F.sum("_d"), 6).alias("inertia")
    )


def _d2_scaled(a: Column, b: Column, scale: int) -> Column:
    """Squared L2 distance as an exact integer: per-dimension deltas are
    rounded to ``scale`` fixed-point BIGINTs before squaring, so the sum
    is summation-order-proof (the repo-wide scaled-long device) and any
    SQL engine replays it bit-for-bit."""

    def term(x: Column, y: Column) -> Column:
        d = F.round((x.cast("double") - y.cast("double")) * scale).cast("long")
        return d * d

    return F.aggregate(
        F.zip_with(a, b, term), F.lit(0).cast("long"), lambda acc, t: acc + t
    )


def kcenter_select(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    value_scale: int = 1000,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Greedy k-center (farthest-point) selection: a maximally-diverse
    size-``k`` subset of an embedded corpus — the classic 2-approximation
    coreset for data selection (pick the point farthest from everything
    chosen so far). Returns one row per selection round:
    ``(round, center_id, max_min_dist2s)`` where ``max_min_dist2s`` is
    the scaled-integer squared distance that made the pick (the corpus
    coverage radius BEFORE the pick; NULL on the seed round).

    Deterministic end to end: the seed is the min id, distances are
    exact scaled-long squared L2 (:func:`_d2_scaled`), and argmax ties
    break to the min id — so the whole greedy trajectory replays in SQL
    (q_kcenter unrolls every round).

    Scale: each round is one full-scan aggregate (map-combinable max of
    a (dist, -id) struct), one broadcast one-row join to fetch the new
    center's vector, and one projection updating the running min
    distance — the corpus is NEVER shuffled, and lineage is severed per
    round (``checkpoint_dir`` = executor-loss-tolerant variant). k full
    scans are inherent to greedy k-center; for k beyond ~tens, switch to
    k-means++ style oversampling (kmeans_fit) instead.
    """
    base = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    seed = base.agg(
        F.min("_id").alias("cid"), F.min_by("_v", "_id").alias("cv")
    )
    state = (
        base.crossJoin(F.broadcast(seed))
        .select("_id", "_v", _d2_scaled(F.col("_v"), F.col("cv"), value_scale).alias("_mind"))
    )
    state = truncate_lineage(state, checkpoint_dir)

    picks = [
        seed.select(
            F.lit(1).alias("round"),
            F.col("cid").alias("center_id"),
            F.lit(None).cast("long").alias("max_min_dist2s"),
        )
    ]
    for i in range(2, int(k) + 1):
        nxt = state.agg(
            F.max(
                F.struct(F.col("_mind").alias("d"), (-F.col("_id")).alias("nid"))
            ).alias("m")
        ).select(
            (-F.col("m.nid")).alias("cid"), F.col("m.d").alias("d")
        )
        picks.append(
            nxt.select(
                F.lit(i).alias("round"),
                F.col("cid").alias("center_id"),
                F.col("d").alias("max_min_dist2s"),
            )
        )
        cvec = (
            base.join(F.broadcast(nxt), base["_id"] == nxt["cid"])
            .select(F.col("_v").alias("cv"))
        )
        state = (
            state.crossJoin(F.broadcast(cvec))
            .select(
                "_id",
                "_v",
                F.least(
                    F.col("_mind"), _d2_scaled(F.col("_v"), F.col("cv"), value_scale)
                ).alias("_mind"),
            )
        )
        state = truncate_lineage(state, checkpoint_dir)

    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def kcenter_oracle_sql(
    *,
    k: int = 4,
    value_scale: int = 1000,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle for :func:`kcenter_select`: every greedy round
    unrolled as chained CTEs (argmax + running-min updates), with the
    identical scaled-long distance arithmetic."""
    delta = (
        f"CAST(round((CAST(a.v AS DOUBLE) - CAST(c.v AS DOUBLE))"
        f" * {value_scale}) AS BIGINT)"
    )
    d2 = f"CAST(sum({delta} * {delta}) AS BIGINT)"
    parts = [
        f"WITH un AS (SELECT {id_col} AS vid,"
        f" generate_subscripts({vec_col}, 1) AS pos,"
        f" unnest({vec_col}) AS v FROM {table}),",
        f"c1 AS (SELECT min({id_col}) AS cid FROM {table}),",
        f"m1 AS (SELECT a.vid, {d2} AS mind"
        f" FROM un a JOIN un c ON a.pos = c.pos"
        f" JOIN c1 ON c.vid = c1.cid GROUP BY a.vid),",
    ]
    for i in range(2, int(k) + 1):
        parts.append(
            f"c{i} AS (SELECT vid AS cid, mind AS d FROM m{i - 1}"
            f" ORDER BY mind DESC, vid LIMIT 1),"
        )
        if i < int(k):
            parts.append(
                f"m{i} AS (SELECT m.vid, least(m.mind, dd.d2) AS mind"
                f" FROM m{i - 1} m JOIN (SELECT a.vid, {d2} AS d2"
                f" FROM un a JOIN un c ON a.pos = c.pos"
                f" JOIN c{i} ON c.vid = c{i}.cid GROUP BY a.vid) dd"
                f" USING (vid)),"
            )
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        "SELECT 1 AS round, cid AS center_id,"
        " CAST(NULL AS BIGINT) AS max_min_dist2s FROM c1"
    ]
    for i in range(2, int(k) + 1):
        selects.append(f"SELECT {i}, cid, d FROM c{i}")
    parts.append("\nUNION ALL ".join(selects))
    return "\n".join(parts)


def clustering_agreement(
    df: DataFrame,
    label_a: str,
    label_b: str,
    *,
    value_scale: int = 10**9,
) -> DataFrame:
    """Agreement between two label assignments over the same items:
    ONE row ``(n, clusters_a, clusters_b, ari, nmi)`` — Adjusted Rand
    Index and Normalized Mutual Information (arithmetic-mean
    normalization).

    The clustering-eval pair every dedup/topic pipeline needs: compare
    k-means topics against ground-truth labels, or an LSH dedup
    clustering against the exact one, without caring how cluster ids
    are numbered (both metrics are permutation-invariant; ARI is
    chance-corrected — 0 means "no better than random", NMI in [0, 1]).

    Exactness: ARI is built ENTIRELY from integer pair counts —
    ``sum C(n_ij,2)`` over contingency cells and ``C(a_i,2)/C(b_j,2)``
    over marginals, kept as exact longs (C(n,2) = n(n-1)/2, always an
    integer) — so ARI is a closed form of exact integers with two
    final double ops. NMI's entropy terms are scaled-long sums (9 dp).
    Rows with a NULL in either label are dropped (an unlabeled item
    can't vote on agreement).

    Scale: one (a, b) contingency aggregate (map-combinable, output
    O(clusters_a x clusters_b)) + two marginal rollups of it; every
    later frame is cluster-vocabulary-sized.
    """
    base = df.select(
        F.col(label_a).alias("_a"), F.col(label_b).alias("_b")
    ).where(F.col(label_a).isNotNull() & F.col(label_b).isNotNull())
    cells = base.groupBy("_a", "_b").agg(F.count(F.lit(1)).alias("_c"))
    ma = cells.groupBy("_a").agg(F.sum("_c").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_c").alias("_nb"))

    # C(n,2) via INTEGER division (`div`), not float /2-then-cast: the
    # double round-trip loses exactness past 2^53 pairs
    sums_cells = cells.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).alias("n"),
        F.coalesce(
            F.sum(F.expr("_c * (_c - 1) div 2")), F.lit(0)
        ).alias("_sij"),
    )
    sums_a = ma.agg(
        F.count(F.lit(1)).alias("clusters_a"),
        F.coalesce(
            F.sum(F.expr("_na * (_na - 1) div 2")), F.lit(0)
        ).alias("_sa"),
    )
    sums_b = mb.agg(
        F.count(F.lit(1)).alias("clusters_b"),
        F.coalesce(
            F.sum(F.expr("_nb * (_nb - 1) div 2")), F.lit(0)
        ).alias("_sb"),
    )

    # NMI: H(A), H(B), I(A;B) from exact counts; scaled-long term sums.
    # p log p terms: p = cnt / n; I term: (c/n) * ln(c*n / (na*nb))
    joined = (
        cells.join(F.broadcast(ma), "_a")
        .join(F.broadcast(mb), "_b")
        .crossJoin(F.broadcast(sums_cells.select("n")))
    )
    iterm = (F.col("_c") / F.col("n")) * F.log(
        (F.col("_c").cast("double") * F.col("n"))
        / (F.col("_na").cast("double") * F.col("_nb"))
    )
    mi = joined.agg(
        (
            F.sum(F.round(iterm * value_scale, 0).cast("long")).cast("double")
            / value_scale
        ).alias("_mi")
    )

    def entropy(m, cnt_col):
        term = -(F.col(cnt_col) / F.col("n")) * F.log(
            F.col(cnt_col) / F.col("n")
        )
        return (
            m.crossJoin(F.broadcast(sums_cells.select("n")))
            .agg(
                (
                    F.sum(F.round(term * value_scale, 0).cast("long")).cast(
                        "double"
                    )
                    / value_scale
                ).alias("_h")
            )
        )

    ha = entropy(ma, "_na").withColumnRenamed("_h", "_ha")
    hb = entropy(mb, "_nb").withColumnRenamed("_h", "_hb")

    out = (
        sums_cells.crossJoin(F.broadcast(sums_a))
        .crossJoin(F.broadcast(sums_b))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
    )
    tot2 = F.expr("n * (n - 1) div 2")
    expected = (
        F.col("_sa").cast("double") * F.col("_sb") / F.nullif(tot2, F.lit(0))
    )
    max_idx = (F.col("_sa") + F.col("_sb")) / 2
    ari = (F.col("_sij") - expected) / F.nullif(
        max_idx - expected, F.lit(0.0)
    )
    nmi = F.col("_mi") / F.nullif(
        (F.col("_ha") + F.col("_hb")) / 2, F.lit(0.0)
    )
    return out.select(
        "n",
        "clusters_a",
        "clusters_b",
        F.round(ari, 6).alias("ari"),
        F.round(nmi, 6).alias("nmi"),
    )
