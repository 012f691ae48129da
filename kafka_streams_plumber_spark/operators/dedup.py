"""Deduplication operators for training-data pipelines, designed for
100 TB scale.

Families:

- :func:`exact_dedup` — hash-groupBy on content. One shuffle carrying a
  32-byte hash instead of the document.
- :func:`minhash_lsh_pairs` / :func:`minhash_dedup` — MinHash signatures
  over word-shingle sets, LSH banding to candidate buckets, exact-Jaccard
  verification. Everything is JVM-side column expressions (xxhash64 +
  higher-order array functions); the only shuffles are the band-bucket
  self-join and the verify joins, all on compact keys.
  :func:`build_minhash_index` / :func:`incremental_minhash_dedup` run the
  same machinery batch-vs-persisted-index for continual ingestion.
- :func:`simhash_pairs` — 64-bit SimHash with banded Hamming candidate
  generation and bit_count(xor) verification.
- :func:`embedding_dup_pairs` — cosine near-duplicates over an embedding
  column via random-hyperplane LSH buckets (deterministic, seeded,
  no driver-side state), verified with exact cosine.
  :func:`semantic_dedup` composes it (or the exact baseline) with
  connected components into cluster-then-keep-one semantic dedup.
- :func:`decontaminate` / :func:`decontaminate_spans` — n-gram benchmark
  leakage at doc and span level; :func:`semantic_decontaminate` — the
  paraphrase-robust embedding-level rule.

Skew safety: every LSH variant caps bucket size (``max_bucket_size``) so a
degenerate bucket (e.g. empty documents all hashing equal) cannot produce
a quadratic pair explosion on one executor; capped buckets are dropped,
which only loses candidates that other bands/tables can still recover.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_plumber_spark.operators.text import (
    WS_RE,
    shingle_hashes,
    shingles,
    tokens,
)

#: Mersenne prime 2^61-1: universal-hash modulus. Products a*h with
#: h < 2^31 and a < 2^31 stay well inside int64.
_P31 = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _P31), rng.randrange(0, _P31)) for _ in range(num_perm)]


def _h32(col: Column) -> Column:
    """xxhash64 folded into [0, 2^31-1) — the universal-hash domain."""
    return F.pmod(F.xxhash64(col), F.lit(_P31))


def _fan_out(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism before heavy per-row
    compute: a single-file parquet table arrives as one partition, which
    would serialize shingling/hashing on one core. No-op when the input
    is already wide (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per distinct combination of ``cols`` (the lowest id).

    Returns (content_hash, keep_id, n_copies). The groupBy key is an md5
    of the content so the shuffle carries bytes, not documents.
    """
    h = F.md5(F.concat_ws("", *[F.col(c).cast("string") for c in cols]))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signature_from_hashes(
    hashes: Column, *, num_perm: int = 64, seed: int = 42
) -> Column:
    """MinHash signature (array<bigint>, length num_perm) from a
    pre-hashed shingle set (array<bigint>).

    Single pass over the shingle array: fold with
    ``acc = zip_with(acc, perms(h), least)`` — no UDF, no extra shuffle;
    cost is O(shingles × num_perm) inside codegen.

    The permutation coefficients are single array *literals* (one Literal
    node each) rather than per-permutation arithmetic subtrees: the
    expression tree stays O(1) in num_perm, which halves driver-side plan
    build + analysis time at num_perm=64 while generating byte-identical
    signatures (perm i applies as ``(a[i]*h + b[i]) % P`` via zip_with).
    """
    params = _perm_params(num_perm, seed)
    a_lit = F.lit([a for a, _ in params])
    b_lit = F.lit([b for _, b in params])
    init = F.lit([_P31] * num_perm).cast("array<long>")

    def perms(h: Column) -> Column:
        return F.zip_with(a_lit, b_lit, lambda a, b: (a * h + b) % F.lit(_P31))

    return F.aggregate(
        F.transform(hashes, lambda x: F.pmod(x, F.lit(_P31))),
        init,
        lambda acc, h: F.zip_with(acc, perms(h), lambda x, y: F.least(x, y)),
    )


def minhash_signature(
    text_col: Column | str, *, num_perm: int = 64, shingle_k: int = 3, seed: int = 42
) -> Column:
    """MinHash signature of a document's word-shingle set (convenience
    over :func:`minhash_signature_from_hashes` + hashed shingles)."""
    return minhash_signature_from_hashes(
        shingle_hashes(text_col, k=shingle_k), num_perm=num_perm, seed=seed
    )


def _band_keys(sig: Column, *, bands: int, rows: int) -> Column:
    """array<struct<band:int, key:bigint>> — one LSH bucket key per band."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.slice(sig, i * rows + 1, rows)).alias("key"),
            )
            for i in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (a_id < b_id, jaccard >= threshold).

    Plan shape (scale-first):
      1. one projection: id, shingle set, minhash signature      (no shuffle)
      2. explode band keys -> groupBy bucket                     (shuffle on 12-byte key)
      3. pairs within buckets via collect_list + explode         (bounded by max_bucket_size)
      4. distinct candidate pairs                                (shuffle on id pair)
      5. join back shingle sets, exact Jaccard filter            (2 joins on id)

    At 100 TB the heavy data (shingle arrays) only moves in step 5, and
    only for candidate ids — the LSH shuffles carry ids and band hashes.
    """
    assert num_perm % bands == 0, "bands must divide num_perm"
    rows = num_perm // bands

    # project to (id, text) BEFORE the fan-out repartition: the shuffle
    # carries only the bytes the pipeline reads, not every column.
    src = _fan_out(df.select(id_col, text_col))
    sigs = src.select(
        F.col(id_col).alias("_id"),
        minhash_signature(text_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed).alias(
            "_sig"
        ),
    )

    buckets = (
        sigs.select("_id", F.explode(_band_keys(F.col("_sig"), bands=bands, rows=rows)).alias("bk"))
        .groupBy("bk.band", "bk.key")
        .agg(F.collect_list("_id").alias("ids"), F.count("*").alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket_size))
    )

    # pairs within a bucket: explode both sides of the (small, capped) list
    pairs = (
        buckets.select(F.explode("ids").alias("a"), F.col("ids"))
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )

    # Verify stage: recompute shingles ONLY for candidate ids. The corpus
    # is scanned once more but the heavy shingle arrays are built for the
    # (small) candidate set alone — the plan above computes shingles once
    # per document, not once per downstream reference. AQE broadcasts the
    # candidate-id side, so the corpus is never shuffled here.
    # No .distinct() here: left_semi output is unaffected by duplicate
    # probe-side keys, and dropping it removes a whole shuffle stage.
    cand_ids = pairs.select(F.col("a").alias("_id")).union(
        pairs.select(F.col("b").alias("_id"))
    )
    cand_sh = (
        src.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
        .join(cand_ids, "_id", "left_semi")
        .select("_id", shingle_hashes(F.col("_txt"), k=shingle_k).alias("_sh"))
    )
    a = cand_sh.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha"))
    b = cand_sh.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb"))
    verified = (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb")).cast("double")
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a").alias("a_id"),
            F.col("b").alias("b_id"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
    return verified


def build_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Compact signature index of a corpus: ``(id, sig: array<long>)``.

    This is the state a CONTINUOUS ingestion pipeline persists between
    runs (as parquet, ~8·num_perm bytes/doc — the text itself never
    needs to be re-read): new batches dedup against it via
    :func:`incremental_minhash_dedup`, and the kept batch's signatures
    (same function, same seed) union-append to the index.
    """
    src = _fan_out(df.select(id_col, text_col))
    return src.select(
        F.col(id_col).alias("id"),
        minhash_signature(
            text_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed
        ).alias("sig"),
    )


def incremental_minhash_dedup(
    batch: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Drop batch rows that near-duplicate an already-indexed corpus.

    The continual-training ingestion shape: yesterday's corpus exists
    only as a signature index (:func:`build_minhash_index`); today's
    batch must not re-add near-copies of it. Returns the surviving
    batch rows (all columns).

    Plan: batch signatures once (projection), band keys exploded on
    both sides, candidates from the (band, key) equi-join, then the
    verify uses the MinHash ESTIMATE — matching-component fraction of
    the two signatures — because the indexed corpus's text is gone by
    design. The estimator's error (Binomial(num_perm, j)) only matters
    for pairs with true jaccard near the threshold; near-dup corpora
    are bimodal (copies >= 0.9, unrelated ~0), where flip probability
    is < 1e-8 at num_perm=64.

    Scale: the index moves only as 12-byte band keys plus per-candidate
    signatures; index band-buckets above ``max_bucket_size`` (junk
    content) are dropped via a tiny anti-join, capping candidate
    fan-out per batch row.
    """
    assert num_perm % bands == 0
    rows = num_perm // bands

    src = _fan_out(batch.select(id_col, text_col))
    bsig = src.select(
        F.col(id_col).alias("_nid"),
        minhash_signature(
            text_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed
        ).alias("_nsig"),
    )

    bb = bsig.select(
        "_nid",
        "_nsig",
        F.explode(_band_keys(F.col("_nsig"), bands=bands, rows=rows)).alias("bk"),
    ).select("_nid", "_nsig", "bk.band", "bk.key")
    ib = index.select(
        F.col("id").alias("_oid"),
        F.col("sig").alias("_osig"),
        F.explode(
            _band_keys(F.col("sig"), bands=bands, rows=rows)
        ).alias("bk"),
    ).select("_oid", "_osig", "bk.band", "bk.key")

    big = (
        ib.groupBy("band", "key")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .select("band", "key")
    )
    ib = ib.join(F.broadcast(big), ["band", "key"], "left_anti")

    matches = F.aggregate(
        F.zip_with(
            F.col("_nsig"), F.col("_osig"), lambda x, y: (x == y).cast("int")
        ),
        F.lit(0),
        lambda acc, m: acc + m,
    )
    # no pair-level distinct: a pair sharing m bands is just verified m
    # times (m <= bands, pure expression work) — cheaper than shuffling
    # 0.5 kB signature pairs to dedup them first. Only the flagged ids
    # (tiny) are distinct'd.
    flagged = (
        bb.join(ib, ["band", "key"])
        .filter(matches / F.lit(float(num_perm)) >= threshold)
        .select("_nid")
        .distinct()
    )
    return batch.join(
        flagged, batch[id_col] == flagged["_nid"], "left_anti"
    )


def minhash_dedup(
    df: DataFrame, text_col: str, id_col: str, **kwargs
) -> DataFrame:
    """Drop near-duplicates: keeps every row whose id is not the greater
    member of any near-dup pair (connected-component-free greedy kill;
    deterministic)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    losers = pairs.select(F.col("b_id").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    threshold: float = 0.1,
    block_col: str | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard within blocks (a_id < b_id).

    The exact (non-LSH) baseline: quadratic within a block, so use
    ``block_col`` (e.g. a source/bucket column) to bound block sizes at
    scale. MinHash-LSH is the scale path; this is the ground truth to
    validate it against.
    """
    base = _fan_out(
        df.select(id_col, text_col, *([block_col] if block_col else []))
    ).select(
        F.col(id_col).alias("_id"),
        shingles(text_col, k=k).alias("_sh"),
        *([F.col(block_col).alias("_blk")] if block_col else [F.lit(0).alias("_blk")]),
    )
    a = base.select(
        F.col("_blk"), F.col("_id").alias("a_id"), F.col("_sh").alias("_sha")
    )
    b = base.select(
        F.col("_blk"), F.col("_id").alias("b_id"), F.col("_sh").alias("_shb")
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb")).cast("double")
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    text_col: Column | str, *, bits: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """SimHash of the token multiset: per-bit majority vote over token
    hashes, packed into a signed 64-bit long. Pure expressions: one fold
    maintaining a ``bits``-length vote array.

    ``hash_fn``: "xxhash64" (default — fastest, JVM-only) or "md5"
    (60-bit md5-hex-prefix integers, bits 60..63 always clear —
    replayable in any SQL dialect, which is what lets dedup_simhash
    run under the exact oracle gate)."""
    toks = tokens(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))
    if hash_fn == "md5":
        hashes = F.transform(
            toks,
            lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long"),
        )
    else:
        hashes = F.transform(toks, lambda x: F.xxhash64(x))
    init = F.array(*[F.lit(0).cast("long") for _ in range(bits)])

    def votes(h: Column) -> Column:
        return F.array(
            *[
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for i in range(bits)
            ]
        )

    folded = F.aggregate(hashes, init, lambda acc, h: F.zip_with(acc, votes(h), lambda x, y: x + y))
    # pack sign bits: shiftleft with a column shift count needs
    # call_function (the python wrapper only accepts int literals);
    # bit 63 wraps to the sign bit, which is fine on long
    packed = F.aggregate(
        F.zip_with(
            folded,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, i: F.when(
                v > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), i.cast("int")),
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return packed


def _bands_for(max_hamming: int) -> int:
    """Smallest divisor-of-64 band count whose pigeonhole guarantee
    covers ``max_hamming`` (guarantee: hamming < bands)."""
    for b in (1, 2, 4, 8, 16, 32, 64):
        if b > max_hamming:
            return b
    return 64


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 7,
    bands: int | None = None,
    max_bucket_size: int = 1000,
    hash_fn: str = "xxhash64",
    allow_probabilistic: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: banded candidate generation
    (see :func:`hamming_pairs` for the recall contract), verified with
    bit_count(a xor b)."""
    base = _fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("_id"),
        simhash(text_col, hash_fn=hash_fn).alias("_sh"),
    )
    return hamming_pairs(
        base,
        "_id",
        "_sh",
        max_hamming=max_hamming,
        bands=bands,
        max_bucket_size=max_bucket_size,
        allow_probabilistic=allow_probabilistic,
    )


def hamming_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    *,
    max_hamming: int = 7,
    bands: int | None = None,
    max_bucket_size: int = 1000,
    allow_probabilistic: bool = False,
) -> DataFrame:
    """Near-duplicate (a_id, b_id, hamming) pairs over ANY 64-bit hash
    column — SimHash, pHash, or any locality-preserving fingerprint.

    Candidates share at least one of ``bands`` equal-width bands of the
    64-bit hash. Pigeonhole recall contract: any pair with hamming
    **< bands** must agree on some band and is therefore FOUND (up to
    the ``max_bucket_size`` cap); pairs with hamming in
    ``[bands, max_hamming]`` are found only probabilistically (when a
    band happens to agree). By default ``bands`` is DERIVED from
    ``max_hamming`` as the smallest divisor of 64 strictly greater than
    it, so every pair the threshold accepts is guaranteed a candidate —
    the default (``max_hamming=7`` -> 8 bands of 8 bits) is exact.
    Passing ``bands <= max_hamming`` explicitly trades recall for fewer
    /wider bands and requires ``allow_probabilistic=True`` so the
    trade-off is opted into, never silent.

    Verification is candidates-only with bit_count(a xor b) — the
    all-pairs comparison never materializes, and ``max_bucket_size``
    caps degenerate buckets (all-black thumbnails, empty docs) exactly
    like the MinHash-LSH path.
    """
    if bands is None:
        bands = _bands_for(max_hamming)
    if 64 % bands:
        raise ValueError(f"bands must divide 64, got {bands}")
    if bands <= max_hamming and not allow_probabilistic:
        raise ValueError(
            f"bands={bands} guarantees recall only for hamming < {bands} "
            f"but max_hamming={max_hamming} accepts more distant pairs; "
            "pass allow_probabilistic=True to opt into banded-LSH "
            "probabilistic recall, or leave bands unset to derive a "
            "guaranteed banding"
        )
    width = 64 // bands
    base = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_sh"))

    band_cols = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("_sh"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    buckets = (
        base.select("_id", F.explode(band_cols).alias("bk"))
        .groupBy("bk.band", "bk.key")
        .agg(F.collect_list("_id").alias("ids"), F.count("*").alias("n"))
        .filter((F.col("n") >= 2) & (F.col("n") <= max_bucket_size))
    )
    pairs = (
        buckets.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    ha = base.select(F.col("_id").alias("a"), F.col("_sh").alias("_ha"))
    hb = base.select(F.col("_id").alias("b"), F.col("_sh").alias("_hb"))
    return (
        pairs.join(ha, "a")
        .join(hb, "b")
        .withColumn("hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("a").alias("a_id"), F.col("b").alias("b_id"), "hamming")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_text: str = "text",
    k: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_hits`` word ``k``-grams with an eval/benchmark set (the
    standard n-gram-overlap rule for keeping test data out of training
    data).

    Plan: hash benchmark k-grams (small set -> distinct -> broadcast),
    explode each doc's k-grams, hash-join against the broadcast set, and
    count hits per doc. The corpus is scanned once and never shuffled:
    the only exchange is the per-doc hit count, which AQE keeps local
    when the contaminated set is small. Returns (doc_id, n_hits,
    contaminated).
    """
    bench_grams = (
        benchmark.select(
            F.explode(shingle_hashes(F.col(bench_text), k=k)).alias("_g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(doc_id), F.explode(shingle_hashes(F.col(doc_text), k=k)).alias("_g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(doc_id)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(doc_id)
        .join(hits, doc_id, "left")
        .select(
            doc_id,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def _positional_gram_hashes(col: Column, *, k: int) -> Column:
    """Position-indexed word k-gram hashes: element i is the hash of
    tokens[i..i+k) (whitespace-run tokenization, empties dropped —
    the decontaminate-oracle convention). NOT distinct: array index ==
    token offset, which is what span localization needs. Empty when
    the document has fewer than k tokens."""
    from kafka_streams_plumber_spark.operators.text import let_

    def body(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), n - k)
        grams = F.transform(
            idx,
            lambda i: F.xxhash64(
                F.concat_ws(
                    " ",
                    *[
                        F.element_at(toks, (i + j + 1).cast("int"))
                        for j in range(k)
                    ],
                )
            ),
        )
        return F.when(n >= k, grams).otherwise(
            F.array().cast("array<bigint>")
        )

    return let_(
        F.filter(F.split(col, WS_RE), lambda x: x != ""), body
    )


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_text: str = "text",
    k: int = 8,
) -> DataFrame:
    """Span-level contamination localization: WHERE each document
    overlaps the benchmark, as merged token intervals — so pipelines
    can excise the contaminated span and keep the document (the
    refinement over :func:`decontaminate`'s doc-level drop).

    Plan: posexplode doc k-grams (keeping the token offset), hash-join
    against the broadcast benchmark gram set, then merge overlapping
    hit intervals [pos, pos+k) per document with the classic
    gaps-and-islands cumsum. The per-doc window partitions on doc_id —
    a high-cardinality key whose groups are the (small) hit lists, so
    no hot single task exists at any corpus size; the corpus is
    scanned once and only (doc_id, pos) pairs of HITS shuffle.

    Returns (doc_id, n_hit_grams, n_spans, covered_tokens) for every
    document with >= 1 hit. Unlike :func:`decontaminate` (distinct gram
    SETS), grams here keep their token position, so repeated
    contaminated grams produce repeated hits — each flagged span is a
    real location in the document.
    """
    bench_grams = (
        benchmark.select(
            F.explode(_positional_gram_hashes(F.col(bench_text), k=k)).alias("_g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(doc_id),
        F.posexplode(_positional_gram_hashes(F.col(doc_text), k=k)).alias(
            "_pos", "_g"
        ),
    )
    hits = doc_grams.join(F.broadcast(bench_grams), "_g").select(doc_id, "_pos")

    w = Window.partitionBy(doc_id).orderBy("_pos")
    # island starts where this hit begins past every previous hit's end
    prev_end = F.max(F.col("_pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_new", (F.coalesce(F.col("_pos") >= prev_end, F.lit(True))).cast("int")
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy(doc_id, "_island").agg(
        F.count("*").alias("_hits"),
        F.min("_pos").alias("_s"),
        (F.max("_pos") + k).alias("_e"),
    )
    return spans.groupBy(doc_id).agg(
        F.sum("_hits").cast("long").alias("n_hit_grams"),
        F.count("*").alias("n_spans"),
        F.sum(F.col("_e") - F.col("_s")).cast("long").alias("covered_tokens"),
    )


def semantic_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    dim: int = 64,
    threshold: float = 0.8,
    exact: bool = True,
    checkpoint_dir: str | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end no-model semantic dedup: hashing-trick embeddings ->
    cosine near-dup pairs -> connected components -> one canonical
    representative per cluster (min id). Returns every input doc with
    ``cluster_id`` and ``keep`` columns, like
    :func:`...graph.dedup_clusters` (cluster-then-keep, transitive —
    unlike :func:`minhash_dedup`'s greedy pairwise kill, a near-dup of
    a near-dup of the representative is also dropped).

    ``exact=True`` (the oracle-gated baseline): integer bucket counts
    (``hash_embed(normalize=False)``), all-pairs dot product as ONE
    fixed-order fold, cosine as one double expression — quadratic, for
    validation corpora. ``exact=False`` is the 100 TB path: the same
    embedding L2-normalized through :func:`...similarity.
    embedding_dup_pairs` (multi-table sign-LSH, capped buckets,
    candidates-only verification); extra ``lsh_kwargs`` (n_planes,
    n_tables, seed, max_bucket_size) pass through.

    ``checkpoint_dir`` makes the component iteration executor-loss
    tolerant (long cluster runs).
    """
    from kafka_streams_plumber_spark.operators.graph import dedup_clusters
    from kafka_streams_plumber_spark.operators.similarity import (
        embedding_dup_pairs,
        hash_embed,
    )
    from kafka_streams_plumber_spark.plans.scale import ensure_parallelism

    # hash_embed's token fold is O(tokens x dim) per row — by far the
    # heaviest projection in the operator. Widen the SOURCE before the
    # embedding is attached so it runs on every core even when the
    # corpus arrives as a single small parquet split; no-op at real
    # scale (guide §2.5).
    docs = ensure_parallelism(docs)

    if exact:
        e = (
            docs.select(
                F.col(id_col),
                hash_embed(text_col, dim=dim, normalize=False).alias("_v"),
            )
            .withColumn(
                "_ss",
                F.aggregate(
                    F.transform(F.col("_v"), lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            .filter(F.col("_ss") > 0)
        )
        a = e.select(
            F.col(id_col).alias("a_id"),
            F.col("_v").alias("_va"),
            F.col("_ss").alias("_sa"),
        )
        b = e.select(
            F.col(id_col).alias("b_id"),
            F.col("_v").alias("_vb"),
            F.col("_ss").alias("_sb"),
        )
        dot = F.aggregate(
            F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        cos = dot / (
            F.sqrt(F.col("_sa").cast("double"))
            * F.sqrt(F.col("_sb").cast("double"))
        )
        pairs = (
            a.join(b, F.col("a_id") < F.col("b_id"))
            .withColumn("_cos", cos)
            .filter(F.col("_cos") >= threshold)
            .select("a_id", "b_id")
        )
    else:
        emb = docs.select(
            F.col(id_col), hash_embed(text_col, dim=dim, normalize=True).alias("_v")
        )
        pairs = embedding_dup_pairs(
            emb,
            id_col=id_col,
            vec_col="_v",
            dim=dim,
            threshold=threshold,
            **lsh_kwargs,
        ).select(F.col("a_id"), F.col("b_id"))

    return dedup_clusters(
        docs, pairs, id_col, checkpoint_dir=checkpoint_dir
    )


def semantic_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    bench_text: str = "text",
    dim: int = 64,
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-level benchmark decontamination: flag corpus documents
    whose hashing-trick embedding has cosine >= ``threshold`` to ANY
    benchmark document — catching paraphrased eval contamination that
    the n-gram rule (:func:`decontaminate`) misses because no k-gram
    survives a rewording. Run both: n-gram for verbatim leaks, this for
    near-verbatim ones.

    Returns (doc_id, n_hits, max_cos, contaminated) for every corpus
    doc. Cosine is the repo's exact integer formulation (bucket-count
    embeddings, fixed-order dot fold, one double divide) so the whole
    operator is SQL-replayable.

    Plan: the benchmark side (small by definition — an eval set) is
    embedded and BROADCAST; the corpus is embedded in the same scan
    that probes it and is never shuffled — the only exchange is the
    per-doc hit aggregate, O(contaminated docs). At very large
    benchmark counts, swap the broadcast product for
    :func:`...similarity.embedding_dup_pairs`' LSH bucketing.
    """
    from kafka_streams_plumber_spark.operators.similarity import hash_embed

    def embed(df: DataFrame, id_out: str, text_col: str) -> DataFrame:
        return (
            df.select(
                F.col(id_out),
                hash_embed(text_col, dim=dim, normalize=False).alias("_v"),
            )
            .withColumn(
                "_ss",
                F.aggregate(
                    F.transform(F.col("_v"), lambda x: x * x),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ),
            )
            .filter(F.col("_ss") > 0)
        )

    corpus = embed(docs.select(F.col(doc_id), F.col(doc_text)), doc_id, doc_text)
    bench = (
        embed(
            benchmark.select(F.col(bench_text)).withColumn("_bid", F.lit(0)),
            "_bid",
            bench_text,
        )
        .select(F.col("_v").alias("_bv"), F.col("_ss").alias("_bss"))
    )
    dot = F.aggregate(
        F.zip_with(F.col("_v"), F.col("_bv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot / (
        F.sqrt(F.col("_ss").cast("double")) * F.sqrt(F.col("_bss").cast("double"))
    )
    hits = (
        corpus.crossJoin(F.broadcast(bench))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .groupBy(doc_id)
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.round(F.max("_cos"), 6).alias("max_cos"),
        )
    )
    return (
        docs.select(doc_id)
        .join(hits, doc_id, "left")
        .select(
            doc_id,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            "max_cos",
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_leakage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    *,
    train_split: str = "train",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Cross-split near-duplicate contamination check: every held-out
    document whose n-gram Jaccard with some TRAINING document reaches
    ``threshold`` — the "is my eval set secretly in the training set"
    audit that exact-id leakage checks (group_split) cannot catch,
    because near-dups survive any id-disjoint split.

    Returns one row per leaking pair ``(held_id, held_split, train_id,
    jaccard)`` — the actionable drop/flag list for eval hygiene.
    Pairs between two held-out splits (val-test) are NOT leakage and
    are excluded, as are docs with a NULL split (subsample remainder).

    Scale design: pair generation is :func:`minhash_lsh_pairs`
    unchanged (banded band-key shuffles, capped buckets, exact-Jaccard
    verify on candidates only — never all-pairs); the split labels
    then join on the id twice (narrow (id, split) projections, AQE
    broadcasts the small pair side). One extra O(pairs) filter.
    """
    pairs = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        seed=seed,
        max_bucket_size=max_bucket_size,
    )
    labels = df.select(F.col(id_col).alias("_lid"), F.col(split_col).alias("_lsplit"))
    la = labels.select(F.col("_lid").alias("a_id"), F.col("_lsplit").alias("_sa"))
    lb = labels.select(F.col("_lid").alias("b_id"), F.col("_lsplit").alias("_sb"))
    j = (
        pairs.join(la, "a_id")
        .join(lb, "b_id")
        .where(F.col("_sa").isNotNull() & F.col("_sb").isNotNull())
        .where(
            (F.col("_sa") == F.lit(train_split))
            != (F.col("_sb") == F.lit(train_split))
        )
    )
    train_on_a = F.col("_sa") == F.lit(train_split)
    return j.select(
        F.when(train_on_a, F.col("b_id")).otherwise(F.col("a_id")).alias("held_id"),
        F.when(train_on_a, F.col("_sb")).otherwise(F.col("_sa")).alias("held_split"),
        F.when(train_on_a, F.col("a_id")).otherwise(F.col("b_id")).alias("train_id"),
        "jaccard",
    )
