"""Mergeable frequency sketches.

Count-min: the approximate-count structure for key spaces too large to
hold exact counts (per-URL / per-user / per-shingle frequencies over a
crawl). The sketch is a (depth x width) counter grid stored RELATIONALLY
— rows ``(j, cell, cnt)`` — which is what makes it Spark-native:

- build is one explode(depth) + map-combinable groupBy: the shuffle
  carries at most depth x width rows per partition, independent of both
  corpus size and key cardinality;
- merging two sketches (two ingestion batches, two days) is
  ``union -> groupBy(j, cell) -> sum`` — the same shape, no driver state;
- lookup joins the query keys' (j, cell) coordinates against the grid
  and takes the per-key MIN across rows (absent cell = 0).

Estimates are classical CMS: never an undercount, overcount bounded by
~2N/width with probability 1 - 2^-depth. Hashing is the module-standard
31-bit multiplicative scheme — pure int64 arithmetic, replayable in any
SQL dialect (the oracle rebuilds the exact grid), deterministic across
runs/engines/partitionings.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M31 = 2**31


def cms_params(depth: int, seed: int) -> list[int]:
    """Per-row odd multipliers for the universal hash family."""
    rng = random.Random(seed)
    return [rng.randrange(1, _M31) | 1 for _ in range(depth)]


def _cell(key: Column, mult: int, width: int) -> Column:
    return (F.pmod(key, F.lit(_M31)) * F.lit(mult)) % _M31 % width


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """Build the counter grid ``(j, cell, cnt)`` over an integer key
    column. NULL keys are excluded. Union + re-aggregate to merge."""
    mults = cms_params(depth, seed)
    k = F.col(key_col)
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cell(k, m, width).alias("cell")
            )
            for j, m in enumerate(mults)
        ]
    )
    return (
        df.filter(k.isNotNull())
        .select(F.explode(coords).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.cell").alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
    seed: int = 42,
    est_col: str = "est",
) -> DataFrame:
    """Estimated count per distinct key in ``keys``: min over the
    ``depth`` grid rows (a missing cell reads as 0). The grid side is
    at most depth x width rows — broadcast — so lookup never shuffles
    the key set."""
    mults = cms_params(depth, seed)
    kk = F.col("key")
    coords = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), _cell(kk, m, width).alias("cell")
            )
            for j, m in enumerate(mults)
        ]
    )
    q = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("key"))
        .distinct()
        .select("key", F.explode(coords).alias("c"))
        .select("key", F.col("c.j").alias("j"), F.col("c.cell").alias("cell"))
    )
    joined = q.join(F.broadcast(sketch), ["j", "cell"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col)
    )


# =====================================================================
# Bloom filter — membership sketch for semi-join pruning
# =====================================================================
#
# The scale story: an equi-join where the probe side is 100 TB and the
# build side matches only a sliver of it shuffles the whole 100 TB
# anyway — rows that cannot possibly match still travel. A Bloom
# filter of the build side's keys, evaluated as a pure PROJECTION on
# the probe side BEFORE the exchange, drops guaranteed-no-match rows
# pre-shuffle. False positives only cost wasted shuffle (removed by
# the real join); false negatives are impossible, so the join result
# is EXACT. This mirrors what Spark's own runtime bloom-filter
# optimization injects; the explicit operator makes the behavior
# deterministic, testable, and available across engine versions.


def _bloom_pos(key: Column, mult: int, m_bits: int) -> Column:
    # same replayable 31-bit multiplicative family as the CMS grid
    return (F.pmod(key, F.lit(_M31)) * F.lit(mult)) % _M31 % m_bits


def _word(pos: Column) -> Column:
    return F.floor(pos / F.lit(32)).cast("long")


def _mask(pos: Column) -> Column:
    # 2^(pos%32) via pow — exact in a double up to 2^53, and positive,
    # which sidesteps PySpark's int-literal-only shiftleft wrapper and
    # signed-top-bit arithmetic alike
    return F.pow(F.lit(2.0), (pos % 32).cast("double")).cast("long")


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 7,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` (any type — keys are
    xxhash64'd first) as packed 32-bit words ``(word, bits)``.

    Relational and mergeable like the CMS grid: union two filters and
    ``groupBy(word).agg(bit_or(bits))`` to combine. The build is one
    explode(k) + map-combinable groupBy whose shuffle carries at most
    ``k * m_bits/32`` rows per partition, independent of build-side
    size."""
    mults = cms_params(k, seed)
    h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(_M31))
    positions = F.array(*[_bloom_pos(h, m, m_bits) for m in mults])
    pos = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(positions).alias("pos"))
    )
    return (
        pos.select(_word(F.col("pos")).alias("word"), _mask(F.col("pos")).alias("m"))
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )


def bloom_might_contain(
    bloom_words: list[int],
    key_col: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 7,
) -> Column:
    """Membership predicate as a PURE EXPRESSION over a dense literal
    word array (``bloom_words[w] & mask != 0`` for all k positions).

    The literal array is ``m_bits/32`` longs — it ships inside the
    serialized plan exactly like Spark's injected runtime bloom
    filters, so the probe side needs no join and no explode: the
    filter runs inside the scan's codegen stage.

    Construction details that matter: the word array is parsed from
    ONE SQL string (py4j materializes a Python list literal one
    element at a time — ~1 s for 2k words), and the expression
    references the array literal ONCE, folding the k probes with
    ``forall`` over a positions array (k copies of a 2k-element
    literal would multiply analysis cost by k)."""
    arr = F.expr(
        "CAST(array(" + ",".join(map(str, bloom_words)) + ") AS array<bigint>)"
    )
    mults = cms_params(k, seed)
    h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(_M31))
    positions = F.array(*[_bloom_pos(h, m, m_bits) for m in mults])
    return F.forall(
        positions,
        lambda p: F.element_at(arr, (_word(p) + 1).cast("int")).bitwiseAND(
            _mask(p)
        )
        != 0,
    )


def bloom_prune_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    *,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join with Bloom pre-pruning of the probe side.

    Builds the filter over ``build[on]``, densifies it to a literal
    word array (a bounded ``m_bits/32``-row collect — sketch-sized,
    data-size-independent), filters ``probe`` rows that cannot match,
    then performs the real join (which removes false positives).

    Result is always EXACTLY ``probe.join(build, on, how)`` — the
    oracle for any query built on this is the plain join."""
    sketch = bloom_build(build, on, m_bits=m_bits, k=k, seed=seed).collect()
    words = [0] * (m_bits // 32)
    for row in sketch:
        words[row["word"]] = row["bits"]
    pruned = probe.filter(
        bloom_might_contain(words, on, m_bits=m_bits, k=k, seed=seed)
    )
    return pruned.join(build, on, how)


# =====================================================================
# HyperLogLog — mergeable distinct-count registers
# =====================================================================

_HLL_MULT = 73244475  # the classic 31-bit xorshift-multiply constant


def _hll_mix31(key: Column) -> Column:
    """31-bit xorshift-multiply mixer (the degski/h2 integer hash,
    masked to 31 bits): nonlinear avalanche over an integer key using
    only +, *, >>, xor, & — pure int64 arithmetic with no overflow
    (products < 2^62), replayable verbatim in any SQL dialect. The
    module's multiplicative CMS scheme is NOT reused here: HLL's rho
    needs uniform LOW bits, and affine maps keep arithmetic
    progressions arithmetic — the xor steps break that linearity."""
    h = F.pmod(key, F.lit(2**31))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = (h * F.lit(_HLL_MULT)).bitwiseAND(F.lit(0x7FFFFFFF))
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = (h * F.lit(_HLL_MULT)).bitwiseAND(F.lit(0x7FFFFFFF))
    return h.bitwiseXOR(F.shiftright(h, 16))


def _hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_cols: str | list[str],
    key_col: str,
    *,
    p: int = 10,
) -> DataFrame:
    """HyperLogLog register rows ``(groups..., bucket, rho)`` over an
    integer key column — the MERGEABLE distinct-count sketch: however
    large the input, each group collapses to at most ``m = 2^p``
    rows, and merging two sketches (two days, two sources, two
    ingestion batches) is ``union -> groupBy -> max(rho)`` — the same
    relational shape as the module's CMS grid, no driver state, no
    binary blobs. Feed to :func:`hll_estimate` for the count.

    NULL keys are excluded. bucket = the top ``p`` mixed bits (the
    well-mixed end), rho = leading-zero count of the remaining
    ``31 - p`` bits + 1, taken via ``length(bin(w))`` — exact string
    arithmetic, no floating log2 at power-of-two boundaries.

    Scale design: one map-combinable groupBy — the shuffle carries at
    most m rows per partition per group, independent of cardinality.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    q = 31 - int(p)
    h = _hll_mix31(F.col(key_col))
    w = h.bitwiseAND(F.lit((1 << q) - 1))
    rho = F.when(w == 0, F.lit(q + 1)).otherwise(
        F.lit(q) - F.length(F.bin(w)) + 1
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *groups,
            F.shiftright(h, q).alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: str | list[str],
    *,
    p: int = 10,
) -> DataFrame:
    """Distinct-count estimate per group from :func:`hll_registers`
    rows (possibly unioned across batches — re-aggregate by max
    first if so). Returns ``(groups..., registers_used, n_est)``.

    Classical HLL with the small-range linear-counting correction:
    raw = alpha_m * m^2 / sum(2^-rho) over all m registers (absent
    register = 2^0); when raw <= 2.5m and zero registers exist,
    n_est = m * ln(m / V). Standard error ~ 1.04/sqrt(m) (~3.3% at
    p=10).

    Exactness: the harmonic sum is computed as an exact INTEGER —
    sum(2^(K - rho)) with K = 32 - p bounds each term at 2^(31-p), so
    the order-dependent double accumulation HLL implementations
    usually carry never appears; raw and the correction are one
    fixed-shape double expression replayed bit-for-bit in SQL (ln's
    last-ulp jitter is far below the 6-decimal output).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m = 1 << int(p)
    k_top = 32 - int(p)  # max rho + 1 = (31-p) + 1, exponent base
    alpha = _hll_alpha(m)
    per_g = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_used"),
        F.coalesce(
            F.sum(
                F.pow(F.lit(2.0), F.lit(k_top) - F.col("rho")).cast(
                    "long"
                )
            ),
            F.lit(0),
        ).alias("_hsum"),
    )
    hsum_all = (
        F.col("_hsum")
        + (F.lit(m) - F.col("_used")) * F.lit(1 << k_top)
    ).cast("double")
    raw = (
        F.lit(alpha * m * m)
        * F.lit(float(1 << k_top))
        / hsum_all
    )
    v_zero = (F.lit(m) - F.col("_used")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return per_g.select(
        *groups,
        F.col("_used").cast("long").alias("registers_used"),
        F.round(est, 6).alias("n_est"),
    )


def hll_distinct(
    df: DataFrame,
    group_cols: str | list[str],
    key_col: str,
    *,
    p: int = 10,
) -> DataFrame:
    """Convenience end-to-end: :func:`hll_registers` ->
    :func:`hll_estimate`. Use the two-step form when sketches are
    persisted and merged across batches."""
    return hll_estimate(
        hll_registers(df, group_cols, key_col, p=p), group_cols, p=p
    )
