"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured to a noop sink (full compute, no driver collect),
after a small warmup to amortize JVM/codegen startup.

Quiet-host protocol (VERDICT r9 item 3): before the JVM starts, the
run WAITS for the 1-minute load average to drop under
$SPARK_GRAFT_BENCH_MAX_LOAD1 (default 2.0, up to ~2 min of retries),
and the output JSON carries ``load1_start`` / ``load1_end`` /
``load1_quiet`` stamps so a hot epoch is visible in the artifact
itself instead of needing after-the-fact narrative.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402
from kafka_streams_plumber_spark.queries import QUERIES  # noqa: E402

#: The bench set: every family with nontrivial compute (aggs, joins,
#: window, text ops) plus a pushdown-friendly scan filter.
HEADLINE = [
    "q_filter",
    "q_chain",
    "q1_pricing",
    "q3_topk",
    "q5_join",
    "q_window",
    "q_hourly",
    "q_setops",
    "q_rollup",
    "q_pivot",
    "q_asof",
    "q14_promo",
    "q18_bigorders",
    "q19_disjunct",
    "q_percentiles",
    "q_sessionize",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "text_stats",
    "text_quality",
    "text_repetition",
    "q_topk_group",
    "q7_volume",
    "q9_profit",
    "q13_custdist",
    "q17_smallqty",
    "q21_waiting",
]

#: Round-3 families, totaled SEPARATELY (``extra_total_sec``) so drift
#: in the newer operators is visible round-over-round without breaking
#: the frozen 28-query headline series the judge compares.
EXTRA = [
    "q_lm_ppl",
    "q_rfm",
    "q_kcore",
    "q_funnel_window",
]

#: Round-4 families (first measured in BENCH_r05, ``extra4_total_sec``):
#: a representative slice of the r4 wave so the newest surface gets its
#: own drift series while the two older lists stay frozen. Timed with
#: run_one_full (construction + execution): q_semantic_keep_lsh's
#: connected components materialize EAGERLY during construction, so
#: write-only timing would credit it with near-zero cost.
EXTRA4 = [
    "q_semantic_keep_lsh",
    "q_ewma",
    "q_attrib_last",
    "q_cdc_chunks",
    "q_benford",
    "q_survival",
]

#: Queries benched at a CAPPED scale factor regardless of the bench
#: dir — same device (and same reason) as tools/scale_probe.py MAX_SF:
#: the synthetic corpus's true cosine>=0.8 pair graph is ~10% DENSE, so
#: at sf0.1 ANY correct semantic dedup is output-bound (~2.5M true
#: pairs to verify+cluster, ~95s) and the measurement would track the
#: fixture's pathology, not the engine (SCALING.md documents the
#: linear-candidate scale path). The capped SF is recorded in the
#: output (``extra4_capped_sf``) so the drift series compares like to
#: like each round.
EXTRA4_MAX_SF = {
    "q_semantic_keep_lsh": "/root/testdata/sf0.01",
}

#: Round-5 audit-wave representatives (first measured in BENCH_r06,
#: ``extra5_total_sec``): one per family generation so every wave has
#: a frozen drift series. Lazy plans — write-only timing like
#: HEADLINE/EXTRA. q_ks rides the fused multi-column running_total.
EXTRA5 = [
    "q_containment",
    "q_jsd",
    "q_ks",
    "q_theils_u",
]

#: Round-8 wave (first measured in BENCH_r08, ``extra6_total_sec``):
#: the windowed-drift and fertility-mix additions. Lazy plans —
#: write-only timing, same as HEADLINE/EXTRA/EXTRA5.
EXTRA6 = [
    "q_psi_drift",
    "q_fertility_mix",
    "q_hist_drift",
    "q_vocab_drift",
    "q_dup_drift",
    "q_quantile_drift",
    "q_bootstrap_ci",
]

#: Round-8 second wave (first measured in BENCH_r08,
#: ``extra7_total_sec``): one representative per new family —
#: k-sample ranks, the 2D-prefix tau grid, the HITS iteration, the
#: HLL sketch, TF-IDF top-k, OHLC bars, log-rank survival, the ICC
#: panel. Lazy plans except q_hits (run_one_full: the power iteration
#: materializes during construction, like EXTRA4's iterative ops).
EXTRA7 = [
    "q_kruskal",
    "q_kendall",
    "q_hll",
    "q_tfidf_keywords",
    "q_ohlc",
    "q_logrank",
    "q_icc",
]
EXTRA7_FULL = ["q_hits"]

#: Round-8 third wave (first measured in BENCH_r08,
#: ``extra8_total_sec``): one per session-4 kernel — normality panel,
#: CvM body-gap, Mood's median, Friedman blocks, Welch t, Durbin-
#: Watson, Theil-Sen, average precision, multiclass MCC, degree
#: assortativity. Lazy plans — write-only timing.
EXTRA8 = [
    "q_jarque_bera",
    "q_cvm",
    "q_mood_median",
    "q_friedman",
    "q_welch",
    "q_dw",
    "q_theil_sen",
    "q_avg_precision",
    "q_mcc",
    "q_assortativity",
    "q_ccf",
    "q_prop_test",
    "q_gof",
    "q_cliffs_delta",
    "q_bartlett",
    "q_qq",
    "q_lexdiv",
    "q_clustering",
    "q_cochran_armitage",
    "q_hhi",
    "q_mann_kendall",
    "q_wilson",
    "q_chao",
    "q_dunn",
    "q_partial_corr",
    "q_smk",
    "q_ljung_box",
    "q_sen_seasonal",
]


def run_one(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name](spark, sf_dir)
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def run_one_full(spark, name: str, sf_dir: str) -> float:
    """Construction + execution. For lazy plans this equals
    :func:`run_one` plus ~ms of plan building, but ITERATIVE operators
    (semantic dedup's connected components, k-means) materialize
    eagerly during construction — timing only the final write would
    credit them with near-zero cost. Used for the EXTRA4 series (which
    contains such operators); the frozen HEADLINE/EXTRA series keep the
    original write-only timing so the cross-round comparison stays
    apples-to-apples."""
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - getloadavg always exists on linux
        return -1.0


def _await_quiet_host(threshold: float, retries: int, wait_s: float) -> float:
    """Block until the 1-minute load average drops to ``threshold``
    (the quiet-host precondition — VERDICT r9 item 3: r6-r9 each had a
    bench epoch contaminated by co-tenant load that then needed manual
    adjudication). Re-checks every ``wait_s`` seconds up to ``retries``
    times, then proceeds anyway (the per-round artifact must exist) —
    the stamped load values let the reader see the epoch was hot."""
    load = _load1()
    for _ in range(retries):
        if load < 0 or load <= threshold:
            break
        print(
            f"bench: host busy (load1={load} > {threshold}); waiting {wait_s:.0f}s",
            file=sys.stderr,
        )
        time.sleep(wait_s)
        load = _load1()
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        print(f"bench: SPARK_GRAFT_SF_DIR does not exist: {sf_dir}", file=sys.stderr)
        sys.exit(2)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Quiet-host gate BEFORE the JVM starts: load1 here is pure
    # co-tenant noise (nothing of ours is running yet).
    load_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD1", "2.0"))
    load1_start = _await_quiet_host(
        load_threshold,
        retries=int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_RETRIES", "6")),
        wait_s=float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "20")),
    )

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run every headline plan once at the smallest SF available
    # (fall back to the bench dir). Whole-stage codegen compiles per plan
    # shape, not per dataset — warming at sf0.001 costs milliseconds of
    # data and makes the measurement steady-state throughput (the 100 TB
    # question) instead of one-time JIT compile latency.
    warm_dir = sf_dir
    for cand in ("/root/testdata/sf0.001",):
        if os.path.isdir(cand) and os.path.abspath(cand) != os.path.abspath(sf_dir):
            warm_dir = cand
            break
    for name in [
        "q_distinct", *HEADLINE, *EXTRA, *EXTRA4, *EXTRA5, *EXTRA6,
        *EXTRA7, *EXTRA7_FULL, *EXTRA8,
    ]:
        try:
            QUERIES[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # warmup is best-effort; the measured run reports real errors

    # Best-of-N per query: a single-shot wall time swings +-30% under GC
    # pauses and host noise; the minimum is the reproducible steady-state
    # cost of the plan (what a cluster scheduler would see per task wave).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)

    total = round(sum(timings.values()), 3)

    extra: dict[str, float] = {}
    for name in EXTRA:
        extra[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)

    extra4: dict[str, float] = {}
    extra4_capped: dict[str, float] = {}
    for name in EXTRA4:
        e4_dir = EXTRA4_MAX_SF.get(name, sf_dir)
        if e4_dir != sf_dir and not os.path.isdir(e4_dir):
            e4_dir = sf_dir
        extra4[name] = round(
            min(run_one_full(spark, name, e4_dir) for _ in range(reps)), 3
        )
        if e4_dir != sf_dir:
            mm = re.search(r"sf([0-9.]+)", e4_dir)
            if mm:
                extra4_capped[name] = float(mm.group(1))

    extra5: dict[str, float] = {}
    for name in EXTRA5:
        extra5[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)

    extra6: dict[str, float] = {}
    for name in EXTRA6:
        extra6[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)

    extra7: dict[str, float] = {}
    for name in EXTRA7:
        extra7[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)
    for name in EXTRA7_FULL:
        extra7[name] = round(
            min(run_one_full(spark, name, sf_dir) for _ in range(reps)), 3
        )

    extra8: dict[str, float] = {}
    for name in EXTRA8:
        extra8[name] = round(min(run_one(spark, name, sf_dir) for _ in range(reps)), 3)

    # The driver records only the LAST 2000 characters of stdout
    # (BENCH_r08.json's `tail` cut the headline block mid-object once
    # the single detail line outgrew the buffer — VERDICT r8 item 4).
    # So: the full per-query detail goes out FIRST, and the LAST line
    # is a compact, complete JSON summary (headline timings + every
    # block total) guaranteed to fit the tail buffer, so the committed
    # artifact always parses and carries the whole headline series.
    # load1 at close still carries OUR OWN just-finished executor work
    # (load1 decays over ~1 min), so it over-reads by construction; the
    # pair (start, end) is for the adjudication record, and the boolean
    # is the start-gate verdict the cross-round series should trust.
    load1_end = _load1()
    detail = {
        "metric": "headline_queries_total_sec_detail",
        "value": total,
        "unit": "sec",
        "load1_start": load1_start,
        "load1_end": load1_end,
        "load1_quiet": 0 <= load1_start <= load_threshold,
        "queries": timings,
        "extra_total_sec": round(sum(extra.values()), 3),
        "extra_queries": extra,
        "extra4_total_sec": round(sum(extra4.values()), 3),
        "extra4_capped_sf": extra4_capped,
        "extra4_queries": extra4,
        "extra5_total_sec": round(sum(extra5.values()), 3),
        "extra5_queries": extra5,
        "extra6_total_sec": round(sum(extra6.values()), 3),
        "extra6_queries": extra6,
        "extra7_total_sec": round(sum(extra7.values()), 3),
        "extra7_queries": extra7,
        "extra8_total_sec": round(sum(extra8.values()), 3),
        "extra8_queries": extra8,
        "sf": sf,
    }
    print(json.dumps(detail))

    # Per-block per-query attribution for EVERY block rides the tail
    # (VERDICT r11 item 1: extra5's map fell outside the 2,000-char
    # capture, which made q_containment's stabilization unverifiable in
    # driver data). Two lines, both inside the tail window:
    #   line A ("blocks"): the five maps not already on the compact
    #     line, 2-decimal values, no-space separators;
    #   line B (LAST, the contract line): byte-compatible keys with the
    #     r10/r11 compact line (headline 3-dp map, every block total,
    #     extra4's map), no-space separators.
    # Together they must fit the driver's 2000-char capture; the assert
    # below enforces it, with a deterministic 1-decimal fallback for
    # line A if a future run's values outgrow the budget.
    sep = (",", ":")

    def _blocks_line(ndigits: int) -> str:
        rd = lambda d: {k: round(v, ndigits) for k, v in d.items()}  # noqa: E731
        return json.dumps(
            {
                "metric": "blocks",
                "extra": rd(extra),
                "extra5": rd(extra5),
                "extra6": rd(extra6),
                "extra7": rd(extra7),
                "extra8": rd(extra8),
            },
            separators=sep,
        )

    compact = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "load1_start": load1_start,
        "load1_end": load1_end,
        "load1_quiet": detail["load1_quiet"],
        "queries": timings,
        "extra_total_sec": detail["extra_total_sec"],
        "extra4_total_sec": detail["extra4_total_sec"],
        # extra4's map stays on the contract line (VERDICT r10 item 3):
        # it holds the eager iterative operators (semantic dedup) and
        # the driver's PERF comparison already reads it from here.
        "extra4_queries": extra4,
        "extra4_capped_sf": extra4_capped,
        "extra5_total_sec": detail["extra5_total_sec"],
        "extra6_total_sec": detail["extra6_total_sec"],
        "extra7_total_sec": detail["extra7_total_sec"],
        "extra8_total_sec": detail["extra8_total_sec"],
        "sf": sf,
    }
    line = json.dumps(compact, separators=sep)
    blocks = _blocks_line(2)
    if len(blocks) + len(line) + 2 > 1990:
        blocks = _blocks_line(1)
    # Tail-buffer invariant: BOTH final lines (plus newlines) must fit
    # the driver's 2000-char capture. At r11's values the pair is
    # ~1970 chars; the assert fails loudly rather than silently losing
    # a block's attribution again.
    assert len(blocks) + len(line) + 2 <= 2000, (
        f"bench tail lines too long: {len(blocks)} + {len(line)}"
    )
    print(blocks)
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
