"""Measure wall time for representative queries across the three test
scale factors and write SCALING.md — cheap empirical evidence that the
plans scale with data (a 10x data step costing ~10x or less), not with
some hidden quadratic or driver-side loop.

Caveats recorded in the output: at these tiny sizes fixed overhead
(stage scheduling, codegen) dominates the small SFs, so ratios well
BELOW 10x on a 10x step are expected; ratios far ABOVE 10x would be
the red flag. Single machine, local[32], best-of-2 per point.

Usage: python tools/scale_probe.py [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402
from kafka_streams_plumber_spark.queries import QUERIES  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

PROBED = [
    "q1_pricing",
    "q3_topk",
    "q9_profit",
    "dedup_exact",
    "dedup_minhash",
    "sim_topk",
    "q_percentiles",
    "text_stats",
    "q_sessionize",
    "q_nb_classifier",
    "q_url_canon",
    "q_pack",
    "q_pagerank",
    "q_bm25",
    "q_cdc_upsert",
    "q_bloom_join",
    "q_funnel",
    "q_triangles",
    "q_pmi",
    "q_rolling_z",
    "q_transitions",
    "q_gapfill",
    "q_funnel_window",
    "q_attrib_last",
    "q_lm_ppl",
    "q_dp_stats",
    "q_expectations",
    "q_zorder",
    "q_semantic_keep",
    "q_semantic_keep_lsh",
    "q_semantic_auto",
    "q_ab_test",
    "q_lpa",
    "q_kcenter",
    "q_ewma",
    "q_cdc_chunks",
    "q_reweight",
    "q_calibration",
    "q_l_diversity",
    "q_cluster_hist",
    "q_rfm",
    "q_weighted_pct",
    "q_token_budget",
    "q_dau_wau",
    "q_kcore",
    "q_paths",
    "q_containment",
    "q_novelty",
    "q_adamic",
    "q_jsd",
    # late-r5 audit wave (VERDICT r5 item 4): the fattest plans in
    # PLANS.md had no measured 10x ratio; q_ks/q_bestthr/q_vocab_cov
    # now run the fused multi-column running_total
    "q_ks",
    "q_bestthr",
    "q_vocab_cov",
    "q_cluster_agree",
    "q_theils_u",
    "q_min_k",
    "q_gains",
    "q_centroid_sim",
    "q_qnorm",
    "q_mase",
    # r6 wave: measured the round they shipped, so no generation of
    # queries ever lacks a 10x ratio
    "q_bh",
    "q_split_leakage",
    "q_krippendorff",
    "q_cusum",
    "q_spearman",
    "q_fightin",
    "q_mannwhitney",
    # r7 wave
    "q_krippendorff_interval",
    "q_krippendorff_ordinal",
    "q_stl",
    "q_stl_by_type",
    "q_acf",
    "q_ph",
    "q_fleiss",
    "q_cronbach",
    "q_t_closeness",
    "q_graph_jaccard",
    "q_ad",
    "q_trendbreak",
    "q_by",
    "q_stl_strength",
    "q_runs",
    "q_acf_by_type",
    "q_stl_runs",
    # r8 wave
    "q_psi_drift",
    "q_fertility_mix",
    "q_hist_drift",
    "q_vocab_drift",
    "q_dup_drift",
    "q_quantile_drift",
    "q_bootstrap_ci",
    # r8 wave 2
    "q_cohen_kappa",
    "q_mcnemar",
    "q_kendall_w",
    "q_kruskal",
    "q_anova",
    "q_brown_forsythe",
    "q_hits",
    "q_kendall",
    "q_cochran",
    "q_hll",
    "q_tfidf_keywords",
    "q_icc",
    "q_cohens_d",
    "q_class_report",
    "q_ohlc",
    "q_logrank",
    "q_cmh",
    "q_jt",
    "q_readability",
    "q_brier",
    "q_pacf",
    "q_isotonic",
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


#: Queries probed only up to the named SF. q_semantic_keep gates the
#: EXACT all-pairs cosine baseline — quadratic by definition, ~200 s at
#: sf0.1 — so its 10x ratio is measured on the sf0.001->sf0.01 step;
#: the production sign-LSH path (q_semantic_keep_lsh, identical
#: clustering, oracle-gated) is probed at full range instead.
MAX_SF = {
    "q_semantic_keep": "/root/testdata/sf0.01",
    # the sign-LSH forms are capped too: on THIS corpus the true
    # cosine>=0.8 pair graph is ~10% dense (random small-vocab docs are
    # mutually similar — measured 13k true pairs among 500 docs), so
    # the verify stage of ANY correct algorithm is output-bound at
    # sf0.1; see the caveat section
    "q_semantic_keep_lsh": "/root/testdata/sf0.01",
    "q_semantic_auto": "/root/testdata/sf0.01",
}


def t_run(spark, name: str, sf: str) -> float:
    best = float("inf")
    for _ in range(2):
        # time construction too: iterative queries (pagerank, kmeans)
        # do their rounds eagerly at plan-build time via localCheckpoint
        t0 = time.time()
        df = QUERIES[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING.md")
    args = ap.parse_args()

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm codegen on the smallest SF
    for name in PROBED:
        try:
            QUERIES[name](spark, SFS[0]).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    rows = []
    for name in PROBED:
        sfs = SFS
        if name in MAX_SF:
            sfs = SFS[: SFS.index(MAX_SF[name]) + 1]
        times = [t_run(spark, name, sf) for sf in sfs]
        if len(times) == 3:
            ratio = times[2] / times[1] if times[1] > 0 else float("nan")
        else:
            # capped probe: the 10x ratio is the last available step
            ratio = times[-1] / times[-2] if times[-2] > 0 else float("nan")
            times = times + [float("nan")] * (3 - len(times))
        rows.append((name, *times, ratio))
        print(f"{name}: {['%.3f' % t for t in times]} ratio10x={ratio:.1f}")

    lines = [
        "# SCALING — wall time vs scale factor",
        "",
        "Generated by `tools/scale_probe.py` on local[32], best-of-2 per",
        "point after codegen warmup. `ratio` is sf0.1 / sf0.01 — a 10x",
        "data step. Fixed per-stage overhead dominates the small SFs, so",
        "ratios well under 10 are expected; ratios far over 10 would flag",
        "super-linear work (quadratic joins, driver loops).",
        "",
        "| query | sf0.001 (s) | sf0.01 (s) | sf0.1 (s) | 10x ratio |",
        "|---|---|---|---|---|",
    ]
    for name, t1, t2, t3, r in rows:
        t3s = f"{t3:.3f}" if t3 == t3 else "capped"
        lines.append(f"| `{name}` | {t1:.3f} | {t2:.3f} | {t3s} | {r:.1f}x |")
    lines += [
        "",
        "## Probe rows at 2.0-2.4x on the 10x step — growth driver per query",
        "",
        "None of these are super-linear; a 10x data step moving wall time only",
        "2x means fixed per-stage overhead still covers most of the cost. The",
        "driver differs per query:",
        "",
        "- `q_min_k` (2.4x): linear token-grain work (per-document bigram",
        "  scoring touches every token) emerging from under fixed stage",
        "  overhead — output stays one row per document; no pair or grain",
        "  blowup anywhere in the plan.",
        "- `q_jsd` (2.1x): distinct-TERM grain growth — the language-pair grid",
        "  is fixed (190 pairs) but the per-language term distributions grow",
        "  with the vocabulary, which grows Heaps-style with corpus size; the",
        "  pairwise stage is linear in distinct (pair, term) combinations.",
        "- `q_krippendorff` (2.1x): fixed-cost amortization — the coincidence",
        "  grain is pinned by construction (50 units x rating-value pairs), so",
        "  the added time is purely the linear panel scan/groupBy feeding it.",
        "  (Same argument for the interval/ordinal variants.)",
        "- `q_centroid_sim` (2.1x): fixed-cost amortization — the output pair",
        "  grid is constant (190 centroid pairs from k=20); the linear part is",
        "  the assignment scan that builds the centroids.",
        "- `q_qnorm` (2.0x): linear OUTPUT growth — quantile normalization",
        "  returns one row per input row, so the rank machinery (range",
        "  exchange + O(P) offsets) and the write scale with the data; nothing",
        "  grows faster than n.",
        "",
        "Any other row in the 2.0-3.2x band is a scan-linear plan (pushdown /",
        "partial-agg / broadcast evidence in PLANS.md) whose data-linear term",
        "is beginning to emerge from fixed overhead — the expected shape for",
        "sub-second queries on a 10x step, trending toward ~10x only once",
        "per-task time dominates scheduling.",
        "",
        "## Bench-anomaly notes (cross-round)",
        "",
        "- r9 full-table regeneration: the two wave-6 rows (`q_ljung_box`,",
        "  `q_sen_seasonal`) are folded into the main table (they were",
        "  probed in a same-host follow-up pass in r8), and `q_bootstrap_ci`",
        "  drops from 16.3 s to the low single digits at sf0.1 by a REAL",
        "  KERNEL CHANGE, not environment: the r9 salted two-level sum keeps",
        "  the n*b hot loop on long arithmetic instead of per-row",
        "  decimal(38,0) accumulation (operators/sampling.py; same summed",
        "  integers, same oracle hash; isolated 5-rep min 3.165 s vs 11.795 s",
        "  for the decimal kernel on the same quiet host, load1 <= 3).",
        "- r9 closing bench (full sf0.1 bench.py, load1 0.07 at start):",
        "  headline 12.775 s vs the r8 quiet-host 8.098 s — another",
        "  elevated host epoch, adjudicated BEFORE closing (VERDICT r8",
        "  item 8) with isolated 5-rep remeasures of the four biggest",
        "  deviators: q1_pricing min 0.616 (r8 isolated 0.600),",
        "  q3_topk 0.595 (0.675 — better than band), q21_waiting 0.888",
        "  (r8 bench 0.964 — inside band), dedup_minhash 1.023 (r7",
        "  isolated 0.881; one rep spiked to 5.3 s with load1 swinging",
        "  0.08 -> 2.2 between reps — external container activity",
        "  visible even under isolation). Per-query bench ratios vs r8",
        "  span 0.86-1.55x with constant-cost plans at 1.0x",
        "  (dedup_exact 0.104, q_setops 1.00x), the environmental",
        "  signature; no code or plan touched these queries in r9",
        "  (PLANS.md rows unchanged). extra6 closed at 6.121 s",
        "  (bootstrap 3.802) — under the r8 verdict's ~8 s target even",
        "  in the elevated epoch.",
        "- r10 closing bench (full sf0.1 bench.py, load1_start 0.19 via the",
        "  NEW self-gating stamps — VERDICT r9 item 3 landed: bench.py waits",
        "  for load1 <= 2.0 pre-JVM and stamps load1_start/end/quiet into",
        "  its JSON): headline 11.715 s vs the r9 driver 9.469 s. Same",
        "  environmental signature as the r6-r9 epochs: uniform positive",
        "  drift across nearly every query (sum of deltas +2.2 s spread",
        "  over 28 queries, ratios preserved, no single dominator), zero",
        "  plan changes on the deviators (PLANS.md rows identical for the",
        "  TPC-H family). Adjudicated the same session with isolated 5-rep",
        "  remeasures (tools/remeasure.py): q18_bigorders min 0.479 and",
        "  text_repetition 0.416 BACK INSIDE their r9 bands (0.527/0.397),",
        "  q14_promo 0.415 vs bench 0.558, q1_pricing 0.676 and",
        "  q21_waiting 1.094 ~10% over their r9 isolated precedents with",
        "  monotone-descending rep series (2.23 -> 1.09 for q21) — cache/",
        "  epoch decay, not plan cost. The load1 stamp alone does not",
        "  capture this epoch class (start load was 0.19); the per-query",
        "  stamps + this artifact are the adjudication record.",
        "- `q_pacf`'s r9 row reads 5.888 s at sf0.001 against 1.846 /",
        "  2.261 at the larger SFs — non-monotone, so adjudicated the",
        "  same session: an isolated fresh-session 3-SF best-of-2",
        "  re-probe (load1 0.71) gave [0.712, 0.647, 0.613] — flat and",
        "  sub-second everywhere; the 5.888 was a scheduling hiccup in",
        "  the 142-query shared session, not the plan (PACF's",
        "  Durbin-Levinson recursion is fixed-size; only the bucketed",
        "  ACF scan sees data).",
        "- `q_cohen_kappa`'s r8 probe row (6.370 / 2.186 / 5.434 — NON-",
        "  monotone, sf0.001 reading 3x its sf0.1) was flagged by the r8",
        "  verdict as contaminated; a quiet-host isolated 5-rep remeasure",
        "  in r9 (tools/remeasure.py, load1 0.13) gave [0.922, 0.748,",
        "  0.903, 0.770, 0.575] min 0.575 s at sf0.1 — the kernel is",
        "  sub-second and the r8 row was environment; this table's",
        "  regenerated row is the standing record.",
        '- Session-4 closing measurements (r8, previous session): the full',
        '  sf0.1 bench read headline 10.596 s with a BROAD ~15-30%',
        '  elevation over the early-r8 quiet-host run (8.098 s) spread',
        '  across unrelated queries — including constant-cost plans like',
        '  dedup_exact (0.084 -> 0.140) whose PLANS.md rows are unchanged.',
        '  Isolated 5-rep re-measures (tools/remeasure.py, load1 0.07 at',
        '  start) REPRODUCE the elevation: q1_pricing min 0.663 (early-r8',
        '  isolated 0.600), q3_topk 0.856 (0.675), q_rollup 0.430 (0.395),',
        '  dedup_exact 0.115 (bench 0.084). A uniform shift that survives',
        '  isolation and hits trivial plans equally is host-epoch',
        '  throughput variance (container CPU allocation / frequency), not',
        '  a regression: no code or plan diff touches these queries this',
        '  session, and every per-query RATIO between them is preserved.',
        "- BENCH_r06's `dedup_minhash` 2.548 s (vs 0.887 s in r5) was",
        "  driver-host contention, not a plan change: an isolated 5-rep",
        "  re-measure at sf0.1 in r7 gave [1.287, 1.127, 0.986, 0.881,",
        "  1.208] — min 0.881 s, matching r5 (0.887) and this table's probe",
        "  row. Zero code changes touched the minhash path in r6; PLANS.md",
        "  shows the same 10-shuffle banded plan.",
        "- BENCH_r06's `q_funnel_window` 0.740 s (vs 0.513 in r5) is the same",
        "  event: an isolated fresh-session 5-rep re-measure gave [1.161,",
        "  0.682, 0.683, 0.692, 0.562] — min 0.562 s, inside the r4-r5 band.",
        "- r7 in-round informal bench (host load-average ~6 at measurement",
        "  time): `q_percentiles` read 1.2-2.1 s isolated (r6: 0.973) while",
        "  `dedup_minhash` stayed at 0.79-0.83 s — the percentile range",
        "  exchange is the contention-sensitive stage; its plan is unchanged",
        "  (PLANS.md) and its probe ratio is ~2x, so treat high headline",
        "  readings of q_percentiles under load as environmental.",
        "- BENCH_r07's `q1_pricing` 0.607 / `q3_topk` 0.830 / `q_rollup`",
        "  0.432 / `q_rfm` 0.662 (38-54% over r6) were the same disclosed",
        "  load~6 contention event, adjudicated in r8 with two quiet-host",
        "  artifacts (tools/remeasure.py, load1 0.06-1.09): (a) isolated",
        "  fresh-session 5-rep re-measures — q1_pricing [0.984, 0.808,",
        "  0.611, 0.613, 0.600] min 0.600, q3_topk [1.138, 0.794, 0.990,",
        "  0.709, 0.675] min 0.675, q_rollup [0.453, 0.395, 0.553, 0.495,",
        "  0.401] min 0.395, q_rfm [0.983, 0.960, 0.682, 0.639, 0.593]",
        "  min 0.593 — q3_topk/q_rollup/q_rfm back inside the r5 band",
        "  (isolated sessions carry less JVM warmup than the shared bench",
        "  session, so their mins sit slightly above full-bench readings);",
        "  and (b) a full shared-session bench.py run on the same quiet",
        "  host: q1_pricing 0.412, q3_topk 0.534, q_rollup 0.320, q_rfm",
        "  0.406, headline total 8.098 s — at or below every r6 value.",
        "  Zero code or plan changes touched these queries in r7",
        "  (PLANS.md rows identical).",
        "- `q_containment` is the one r7-flagged query NOT fully explained",
        "  by contention: quiet-host isolated reps [3.304, 2.895, 2.746,",
        "  2.420, 3.272] min 2.420 and quiet full-bench 2.544 vs r6's",
        "  1.941. Its plan is unchanged; the variance tracks the",
        "  degenerate ~30-word-vocabulary corpus (see the super-linear",
        "  note below) where every posting list is long and task skew",
        "  dominates. The Zipfian-vocabulary fixture row below is the",
        "  controlled evidence for the prefix filter itself.",
        "",
        "## Known super-linear entries (by design, with a scale path)",
        "",
        "- `q_containment` (the table's largest ratio — 4-6x on the 10x",
        "  step across rounds) is posting-list-bound on this corpus: the",
        "  ~30-word synthetic vocabulary makes every word 3-shingle COMMON,",
        "  so the rarest-first prefix filter cannot shorten the probed",
        "  posting lists the way it does on natural text (where shingle",
        "  frequencies are Zipfian and the rare prefix prunes most of the",
        "  candidate space). The algorithm is the standard exact asymmetric",
        "  prefix filter; `block_col` bounds the lists further in",
        "  production.",
        "",
        "  MEASURED in r8 (tools/zipf_probe.py, quiet host): on a",
        "  Zipf-tailed corpus (10k-word vocabulary, s=1.1, lengths 20-100",
        "  words, a planted full quote every 50 docs) at the same doc",
        "  counts as sf0.01/sf0.1, the prefix filter's candidate set is",
        "  LINEAR and nearly all-true: 181 candidates at 5k docs -> 1,908",
        "  at 50k (10.5x on a 10x step, ~0.04/doc at both sizes), with",
        "  1,723 of the 1,908 surviving verification as true >=0.8",
        "  containment pairs — ~90% filter precision. The degenerate",
        "  driver corpus measured the same way explodes QUADRATICALLY:",
        "  61 candidates at 500 docs (sf0.01) -> 206,240 at 5k docs",
        "  (sf0.1), i.e. 0.1/doc -> 41.2/doc on one 10x step. Zipf wall",
        "  times: 2.44 s at 5k docs -> 10.12 s at 50k (4.1x, the linear",
        "  token grain emerging from fixed overhead; q_novelty on the",
        "  same corpus: 0.83 -> 1.48 s, 1.8x). This turns the",
        "  degenerate-corpus disclosure into measured evidence: the",
        "  rarest-first prune works as designed on natural-shaped text,",
        "  and the bench/probe numbers above track fixture pathology.",
        "",
        "- The semantic-dedup family is probed only to sf0.01, for two",
        "  distinct reasons. (1) `q_semantic_keep` gates the EXACT",
        "  all-pairs baseline — quadratic by definition; it exists to",
        "  validate the approximate path bit-for-bit under the oracle.",
        "  (2) The sign-LSH forms (`q_semantic_keep_lsh` pinned at 10",
        "  planes for its static-hyperplane SQL oracle; `q_semantic_auto`",
        "  with data-derived planes via `target_bucket_size`, the form a",
        "  real corpus runs) are OUTPUT-BOUND on this synthetic corpus:",
        "  docs are random draws over a ~30-word vocabulary, so the TRUE",
        "  cosine>=0.8 pair graph is ~10% dense (measured: 13,053 true",
        "  pairs among 500 docs at sf0.001) — any correct algorithm must",
        "  verify ~0.1*n^2 pairs here, exactly the q_setsim situation.",
        "  On a real corpus (pair graph sparse), `target_bucket_size`",
        "  keeps expected bucket occupancy constant (planes =",
        "  ceil(log2(n/target))) so candidate volume ~ true pairs +",
        "  n*target — linear; with FIXED planes it would grow",
        "  n^2/2^planes regardless of data. Equivalence chain: auto ==",
        "  pinned kernel (same code path, tests/test_dedup.py::",
        "  test_semantic_dedup_auto_sizing_matches_exact), pinned ==",
        "  exact (test_semantic_dedup_lsh_path_matches_exact), exact ==",
        "  DuckDB oracle (q_semantic_keep).",
        "",
        "  MEASURED in r10 (tools/zipf_probe.py --section semantic,",
        "  quiet host), closing the one remaining measured-at-scale gap",
        "  in the dedup story. Two findings. (a) The Zipf TEXT corpus is",
        "  the wrong fixture for the SEMANTIC family: hashing-trick",
        "  embeddings of same-vocabulary text all share the common-word",
        "  direction, so its true cosine>=0.8 pair graph is ~5.6% dense",
        "  (measured: 701,505 true pairs among 5k docs, mean pairwise",
        "  cosine 0.586) — output-bound like the driver corpus, just via",
        "  a different mechanism; its 1,368 LSH candidates/doc track",
        "  that density, not the algorithm. (b) On the fixture that",
        "  isolates the claim — seeded random unit vectors (sparse true",
        "  pair graph), a planted near-dup every 50 docs, pushed through",
        "  embedding_dup_pairs with target_bucket_size=64, i.e. the",
        "  exact component q_semantic_auto runs after hash_embed — the",
        "  data-derived plane count (7 planes at 5k docs -> 10 at 50k)",
        "  holds candidate volume LINEAR: 138.1 candidates/doc at 5k ->",
        "  199.1/doc at 50k (the 1.4x per-doc drift is the ceil(log2)",
        "  occupancy granularity, bounded by 2x at any size; FIXED",
        "  7-plane tables at 50k would sit near ~1,170/doc, ~8x worse),",
        "  wall 4.66 s -> 13.94 s (3.0x on the 10x step), with 940 of",
        "  the 1,000 planted near-dup pairs recovered (94% recall at 6",
        "  tables).",
        "  Same exact-kernel caveat for `q_semantic_dedup` /",
        "  `q_semantic_decon` (decontamination additionally bounds one",
        "  side by the benchmark size, so it is linear in the corpus).",
        "- `q_setsim` / `q_source_overlap` are output-bound on this",
        "  synthetic corpus: the TRUE near-dup pair set is quadratic in",
        "  the planted duplicate groups, so any correct algorithm emits",
        "  O(n^2) rows. The prefix-filter join itself is equi-join-only",
        "  (plan-asserted in tests/test_plans.py).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
