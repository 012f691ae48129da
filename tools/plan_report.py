"""Generate PLANS.md: the physical-plan audit for representative
queries — pushdown/pruning/broadcast/codegen evidence per plan, plus
the formatted explain, so the scale claims in README are checkable
without running Spark.

Usage: python tools/plan_report.py [--sf DIR] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_plumber_spark.plans.inspect import (  # noqa: E402
    broadcast_join_count,
    codegen_span_count,
    plan_string,
    pushed_filters,
    python_eval_count,
    runtime_exchange_count,
    shuffle_count,
)
from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402
from kafka_streams_plumber_spark.queries import QUERIES  # noqa: E402

#: query -> one-line scale rationale (what the plan must show)
AUDITED = {
    "q_filter": "predicate pushdown + column pruning through the kv-struct pipeline",
    "q1_pricing": "scan-agg: partial aggregation below one exchange",
    "q3_topk": "filtered dim broadcast; revenue pre-agg below the join; TakeOrdered top-k",
    "q9_profit": "4-table star: all dims broadcast, single fact shuffle",
    "q21_waiting": "exists/not-exists decorrelated to one per-order aggregate",
    "dedup_exact": "content-hash groupBy: shuffle carries 32-byte hashes, not documents",
    "dedup_minhash": "LSH banding: shuffles carry band keys + ids; heavy arrays only for candidates",
    "sim_topk": "broadcast query side; corpus never shuffles; two-phase top-k",
    "q_percentiles": "range-partitioned parallel rank (no per-group single-task window)",
    "q_sessionize": "one shuffle on the user key; window cumsum",
    "q_train_order": "parallel global permutation: range exchange + O(P) offset broadcast",
    "q_url_canon": "pure string expressions: zero exchanges, zero Python",
    "q_matryoshka": "pure array expressions: zero exchanges, zero Python",
    "q_nb_classifier": "O(vocab) model broadcast; corpus aggregates map-side",
    "q_bpe_train": "corpus collapses to word table; per-round one-row argmax",
    "q_decontaminate": "benchmark grams broadcast; corpus scanned once, never shuffled",
    "q_pack": "shard-parallel window cumsum (n_shards bounds task size)",
    "q_kmeans": "one-row centroid broadcast per iteration; corpus never shuffles",
    "q_html_text": "HTML->text: pure regexp chain, zero exchanges, zero Python",
    "q_quality_ensemble": "per-signal parallel rank (range exchange + O(P) offsets), no single-task window",
    "q_negatives": "permutation walk: k equi-joins on 8-byte position keys",
    "q_blocklist": "broadcast anti-join on registrable domain",
    "q_pagerank": "per-round join+groupBy on contribution edges; checkpointed lineage",
    "q_bm25": "corpus shuffles once into postings; df/avgdl/query side broadcast; two-phase top-k",
    "q_cdc_upsert": "max_by change fold (map-combinable) + one full-outer equi-join",
    "q_bloom_join": "probe-side bloom predicate pre-exchange; only survivors shuffle",
    "q_outliers": "two per-group percentile aggregates + broadcast-back joins",
    "q_fim": "pure substring projection: zero exchanges, zero Python",
    "q_lr": "per-round scan, corpus never shuffled; dim-row gradient aggregate (plan shows the checkpointed final round)",
    "q_funnel": "per-stage type-filtered equi-joins; each shuffle carries one step's events",
    "q_gapfill": "distributed sequence-explode spine; one key-partitioned fill window",
    "q_setsim": "prefix-filtered candidate join (rarest tokens only) + candidate-only verify; no all-pairs",
    "q_triangles": "degree-oriented wedge equi-joins; no nested-loop closure probe",
    "q_pmi": "in-array adjacency (no posexplode self-join); vocab-sized broadcasts",
    "q_rrf": "fusion touches only top-k legs; corpus scanned by the legs once each",
    "q_cohort": "user-grain first-event join; widest shuffle carries (user, week) pairs",
    "q_rolling_z": "one key-partitioned window; exact scaled-long rolling sums",
    "q_transitions": "lead window on user key; O(#types) broadcast normalization",
    "q_ir_metrics": "metric joins touch only the top-k frame + O(queries) qrels",
    "q_funnel_window": "exact windowed funnel: feasible-set equi-joins, single-job stage counts",
    "q_attrib_last": "last-touch credit via ONE per-user range window — no join, no fan-out",
    "q_attrib_linear": "type-filtered user-keyed join; exact integer split; map-combinable aggs",
    "q_lm_ppl": "in-array bigrams; gated model broadcast; scaled-long per-doc sums",
    "q_zorder": "Morton interleave: pure shift/mask projection, zero exchanges",
    "q_dp_stats": "one grouped aggregate; noise is scalar exprs on the group frame",
    "q_expectations": "all rules ride ONE aggregate pass (single scan)",
    "q_profile": "per-column stats in one multi-distinct aggregate (single scan)",
    "q_semantic_keep": "exact pair join feeds component rounds; docs join clusters on 16-byte ids",
    "q_ab_test": "unit collapse + O(arms) agg + broadcast control row; fact never re-shuffled",
    "q_lpa": "per-round two map-combinable aggs + id/count equi-join; checkpointed lineage",
    "q_kfold": "pure hash projection: zero exchanges, zero Python",
    "q_kcenter": "per-round map-combinable argmax scan + one-row broadcast; corpus never shuffled",
    "q_ewma": "one key-partitioned window pass; explicit lag chain",
    "q_cdc_chunks": "lag-chain rolling hash + boundary cumsum on doc-key windows; order-proof reassembly",
    "q_semantic_decon": "benchmark embeddings broadcast; corpus embedded+probed in one scan",
    "q_dedup_weights": "component rounds + O(clusters) size join on 8-byte ids",
    "q_reweight": "O(strata) count agg broadcast back; fact table never shuffled",
    "q_calibration": "one map-combinable bucket agg + O(bins) total window",
    "q_l_diversity": "distinct-count combo agg + tiny rollup",
    "q_cluster_hist": "two O(clusters) rollups over the component output",
    "q_fertility": "one map-combinable aggregate over token counts",
    "q_rfm": "three parallel-rank range exchanges on the user-grain frame; O(1) count broadcast",
    "q_weighted_pct": "range sort + (pid,group)-keyed prefix window; O(PxG) offsets broadcast",
    "q_token_budget": "seeded-hash partition walk + integer prefix sums; no whole-group task",
    "q_dau_wau": "bounded grain explode (x window days) + two map-combinable distinct aggs",
    "q_kcore": "per-round degree agg + shrinking semi-joins; checkpointed lineage",
    "q_paths": "one lead-chain window on the user key + map-combinable count",
    "q_langid_eval": "one aggregate over the classification projection",
    "q_approx_pct": "one sketch+exact aggregate per group; posexplode of an O(labels) frame",
    "q_emb_drift": "posexplode -> ONE (pos,side) map-combinable agg; shuffled rows = dims x 2",
    "q_text_norm": "pure translate/regexp projection: zero exchanges, zero Python",
    "q_next_events": "one lag-chain window pass on the user key",
    "q_standardize": "O(groups) integer-moment agg broadcast back; fact scanned once, no window",
    "q_generalize": "per-level O(classes) count frames broadcast; fact scanned once",
    "q_semantic_keep_lsh": "sign-LSH bucket join (capped) + candidate-only cosine verify; no all-pairs",
    "q_funnel_both": "feasible-set equi-joins under both window bounds; single-job stage counts",
    "q_word_dropout": "pure array/hash projection: zero exchanges, zero Python",
    "q_ppl_buckets": "LM kernel + per-source tercile broadcast back; no window funnel",
    "q_lang_mix": "sentence explode + TWO map-combinable doc-keyed aggregates",
    "q_balanced_pack": "parallel length-desc rank (range exchange + O(P) offsets) + serpentine projection",
    "q_bootstrap": "explode xB -> ONE (group,replicate) map-combinable agg -> O(groups x B) quantile frame",
    "q_survival": "one user-grain min/max agg; all KM arithmetic on the O(tenure-days) frame",
    "q_neyman": "one moment agg -> O(strata) allocation broadcast back; fact scanned once",
    "q_user_growth": "user-grain min agg -> per-day rollup -> running sum on the O(days) frame",
    "q_fd": "(lhs,rhs)-distinct agg + O(distinct-lhs) rollup per check",
    "q_benford": "one map-combinable digit agg + an O(9) ordered frame",
    "q_dialogue": "one groupBy shuffle; per-key cost = its own event count (inherent to sequence construction)",
    "q_containment": "asymmetric prefix-filter candidates + candidates-only verify; never all-pairs",
    "q_heaps": "explode + map-combinable first-occurrence min; cumsums + OLS on the O(checkpoints) frame",
    "q_assoc": "distinct-basket self-join bounded by the item vocabulary; O(types^2) output",
    "q_kappa": "one count agg + two O(classes) marginal aggs; integer pe numerator",
    "q_jsd": "O(groups x values) probability spine; scaled-long per-pair sums",
    "q_rbo": "entry-depth equi-join + O(k)-bounded per-key window",
    "q_forget": "broadcast anti-join purge; audit counts ride the same scan",
    "q_novelty": "shingle explode + min-agg + one key join; O(total shingles), no pairwise stage",
    "q_auc": "distinct-score collapse (6-dp quantized); cumulative window on the O(scores) frame",
    "q_adamic": "center-keyed wedge join with hub cap; scaled-long 1/ln sums",
    "q_qnorm": "per-group rank window + range-partitioned pooled rank + one 8-byte index equi-join",
    "q_mase": "one (key,bucket) map-combinable agg + two bucket-key self-equi-joins + O(keys) rollup",
    "q_corr": "ALL pairs ride ONE map-combinable aggregate; decimal(38) moment sums; O(k^2) unpivot",
    "q_chi2": "one (a,b) count agg + O(R)+O(C) marginals + O(RxC) spine",
    "q_gini": "range-partitioned per-group rank (no per-source window) + O(groups) rollup",
    "q_robust": "quantile_cont-parity bounds broadcast back; data never shuffles for the join",
    "q_ngrams": "map-combinable shingle DF agg + two-phase top-k prune (no per-source window)",
    "q_min_k": "shared gated-broadcast LM scoring core + per-doc bounded tail window",
    "q_emb_diversity": "seeded md5 pairing via range-partitioned rank; O(n) — never a self-join",
    "q_cluster_agree": "one contingency agg + marginal rollups; all later frames cluster-vocabulary-sized",
    "q_vocab_cov": "distributed prefix sum (range exchange + O(P) offsets) — no unpartitioned vocab window",
    "q_ks": "distinct-value collapse + distributed prefix sums; integer gap numerator, one final division",
    "q_centroid_sim": "one token explode + (group,bucket) agg; pair join on the O(groups x dim) frame only",
    "q_bestthr": "distinct-score collapse + descending distributed prefix sums; two-pass argmax",
    "q_gains": "range-partitioned global rank + integer bin cut; cumulative columns on the O(bins) frame",
    "q_theils_u": "one contingency agg + O(levels) marginals; everything later level-vocabulary-sized",
    "q_bh": "rank + suffix-min both on O(panel) frames via range exchanges; one broadcast cutoff. Compile 17 = branch duplication: post-AQE 11 materialized stages (5 reused refs) — under the r6 <=~14 target",
    "q_split_leakage": "LSH band-key shuffles + capped buckets; split labels join as narrow (id,split) frames",
    "q_krippendorff": "two map-combinable aggregates to O(units)/O(categories) grains; three tiny broadcast joins",
    "q_krippendorff_interval": "variance identity collapses pairwise walk to per-unit scaled-long moments; broadcast totals",
    "q_stl": "O(period) phase-median broadcast; two single-row median/MAD broadcasts; pure column math between",
    "q_acf": "lag pairs via ONE equi-join on the shifted bucket index (never a range join); map-combinable per-lag moments",
    "q_fleiss": "ratings -> per-unit category counts -> integer terms; O(categories) marginals; single-row broadcasts",
    "q_cronbach": "per-item and per-unit moment aggregates, both map-combinable; O(items) completeness broadcast",
    "q_t_closeness": "O(categories) marginal broadcast; absent-mass closed form avoids combo x category cross-join",
    "q_graph_jaccard": "center-keyed wedge equi-join (hub-cappable); O(V) degree joins; integer ratio divided once",
    "q_ph": "two fused running_agg passes (sum+pos, then sum+min_of_sum in ONE exchange each); no other shuffles",
    "q_ad": "distinct-grain fused prefix for midranks; ranked harmonic prefix + mirrored-index equi-join for sigma. Compile 55 is reused-branch double-counting: post-AQE 30 stages (14 reused refs), all on the tiny distinct-value grain",
    "q_trendbreak": "one exact-percentile broadcast + ONE grouped-moments aggregate over the two segments",
    "q_by": "same fused rank+suffix-min exchange as q_bh; harmonic c(m) is an aggregate on the ranked frame. Compile 32 -> post-AQE 14 stages (9 reused refs)",
    "q_stl_strength": "decompose plan + ONE map-combinable moments aggregate; nothing new shuffles",
    "q_runs": "broadcast center; parallel rank + ONE narrow rank+1 self equi-join; map-combinable counts",
    "q_acf_by_type": "per-(group,lag) moments; shifted-key equi-join; O(groups) moments frame broadcast back",
    "q_stl_runs": "pure composition: decompose residuals feed the runs-test rank + rank+1 join. Compile 69 (fattest registered) is branch duplication of the reused decompose subtree: post-AQE 21 stages (13 reused refs), runtime probe 0.9x on the 10x step",
    "q_stl_by_type": "per-group phase/level/MAD medians on O(groups) grains joined back; pure column math between",
    "q_krippendorff_ordinal": "O(categories) rank-score cumsum broadcast back; then the interval moment machinery",
    "q_cusum": "O(days) grain after one agg; prefix sum + prefix min ride range exchanges with O(P) offsets",
    "q_spearman": "distinct-value collapse per column + running_total ranks; one map-combinable moment aggregate",
    "q_fightin": "one token explode to an O(vocab) grain; broadcast totals; two-phase top-k prune",
    "q_mannwhitney": "distinct-value collapse + running_total cumulative counts; one final aggregate",
    # r8 wave
    "q_psi_drift": "one (feed,day,bin) count; observed-grid fill; ONE range-frame baseline window on the tiny grain",
    "q_fertility_mix": "ONE map-combinable aggregate; tokenize/count per-row codegen (size(), no explode)",
    "q_hist_drift": "psi_drift's staging + two bin-ordered cumsum windows keyed by (feed, day); exact integer sup",
    "q_vocab_drift": "distinct (token, day) grain; ONE range-frame count window on the token key; day rollup",
    "q_dup_drift": "map-side collapse to (digest, day) counts; ONE range-frame window on the digest; day rollup",
    "q_quantile_drift": "exact_percentiles' parallel rank per (feed, day) + ONE range-frame window on the day grain",
    "q_bootstrap_ci": "xB widening projection collapsed map-side to <= B rows/partition; all stats on the B-row frame",
    # r8 wave 2 (agreement / k-sample / graph / sketch / text)
    "q_cohen_kappa": "k^2-bounded confusion grain; label-index window on the k-row label frame only; broadcast marginal cross",
    "q_mcnemar": "ONE map-combinable conditional-count aggregate; no join, no window",
    "q_kendall_w": "(rater,score) distinct grain; ONE fused range exchange + O(raters) offsets; ratings join the tie-block grain",
    "q_kruskal": "distinct-value collapse + running_total doubled midranks; k-row group aggregate with 1-row totals broadcast",
    "q_anova": "ONE map-combinable scaled-long moment aggregate to the k-row group grain",
    "q_brown_forsythe": "exact_percentiles parallel-rank medians broadcast back; then the one-aggregate ANOVA core",
    "q_hits": "per round two map-combined contribution shuffles + 1-row max broadcast; lineage truncated between rounds",
    "q_kendall": "dense quantized cell grid; three running_total range exchanges + per-group offsets; NO quadratic pair join",
    "q_cochran": "two map-combinable aggregates (per-item, 1-row) + O(k) treatment aggregate broadcast in",
    "q_hll": "map-combinable max per (group,bucket) — <= 2^p rows/group however large the input; integer harmonic sum",
    "q_tfidf_keywords": "explode -> (doc,term) counts; O(vocab) df joined on term; 1-row N broadcast; two-phase top-k prune",
    "q_icc": "(item,rater) collapse; per-item aggregate; O(k) rater aggregate broadcast — never self-joined",
    "q_cohens_d": "ONE conditional-sum aggregate; divisions cleared to exact integer moments",
    "q_class_report": "k^2-bounded confusion grain; O(k) marginals full-outer-joined on the class key",
    "q_ohlc": "ONE map-combinable (key,bucket) aggregate; struct-min/max open/close, no windows/joins",
    "q_logrank": "distinct-duration collapse; suffix at-risk counts off ONE fused prefix pass; 1e-9 frozen terms",
    "q_cmh": "ONE conditional-count aggregate to the stratum grain; 1e-9 frozen fractional terms; 1-row final",
    "q_jt": "kendall_tau 2D-prefix grid (no O(k^2) sweep); exact integer 2J; O(k)/O(values) tie aggregates",
    "q_readability": "pure codegen regexp counts + two fixed-shape doubles: zero exchanges, zero Python",
    "q_brier": "distinct-forecast collapse + 1-row totals broadcast; frozen e^2/n, f^2/n quotients; exact integer BS",
    "q_pacf": "one autocorrelation pass; Durbin-Levinson runs on the pivoted O(1)-row ACF frame, level-materialized",
    "q_isotonic": "d^2 interval table off ONE fused prefix pass; suffix-min/prefix-max windows bounded by d, not data",
    "q_jarque_bera": "two map-combinable passes + k-row pivot broadcast; exact integer d^1..d^4 moments, no window",
    "q_cvm": "distinct-value grain; ONE fused prefix exchange for both cumulative counts; exact integer gap device",
    "q_mood_median": "one percentile range exchange + 1-row median broadcast; frozen chi-square terms, k-row fold",
    "q_friedman": "within-block midranks off ONE global range exchange with per-block offsets; all-integer Q identity",
    "q_welch": "ONE map-combinable aggregate to two rows; exact integer (n,S,Q) moments; fixed-shape double tail",
    "q_dw": "shifted-index equi-join on the bounded hourly grain; exact integer diff/cleared-mean moments",
    "q_theil_sen": "O(B^2) pair join ON THE COLLAPSED hourly grain only; frozen slopes; percentile range exchange",
    "q_avg_precision": "distinct-score grain; ONE descending fused prefix pass; frozen per-threshold contributions",
    "q_mcc": "k^2-bounded confusion grain; O(k) full-outer marginals; all-integer R_K moments, one sqrt",
    "q_assortativity": "edge dedup + degree agg + two equi-joins of the O(V) degree table; exact integer moments",
    "q_ccf": "shifted-index equi-join per lag on the bounded hourly grain; n^2-cleared exact cross-moments",
    "q_prop_test": "ONE conditional-count aggregate to two rows; fixed-shape pooled-z tail",
    "q_gof": "count aggregate joined onto a broadcast O(k) literal spine; frozen chi-square terms",
    "q_cliffs_delta": "distinct-value grain + ONE prefix pass; exact integer doubled dominance count",
    "q_bartlett": "ONE aggregate to k rows; frozen per-group log terms summed as exact integers",
    "q_qq": "both groups' deciles in ONE exact-percentile range exchange; O(1) pivot",
    "q_lexdiv": "token-grain collapse (map-side combine absorbs the Zipf head) + one group aggregate; integer spectrum moments",
    "q_clustering": "hub-capped wedge join reused from triangles; O(V) degree broadcast; frozen local ratios",
    "q_cochran_armitage": "ONE aggregate to the k-score grain; integer identity clears the pooled rate; one sqrt",
    "q_hhi": "one (group, category) collapse + one group aggregate; integer count moments",
    "q_mann_kendall": "bounded-grain pair join for exact integer S; tie terms off a (group, value) collapse",
    "q_wilson": "ONE conditional-count aggregate to k rows; fixed-shape Wilson interval",
    "q_chao": "token-grain collapse + one group aggregate; integer V/V1/V2 spectrum counts",
    "q_dunn": "kruskal machinery (collapse + ONE prefix pass) then a k x k self-join on the tiny group table",
    "q_partial_corr": "ONE aggregate to a single 10-moment row; fixed-shape double tail",
    "q_smk": "phase-keyed pair join (B^2/period on the collapsed grain); per-season integer kernels",
    "q_ljung_box": "ONE autocorrelation pass; frozen r^2/(n-k) terms; O(h)-row fold",
    "q_sen_seasonal": "phase-keyed bounded pair join; pooled exact-percentile median of frozen slopes",
}


def _collapse_literals(plan: str) -> str:
    """Giant array literals (bloom words, LSH hyperplanes) ship inside
    the plan by design; collapse them so the audit stays readable."""
    import re

    def shorten(m: re.Match) -> str:
        body = m.group(0)
        n = body.count(",") + 1
        return f"[..{n}-element literal..]"

    plan = re.sub(
        r"\[(?:-?\d+(?:\.\d+(?:E-?\d+)?)?,){32,}[^\]]*\]", shorten, plan
    )
    # literal control chars (e.g. the \x01 BPE split marker) would make
    # the generated markdown a "binary" file for grep — escape them
    return re.sub(
        r"[\x00-\x08\x0b-\x1f]",
        lambda m: f"\\x{ord(m.group(0)):02x}",
        plan,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated by `tools/plan_report.py` at sf dir `{args.sf}` "
        "(plan SHAPE is data-independent; AQE may further coalesce at runtime).",
        "",
        "`shuffles` counts COMPILE-TIME Exchange nodes: a plan that",
        "broadcasts several scalar aggregates of the same subtree (q_ad,",
        "q_by, q_bh, q_stl_runs) counts that subtree's exchanges once",
        "per branch. `post-AQE` is the count of DISTINCT materialized",
        "ShuffleQueryStage ids after EXECUTING the plan — the shuffles",
        "the cluster actually paid for, with ReuseExchange/AQE stage",
        "reuse deduped (`reused` = ReusedExchange references, shuffle +",
        "broadcast). A compile count far above the post-AQE count is",
        "branch double-counting of reused subtrees, not repeated work.",
        "post-AQE can slightly exceed compile for plans with scalar",
        "subqueries: a subquery's stages materialize separately and",
        "don't print as Exchange nodes in the compiled main plan.",
        "",
        "| query | shuffles | post-AQE | reused | broadcast joins | codegen spans | python evals | pushed filters |",
        "|---|---|---|---|---|---|---|---|",
    ]
    details = []
    for name, why in AUDITED.items():
        df = QUERIES[name](spark, args.sf)
        # compile-time metrics FIRST: executing the plan (which the
        # runtime/codegen metrics do) stringifies BOTH the final and
        # the initial plan, doubling naive node counts
        pf = pushed_filters(df)
        comp_sh = shuffle_count(df)
        comp_bj = broadcast_join_count(df)
        comp_pe = python_eval_count(df)
        ptxt = _collapse_literals(plan_string(df).strip())[:4000]
        cg = codegen_span_count(df)  # collects when AQE — keep before rt
        rt, reused = runtime_exchange_count(df)
        lines.append(
            f"| `{name}` | {comp_sh} | {rt} | {reused} "
            f"| {comp_bj} | {cg} | {comp_pe} "
            f"| {len(pf)} |"
        )
        details += [
            "",
            f"## {name}",
            "",
            f"**Scale rationale:** {why}",
            "",
            "```",
            ptxt,
            "```",
        ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines + details) + "\n")
    print(f"wrote {args.out} ({len(AUDITED)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
