"""Zipfian-vocabulary fixture probe for the posting-list-bound
operators (q_containment / q_novelty).

The driver's synthetic documents corpus draws from a ~30-word
vocabulary, which makes EVERY word 3-shingle COMMON and defeats the
rarest-first prefix filter by construction — SCALING.md documents the
resulting 4-6x probe ratios as corpus pathology, not algorithm cost.
This probe generates a corpus with a realistic Zipf rank-frequency
tail (10,000-word vocabulary, s = 1.1 — the shape of natural text per
Zipf's law) at the same document counts as sf0.01 and sf0.1 (5k and
50k docs, lengths 20-100 words), plants a quote every 50 docs so the
containment output is non-empty, and measures the same operators.
A 10x-step ratio well under the degenerate corpus's 4-6x is the
measured evidence that the prefix filter prunes as designed on
natural-shaped text.

Usage: python tools/zipf_probe.py            # prints one line per probe
"""

from __future__ import annotations

import bisect
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402

VOCAB = 10_000
ZIPF_S = 1.1
SEED = 20260815


def zipf_corpus(n_docs: int) -> list[tuple[int, str]]:
    """Deterministic Zipf-tailed corpus: doc lengths 20-100 words,
    words drawn rank-proportional to 1/r^s; every 50th doc fully
    quotes the previous doc (plus 10 fresh words) so containment has
    true positives to find."""
    rng = random.Random(SEED)
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(VOCAB)]
    cum, acc = [], 0.0
    for w in weights:
        acc += w
        cum.append(acc)

    def word() -> str:
        return f"w{bisect.bisect_left(cum, rng.random() * acc)}"

    docs: list[tuple[int, str]] = []
    for i in range(n_docs):
        if i % 50 == 25 and i > 0:
            # a full quote of the previous doc + 10 fresh words:
            # containment(prev -> this) = 1.0 by construction
            text = docs[i - 1][1] + " " + " ".join(word() for _ in range(10))
        else:
            text = " ".join(word() for _ in range(rng.randint(20, 100)))
        docs.append((i, text))
    return docs


def main() -> None:
    spark = get_spark("zipf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from kafka_streams_plumber_spark.operators.setsim import containment_join
    from kafka_streams_plumber_spark.operators.text import ngram_novelty

    sizes = {"sf0.01-equiv": 5_000, "sf0.1-equiv": 50_000}
    frames = {}
    for label, n in sizes.items():
        frames[label] = spark.createDataFrame(
            zipf_corpus(n), "doc_id long, text string"
        ).cache()
        frames[label].count()  # materialize the cache before timing

    def timed(make):
        t0 = time.time()
        df = make()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    results = {}
    for op, make in (
        ("q_containment", lambda d: containment_join(d, threshold=0.8)),
        ("q_novelty", lambda d: ngram_novelty(d)),
    ):
        # warmup (codegen) on the small corpus
        make(frames["sf0.01-equiv"]).write.format("noop").mode(
            "overwrite"
        ).save()
        small = min(timed(lambda: make(frames["sf0.01-equiv"])) for _ in range(3))
        big = min(timed(lambda: make(frames["sf0.1-equiv"])) for _ in range(3))
        n_pairs = make(frames["sf0.1-equiv"]).count()
        ratio = round(big / small, 1) if small else None
        results[op] = (small, big, ratio, n_pairs)
        print(
            f"{op}: zipf {sizes['sf0.01-equiv']}->{sizes['sf0.1-equiv']} docs "
            f"{small}s -> {big}s ratio {ratio}x (output rows at 50k: {n_pairs})"
        )

    # The decisive pruning evidence: candidate pairs the prefix filter
    # lets through per corpus shape. On the driver's ~30-word-vocab
    # corpus every shingle is common, so candidates grow ~quadratically;
    # on the Zipf corpus the rarest-first prefix keeps them near the
    # true-pair count. Candidates per doc is the comparable number.
    from kafka_streams_plumber_spark.operators.setsim import (
        _containment_candidates,
    )
    from kafka_streams_plumber_spark.plans.session import load_tables

    def cand_count(d) -> int:
        _, cand = _containment_candidates(
            d, threshold=0.8, k=3, id_col="doc_id", text_col="text",
            block_col=None,
        )
        return cand.count()

    for label, d in frames.items():
        c = cand_count(d)
        n = sizes[label]
        print(f"zipf {label} ({n} docs): candidates={c} ({c / n:.1f}/doc)")
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        if not os.path.isdir(sf_dir):
            continue
        d = load_tables(spark, sf_dir)["documents"]
        n = d.count()
        c = cand_count(d)
        print(f"degenerate {sf_dir} ({n} docs): candidates={c} ({c / n:.1f}/doc)")
    spark.stop()


if __name__ == "__main__":
    main()
