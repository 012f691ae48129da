"""Isolated re-measure for EAGER queries (construction + write), the
run_one_full twin of tools/remeasure.py: iterative operators (semantic
dedup's connected components, HITS) materialize during construction, so
write-only timing would credit them with near-zero cost.

One fresh SparkSession per query, sf0.001 codegen warmup, N full reps.
``name=sf_dir`` overrides the measured scale per query (e.g.
``q_semantic_keep_lsh=/root/testdata/sf0.01`` — the bench's capped SF).

Usage: python tools/remeasure_full.py q_hits q_semantic_keep_lsh=/root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402
from kafka_streams_plumber_spark.queries import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))


def main() -> None:
    out: dict[str, dict] = {}
    for arg in sys.argv[1:]:
        name, _, sf = arg.partition("=")
        sf_dir = sf or SF_DIR
        load1 = os.getloadavg()[0]
        spark = get_spark(f"remeasure-full-{name}")
        spark.sparkContext.setLogLevel("ERROR")
        if os.path.isdir(WARM_DIR):
            QUERIES[name](spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        reps = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.time() - t0, 3))
        spark.stop()
        out[name] = {
            "reps": reps,
            "min": min(reps),
            "sf_dir": sf_dir,
            "load1_before": round(load1, 2),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
