"""Per-stage profile of one query: runs it isolated (construction +
noop write, like the eager-aware bench path), then dumps every stage's
duration, task count and shuffle bytes from the UI REST API — the
evidence the optimization guide (§1, §7.1) says to collect before
touching a plan.

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_plumber_spark.plans.session import get_spark  # noqa: E402
from kafka_streams_plumber_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        QUERIES[name](spark, warm).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    # stages before the measured run, to subtract warmup
    before = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
        )
    }

    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    t1 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.time()
    print(f"construction: {t1 - t0:.3f}s  write: {t2 - t1:.3f}s  total: {t2 - t0:.3f}s")

    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    rows = []
    for s in stages:
        if s["stageId"] in before or s["status"] == "SKIPPED":
            continue
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        dur = "?"
        if sub and comp:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = (
                datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
            ).total_seconds()
        rows.append(
            (
                s["stageId"],
                dur,
                s["numCompleteTasks"],
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("inputBytes", 0),
                (s.get("name") or "")[:80],
            )
        )
    rows.sort(key=lambda r: (r[1] if isinstance(r[1], float) else 0), reverse=True)
    print(f"{'stage':>6} {'sec':>8} {'tasks':>6} {'shRead':>10} {'shWrite':>10} {'input':>10}  name")
    for r in rows:
        d = f"{r[1]:.3f}" if isinstance(r[1], float) else r[1]
        print(f"{r[0]:>6} {d:>8} {r[2]:>6} {r[3]:>10} {r[4]:>10} {r[5]:>10}  {r[6]}")
    n_meas = len(rows)
    tot = sum(r[1] for r in rows if isinstance(r[1], float))
    print(f"stages: {n_meas}  sum(stage seconds, incl overlap): {tot:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
