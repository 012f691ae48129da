"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive values.

Usage:
    python tools/check_correctness.py [--sf DIR] [--queries a,b,c]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from kafka_streams_plumber_spark.plans.session import TABLES, get_spark


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    import datetime

    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    try:
        from pyspark.sql import Row

        if isinstance(v, Row):
            return tuple(sorted((k, normalize(x)) for k, x in v.asDict().items()))
    except Exception:
        pass
    if isinstance(v, dict):
        return tuple(sorted((k, normalize(x)) for k, x in v.items()))
    return v


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: rows may mix None with values, which plain tuple
    # comparison can't order
    return sorted(
        (tuple(normalize(r[i]) for i in order) for r in rows), key=repr
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--queries", default=None)
    ap.add_argument(
        "--json",
        default=None,
        help="write per-query results (driver CORRECTNESS format) to this path",
    )
    args = ap.parse_args()
    results: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries.split(",") if args.queries else list(qs)

    failures = 0
    for name in names:
        t0 = time.time()
        rec = results[name] = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            rec["err"] = f"spark: {type(e).__name__}: {e}"
            failures += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            rec["err"] = "no_oracle"
            continue
        try:
            # the driver materializes DuckDB results via pandas, which
            # reads HUGEINT (the silent result type of window sums over
            # BIGINT) as float64 — so a HUGEINT column hash-diverges at
            # the driver even when the local fetchall() (python ints)
            # compares equal. Flag it as a failure here.
            hugeint = [
                (r[0], r[1])
                for r in con.execute(
                    f"DESCRIBE {oracles[name]}"
                ).fetchall()
                if "HUGEINT" in r[1]
            ]
            if hugeint:
                print(f"FAIL  {name}: oracle emits HUGEINT cols {hugeint}"
                      " (driver reads them as float64 — add CAST)")
                rec["err"] = f"oracle_hugeint: {hugeint}"
                failures += 1
                continue
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"
            failures += 1
            continue
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if not rec["schema_match"]:
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures += 1
            continue
        rec["rows_match"] = len(srows) == len(orows)
        if not rec["rows_match"]:
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            failures += 1
            continue
        s = rowset(scols, srows)
        o = rowset(ocols, orows)
        rec["hash_match"] = s == o
        if not rec["hash_match"]:
            diff = next(
                (i for i, (a, b) in enumerate(zip(s, o)) if a != b), None
            )
            print(f"FAIL  {name}: values differ; first diff at sorted idx {diff}:")
            if diff is not None:
                print(f"      spark : {s[diff]}")
                print(f"      duckdb: {o[diff]}")
            failures += 1
            continue
        print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - failures}/{len(names)} queries pass")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
