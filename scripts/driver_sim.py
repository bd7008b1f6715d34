"""Simulate the per-round driver CORRECTNESS gate under a VANILLA
SparkSession — stock confs, NO Arrow execution enabled — because the
engine's own get_spark() turns Arrow on and that masked a real driver
failure once (round 4: numpy.float64 centroids passed createDataFrame
under Arrow but hit the non-Arrow type verifier in the driver env,
turning ivf_probe_topk red while every pytest stayed green).

Runs every queries() entry at sf0.01 and, where an oracle_sql() exists,
compares row count + sorted column names + rounded sorted values against
DuckDB — the same contract the driver records in CORRECTNESS_r{N}.json.

Usage:
    python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = 0.0 if (math.isnan(v) or v == 0) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    # Deliberately NOT web_search_engine_spark.session.get_spark: the
    # point is the driver's stock session (Arrow off by default).
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {k for k in args.only.split(",") if k}
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only OK ({len(s_rows)} rows)")
                continue
            res = con.execute(sql)
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
            ok_schema = sorted(s_cols) == sorted(d_cols)
            ok_rows = len(s_rows) == len(d_rows)
            ok_vals = ok_schema and ok_rows and (
                _norm(s_rows, s_cols) == _norm(d_rows, d_cols)
            )
            tag = "PASS" if (ok_schema and ok_rows and ok_vals) else "FAIL"
            print(
                f"{name}: {tag} rows={len(s_rows)}/{len(d_rows)} "
                f"schema={ok_schema} values={ok_vals}"
            )
            if tag == "FAIL":
                failures.append(name)
                if not ok_schema:
                    print(f"  spark cols: {sorted(s_cols)}")
                    print(f"  duck  cols: {sorted(d_cols)}")
        except Exception:
            failures.append(name)
            print(f"{name}: ERROR")
            traceback.print_exc()

    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
