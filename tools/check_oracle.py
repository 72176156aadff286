"""Local replica of the driver's correctness gate.

Runs every CATALOG query on Spark and its DuckDB oracle side-by-side,
compares row count, column names, and an order-insensitive value
comparison (columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG
from flink_realtime_dw4_0_spark.session import get_spark

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for tb in TABLES:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name, spec in CATALOG.items():
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows-only, {len(srows)} rows")
            continue
        try:
            cur = con.execute(spec.oracle)
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = norm_rows(scols, [tuple(r) for r in srows])
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns {sc} vs {dc}")
            failures += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount {len(sr)} vs {len(dr)}")
            failures += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diff}")
            failures += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
