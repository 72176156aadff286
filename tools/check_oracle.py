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


def _kind_spark(dt: str) -> str:
    """Canonical type kind for a Spark dtype string.  Integer widths are
    kept distinct because the driver's value hash does not collapse
    width differences (the r3 dedup_simhash INT-vs-HUGEINT lesson)."""
    d = dt.lower()
    if d in ("tinyint", "byte"):
        return "i8"
    if d in ("smallint", "short"):
        return "i16"
    if d in ("int", "integer"):
        return "i32"
    if d in ("bigint", "long"):
        return "i64"
    if d == "float":
        return "f32"
    if d == "double":
        return "f64"
    if d.startswith("decimal"):
        return "dec"
    if d.startswith("array"):
        return "array"
    if d.startswith("struct"):
        return "struct"
    if d.startswith("map"):
        return "map"
    if d.startswith("timestamp"):
        return "ts"
    return d  # string / boolean / date / binary


def _kind_arrow(t) -> str:
    """Canonical type kind for a pyarrow type from the DuckDB oracle.
    NOTE duckdb's HUGEINT (what every un-cast sum() returns) arrives as
    decimal128(38,0) — kind 'dec' — so an oracle sum() whose Spark twin
    is an integer column is flagged here even though stringified values
    agree."""
    import pyarrow as pa

    if pa.types.is_int8(t):
        return "i8"
    if pa.types.is_int16(t):
        return "i16"
    if pa.types.is_int32(t):
        return "i32"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "i64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_decimal(t):
        return "dec"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def type_mismatches(scols, sdtypes, oracle_arrow_schema):
    """Columns whose canonical kind differs between the Spark result and
    the DuckDB oracle result.  These hash-mismatch in the driver even
    when stringified values agree."""
    sk = {c: _kind_spark(d) for c, d in sdtypes}
    out = []
    for field in oracle_arrow_schema:
        if field.name not in sk:
            continue
        ok = _kind_arrow(field.type)
        if sk[field.name] != ok:
            out.append((field.name, sk[field.name], ok))
    return out


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
            atbl = con.execute(spec.oracle).arrow()
            dcols = atbl.schema.names
            drows = [tuple(r.values()) for r in atbl.to_pylist()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        tmis = type_mismatches(scols, sdf.dtypes, atbl.schema)
        if tmis:
            print(f"FAIL  {name}: type kind mismatch (spark vs oracle): {tmis}")
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
