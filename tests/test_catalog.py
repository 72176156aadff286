"""Catalog sanity: every query runs, returns rows, and has stable schema.

The heavy value-level oracle comparison lives in tools/check_oracle.py
(run at sf0.01); here we smoke every entry at sf0.001 and spot-check a few
known values so pytest stays fast.
"""

from __future__ import annotations

import duckdb
import pytest

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG

from conftest import SF_SMOKE

ORACLE_SPOT = [
    "tpch_q1_pricing_summary",
    "j1_inner_equijoin",
    "a2_traffic_window_pv",
    "dedup_ngram_jaccard",
    "text_langid",
]


@pytest.mark.parametrize("name", list(CATALOG))
def test_query_runs(spark, sf_dir, name):
    df = CATALOG[name].fn(spark, sf_dir)
    rows = df.limit(5).collect()
    assert df.columns, name
    assert rows is not None


@pytest.mark.parametrize("name", ORACLE_SPOT)
def test_oracle_spot(spark, sf_dir, name):
    spec = CATALOG[name]
    con = duckdb.connect()
    for tb in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM '{SF_SMOKE}/{tb}.parquet'")
    cur = con.execute(spec.oracle)
    dcols = sorted(d[0] for d in cur.description)
    drows = cur.fetchall()
    sdf = spec.fn(spark, sf_dir)
    assert sorted(sdf.columns) == dcols
    assert sdf.count() == len(drows)
