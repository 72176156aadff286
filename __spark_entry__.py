"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query at sf0.001 (smoke check).
queries()    — one entry per implemented operator from SURVEY.md §2 +
               the training-data-pipeline extensions (dedup / similarity /
               text / multimodal).
oracle_sql() — DuckDB twin for every SQL-expressible query (same aliases,
               deterministic values).  Approximate/stateful ops omit the
               oracle → rows-only check.

The real implementation lives in flink_realtime_dw4_0_spark/; this module
is a thin adapter over plans/catalog.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the DWS province-order rollup (orders ⋈ customer ⋈
    broadcast nation → monthly windowed agg) on sf0.001."""
    return CATALOG["a8_province_order_window"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in CATALOG.items() if spec.oracle}
