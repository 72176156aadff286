"""Headline benchmark: runs the bench-tagged catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is fully materialized via the noop sink (forces every column's
computation, unlike count()).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG  # noqa: E402
from flink_realtime_dw4_0_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, s in CATALOG.items() if s.bench]
    # Warm up codegen/JIT for every headline plan at the smallest SF first
    # (compiling the generated code costs seconds and is a one-time JVM
    # cost, not a property of the engine at scale), then measure at the
    # target SF.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            CATALOG[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_bench_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
