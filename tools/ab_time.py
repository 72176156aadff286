"""Paired A/B timing helper for optimization rounds.

Times the named catalog queries exactly like bench.py's extras section
(noop sink, cache cleared + GC + settle before EVERY rep, min-of-N) and
brackets them with a tpch_q1 canary so runs from different host phases
can be normalized.  Prints ONE JSON line.

Usage:  python tools/ab_time.py <query> [<query> ...]
Env:    AB_REPS (default 3), SPARK_GRAFT_SF_DIR (default sf0.1).

The A/B protocol: alternate runs of this script between the old and new
tree (git stash pop/push), compare per-query minima normalized by the
in-run canary, and judge by the median of the paired ratios — never by
raw seconds across sessions (host co-tenant phase, see ROUND11.md §8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG
from flink_realtime_dw4_0_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("AB_REPS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-time")
    spark.sparkContext.setLogLevel("ERROR")
    for n in [*names, "tpch_q1_pricing_summary"]:  # codegen warm-up
        try:
            CATALOG[n].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001 — warmup is best-effort
            pass

    def once(n: str) -> float:
        t0 = time.perf_counter()
        CATALOG[n].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def cold(n: str) -> list[float]:
        rs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)
            rs.append(round(once(n), 3))
        return rs

    out: dict = {"sf_dir": sf_dir}
    out["canary"] = cold("tpch_q1_pricing_summary")
    for n in names:
        out[n] = cold(n)
    out["canary_end"] = cold("tpch_q1_pricing_summary")
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
