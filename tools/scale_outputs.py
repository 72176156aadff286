#!/usr/bin/env python3
"""Output-cardinality companion to the scale ladder: for queries whose
wall time scales super-linearly, measure how the RESULT SET scales on
the same replica points.  A pair-enumeration operator (jaccard pairs,
cosine all-pairs) whose output itself grows ~quadratically is
output-bound — time/output-row flat means the PLAN is linear in work;
the scale path for those semantics is the capped/LSH/top-k variant,
which the ladder carries separately.

Usage: python tools/scale_outputs.py q1 q2 ... [--points sf0.1,sf1]
Prints one JSON line {query: {point: rows}}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG  # noqa: E402
from flink_realtime_dw4_0_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    points = ["sf0.1", "sf1"]
    if "--points" in sys.argv:
        points = sys.argv[sys.argv.index("--points") + 1].split(",")
    root = os.environ.get("SPARK_GRAFT_REPLICA_ROOT", "/tmp/sfrep")
    spark = get_spark("scale-outputs")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for name in args:
        out[name] = {}
        for p in points:
            d = os.path.join(root, p)
            out[name][p] = CATALOG[name].fn(spark, d).count()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
