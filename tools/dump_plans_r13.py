"""Dump .explain('formatted') for named catalog queries into
plans/r13/<query>_<suffix>.txt — the before/after plan evidence for the
round-12 optimization pass.

Usage: python tools/dump_plans_r13.py <suffix> <query> [<query> ...]
       python tools/dump_plans_r13.py <suffix> --bench   (all bench-tagged)

The suffix is 'before' or 'after'.  Plans are captured at the bench SF
(SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1) with the exact session
the bench uses, so Exchange counts / join strategies / PushedFilters in
the files match what bench.py times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_dw4_0_spark.plans.catalog import CATALOG
from flink_realtime_dw4_0_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if names == ["--bench"]:
        names = [n for n, s in CATALOG.items() if s.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans-r13")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
