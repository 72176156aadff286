"""Query-runner CLI: execute any catalog query by name.

    python -m flink_realtime_dw4_0_spark.run <query> [sf_dir] [--explain] [-n N]
    python -m flink_realtime_dw4_0_spark.run --list [tag]

The ergonomic entry a reference user needs on day one: every operator in
`plans/catalog.py` is runnable (and explainable) without writing a line
of PySpark.  `--explain` prints the formatted physical plan instead of
rows — the first thing to check before pointing a query at 100 TB.
"""

from __future__ import annotations

import sys

from .plans.catalog import CATALOG
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if not args or args[0] in ("-h", "--help"):
        print(__doc__.strip())
        return 0
    if args[0] == "--list":
        tag = args[1] if len(args) > 1 else None
        for name, spec in sorted(CATALOG.items()):
            if tag is None or tag in spec.tags:
                oracle = "oracle" if spec.oracle else "rows-only"
                print(f"{name:45s} {oracle:9s} tags={','.join(spec.tags)}")
        return 0

    name = args.pop(0)
    if name not in CATALOG:
        import difflib

        close = difflib.get_close_matches(name, CATALOG, n=3)
        print(f"unknown query {name!r}" + (f"; did you mean: {', '.join(close)}" if close else ""))
        return 2
    explain = "--explain" in args and (args.remove("--explain") or True)
    n = 20
    if "-n" in args:
        i = args.index("-n")
        if i + 1 >= len(args):
            print("usage: -n requires a row count (e.g. -n 50)")
            return 2
        try:
            n = int(args[i + 1])
        except ValueError:
            print(f"usage: -n requires an integer row count, got {args[i + 1]!r}")
            return 2
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    spark = get_spark("run")
    spark.sparkContext.setLogLevel("ERROR")
    df = CATALOG[name].fn(spark, sf_dir)
    if explain:
        df.explain("formatted")
    else:
        df.show(n, truncate=False)
        print(f"({df.count()} rows total)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
