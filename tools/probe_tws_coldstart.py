#!/usr/bin/env python3
"""TWS cold-start-tax probe (r10 judge item #6): transformWithState
launches a state server when a query starts, which makes short-lived
``availableNow`` replays pay a fixed tax that ``applyInPandasWithState``
does not (r10 measured ratelimit TWS wall throughput at 41% of apply on
short jobs even after steady-state flips won).  The open question:
is the tax PER QUERY (each availableNow run pays it again) or PER
SESSION (the second tws query in one JVM amortizes it)?

Method: in ONE fresh JVM, run the same tiny availableNow visitor-fix
job N times per impl (fresh checkpoint + sink each run, identical
μ-batch), and print every wall time.  Reading the result:

  * tws run 1 >> tws runs 2..N ≈ apply runs → the tax is per-SESSION
    (python-worker + proto import warmth dominates); long sessions
    amortize it and the `auto` default is fine even for replay fleets
    that reuse a session.
  * tws runs 1..N all >> apply runs → the tax is per-QUERY (the state
    server relaunches every run); the documented guidance stands —
    short-lived availableNow replays should pin impl='apply'.

Usage: python tools/probe_tws_coldstart.py [N_RUNS]
Prints one JSON line {"apply": [...], "tws": [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_dw4_0_spark.operators.state import visitor_fix  # noqa: E402
from flink_realtime_dw4_0_spark.session import get_spark  # noqa: E402


def run_once(spark, src_dir: str, impl: str, tmp: str, tag: str) -> float:
    out = os.path.join(tmp, f"out_{tag}")
    ck = os.path.join(tmp, f"ck_{tag}")
    stream = (
        spark.readStream.schema(
            "mid string, event_id long, ts long, is_new string"
        ).json(src_dir)
    )
    t0 = time.perf_counter()
    q = (
        visitor_fix(stream, impl=impl)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tmp = tempfile.mkdtemp(prefix="tws_coldstart_")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    with open(os.path.join(src, "f0.json"), "w") as fh:
        for i in range(200):
            fh.write(json.dumps({
                "mid": f"m{i % 20}", "event_id": i,
                "ts": 1_700_000_000_000 + i * 1000, "is_new": "1",
            }) + "\n")

    spark = get_spark("tws-coldstart-probe")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, list[float]] = {"apply": [], "tws": []}
    try:
        # apply first: its runs double as the JVM/stream-machinery
        # warm-up, so tws run 1 isolates the state-server launch
        for impl in ("apply", "tws"):
            for i in range(n_runs):
                times[impl].append(
                    run_once(spark, src, impl, tmp, f"{impl}{i}"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(times))


if __name__ == "__main__":
    main()
