"""TWS default-flip gate for the remaining `impl='apply'` families —
the r9 judge's top item: the CEP machines (`cep_seq`, `cep_pattern_loop`,
`mr_nested`, `combinations`) and `visitor_fix` have TWS twins with
equivalence + restart coverage, but the repo's own flip policy
(ROUND9.md §6) requires a family-specific A/B before a default flips.

Gate protocol, hardened against the observed ±30% single-run variance
(r9 "What's wrong" #4): **best-of-3 FRESH-JVM sessions per side**,
steady-state throughput **canary-normalized** inside each session
(rows/s × that session's tpch_q1 seconds = rows per one-canary of this
machine's compute — machine- and load-invariant), flip at
parity-or-better (best-of-3 tws ≥ 0.95 × best-of-3 apply, normalized).

Usage:
    python tools/bench_tws_flip.py                 # full gate → BENCH_TWS_FLIP.json
    python tools/bench_tws_flip.py --one FAMILY IMPL   # child: one fresh-JVM run

Each child process is one session: JVM start, unmeasured warm-up drive,
one measured drive (availableNow, parquet sink, steady rows/s from the
batch progress series, first batch excluded), then the canary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = ("visitor_fix", "cep_seq", "cep_pattern_loop", "combinations",
            "mr_nested")
SESSIONS = int(os.environ.get("SPARK_GRAFT_FLIP_SESSIONS", "3"))
PARITY = 0.95  # flip at parity-or-better: tws >= PARITY * apply


def _write_src(tmp: str, rows: list[dict], files: int = 6) -> str:
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    per = len(rows) // files
    for fi in range(files):
        path = os.path.join(src, f"f{fi}.json")
        with open(path, "w") as fh:
            for r in rows[fi * per:(fi + 1) * per]:
                fh.write(json.dumps(r) + "\n")
        os.utime(path, (1_000_000 + fi * 10, 1_000_000 + fi * 10))
    return src


def _drive(spark, out_df, tmp: str, n_rows: int, files: int, max_files: int):
    from bench import _progress_series, _steady_rows_per_sec

    t0 = time.perf_counter()
    q = (
        out_df.writeStream.format("parquet")
        .option("path", os.path.join(tmp, "out"))
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(600)
    dt = time.perf_counter() - t0
    per = n_rows // files
    series = _progress_series(q, [per * max_files] * (files // max_files))
    return {
        "rows": n_rows,
        "sec": round(dt, 3),
        "rows_per_sec": int(n_rows / dt),
        "batches": series,
        "steady_rows_per_sec": _steady_rows_per_sec(series),
    }


# --- family stream builders -------------------------------------------------
# Each returns (output DataFrame, n_rows, files, max_files).  Event mixes
# are chosen so the machines do real work: partials advance, loops run,
# matches complete — not an all-anchor or all-noise degenerate stream.

def _mk_events(tmp, n, keys, mk_row, files=6):
    day_ms = 1_700_000_000_000
    rows = [mk_row(i, f"u{i % keys}", day_ms + i * 5) for i in range(n)]
    return _write_src(tmp, rows, files)


def _family_visitor_fix(spark, tmp, impl):
    from flink_realtime_dw4_0_spark.operators.state import visitor_fix

    n, keys, files, max_files = 240_000, 4000, 6, 2
    src = _mk_events(
        tmp, n, keys,
        lambda i, k, ts: {"mid": k, "event_id": i, "ts": ts,
                          "is_new": "1" if i % 3 else "0"},
        files,
    )
    stream = spark.readStream.schema(
        "mid string, event_id long, ts long, is_new string"
    ).option("maxFilesPerTrigger", max_files).json(src)
    return visitor_fix(stream, impl=impl), n, files, max_files


_ETYPES = ("A", "B", "C", "X")


def _cep_src(spark, tmp, n, keys, files, max_files):
    src = _mk_events(
        tmp, n, keys,
        lambda i, k, ts: {"user_id": k, "ts": ts, "event_id": i,
                          "event_type": _ETYPES[(i * 2654435761) % 4]},
        files,
    )
    return spark.readStream.schema(
        "user_id string, ts long, event_id long, event_type string"
    ).option("maxFilesPerTrigger", max_files).json(src)


def _family_cep_seq(spark, tmp, impl):
    from pyspark.sql import functions as F

    from flink_realtime_dw4_0_spark.streaming.cep import match_sequence_stream

    n, keys, files, max_files = 120_000, 3000, 6, 2
    stream = _cep_src(spark, tmp, n, keys, files, max_files)
    out = match_sequence_stream(
        stream,
        [("a", F.col("event_type") == "A"),
         ("b", F.col("event_type") == "B"),
         ("c", F.col("event_type") == "C")],
        within="10 minutes", watermark="5 seconds",
        event_id="event_id", impl=impl,
    )
    return out, n, files, max_files


def _family_cep_pattern_loop(spark, tmp, impl):
    from pyspark.sql import functions as F

    from flink_realtime_dw4_0_spark.streaming.cep_pattern import (
        match_pattern_stream,
    )

    n, keys, files, max_files = 120_000, 3000, 6, 2
    stream = _cep_src(spark, tmp, n, keys, files, max_files)
    pat = [
        {"name": "a", "where": F.col("event_type") == "A"},
        {"name": "b", "where": F.col("event_type") == "B",
         "one_or_more": True},
        {"name": "c", "where": F.col("event_type") == "C"},
    ]
    out = match_pattern_stream(stream, pat, within="10 minutes",
                               watermark="5 seconds", event_id="event_id",
                               mode="all", impl=impl)
    return out, n, files, max_files


def _family_combinations(spark, tmp, impl):
    from pyspark.sql import functions as F

    from flink_realtime_dw4_0_spark.streaming.cep_pattern import (
        match_combinations_stream,
    )

    n, keys, files, max_files = 90_000, 3000, 6, 2
    stream = _cep_src(spark, tmp, n, keys, files, max_files)
    pat = [
        {"name": "a", "where": F.col("event_type") == "A"},
        {"name": "b", "where": F.col("event_type") == "B",
         "one_or_more": True, "allow_combinations": True},
        {"name": "c", "where": F.col("event_type") == "C"},
    ]
    out = match_combinations_stream(
        stream, pat, within="5 minutes", watermark="5 seconds",
        event_id="event_id", max_loop_candidates=8, max_combinations=32,
        impl=impl,
    )
    return out, n, files, max_files


def _family_mr_nested(spark, tmp, impl):
    from flink_realtime_dw4_0_spark.streaming.cep_pattern import (
        match_recognize_stream,
    )

    n, keys, files, max_files = 90_000, 3000, 6, 2
    stream = _cep_src(spark, tmp, n, keys, files, max_files)
    # T reuses the 'A' rows as the terminal (pattern variables must be
    # unique per variant; predicates may overlap)
    out = match_recognize_stream(
        stream, pattern="A (B | C X) T",
        define={"A": "event_type = 'A'", "B": "event_type = 'B'",
                "C": "event_type = 'C'", "X": "event_type = 'X'",
                "T": "event_type = 'A'"},
        within="5 minutes", watermark="5 seconds", impl=impl,
    )
    return out, n, files, max_files


BUILDERS = {
    "visitor_fix": _family_visitor_fix,
    "cep_seq": _family_cep_seq,
    "cep_pattern_loop": _family_cep_pattern_loop,
    "combinations": _family_combinations,
    "mr_nested": _family_mr_nested,
}


def run_one(family: str, impl: str) -> dict:
    """One fresh-JVM session: warm-up drive (unmeasured), measured
    drive, canary — prints one JSON line."""
    from flink_realtime_dw4_0_spark.plans.catalog import CATALOG
    from flink_realtime_dw4_0_spark.session import get_spark

    spark = get_spark(f"flip-{family}-{impl}")
    spark.sparkContext.setLogLevel("ERROR")
    build = BUILDERS[family]
    # warm-up: JIT the machine + sink codepaths, then discard
    tmp_w = tempfile.mkdtemp(prefix="flipw_")
    try:
        out_df, n, files, max_files = build(spark, tmp_w, impl)
        _drive(spark, out_df, tmp_w, n, files, max_files)
    finally:
        shutil.rmtree(tmp_w, ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix="flip_")
    try:
        out_df, n, files, max_files = build(spark, tmp, impl)
        res = _drive(spark, out_df, tmp, n, files, max_files)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # canary INSIDE the session (normalizes across machine load phases)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    CATALOG["tpch_q1_pricing_summary"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        CATALOG["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 4))
    canary = min(reps)
    res.update({
        "family": family, "impl": impl, "canary_sec": canary,
        "canary_reps": reps,
        "rows_per_canary": int(res["rows_per_sec"] * canary),
        "steady_rows_per_canary": int(
            (res["steady_rows_per_sec"] or res["rows_per_sec"]) * canary),
    })
    spark.stop()
    return res


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        res = run_one(sys.argv[2], sys.argv[3])
        sys.stdout.flush()
        print(json.dumps(res))
        return 0

    only = [f for f in sys.argv[1:] if f in FAMILIES] or list(FAMILIES)
    runs: dict[str, dict[str, list[dict]]] = {
        f: {"apply": [], "tws": []} for f in only
    }
    for session in range(SESSIONS):
        for family in only:
            for impl in ("apply", "tws"):
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one",
                     family, impl],
                    capture_output=True, text=True, timeout=1800,
                )
                if proc.returncode != 0:
                    sys.stderr.write(
                        f"{family}[{impl}] session {session} FAILED:\n"
                        + proc.stderr[-2000:] + "\n")
                    continue
                last = [ln for ln in proc.stdout.strip().splitlines()
                        if ln.strip()][-1]
                r = json.loads(last)
                runs[family][impl].append(r)
                print(f"s{session} {family}[{impl}]: "
                      f"steady {r['steady_rows_per_sec']} rows/s, "
                      f"canary {r['canary_sec']} s -> "
                      f"{r['steady_rows_per_canary']} rows/canary",
                      flush=True)
    decisions = {}
    for family in only:
        a = [r["steady_rows_per_canary"] for r in runs[family]["apply"]]
        t = [r["steady_rows_per_canary"] for r in runs[family]["tws"]]
        if not a or not t:
            decisions[family] = {"flip": False, "reason": "missing runs"}
            continue
        best_a, best_t = max(a), max(t)
        flip = best_t >= PARITY * best_a
        decisions[family] = {
            "flip": bool(flip),
            "best_apply_rows_per_canary": best_a,
            "best_tws_rows_per_canary": best_t,
            "ratio_tws_over_apply": round(best_t / best_a, 3),
            "parity_threshold": PARITY,
            "sessions": SESSIONS,
        }
        print(f"DECISION {family}: tws/apply = {best_t}/{best_a} "
              f"= {best_t / best_a:.3f} -> "
              f"{'FLIP to auto' if flip else 'KEEP apply'}", flush=True)
    # merge into an existing artifact so a re-run of one failed family
    # doesn't discard the others' sessions
    out = {"protocol": "best-of-3 fresh-JVM sessions per side, "
                       "steady-state canary-normalized, flip at "
                       f"tws >= {PARITY} x apply",
           "runs": {}, "decisions": {}}
    if os.path.exists("BENCH_TWS_FLIP.json"):
        with open("BENCH_TWS_FLIP.json") as fh:
            prev = json.load(fh)
        out["runs"] = prev.get("runs", {})
        out["decisions"] = prev.get("decisions", {})
    out["runs"].update(runs)
    out["decisions"].update(decisions)
    with open("BENCH_TWS_FLIP.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote BENCH_TWS_FLIP.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
