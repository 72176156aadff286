"""Windowed aggregation operators (SURVEY §2.5 A1-A8).

The reference's DWS layer is empty but names 8 tumbling-window summary
tables (Constant.java:40-47); all of them reduce to
``groupBy(window(event_time, size), *dims).agg(...)`` — built-in Structured
Streaming tumbling windows in stream mode, plain groupBy in batch.

Scale notes: windowed aggs shuffle once on (window, dims); partial
aggregation (map-side combine) happens automatically.  Distinct-user
counts use exact count_distinct in batch and first-seen keyed state in
streaming (operators/state.py); at 100 TB prefer approx_count_distinct
when the serving table tolerates ~2% error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    dims: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Generic tumbling-window groupBy — the common shape of all 8 DWS
    tables (Constant.java:40-47).

    Window bounds are emitted as formatted strings (`window_start`,
    `window_end`) so results hash identically across engines/timezones.
    """
    out = df.groupBy(F.window(ts_col, size).alias("__w"), *dims).agg(*aggs)
    rest = [c for c in out.columns if c != "__w"]
    return out.select(
        F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("__w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        *rest,
    )
