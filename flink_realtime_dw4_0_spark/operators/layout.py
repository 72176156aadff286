"""Physical-layout operators: multi-dimensional (Z-order) clustering for
data-skipping at scale.

A 100 TB table is pruned, not scanned: parquet row-group min/max stats
(and partition values) let the reader skip data that can't match a
predicate.  Sorting by ONE column gives perfect skipping on that column
and none on any other; interleaving the bits of two (or more) key columns
— a Morton / Z-order curve — gives every interleaved column locality, so
row-group stats stay tight on all of them.  This is the layout trick
behind Delta/Iceberg `OPTIMIZE ZORDER BY`; here it's expressed directly:
a pure-Column morton key + a range-repartition/sort write.

Everything is integer bit arithmetic (shifts/and/or) — JVM codegen on
both engines, no UDFs, oracle-replayable bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of k non-negative integer columns
    into one Z-order key (column j contributes bit i to output bit
    ``i*k + j``).  Built as a balanced OR-tree of shift/mask terms —
    k·bits leaf expressions, all whole-stage-codegen.

    Skipping quality depends on the columns occupying COMPARABLE bit
    widths: the curve gives each column every k-th bit, so if one
    column's values are 2^6 times larger, its six extra high bits
    dominate the curve top and the narrow column only starts clustering
    2^12 files deep.  Scale/bucket columns to a common domain first
    (e.g. `% 1024`, or a rank/ntile id as Delta's OPTIMIZE does) and
    pass the matching ``bits``.
    """
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    k = len(cs)
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, c in enumerate(cs)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of ``cols``:
    range-repartition on the morton key (contiguous curve segments per
    file — this is what makes per-file min/max tight on EVERY key column),
    sort within partitions, drop the helper key.  At cluster scale,
    ``n_files`` becomes the target file count per job; the shuffle is one
    range exchange, same cost class as a global sort."""
    keyed = df.withColumn("__z", morton_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    *,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Hive-bucketed (and optionally sort-bucketed)
    table: rows are hash-partitioned on ``bucket_cols`` into exactly
    ``n_buckets`` files per write-partition, and the bucket spec is
    recorded in the catalog.

    This is the storage-level join optimization the shuffle can't give
    you: two tables bucketed on the SAME columns with the SAME bucket
    count join with ZERO exchange — each task reads bucket i of both
    sides (and with ``sort_cols`` = join keys, zero sort too: the
    classic sort-merge-bucket join).  At 100 TB this converts every
    recurring fact⋈fact join on the bucket key from a full-cluster
    shuffle into a local merge, which is why warehouses bucket their
    biggest facts once at ingest.  (DataFrameWriter.bucketBy requires a
    catalog table — saveAsTable, not a bare path; Spark's in-memory
    catalog works, and on a cluster this is the Hive/Unity metastore.)
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)
