"""Data-quality expectations — the contract-checking layer a warehouse
runs before promoting a layer (dbt tests / Great Expectations shape,
re-expressed as Spark aggregations).

Each expectation compiles to a violation COUNT; a suite of expectations
over one table folds into a single pass (one aggregation collecting all
counts at once — profiling-style, never one scan per check) plus one
extra aggregation per uniqueness check and one anti-join per referential
check.  At 100 TB the whole suite is a handful of map-side-combinable
aggregations — strictly cheaper than the layer-build it gates.

Output relation: (check_name, n_violations, passed) — loggable,
alertable, and oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    name: str
    kind: str  # 'row' | 'unique' | 'fk'
    # row-kind: a boolean Column that is True when the ROW VIOLATES
    violates: Column | None = None
    cols: list[str] | None = None  # unique-kind: key columns
    ref: DataFrame | None = None  # fk-kind: referenced dim
    col: str | None = None  # fk-kind: local column
    ref_col: str | None = None  # fk-kind: referenced column


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", "row", violates=F.col(col).isNull())


def expect_in(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values_{col}", "row",
        violates=~F.col(col).isin(values) | F.col(col).isNull(),
    )


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"range_{col}", "row",
        violates=F.col(col).isNull() | (F.col(col) < lo) | (F.col(col) > hi),
    )


def expect_unique(cols: list[str]) -> Expectation:
    return Expectation(f"unique_{'_'.join(cols)}", "unique", cols=cols)


def expect_fk(col: str, ref: DataFrame, ref_col: str) -> Expectation:
    return Expectation(f"fk_{col}", "fk", ref=ref, col=col, ref_col=ref_col)


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Evaluate a suite over one table.  All row-level checks share ONE
    aggregation pass; each unique check is one groupBy; each fk check is
    one broadcast anti-join count.  Returns
    (check_name, n_violations, passed) for every check."""
    results: list[DataFrame] = []
    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        agg = df.agg(
            *[
                F.sum(c.violates.cast("long")).alias(c.name)
                for c in row_checks
            ]
        )
        unpivoted = agg.selectExpr(
            "stack({n}, {pairs}) AS (check_name, n_violations)".format(
                n=len(row_checks),
                pairs=", ".join(f"'{c.name}', {c.name}" for c in row_checks),
            )
        )
        results.append(unpivoted)
    for c in checks:
        if c.kind == "unique":
            dup = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("n"))
                .select(
                    F.lit(c.name).alias("check_name"),
                    F.col("n").cast("long").alias("n_violations"),
                )
            )
            results.append(dup)
        elif c.kind == "fk":
            orphans = (
                df.select(F.col(c.col).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    F.broadcast(c.ref.select(F.col(c.ref_col).alias("__k")).distinct()),
                    "__k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.lit(c.name).alias("check_name"),
                    F.col("n").cast("long").alias("n_violations"),
                )
            )
            results.append(orphans)
    out = reduce(lambda a, b: a.unionByName(b), results)
    return out.select(
        "check_name",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).cast("int").alias("passed"),
    )


def publish_if(
    table,
    df: DataFrame,
    checks: list[Expectation],
) -> tuple[bool, DataFrame]:
    """Write-audit-publish: evaluate the expectation suite on the
    CANDIDATE snapshot and commit it to the KeyedTable only if every
    check passes — the WAP pattern (audit a staged write, atomically
    publish or abandon).  The staged DataFrame is pinned with
    localCheckpoint so the audit and the publish see identical data even
    if its lineage reads the table's previous version.  Returns
    (published, report); on failure the table is untouched and the
    report carries the violation counts.  Combined with
    `keep_versions`, a bad publish that DOES slip through is one
    `read_version(1)` rollback away.
    """
    staged = df.localCheckpoint()
    report = run_expectations(staged, checks).cache()
    ok = report.filter(F.col("passed") == 0).count() == 0
    if ok:
        table.replace(staged)
    return ok, report
