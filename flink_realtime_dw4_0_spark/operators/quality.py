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


def psi_drift(
    df: DataFrame,
    value_col: str,
    split_col: str,
    ref_value,
    cur_value,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two splits of one table — the
    standard production drift monitor for a feature/score column
    (PSI = Σ (p_i − q_i)·ln(p_i / q_i) over fixed bins; rule of thumb:
    < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    Bins are FIXED equal-width over [lo, hi) supplied by the caller
    (+ two overflow bins), so the plan is one narrow projection + one
    map-combinable count per (split, bin) + a driver-free pivot join —
    no quantile job, no sort, deterministic on both engines.  Counts get
    +0.5 Laplace smoothing so empty bins never divide by zero (the
    conventional estimator fix, applied identically in the oracle).

    Returns one row per bin (bin id, per-split counts, p, q, the bin's
    PSI term) plus the total under bin = -1 — shaped for both dashboard
    plotting and a single-row gate."""
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_id = (
        F.when(v < lo, F.lit(-2))  # underflow bin
        .when(v >= hi, F.lit(n_bins))
        .otherwise(F.floor((v - lo) / width))
        .cast("int")
    )
    # NULL values belong to no numeric bin: drop them explicitly (they
    # would otherwise surface as an undocumented bin=NULL row polluting
    # the bin=-1 total); monitor null RATES with dq expectations instead
    base = df.filter(
        F.col(split_col).isin(ref_value, cur_value) & v.isNotNull()
    ).select(
        bin_id.alias("bin"),
        F.when(F.col(split_col) == ref_value, 1).otherwise(0).alias("is_ref"),
    )
    counts = base.groupBy("bin").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    k = n_bins + 2  # + under/overflow
    per = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_ref", "n_cur",
            ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * k)).alias("p"),
            ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * k)).alias("q"),
        )
        .select(
            "bin", "n_ref", "n_cur",
            F.round("p", 6).alias("p"),
            F.round("q", 6).alias("q"),
            F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 6)
            .alias("psi_term"),
        )
    )
    total = per.agg(
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.sum("p"), 6).alias("p"),
        F.round(F.sum("q"), 6).alias("q"),
        F.round(F.sum("psi_term"), 6).alias("psi_term"),
    ).select(F.lit(-1).cast("int").alias("bin"), "n_ref", "n_cur", "p", "q", "psi_term")
    return per.unionByName(total)


def psi_from_histograms(
    ref: DataFrame,
    cur: DataFrame,
    bin_col: str = "bin",
    cnt_col: str = "cnt",
) -> DataFrame:
    """PSI over two histogram REGISTER tables (operators.profiling.
    histogram_registers output, or the streaming sketch state a
    StreamingSketchMerge maintains) — the monitoring path that never
    touches raw rows: registers are sum-mergeable across batches/splits,
    so the reference is a frozen register table and the current side is
    the live sketch; the PSI join costs O(bins), not O(events).

    Same estimator as `psi_drift` (Laplace +0.5 per bin over the UNION
    of observed bins; bins one side never saw count as 0).  Returns
    per-bin rows plus the bin = -1 total."""
    r = ref.select(F.col(bin_col).alias("bin"), F.col(cnt_col).cast("long").alias("n_ref"))
    c = cur.select(F.col(bin_col).alias("bin"), F.col(cnt_col).cast("long").alias("n_cur"))
    joined = (
        r.join(c, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("k"),
    )
    per = (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin", "n_ref", "n_cur",
            ((F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("k"))).alias("p0"),
            ((F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("k"))).alias("q0"),
        )
        .select(
            "bin", "n_ref", "n_cur",
            F.round("p0", 6).alias("p"),
            F.round("q0", 6).alias("q"),
            F.round((F.col("p0") - F.col("q0")) * F.log(F.col("p0") / F.col("q0")), 6)
            .alias("psi_term"),
        )
    )
    total = per.agg(
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.sum("p"), 6).alias("p"),
        F.round(F.sum("q"), 6).alias("q"),
        F.round(F.sum("psi_term"), 6).alias("psi_term"),
    ).select(F.lit(-1).cast(joined.schema["bin"].dataType).alias("bin"),
             "n_ref", "n_cur", "p", "q", "psi_term")
    return per.unionByName(total)
