"""Data-profiling operators: the observability half of a pipeline engine.

Before a 100 TB job runs, two questions decide whether it will finish:
what's actually in each column (nulls, cardinality, range), and whether
the join/group keys are skewed enough to melt a partition.  Both answers
here come from single-pass, map-side-combinable aggregations — profiling
must be cheaper than the job it de-risks.

Parity note: the reference has no profiling surface (its Flink jobs are
hand-tuned against known gmall topics); these are engine-level additions
in the spirit of its `ConfigUtil` introspection helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _stat_exprs(df: DataFrame, col: str) -> list:
    """count/nulls/distinct plus type-aware min/max rendered as strings
    that format identically in Spark and DuckDB (floats through a
    fixed-scale DECIMAL so large magnitudes never flip to scientific
    notation — double→string in Spark prints '1.23E7' at >= 1e7 while
    DuckDB prints '12300000.0'; timestamps formatted explicitly,
    strings/ints/decimals cast verbatim)."""
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype in ("double", "float"):
        mn = F.round(F.min(c), 4).cast("decimal(38,4)").cast("string")
        mx = F.round(F.max(c), 4).cast("decimal(38,4)").cast("string")
    elif dtype.startswith("timestamp"):
        mn = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
        mx = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
    else:
        mn = F.min(c).cast("string")
        mx = F.max(c).cast("string")
    return [
        F.sum(c.isNull().cast("long")).alias(f"{col}__nulls"),
        F.count_distinct(c).alias(f"{col}__distinct"),
        mn.alias(f"{col}__min"),
        mx.alias(f"{col}__max"),
    ]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: (column, n_nulls, n_distinct, min_s, max_s)
    per requested column, plus the table row count on every row.

    Scale shape: ONE aggregation over the table computes every statistic
    (all exprs share the single scan and partial-aggregate), and the
    wide→long unpivot happens on the resulting 1-row frame — driver-tiny
    regardless of table size.  count_distinct is exact; swap in
    approx_count_distinct when profiling runs interactive."""
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for col in cols:
        aggs.extend(_stat_exprs(df, col))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col in cols
    )
    return wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_s, max_s)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_s", "max_s")


def key_skew(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Join/group-key skew diagnostic: the top-k heaviest keys with their
    row share — the number that predicts whether a shuffle on `key_col`
    needs AQE skew-splitting or salting.

    Scale shape: one map-side-combinable groupBy on the key, a global
    TakeOrdered for the top-k (no single-partition window — ordering a
    full key domain through one task is exactly the failure this tool
    diagnoses), and a 1-row total broadcast for the share."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
        .join(F.broadcast(total))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") * 100.0 / F.col("total"), 4).alias("share_pct"),
        )
        # joins do not guarantee order preservation: re-sort the top_k
        # rows (trivial — top_k rows) so rank order is part of the
        # contract, not an accident of the current physical plan
        .orderBy(F.col("cnt").desc(), F.col("key"))
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    seed: str = "hll",
    register_hex: int = 2,
    tail_hex: int = 6,
) -> DataFrame:
    """HyperLogLog register table per group — the MERGEABLE state behind
    an approximate distinct count, materialized instead of hidden inside
    `approx_count_distinct` so it (a) is integer-exact and oracle-
    checkable and (b) can be stored/merged across partitions, days, or
    clusters with a plain `max` groupBy (the serving-layer pattern for
    incremental cardinality at 100 TB: registers union + max, never a
    re-scan of history).

    Hashing is md5; the register id is the first `register_hex` hex
    chars (m = 16^register_hex registers, default 256) and rho (position
    of the first set bit) is computed on the next `tail_hex` hex chars
    entirely with string ops — leading-zero nibbles via regexp, the
    first non-zero nibble via a 16-way CASE — so any engine replays it
    without integer/bit conversions.  All-zero tails cap at
    4*tail_hex + 1.  Output: (*group_cols, register, max_rho); the
    estimator itself (harmonic mean + small-range correction) is plain
    arithmetic over <= m rows per group (tests compute it and bound the
    error vs exact distinct).
    """
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    out = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__reg", F.substring(h, 1, register_hex))
        .withColumn("__tail", F.substring(h, register_hex + 1, tail_hex))
        .withColumn("__nz", F.length(F.regexp_extract("__tail", "^0*", 0)))
        .withColumn("__first", F.expr("substring(__tail, __nz + 1, 1)"))
    )
    extra = (
        F.when(F.col("__first") == "1", 3)
        .when(F.col("__first").isin("2", "3"), 2)
        .when(F.col("__first").isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.col("__nz") == tail_hex, 4 * tail_hex + 1).otherwise(
        4 * F.col("__nz") + extra + 1
    )
    return (
        out.withColumn("__rho", rho.cast("long"))
        .groupBy(*group_cols, F.col("__reg").alias("register"))
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_estimate(registers: list[int], m: int) -> float:
    """Driver-side HLL estimator over one group's register values (the
    tiny final step — everything distributed happens in
    `hll_registers`).  Standard HLL with the small-range (linear
    counting) correction."""
    import math

    alpha = 0.7213 / (1 + 1.079 / m)
    z = sum(2.0 ** -r for r in registers) + (m - len(registers))  # unseen → 2^0
    est = alpha * m * m / z
    v = m - len(registers)
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    return est


def hll_estimate_df(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    seed: str = "hll",
    register_hex: int = 2,
) -> DataFrame:
    """Fully-distributed HLL estimate per group over the register sketch
    (the end-to-end approximate cardinality, not just the state): one
    grouped pass folds the registers into the harmonic sum and applies
    the small-range (linear counting) correction as column arithmetic.

    ORACLE-EXACT despite being float math: every 2^-rho is a dyadic
    rational and the <= m partial sums stay inside a double's 53-bit
    mantissa (m=256, rho <= 25 → exponent span 33 bits), so the harmonic
    sum is EXACT in any summation order; the remaining ops are literal
    IEEE arithmetic both engines round identically, and ln() enters only
    via the correction branch where a last-ulp difference is ~1e-13 of
    the value — invisible at the 4-decimal rounding.  Error vs exact
    distinct is bounded in pytest (the usual ~1.04/sqrt(m))."""
    m = 16 ** register_hex
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = hll_registers(df, key_col, group_cols, seed=seed,
                         register_hex=register_hex)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("__zsum"),
        F.count(F.lit(1)).alias("__nreg"),
    )
    v = F.lit(m) - F.col("__nreg")  # unseen registers (rho 0 → 2^0 each)
    z = F.col("__zsum") + v.cast("double")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("uu_hll"))


def countmin_registers(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    pos_hex: int = 3,
    seed: str = "cm",
) -> DataFrame:
    """Count-min sketch registers over a key column — the mergeable
    frequency-sketch companion to `hll_registers`: `depth` hash rows of
    16^pos_hex counters (default 3 x 4096).  Like the HLL registers, the
    state is (sketch_row, pos, cnt) rows: integer-exact, oracle-
    checkable, and mergeable across any split with a plain SUM — the
    incremental heavy-hitters path (est(key) = min over rows of the
    counter at md5("{seed}{row}:" || key), always >= the true count).

    One map-side-combinable shuffle of depth rows per input row;
    positions are md5 hex prefixes compared as strings (engine-portable,
    no integer conversions).
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("sketch_row"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}{i}:"), F.col(key_col).cast("string"))),
                    1,
                    pos_hex,
                ).alias("pos"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.sketch_row").alias("sketch_row"), F.col("r.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    width: float,
) -> DataFrame:
    """Fixed-width histogram registers per group — the mergeable QUANTILE
    sketch completing the trio with `hll_registers` (cardinality) and
    `countmin_registers` (frequency): state is (*group_cols, bin, cnt)
    with bin = floor(value / width), integer-exact, oracle-checkable,
    and SUM-mergeable across any split.  Quantile estimates come from a
    cumulative walk over a group's <= range/width rows with linear
    interpolation inside the hit bin — error bounded by `width`
    (`histogram_quantile`, tested against exact percentiles).

    One map-side-combinable shuffle; at 100 TB this is the
    incremental-percentile path (daily register tables sum into
    month-to-date without re-scanning history).
    """
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *group_cols,
            F.floor(F.col(value_col) / F.lit(width)).cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate_df(
    registers: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    depth: int = 3,
    pos_hex: int = 3,
    seed: str = "cm",
) -> DataFrame:
    """End-to-end count-min frequency estimates for a probe key set,
    fully distributed: each probe key re-derives its ``depth`` counter
    positions with the writer's hash, left-joins the register table on
    (sketch_row, pos) — an absent counter is 0 — and takes the MIN
    across rows.  Integer arithmetic throughout (oracle-exact), always
    an over-estimate of the true count (collisions only add), and the
    join touches depth rows per probe key, never the corpus."""
    rows = F.array(*[
        F.struct(
            F.lit(i).alias("sketch_row"),
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}{i}:"), F.col(key_col).cast("string"))),
                1,
                pos_hex,
            ).alias("pos"),
        )
        for i in range(depth)
    ])
    # one pass over the probe plan (a union would re-evaluate it per row)
    probes = keys.select(
        F.col(key_col).alias("key"), F.explode(rows).alias("rp")
    ).select("key", "rp.sketch_row", "rp.pos")
    joined = probes.join(registers, ["sketch_row", "pos"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est_count")
    )


def histogram_quantiles_df(
    registers: DataFrame,
    group_cols: list[str],
    width: float,
    probs: list[float],
) -> DataFrame:
    """Distributed quantile estimates from histogram registers: one
    window cumsum per group orders the bins, each requested prob picks
    the bin whose cumulative range covers q·total and interpolates
    linearly inside it — EXACTLY the driver-side `histogram_quantile`
    walk as column algebra (the boundary case q·total == cum(prev bin)
    resolves to the PREVIOUS bin with fraction 1.0 in both).  Output:
    (*group_cols, q, quantile); error bounded by ``width``; registers
    sum-merge first, so month-to-date percentiles never re-scan days.

    q == 0.0 resolves to the first non-empty bin with fraction 0 (the
    driver walk's behavior — ``target 0`` would otherwise satisfy
    ``cum - cnt < target`` in no bin and silently drop the prob);
    probs outside [0, 1] raise."""
    bad = [p for p in probs if not (0.0 <= float(p) <= 1.0)]
    if bad:
        raise ValueError(f"probs must be within [0, 1], got {bad}")
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    base = registers.withColumn("__cum", F.sum("cnt").over(w_cum)).withColumn(
        "__total", F.sum("cnt").over(w_all)
    )
    # ONE cumsum pass for every requested prob: broadcast the tiny probs
    # frame across the windowed registers (a per-prob union would run the
    # partitionBy+orderBy window once per prob)
    qs = registers.sparkSession.createDataFrame(
        [(float(q),) for q in probs], "q double"
    )
    target = F.col("q") * F.col("__total")
    hit = F.when(
        F.col("q") == 0.0,  # first non-empty bin, fraction 0 (driver twin)
        (F.col("cnt") > 0) & (F.col("__cum") == F.col("cnt")),
    ).otherwise(
        (F.col("__cum") >= target) & ((F.col("__cum") - F.col("cnt")) < target)
    )
    return (
        base.crossJoin(F.broadcast(qs))
        .filter(hit)
        .select(
            *group_cols,
            "q",
            F.round(
                (
                    F.col("bin")
                    + (target - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
                )
                * F.lit(float(width)),
                6,
            ).alias("quantile"),
        )
    )


def histogram_quantile(bins: list[tuple[int, int]], width: float, q: float) -> float:
    """Driver-side quantile estimate over one group's (bin, cnt) rows —
    cumulative walk + linear interpolation within the hit bin."""
    if not (0.0 <= q <= 1.0):
        raise ValueError(f"q must be within [0, 1], got {q}")
    bins = sorted(bins)
    total = sum(c for _, c in bins)
    target = q * total
    seen = 0.0
    for b, c in bins:
        if seen + c >= target and c > 0:
            frac = (target - seen) / c
            return (b + frac) * width
        seen += c
    return (bins[-1][0] + 1) * width if bins else float("nan")


def kmv_overlap(
    df: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Pairwise distinct-set OVERLAP estimation between segments via KMV
    (k-minimum-values) sketches — the set-intersection cardinality a
    union-only sketch (HLL) cannot give, and the classic serving shape
    behind "audience overlap" dashboards.

    Per group, the sketch is the k lexicographically-smallest
    ``md5(key)`` prefixes over the group's DISTINCT keys (hex-string
    order == a fixed pseudo-random order — the same portable-determinism
    trick the minhash tier uses, so the DuckDB oracle replays the EXACT
    estimates).  For each unordered group pair, merging the two sketches
    and re-trimming to k yields the k smallest of the UNION (the KMV
    merge property), every kept hash's membership in either side is
    exact (kept h <= the pair kth <= each group's kth), and:

      est_union        = n_kept < k ? n_kept : (k-1) / u(kth)
      est_intersection = |kept in BOTH| * est_union / n_kept

    Returns (group_a, group_b, est_a, est_b, est_union,
    est_intersection), 4-dec rounded; groups with fewer than k distinct
    keys estimate exactly.

    Scale shape: ONE distinct over (group, key) is the only data-sized
    shuffle; the per-group rank emits <= k rows per group, and every
    pairwise computation runs over sketch rows only (k x |groups|) with
    the tiny pair list broadcast.  Relative error ~ 1/sqrt(k).
    """
    _SCALE = float(1 << 60)  # 15 hex chars

    def u_of(h):
        return F.conv(h, 16, 10).cast("double") / F.lit(_SCALE)

    dk = (
        df.select(
            F.col(group_col).alias("g"),
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15).alias("h"),
        )
        .distinct()
    )
    w_g = Window.partitionBy("g").orderBy("h")
    # NOT cached (r12 probe): sk feeds three branches, but the heavy
    # part (the distinct's exchange) is byte-identical across them and
    # Spark's ReusedExchange already shares it within the one plan — a
    # .cache() here measured 1.08x (materialization cost, no saved work)
    sk = dk.withColumn("rnk", F.row_number().over(w_g)).filter(
        F.col("rnk") <= k
    ).select("g", "h")
    ge = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    ).select(
        "g",
        F.when(F.col("n_sk") < k, F.col("n_sk").cast("double"))
        .otherwise(F.lit(float(k - 1)) / u_of(F.col("kth"))).alias("est_g"),
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("group_a"))
        .crossJoin(F.broadcast(groups.select(F.col("g").alias("group_b"))))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    # pair membership as an EXPLOSION + one equi-join, not an OR-condition
    # join (which planned as a BroadcastNestedLoopJoin doing |pairs| x
    # sketch-rows predicate work — fine at dashboard-scale |groups|, a
    # wall at thousands): each pair emits two (pair, member-group) rows,
    # then the sketch attaches by a plain hash/broadcast equi-join on g.
    # Same joined rows, so the kept hashes and estimates are unchanged.
    sides = pairs.select(
        "group_a",
        "group_b",
        F.explode(F.array(F.col("group_a"), F.col("group_b"))).alias("g"),
    )
    merged = (
        sides.join(sk, "g")
        .groupBy("group_a", "group_b", "h")
        .agg(
            F.max((F.col("g") == F.col("group_a")).cast("int")).alias("in_a"),
            F.max((F.col("g") == F.col("group_b")).cast("int")).alias("in_b"),
        )
    )
    w_p = Window.partitionBy("group_a", "group_b").orderBy("h")
    kept = merged.withColumn("rnk", F.row_number().over(w_p)).filter(
        F.col("rnk") <= k
    )
    agg = kept.groupBy("group_a", "group_b").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("k_int"),
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / u_of(F.col("kth")))
    out = agg.select(
        "group_a", "group_b",
        est_union.alias("est_union"),
        (F.col("k_int") * est_union / F.col("n_kept")).alias("est_intersection"),
    )
    ea = ge.select(F.col("g").alias("group_a"), F.col("est_g").alias("est_a"))
    eb = ge.select(F.col("g").alias("group_b"), F.col("est_g").alias("est_b"))
    return (
        out.join(F.broadcast(ea), "group_a").join(F.broadcast(eb), "group_b")
        .select(
            "group_a", "group_b",
            F.round("est_a", 4).alias("est_a"),
            F.round("est_b", 4).alias("est_b"),
            F.round("est_union", 4).alias("est_union"),
            F.round("est_intersection", 4).alias("est_intersection"),
        )
    )
