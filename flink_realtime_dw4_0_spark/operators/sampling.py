"""Corpus-management operators: deterministic splits, stratified samples,
distribution histograms.

The ops every large training-data pipeline runs between dedup and
training: carve train/val/test, downsample a stratum, inspect the length
distribution.  All are hash-based and DETERMINISTIC — a doc's split
assignment never changes across runs, machines, or engines — and all stay
in JVM expressions (md5 / substring / string compare), so they distribute
trivially: no shuffle at all for split/sample (narrow maps), one
aggregation shuffle for the histograms.

Engine-portability (the oracle story): bucket arithmetic uses md5 HEX
STRING comparison, never hex→int conversion — `substr(md5(k),1,4) <
'0ccc'` means the same thing in Spark and DuckDB, while hex-to-int
functions differ between engines.  16^4 = 65536 buckets gives 0.0015%
split granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# 4 hex chars = 65536 buckets; boundaries are hex-string literals.
_BUCKET_LEN = 4
_BUCKETS = 16**_BUCKET_LEN


def _bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket id as a fixed-width hex string.

    NULL keys hash like the empty string — md5(concat(.., NULL)) would be
    NULL, silently routing every NULL-key row to the `otherwise` split (or
    dropping it from every sample); coalescing keeps the assignment
    deterministic and the row counted."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.coalesce(key.cast("string"), F.lit("")))),
        1,
        _BUCKET_LEN,
    )


def _hex_lit(frac: float) -> str:
    """The hex-string boundary below which `frac` of buckets fall.

    frac >= 1.0 returns 'zzzz' (lexically above every hex string) — the
    natural `format(65536, '04x')` would be 5 chars and lexically BELOW
    'ffff', inverting the comparison."""
    edge = min(_BUCKETS, max(0, round(frac * _BUCKETS)))
    if edge >= _BUCKETS:
        return "z" * _BUCKET_LEN
    return format(edge, f"0{_BUCKET_LEN}x")


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by hashing its key — stable under
    re-runs, insertions, and re-partitioning (unlike randomSplit, whose
    assignment depends on partition layout).  Pure narrow map: zero
    shuffle at any scale."""
    b = _bucket(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(b < F.lit(_hex_lit(train)), "train")
        .when(b < F.lit(_hex_lit(train + val)), "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str = "doc_id",
    default_frac: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    bucket falls under its stratum's fraction.  The per-stratum rates
    arrive as a literal CASE, so this is also a pure narrow map — the
    standard rebalancing step (e.g. cap 'en' at 10%, keep all 'yo')."""
    b = _bucket(F.col(key_col), salt)
    edge = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        lit = F.lit(_hex_lit(frac))
        edge = F.when(cond, lit) if edge is None else edge.when(cond, lit)
    edge = F.lit(_hex_lit(default_frac)) if edge is None else edge.otherwise(
        F.lit(_hex_lit(default_frac))
    )
    return df.filter(b < edge)


def length_histogram(
    df: DataFrame, text_col: str = "text", bin_width: int = 100
) -> DataFrame:
    """Character-length histogram: one partial-aggregated shuffle, however
    large the corpus."""
    return (
        df.withColumn("bin", (F.length(text_col) / bin_width).cast("long") * bin_width)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("doc_ct"))
    )


def concat_chunk_assign(
    df: DataFrame,
    chunk_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk assignment — the GPT-style pretraining packing:
    documents are concatenated in a deterministic global order (by id)
    and the stream is cut into fixed `chunk_tokens` sequences.  Returns
    per document its global token offset and the chunk range it spans:
    (doc_id, n_tokens, start_off, chunk_id, end_chunk_id).

    Scale design: a single global window cumsum is a one-partition
    bottleneck, so this runs the classic DISTRIBUTED PREFIX SUM —
    range-repartition by id (Spark's sort machinery), per-partition
    running sums via one window inside each range partition, partition
    totals collected (≤ #partitions longs) and turned into broadcast
    prefix offsets.  No stage sees more than its partition; the driver
    holds one long per partition.

    Deterministic and integer-exact, so the DuckDB oracle (one window
    cumsum) hash-matches (`pack_concat_chunk`).
    """
    import pandas as pd
    from collections.abc import Iterator

    spark = df.sparkSession
    parts = max(2, spark.sparkContext.defaultParallelism)
    base = (
        df.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).cast("long").alias("n_tokens"))
        .repartitionByRange(parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("_pid", F.spark_partition_id())
    )

    # per-partition running sum as an Arrow pass over the already-sorted
    # range partition — no shuffle (Window.partitionBy(_pid) would add an
    # Exchange; the iterator's closure carries the running total across
    # Arrow batches of the same partition)
    def cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for pdf in batches:
            if pdf.empty:
                continue
            ends = pdf["n_tokens"].cumsum() + run
            run = int(ends.iloc[-1])
            pdf["_local_end"] = ends
            yield pdf

    local = base.mapInPandas(
        cumsum, "doc_id long, n_tokens long, _pid int, _local_end long"
    ).cache()
    totals = {
        r._pid: r.total
        for r in local.groupBy("_pid").agg(F.sum("n_tokens").alias("total")).collect()
    }
    prefix = {}
    acc = 0
    for pid in sorted(totals):
        prefix[pid] = acc
        acc += totals[pid]
    pref_df = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _prefix long"
    )
    out = (
        local.join(F.broadcast(pref_df), "_pid")
        .withColumn("start_off", F.col("_prefix") + F.col("_local_end") - F.col("n_tokens"))
        # SQL `div` = exact integer division (float `/` misrounds at large
        # offsets); `n_tokens - 1` puts a doc's last token in its chunk
        .withColumn("chunk_id", F.expr(f"start_off div {int(chunk_tokens)}"))
        .withColumn(
            "end_chunk_id",
            F.expr(f"(start_off + n_tokens - 1) div {int(chunk_tokens)}"),
        )
        .select("doc_id", "n_tokens", "start_off", "chunk_id", "end_chunk_id")
    )
    return out


def pack_sequences_nosplit(
    df: DataFrame,
    seq_tokens: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """No-split sequence packing — the SFT/boundary-preserving twin of
    ``concat_chunk_assign``: documents are NEVER cut across sequences.
    Within each shard (``doc_id % n_shards``), docs are taken in id
    order and greedily packed: when the running total would exceed
    ``seq_tokens``, a new sequence starts.  One uniform rule also covers
    over-long docs (a doc longer than ``seq_tokens`` opens its own
    sequence at offset 0, and the next doc starts a fresh one);
    ``overflow`` flags them.  Returns
    (doc_id, shard, n_tokens, seq_id, seq_off, overflow) with ``seq_id``
    sequential per shard — (shard, seq_id) is the training-sequence key.

    Scale shape: the greedy fill is inherently sequential PER SHARD (a
    capacitated reset-cumsum has no prefix-sum closed form), so shards
    are the parallelism unit: ONE repartition on shard, a
    sortWithinPartitions, and one mapInPandas pass whose per-shard
    running state crosses Arrow batches (same carry pattern as the CEP
    skip replay) — no driver loop, no global window.  Pick n_shards ~
    cluster cores; each shard's work is O(its docs).

    Determinism: shard assignment and in-shard order are pure id
    arithmetic, so the DuckDB oracle (per-shard recursive-CTE replay of
    the same greedy rule) hash-matches (``pack_sequences_nosplit``)."""
    import pandas as pd
    from collections.abc import Iterator

    L = int(seq_tokens)
    base = (
        df.select(
            F.col(id_col).alias("doc_id"),
            (F.col(id_col) % n_shards).cast("int").alias("shard"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "doc_id")
    )

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-shard (running_tokens, seq_counter), carried across Arrow
        # batches of the same partition; a partition may hold several
        # shards (rows arrive grouped by the sort above)
        state: dict[int, tuple[int, int]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            seq_ids, offs = [], []
            for shard, n in zip(pdf["shard"].to_numpy(),
                                pdf["n_tokens"].to_numpy()):
                run, seq = state.get(int(shard), (0, -1))
                n = int(n)
                if seq < 0 or run + n > L:
                    seq += 1
                    run = 0
                seq_ids.append(seq)
                offs.append(run)
                state[int(shard)] = (run + n, seq)
            pdf = pdf.assign(
                seq_id=pd.Series(seq_ids, index=pdf.index, dtype="int64"),
                seq_off=pd.Series(offs, index=pdf.index, dtype="int64"),
                overflow=(pdf["n_tokens"] > L).astype("int32"),
            )
            yield pdf

    return base.mapInPandas(
        fill,
        "doc_id long, shard int, n_tokens long, "
        "seq_id long, seq_off long, overflow int",
    )


def _ffd_place(
    open_bins: list, next_id: int, ub: int, n: int, L: int, shard_min: int
) -> tuple[int, int, int, int]:
    """Place ONE doc of ``n`` tokens into ``open_bins`` (mutated in
    place; entries are (seq_id, residual) in creation order) under
    first-fit-decreasing with the close-saturated-bins hardening: after
    placement, a bin whose residual drops below ``shard_min`` (the
    static minimum doc size of the shard — every future doc in DESC
    order is >= it) is REMOVED from the open list, since it can never
    admit another doc.  Closure never changes a first-fit choice, so
    outputs are bit-identical to the unhardened scan; it bounds the
    open list (and thus both memory and the scan) on pathological
    many-tiny-docs shards.  Returns (seq_id, seq_off, next_id, ub);
    ``ub`` stays a sound upper bound on open residuals (it only
    loosens)."""
    fit = -1
    if n <= ub:
        for i, (_sid, r) in enumerate(open_bins):
            if r >= n:
                fit = i
                break
    if fit < 0:
        open_bins.append((next_id, L))
        fit = len(open_bins) - 1
        next_id += 1
    sid, r = open_bins[fit]
    off = L - r
    r -= n
    if r < shard_min:  # saturated: no remaining doc can fit
        open_bins.pop(fit)
    else:
        open_bins[fit] = (sid, r)
    return sid, off, next_id, max(ub, r)


def pack_sequences_ffd(
    df: DataFrame,
    seq_tokens: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """First-fit-decreasing no-split packing — the utilization upgrade
    over ``pack_sequences_nosplit``'s in-id-order greedy fill: within
    each shard, docs are taken in (n_tokens DESC, doc_id) order and each
    goes into the FIRST already-open sequence with enough remaining
    capacity, opening a new one only when none fits (classic FFD, ≤
    11/9·OPT+1 bins).  A doc longer than ``seq_tokens`` fits nowhere, so
    it opens its own sequence (residual goes negative — it never admits
    another doc), which is exactly the greedy variant's flagged
    ``overflow`` singleton.  Same output schema
    (doc_id, shard, n_tokens, seq_id, seq_off, overflow); ``seq_id`` is
    the per-shard sequence CREATION index, ``seq_off`` the tokens
    already packed into it at placement.

    Scale shape: one cheap 3-column pre-aggregation for the per-shard
    MIN doc size, then — identical to the greedy variant — ONE
    repartition on shard + sortWithinPartitions + one mapInPandas pass
    whose per-shard open-sequence residual lists carry across Arrow
    batches.  The in-shard fill is a linear first-fit scan over OPEN
    sequences; two hardenings keep the O(docs × open-seqs) worst case
    unreachable: a running upper bound on the max residual
    short-circuits the doesn't-fit-anywhere case, and any sequence
    whose residual drops below the shard's static min doc size CLOSES
    (``_ffd_place`` — in DESC order nothing remaining can fit it, so
    closure never changes a first-fit choice; outputs are
    bit-identical).  On a many-tiny-equal-docs adversarial shard the
    open list stays O(1) instead of O(docs/L).

    Determinism: shard assignment and the (n_tokens DESC, doc_id) order
    are pure column arithmetic — the DuckDB oracle replays the same
    first-fit rule as a per-shard recursive CTE carrying the residual
    list (``pack_sequences_ffd``) and hash-matches."""
    import pandas as pd
    from collections.abc import Iterator

    L = int(seq_tokens)
    proj = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    # static per-shard min doc size: the close-saturated-bins threshold
    # (n_shards rows — always broadcastable)
    mins = proj.groupBy("shard").agg(
        F.min("n_tokens").alias("shard_min")
    )
    base = (
        proj.join(F.broadcast(mins), "shard")
        .repartition(n_shards, "shard")
        .sortWithinPartitions(
            F.col("shard"), F.col("n_tokens").desc(), F.col("doc_id")
        )
    )

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-shard (open (seq_id, residual) list in creation order,
        # next seq_id, upper bound on open residuals), carried across
        # Arrow batches; the bound only loosens (residuals shrink, it
        # doesn't), staying a sound skip-the-scan test for docs larger
        # than every residual
        state: dict[int, tuple[list, int, int]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            seq_ids, offs = [], []
            for shard, n, smin in zip(pdf["shard"].to_numpy(),
                                      pdf["n_tokens"].to_numpy(),
                                      pdf["shard_min"].to_numpy()):
                open_bins, nxt, ub = state.get(int(shard), ([], 0, -1))
                sid, off, nxt, ub = _ffd_place(
                    open_bins, nxt, ub, int(n), L, int(smin)
                )
                seq_ids.append(sid)
                offs.append(off)
                state[int(shard)] = (open_bins, nxt, ub)
            pdf = pdf.drop(columns=["shard_min"]).assign(
                seq_id=pd.Series(seq_ids, index=pdf.index, dtype="int64"),
                seq_off=pd.Series(offs, index=pdf.index, dtype="int64"),
                overflow=(pdf["n_tokens"] > L).astype("int32"),
            )
            yield pdf

    return base.mapInPandas(
        fill,
        "doc_id long, shard int, n_tokens long, "
        "seq_id long, seq_off long, overflow int",
    )


def reservoir_sample(
    df: DataFrame,
    k: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    salt: str = "res",
) -> DataFrame:
    """Deterministic-hash reservoir sampling — Algorithm R with the
    random draw replaced by a PORTABLE hash, so the k-sample of an
    arbitrarily long per-key stream is a pure function of the (key, ts,
    id) value set (replayable by the DuckDB oracle, stable across
    partitionings, and identical between this batch operator and the
    streaming twin):

    per key, events are consumed in (ts, id) order; the n-th event
    (1-based) fills slot n-1 while n <= k, and afterwards computes
    ``j = int(md5('{salt}:{key}:{id}')[:15], 16) % n`` — replacing slot
    j when j < k, exactly Algorithm R's uniform draw with the hash as
    the randomness source.  Every retained prefix is a uniform-ish
    k-sample of the events seen so far (the hash is equidistributed
    over [0, n)), which is the eval-set-construction contract a
    training pipeline needs from an unbounded stream.

    Returns one row per occupied slot: (key, slot, ts, id) — fewer than
    k rows for keys with fewer than k events.

    Scale shape: ONE repartition on the key + sortWithinPartitions +
    one mapInPandas pass whose per-key (count, slots) state carries
    across Arrow batches (the same sequential-fold pattern as the
    packers; a capacitated replacement chain has no closed form).
    State is O(k) per key; ``str(key)``/``str(id)`` must match the SQL
    VARCHAR casts for oracle parity (int/string columns do)."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = (
        f"{key_col} {fields[key_col]}, slot int, "
        f"{ts_col} {fields[ts_col]}, {id_col} {fields[id_col]}"
    )
    base = (
        df.select(key_col, ts_col, id_col)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, ts_col, id_col)
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive key-grouped (the sort above), so only the CURRENT
        # key's (count, slots) lives in memory — O(k), not
        # O(distinct keys x k); each finished key's slots append to an
        # output buffer that is yielded in bounded chunks
        _NONE = object()  # sentinel: distinguishes "no key yet" from any value
        cur, cnt, slots = _NONE, 0, []
        rows = {key_col: [], "slot": [], ts_col: [], id_col: []}

        def flush_key() -> None:
            for slot, (ts_v, id_v) in enumerate(slots):
                rows[key_col].append(cur)
                rows["slot"].append(slot)
                rows[ts_col].append(ts_v)
                rows[id_col].append(id_v)

        for pdf in batches:
            if pdf.empty:
                continue
            for key, ts_v, id_v in zip(
                pdf[key_col], pdf[ts_col], pdf[id_col]
            ):
                if cur is _NONE or key != cur:
                    if cur is not _NONE:
                        flush_key()
                    cur, cnt, slots = key, 0, []
                cnt += 1
                if cnt <= k:
                    slots.append((ts_v, id_v))
                else:
                    h = int(hashlib.md5(
                        f"{salt}:{key}:{id_v}".encode()
                    ).hexdigest()[:15], 16)
                    j = h % cnt
                    if j < k:
                        slots[j] = (ts_v, id_v)
            if len(rows["slot"]) >= 8192:
                yield pd.DataFrame(rows)
                rows = {key_col: [], "slot": [], ts_col: [], id_col: []}
        if cur is not _NONE:
            flush_key()
        if rows["slot"]:
            yield pd.DataFrame(rows)

    return base.mapInPandas(fold, out_schema)


def weighted_reservoir(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "wres",
) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-Res) with the
    uniform draw replaced by a PORTABLE hash: each row gets the sort
    key ``u^(1/w)`` where ``u = md5('{salt}:{id}')[:15]/16^15 ∈ (0,1)``
    and ``w = weight``; the k LARGEST keys per group are exactly a
    weight-proportional without-replacement sample — deterministic,
    partition-stable, and oracle-replayable (no sequential fold at all:
    one window per group, unlike the unweighted streaming reservoir).

    Zero/negative weights never sample (their key is 0); ties cannot
    happen (md5 over distinct ids).  Returns the input columns plus
    ``draw_rank`` (1..k).  Scale shape: ONE hash shuffle on the group
    key + a top-k window — at 100 TB this is the same plan as any
    per-group top-k, and AQE handles group skew."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (
        F.conv(F.substring(F.md5(
            F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
        ), 1, 15), 16, 10).cast("double")
        / F.lit(float(1 << 60))
    )
    skey = F.when(
        F.col(weight_col) > 0,
        F.pow(u, F.lit(1.0) / F.col(weight_col)),
    ).otherwise(F.lit(0.0))
    if group_col is None:
        # global top-k: sort+limit plans as a distributed TakeOrdered
        # (per-partition top-k, then a k-row merge) — never the
        # single-partition global window; the draw_rank window then
        # runs over exactly k rows
        tiny = (
            df.withColumn("__sk", skey)
            .filter(F.col("__sk") > 0)
            .orderBy(F.col("__sk").desc(), id_col)
            .limit(k)
        )
        w2 = Window.orderBy(F.col("__sk").desc(), id_col)
        return tiny.withColumn(
            "draw_rank", F.row_number().over(w2)
        ).drop("__sk")
    w = Window.partitionBy(group_col)
    ranked = df.withColumn("__sk", skey).withColumn(
        "draw_rank",
        F.row_number().over(w.orderBy(F.col("__sk").desc(), id_col)),
    )
    return ranked.filter(
        (F.col("draw_rank") <= k) & (F.col("__sk") > 0)
    ).drop("__sk")


def pack_efficiency(
    packed: DataFrame, seq_tokens: int
) -> DataFrame:
    """Padding/utilization report over a ``pack_sequences_nosplit``
    result — the number a capacity plan actually reads: per shard,
    how many sequences, how many are over-long singletons, and what
    fraction of the non-overflow capacity is padding.

    Input is the packing output (doc_id, shard, n_tokens, seq_id,
    seq_off, overflow); returns per shard
    (shard, n_docs, n_seqs, n_overflow_seqs, total_tokens,
    total_padding, padding_frac) where padding counts only non-overflow
    sequences (an over-long singleton has no padding by construction)
    and padding_frac = total_padding / (non_overflow_seqs * L), 4-dec.
    Two narrow aggregations over the packing result — nothing rescans
    the corpus."""
    L = int(seq_tokens)
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.max("overflow").alias("overflow"),
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("overflow").cast("long").alias("n_overflow_seqs"),
            F.sum("seq_tokens").cast("long").alias("total_tokens"),
            F.sum(
                F.when(F.col("overflow") == 0, F.lit(L) - F.col("seq_tokens"))
                .otherwise(F.lit(0))
            ).cast("long").alias("total_padding"),
            F.sum((F.col("overflow") == 0).cast("long")).alias("__n_full"),
        )
        .select(
            "shard", "n_docs", "n_seqs", "n_overflow_seqs",
            "total_tokens", "total_padding",
            F.when(
                F.col("__n_full") > 0,
                F.round(F.col("total_padding")
                        / (F.col("__n_full") * L), 4),
            ).otherwise(F.lit(0.0)).alias("padding_frac"),
        )
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    range_cols: list[Column],
    out_col: str = "rank",
) -> DataFrame:
    """1-based row number in a TOTAL order, without the single-partition
    global window (`row_number().over(Window.orderBy(...))` funnels the
    whole table through one task).

    Same distributed-prefix-sum shape as `concat_chunk_assign`, with a
    unit weight: range-repartition on the order keys (Spark samples the
    key distribution, so partitions are balanced even on skewed counts),
    sort within partitions, count rows per partition with one Arrow pass,
    and offset each partition by the broadcast prefix of earlier
    partition sizes.  The driver only ever holds one long per partition.

    `order_cols` must be a total order (include a unique tiebreak column)
    or ranks are nondeterministic within ties.  `range_cols` are the same
    keys as bare columns (repartitionByRange accepts desc() exprs but the
    partitioner needs the natural columns with matching direction via the
    sort exprs themselves).
    """
    import pandas as pd
    from collections.abc import Iterator

    spark = df.sparkSession
    parts = max(2, spark.sparkContext.defaultParallelism)
    base = (
        df.repartitionByRange(parts, *range_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )

    # fresh StructType — StructType.add mutates in place, and mutating
    # base.schema would make base itself claim a column it doesn't have
    out_schema = T.StructType(
        list(base.schema.fields) + [T.StructField("_local_rn", T.LongType())]
    )

    def rn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = 0
        for pdf in batches:
            if pdf.empty:
                continue
            pdf["_local_rn"] = range(run + 1, run + 1 + len(pdf))
            run += len(pdf)
            yield pdf

    # cache is REQUIRED for correctness, not speed: the range partitioner
    # samples key boundaries per execution, and the partition sizes
    # collected below must describe the SAME partitioning the final join
    # reads — an uncached recompute could place rows in different
    # partitions than the offsets were built for.
    local = base.mapInPandas(rn, out_schema).cache()
    sizes = {
        r._pid: r.ct
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("ct")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(sizes):
        prefix[pid] = acc
        acc += sizes[pid]
    pref_df = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _prefix long"
    )
    return (
        local.join(F.broadcast(pref_df), "_pid")
        .withColumn(out_col, F.col("_prefix") + F.col("_local_rn"))
        .drop("_pid", "_local_rn", "_prefix")
    )


def token_budget_take(
    df: DataFrame,
    budget: int,
    n_tokens_col: str = "n_tokens",
    source_col: str = "source",
    priority_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-source token-budget selection: take documents in priority order
    (descending `priority_col`, key tiebreak) until the source's running
    token total exceeds `budget` — the standard data-mixture step that
    caps each source's contribution in TOKENS, not documents.

    Scale shape: one window partitioned by source — each source's cumsum
    runs inside its own partition group, so the operator scales with the
    number of sources × docs-per-source.  If a single source dwarfs the
    rest (one giant crawl), route that source through the distributed
    prefix sum (`concat_chunk_assign` / `global_rank` pattern) instead of
    a per-key window; for the typical many-domain corpus this shape is
    the cheaper single shuffle."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(priority_col).desc(), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cum_tokens", F.sum(n_tokens_col).over(w).cast("long")
    ).filter(F.col("cum_tokens") <= budget)


def per_group_cap(
    df: DataFrame,
    group_col: str = "source",
    n: int = 10,
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Keep at most `n` rows per group, chosen by deterministic hash order
    — the per-domain cap that stops one crawl host from dominating a
    mixture.  Unlike `LIMIT`-per-group via arbitrary order, the md5 sort
    key makes the selection stable under re-partitioning, insertions of
    unrelated rows, and re-runs.

    Scale shape: one window partitioned by the group key; same skew
    caveat (and escape hatch) as `token_budget_take`."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame,
    rate_col: Column,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic per-row weighted sampling: keep a row with
    probability `rate_col` (clamped to [0,1]) — quality-weighted
    downsampling where better documents survive more often, without any
    RNG state (stable under re-runs/re-partitioning, like every sampler
    in this module).

    The row's md5 bucket (16 bits) is compared against the row's own
    rate edge rendered as a fixed-width hex string, so the whole
    predicate is one narrow JVM map — no shuffle, no UDF."""
    edge = F.least(
        F.lit(65535), F.greatest(F.lit(0), F.floor(rate_col * 65536).cast("long"))
    )
    full = rate_col >= 1.0
    b = _bucket(F.col(key_col), salt)
    return df.filter(full | (b < F.format_string("%04x", edge)))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token windows — the
    context-length chunker feeding sequence packing: windows of
    `chunk_tokens` advancing by (chunk_tokens - overlap), last window
    ragged, every doc emitting at least one chunk.

    Pure narrow map + explode (no shuffle at all): each chunk carries
    (doc_id, chunk_id, n_chunk_tokens, chunk_fp) with the text as an
    md5 fingerprint so downstream exact-dedup of chunks is a groupBy
    away and the exchange never carries chunk text.
    """
    from .text import tokenize

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    tk = tokenize(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), tk.alias("tk"))
    n_chunks = F.greatest(
        F.floor((F.size("tk") - overlap + stride - 1) / stride).cast("int"), F.lit(1)
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda k: k * stride + 1
    )
    exploded = base.select(
        "doc_id", "tk", F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.slice("tk", F.col("start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.substring(F.md5(F.array_join(chunk, " ")), 1, 16).alias("chunk_fp"),
    )


def negative_pairs(
    df: DataFrame, id_col: str = "vec_id", k: int = 4, seed: str = "ns"
) -> DataFrame:
    """Contrastive negative sampling: k deterministic pseudo-random
    negatives per anchor — the (anchor, negative) pair generation behind
    contrastive embedding training / triplet mining, without RNG state
    (md5 is the hash, so runs and engines agree bit-for-bit).

    Shape: a dense 1..n rank via the distributed prefix-sum
    `global_rank` (no single-partition window), then each anchor derives
    k candidate ranks as md5(seed‖id‖':'‖j) mod n and one equi-join on
    rank resolves them to ids.  Self-collisions are dropped (an anchor
    can yield < k pairs — P(self) = 1/n per draw).  Only the corpus size
    n crosses the driver."""
    ids = df.select(id_col).distinct()
    ranked = global_rank(ids, [F.col(id_col)], [F.col(id_col)], "rank")
    n = ids.count()
    expanded = ranked.select(
        id_col, F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j")
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(seed),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = expanded.withColumn("neg_rank", (h % n) + 1)
    return (
        cand.join(
            ranked.select(
                F.col(id_col).alias("neg_id"), F.col("rank").alias("neg_rank")
            ),
            "neg_rank",
        )
        .filter(F.col("neg_id") != F.col(id_col))
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col("j").cast("long").alias("j"),
            "neg_id",
        )
    )


def length_bucket_batches(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    capacity_tokens: int = 1024,
) -> DataFrame:
    """Padding-efficient batch assignment for training: docs bucket by
    padded (power-of-two) token length, and each bucket packs
    ``capacity_tokens // bucket`` docs per batch — the standard
    length-grouped batching that keeps padding waste < 50% without
    sorting the whole corpus by length.

    Distributed rank: within-bucket positions come from the global
    prefix-sum rank over (bucket, id) minus each bucket's start rank —
    NO per-bucket single-partition window, so a dominant bucket (most
    docs are mid-length) can't funnel through one task.

    Returns (id, n_tokens, bucket, batch_id); deterministic (id-ordered
    within bucket)."""
    from ..operators.text import token_count_ws

    base = df.select(
        id_col, token_count_ws(text_col).cast("long").alias("n_tokens")
    )
    # smallest power of two >= n, INTEGER-exact: 2^bit_length(n-1).
    # pow(2, ceil(log2(n))) is a latent off-by-2x: JVM log2(2^29) returns
    # 29.000000000000004, so exact powers of two round UP a bucket (and
    # diverge from DuckDB, whose log2 is exact there).
    bucket = F.expr(
        "CASE WHEN n_tokens <= 1 THEN CAST(1 AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), "
        "length(conv(n_tokens - 1, 10, 2))) END"
    )
    base = base.withColumn("bucket", bucket)
    ranked = global_rank(
        base, [F.col("bucket"), F.col(id_col)], [F.col("bucket"), F.col(id_col)], "__r"
    )
    starts = ranked.groupBy("bucket").agg(F.min("__r").alias("__r0"))
    per_batch = F.greatest(
        (F.lit(capacity_tokens) / F.col("bucket")).cast("long"), F.lit(1)
    )
    return (
        ranked.join(starts, "bucket")
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.floor((F.col("__r") - F.col("__r0")) / per_batch)
            .cast("long")
            .alias("batch_id"),
        )
    )


def weighted_sample_wor(
    df: DataFrame,
    *,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    group_cols: list[str] | None = None,
    seed: str = "wor",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES),
    deterministic: each row draws u = md5-uniform(0,1) from its key and
    scores u^(1/w); the top-k scores per group are exactly a
    weight-proportional sample without replacement.

    No RNG state — reruns, insert-order, and partitioning can't change
    the sample, and the DuckDB twin replays the identical draw.  The
    top-k is a per-group window over (score desc, key) — for a single
    giant group use the salted two-phase top-k (text.top_tokens_by_group)
    shape instead; grouped sampling keys are the normal case.
    Rows with weight <= 0 never sample."""
    groups = list(group_cols or [])
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(float(16**6 + 1))
    score = F.pow(u, 1.0 / F.col(weight_col))
    w = Window.partitionBy(*groups).orderBy(
        F.col("__score").desc(), F.col(key_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__score", score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__score", "__rn")
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 0.7,
    total: int = 1000,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the Gopher/LLaMA-style
    data-mixing knob): source i's share of the `total`-document budget is
    count_i^(1/T) / Σ count_j^(1/T) — T = 1 keeps natural proportions,
    T → ∞ approaches uniform-over-sources, T < 1 sharpens toward the big
    sources.  Deterministic end to end: per-source targets come from a
    broadcast share table (floor of the budget × share, both engines
    rounding the share at 9 dec first so the floor boundary is not a
    last-ulp pow() coin flip), and each source contributes its
    lowest-md5(id) documents — a stable pseudo-random draw, replayable
    bit-for-bit by the SQL oracle.

    A source whose quota exceeds its document count contributes ALL its
    documents and the total undershoots — this operator never repeats
    documents; pipelines that want epoch-style upsampling of small
    sources repeat the draw downstream.

    Plan: one count per source (map-combinable), the share table
    broadcasts back, one window rank per source — a single shuffle over
    the corpus at any scale."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    powed = counts.select(
        source_col, "__n",
        F.pow(F.col("__n").cast("double"), 1.0 / float(temperature)).alias("__w"),
    )
    tot = powed.agg(F.sum("__w").alias("__tw"))
    targets = (
        powed.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.floor(
                F.round(F.lit(float(total)) * F.col("__w") / F.col("__tw"), 9)
            ).cast("long").alias("__target"),
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string"))), id_col
    )
    return (
        df.join(F.broadcast(targets), source_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__target"))
        .select(
            id_col, source_col,
            F.col("__target").alias("source_quota"),
            F.col("__rk").cast("long").alias("draw_rank"),
        )
    )


def shard_assign(
    df: DataFrame,
    docs_per_shard: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic export sharding: documents in id order cut into
    fixed-size shards — (shard_id, pos_in_shard) per doc — the layout a
    training-data export writes (N docs per JSONL shard + a manifest).
    Rides the distributed prefix-sum rank (`global_rank`), so no
    single-partition window ever sees the corpus."""
    ranked = global_rank(
        df, [F.col(id_col).asc()], [F.col(id_col)], out_col="__r"
    )
    return ranked.select(
        id_col,
        ((F.col("__r") - 1) / docs_per_shard).cast("long").alias("shard_id"),
        ((F.col("__r") - 1) % docs_per_shard).cast("long").alias("pos_in_shard"),
    )


def write_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    docs_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the export: one directory per shard of exactly
    ``docs_per_shard`` docs (id order), rows as JSON lines, plus a
    returned manifest (shard_id, n_docs) the loader checks off.  The
    repartition keys on shard_id so each shard is one task's file —
    the write parallelism IS the shard count."""
    spark = df.sparkSession
    assigned = shard_assign(df, docs_per_shard, id_col).join(df, id_col)
    payload = assigned.select(
        "shard_id",
        F.col(id_col).alias("__id"),
        F.to_json(F.struct(F.col(id_col), F.col(text_col))).alias("value"),
    )
    n_shards = payload.agg((F.max("shard_id") + 1).cast("int").alias("n")).collect()[0]["n"]
    if not n_shards:  # empty corpus: empty export, empty manifest
        os.makedirs(out_dir, exist_ok=True)
        return spark.createDataFrame([], "shard_id long, n_docs long")
    (
        # sort on (shard, id) so each shard FILE is in id order — the
        # documented layout resumable position-based loaders rely on;
        # the trailing narrow projection preserves that order
        payload.repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "__id")
        .select("shard_id", "value")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .text(out_dir)
    )
    return assigned.groupBy("shard_id").agg(F.count(F.lit(1)).alias("n_docs"))
