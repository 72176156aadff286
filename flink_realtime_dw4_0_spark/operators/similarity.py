"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine — a crossJoin whose dot products run as
zip_with/aggregate folds inside codegen (no Python).  Scale path: LSH
bucketing via deterministic md5-derived hyperplane signs cuts the
candidate set before the exact re-rank, and an IVF-style coarse quantizer
can reuse the same shape (assign → per-cell join).

Numeric determinism: dot products accumulate left-to-right in float64, so
the DuckDB oracle (list_cosine_similarity over DOUBLE[]) agrees to ~1e-15
relative — thresholds/rounding at 1e-6 granularity are stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    query_filter: Column | None = None,
    vectorized: bool = True,
    block_rows: int = 65536,
    n_blocks: int | None = None,
    broadcast_rows: int = 262144,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (brute force).

    `vectorized=True` (default) picks between two GEMM plans by a counted
    bound — the corpus is NEVER pulled to the driver unguarded:

    * corpus <= `broadcast_rows`: the BROADCAST fast path — collect the
      (provably small) corpus once, broadcast it, and let every partition
      GEMM its slice against it via `mapInPandas`.  No shuffle at all;
      parallelism = input partitions.
    * otherwise (or `n_blocks` forced): the BLOCK-GRID join — vectors are
      hash-assigned to `n_blocks` blocks, each unordered block pair
      (i <= j) meets in exactly one grid cell (triangle replication —
      A-side rows of block b go to cells (b, j>=b), B-side rows to cells
      (i<=b, b)), and each cell runs a chunked float64 GEMM over its two
      blocks.  Nothing is collected to the driver and no block pair is
      materialized twice, so the plan scales with the cluster; per-row
      shuffle amplification is ~n_blocks, the classic O(n*sqrt(n/mem))
      all-pairs trade.  `n_blocks` defaults to ceil(count/block_rows).

    `query_filter` restricts the query side: emitted pairs are (a, b)
    with a.id < b.id and a matching the filter.  In the grid plan the
    filtered side is replicated across the full grid (no triangle
    shortcut — the sides are no longer symmetric).
    """
    if not vectorized:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        if query_filter is not None:
            a = a.filter(query_filter)
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("sim", cosine(F.col("va"), F.col("vb")))
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b")
        )

    import math

    import numpy as np
    import pandas as pd

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_blocks is None:
        n = base.count()
        if n <= broadcast_rows:
            # bounded-by-count broadcast fast path: zero shuffle, corpus
            # collected only after proving it fits the broadcast ceiling
            from collections.abc import Iterator

            spark = df.sparkSession
            corpus = base.collect()
            c_ids = np.array([r.id for r in corpus], dtype=np.int64)
            c_mat = np.array([r.v for r in corpus], dtype=np.float64)
            c_norms = np.sqrt((c_mat * c_mat).sum(axis=1))
            bc = spark.sparkContext.broadcast((c_ids, c_mat, c_norms))
            a = base if query_filter is None else base.filter(query_filter)

            def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                b_ids, b_mat, b_norms = bc.value
                for pdf in batches:
                    if pdf.empty:
                        continue
                    q_ids = pdf["id"].to_numpy(dtype=np.int64)
                    q_mat = np.array(list(pdf["v"]), dtype=np.float64)
                    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
                    sims = (q_mat @ b_mat.T) / np.outer(q_norms, b_norms)
                    qi, bi = np.nonzero(
                        (sims >= threshold) & (q_ids[:, None] < b_ids[None, :])
                    )
                    yield pd.DataFrame({"id_a": q_ids[qi], "id_b": b_ids[bi]})

            return a.mapInPandas(block, "id_a long, id_b long")
        n_blocks = max(1, math.ceil(n / block_rows))
    nb = int(n_blocks)
    symmetric = query_filter is None
    blk = F.pmod(F.xxhash64(F.col("id")), F.lit(nb)).cast("int")

    a_side = base if symmetric else base.filter(query_filter)
    # A rows of block b cover cells (b, j): j in [b, nb) symmetric, all j
    # otherwise; B rows of block b cover cells (i, b): i in [0, b] / all i.
    a_cells = F.sequence(blk if symmetric else F.lit(0), F.lit(nb - 1))
    a_tag = a_side.withColumn("_blk", blk).select(
        F.explode(F.transform(a_cells, lambda j: F.col("_blk") * nb + j)).alias("cell"),
        F.lit(0).alias("role"),
        "id",
        "v",
    )
    b_cells = F.sequence(F.lit(0), blk if symmetric else F.lit(nb - 1))
    b_tag = base.withColumn("_blk", blk).select(
        F.explode(F.transform(b_cells, lambda i: i * nb + F.col("_blk"))).alias("cell"),
        F.lit(1).alias("role"),
        "id",
        "v",
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        pa = pdf[pdf["role"] == 0]
        pb = pdf[pdf["role"] == 1]
        if pa.empty or pb.empty:
            return empty
        a_ids = pa["id"].to_numpy(dtype=np.int64)
        a_mat = np.array(list(pa["v"]), dtype=np.float64)
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_ids = pb["id"].to_numpy(dtype=np.int64)
        b_mat = np.array(list(pb["v"]), dtype=np.float64)
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        cell = int(pdf["cell"].iloc[0])
        diag_or_asym = (not symmetric) or (cell // nb == cell % nb)
        outs = []
        # chunk the A side so the sims buffer stays ~32 MB however large
        # the blocks are
        step = max(1, (1 << 22) // max(1, len(b_ids)))
        for lo in range(0, len(a_ids), step):
            hi = lo + step
            sims = (a_mat[lo:hi] @ b_mat.T) / np.outer(a_norms[lo:hi], b_norms)
            mask = sims >= threshold
            if diag_or_asym:
                # same block (or filtered query side): keep a.id < b.id
                mask &= a_ids[lo:hi, None] < b_ids[None, :]
            ai, bi = np.nonzero(mask)
            ia, ib = a_ids[lo:hi][ai], b_ids[bi]
            if not diag_or_asym:
                # disjoint blocks meet once; normalize pair orientation
                ia, ib = np.minimum(ia, ib), np.maximum(ia, ib)
            outs.append(pd.DataFrame({"id_a": ia, "id_b": ib}))
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        a_tag.unionByName(b_tag)
        .groupBy("cell")
        .applyInPandas(kernel, "id_a long, id_b long")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Scale notes: broadcast the (small) query set against the partitioned
    corpus — each corpus partition computes local candidates, then one
    shuffle on query_id ranks globally.  The rank window uses
    (sim DESC, id ASC) so results are fully deterministic.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(n_tables: int, n_planes: int, dim: int) -> list[list[list[float]]]:
    """Deterministic pseudo-random ±1 hyperplanes (md5-seeded)."""
    import hashlib

    return [
        [
            [
                1.0 if hashlib.md5(f"t{t}p{p}:{d}".encode()).digest()[0] % 2 else -1.0
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 6,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Multi-table LSH ANN: per table, a sign-of-projection bucket signature
    from deterministic ±1 hyperplanes; candidates = union over tables of
    same-bucket vectors; exact cosine re-rank on candidates only.

    Scale path vs brute force: each table's join touches only same-bucket
    pairs (expected n²/2^planes per table), so total work is
    O(L · n²/2^b) instead of O(n²).  Recall/cost is tuned by (L, b).
    Approximate RECALL, deterministic answer (md5-constant hyperplanes) —
    oracle-checked; tests additionally measure recall vs brute force.

    Contract (shared with `brute_force_topk`): `queries` is the PROBE
    set and must be broadcast-sized (thousands to low millions of rows,
    not a second corpus) — it is explicitly broadcast for the post-dedup
    vector join.  For corpus-vs-corpus all-pairs similarity use
    `cosine_pairs`, whose count-gated hybrid never broadcasts unproven
    sizes.
    """
    tables = _hyperplanes(n_tables, n_planes, dim)

    def sig(vec: Column, planes: list[list[float]]) -> Column:
        return F.concat_ws(
            "",
            *[
                (
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(x) for x in pl]),
                            lambda x, y: x.cast("double") * y,
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    > 0
                )
                .cast("int")
                .cast("string")
                for pl in planes
            ],
        )

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        from .split import explode_computed

        # id + bucket ONLY: the bucket join and candidate distinct move
        # narrow rows; a vector sharing b buckets with a query would
        # otherwise ride the exchange b times at dim*8 bytes a copy.
        return explode_computed(
            df,
            [F.col(id_col).alias(idc)],
            F.array(
                *[
                    F.concat(F.lit(f"{ti}:"), sig(F.col(vec_col), pl))
                    for ti, pl in enumerate(tables)
                ]
            ),
            "bucket",
        )

    q = with_buckets(queries, "query_id")
    c = with_buckets(corpus, "neighbor_id")
    # Dedup on ids BEFORE vectors enter the plan, then re-join each vector
    # table exactly once — the distinct shuffles (query_id, neighbor_id)
    # pairs instead of two full embedding arrays per shared bucket.
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _train_ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    sample_cap: int | None = None,
) -> tuple["np.ndarray", int]:  # noqa: F821 — numpy imported lazily
    """Deterministic IVF centroids trained on a BOUNDED corpus sample.

    The sample is the `cap` rows with the smallest xxhash64(id) — a
    deterministic pseudo-random subset whose physical plan is a
    per-partition top-k (TakeOrderedAndProject), so only `cap` rows ever
    reach the driver no matter how large the corpus is.  Seeding is an
    id-ordered stratified pick over the sample, sharpened by one Lloyd
    step (also sample-only).  Returns (centroids, sample_size).
    """
    import numpy as np

    cap = int(sample_cap) if sample_cap is not None else max(n_cells * 64, 1024)
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(cap)
        .collect()
    )
    rows.sort(key=lambda r: r.id)
    mat = np.array([r.v for r in rows], dtype=np.float64)
    stride = max(1, len(rows) // n_cells)
    cents = mat[::stride][:n_cells].copy()
    # one deterministic Lloyd step sharpens the stratified seed
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    for c in range(len(cents)):
        members = mat[assign == c]
        if len(members):
            cents[c] = members.mean(axis=0)
    return cents, len(rows)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    sample_cap: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    its nearest of `n_cells` centroids; a query probes its `nprobe`
    closest cells and exact-ranks only those vectors.

    Centroids are deterministic and trained on a bounded sample (see
    `_train_ivf_centroids`), so results are reproducible run-to-run and
    the driver never holds more than `sample_cap` vectors.
    `refine_iters > 0` sharpens them with that many FULL-DATA distributed
    Lloyd steps (`kmeans_fit` — only the k×dim model crosses the driver),
    tightening cells (lower inertia → better recall per probe) at the
    cost of `refine_iters` extra corpus passes.  Scale path: the cell
    assignment is one numpy pass per partition; search cost drops to
    ~nprobe/n_cells of brute force; at 100 TB the cell id becomes the
    table's partition key so a probe reads only its cells' files.
    Approximate → rows-only; tests measure recall vs brute force.
    """
    spark = corpus.sparkSession
    if refine_iters > 0:
        cents, _ = kmeans_fit(
            corpus, n_cells, refine_iters, id_col, vec_col, sample_cap
        )
    else:
        cents, _ = _train_ivf_centroids(corpus, id_col, vec_col, n_cells, sample_cap)
    bc = spark.sparkContext.broadcast(cents)
    c_cells = _assign_cells(corpus, bc, id_col, vec_col, "neighbor_id", "vc", 1)
    q_cells = _assign_cells(queries, bc, id_col, vec_col, "query_id", "vq", nprobe)
    return _rank_probed(q_cells, c_cells, k)


def _assign_cells(df, bc, id_col, vec_col, out_id, out_vec, probes: int) -> DataFrame:
    """Nearest-`probes` centroid cells per vector — one numpy pass per
    Arrow batch against the broadcast centroid matrix."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(list(pdf[out_vec]), dtype=np.float64)
            dist = ((m[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
            p = min(probes, len(cents_))
            order = np.argsort(dist, axis=1)[:, :p]
            out = pdf.loc[pdf.index.repeat(p)].reset_index(drop=True)
            out["cell"] = order.ravel()
            yield out

    schema = f"{out_id} long, {out_vec} array<float>, cell int"
    return df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec)).mapInPandas(
        fn, schema
    )


def _rank_probed(q_cells: DataFrame, c_cells: DataFrame, k: int) -> DataFrame:
    """Join query probes to corpus cells and exact-rank within the probed
    set (shared tail of the in-memory and materialized-index IVF paths)."""
    scored = (
        q_cells.join(c_cells, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
        .distinct()
    )


def ivf_index_write(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_cap: int | None = None,
) -> None:
    """Materialize the IVF index as a cell-PARTITIONED parquet table +
    sidecar centroids — the 100 TB ANN layout.

    Every vector is written under its nearest cell's partition directory
    (`cell=N/`), so a probe's `cell IN (...)` filter becomes a storage-
    level PartitionFilter: Spark lists and reads ONLY the nprobe probed
    directories, never the other (n_cells - nprobe)/n_cells of the corpus.
    Centroids ride along as `_ivf_centroids.json` (leading underscore:
    ignored by parquet readers)."""
    import json
    import os

    spark = corpus.sparkSession
    cents, _ = _train_ivf_centroids(corpus, id_col, vec_col, n_cells, sample_cap)
    bc = spark.sparkContext.broadcast(cents)
    assigned = _assign_cells(corpus, bc, id_col, vec_col, "neighbor_id", "vc", 1)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        json.dump(cents.tolist(), fh)


def ivf_index_topk(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Probe a materialized IVF index (`ivf_index_write`): assign each
    query its `nprobe` nearest cells, then read ONLY those cells'
    partition directories (static partition pruning — the probed cell set
    is collected first, ≤ n_cells integers) and exact-rank within them.
    Identical results to `ivf_topk` under the same centroids."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "_ivf_centroids.json")) as fh:
        cents = np.array(json.load(fh), dtype=np.float64)
    bc = spark.sparkContext.broadcast(cents)
    q_cells = _assign_cells(queries, bc, id_col, vec_col, "query_id", "vq", nprobe).cache()
    probed = [r.cell for r in q_cells.select("cell").distinct().collect()]
    c_cells = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    return _rank_probed(q_cells, c_cells, k)


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 quantization + L2 norm — the storage-
    shrink step before an ANN index ships (4x smaller, GEMM-friendly).

    q_i = round(127 · x_i / max|x|), computed entirely in JVM array
    expressions (transform/aggregate) — a pure narrow map, zero shuffle
    at any scale.  All arithmetic runs in double so the result is
    bit-identical across engines; the quantized codes are exact integers
    (no float in the output payload — the norm/scale round at 4 dec).
    Zero vectors are dropped (scale undefined)."""
    x2d = lambda x: x.cast("double")  # noqa: E731
    staged = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x2d(x)))).alias("__mx"),
    ).filter(F.col("__mx") > 0)
    sq_sum = F.aggregate(
        F.transform(F.col("__v"), lambda x: x2d(x) * x2d(x)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return staged.select(
        id_col,
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
        F.transform(
            F.col("__v"), lambda x: F.round(x2d(x) * 127 / F.col("__mx")).cast("int")
        ).alias("q_int8"),
        F.round(F.col("__mx"), 4).alias("scale"),
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int | None = None,
) -> tuple["np.ndarray", list[float]]:  # noqa: F821 — numpy imported lazily
    """Distributed Lloyd's k-means over an embedding column.

    The scale contract: per iteration, only the MODEL (k×dim centroid
    floats) crosses the driver boundary — assignment is a broadcast-
    centroid numpy pass per Arrow batch (`_assign_cells`, probes=1), and
    the centroid update reduces (cell, dim) partial sums map-side before
    one k×dim-row shuffle; the full corpus never leaves the executors
    (contrast: the r01 `ivf_topk` trained by collecting the corpus).

    Init reuses `_train_ivf_centroids` (bounded deterministic sample +
    stratified seed + one sample-side Lloyd step); `iters` full-data
    steps refine it.  Assignment ties break toward the lower cell id
    (np.argmin), so the fit is deterministic for a given corpus
    regardless of partitioning.

    Returns (centroids ndarray, per-iteration inertia list) — inertia is
    the summed squared distance to the assigned centroid, the monotone
    non-increasing quantity Lloyd guarantees (up to float summation
    noise on ties).
    """
    import numpy as np

    spark = corpus.sparkSession
    cents, _ = _train_ivf_centroids(corpus, id_col, vec_col, k, sample_cap)
    inertia: list[float] = []
    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)
        assigned = _assign_cells(vecs, bc, "id", "v", "id", "v", probes=1)
        # per-(cell, dim) partial sums: posexplode fans out dim rows per
        # vector, but the partial aggregate combines them map-side to at
        # most parts·k·dim rows before the single shuffle
        sums = (
            assigned.select("cell", F.posexplode("v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        new_cents = cents.copy()
        counts = np.zeros(len(cents))
        acc = np.zeros_like(cents)
        for r in sums:
            acc[r.cell, r.pos] = r.s
            counts[r.cell] = r.c
        nonzero = counts > 0
        new_cents[nonzero] = acc[nonzero] / counts[nonzero, None]
        # inertia of the JUST-USED centroids (cheap: reuses the broadcast)
        inertia.append(_inertia_of(assigned, bc))
        bc.destroy()
        cents = new_cents
    return cents, inertia


def _inertia_of(assigned: DataFrame, bc) -> float:
    """Σ min-distance² under the broadcast centroids — one Arrow pass +
    a scalar sum; nothing but one double reaches the driver."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(list(pdf["v"]), dtype=np.float64)
            c = cents_[pdf["cell"].to_numpy()]
            yield pd.DataFrame({"d2": [float(((m - c) ** 2).sum())]})

    return (
        assigned.mapInPandas(fn, "d2 double").agg(F.sum("d2").alias("s")).collect()[0].s
        or 0.0
    )


def semantic_dedup_drops(
    df: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = 64,
    max_cell_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into clusters, compare
    embeddings ONLY within a cluster, and drop every vector that has a
    lower-id cluster-mate above the cosine threshold (keep-first policy).

    Clustering here is a deterministic sign-projection cell code from
    md5-derived ±1 hyperplanes (the same constants family as
    `lsh_bucket_topk`) standing in for SemDeDup's k-means assignment —
    deterministic, trainless, and exactly replayable by the SQL oracle.

    Scale shape vs `cosine_pairs` all-pairs: comparisons are
    O(sum over cells of k_c^2) instead of O(n^2); cell count is 2^n_planes,
    so raising n_planes keeps expected cell size ~n/2^b as the corpus
    grows.  The vectors shuffle ONCE on the cell code; each cell's
    self-join is local to its partition group.  `max_cell_size` optionally
    chunks oversized cells under a salted deterministic order (same design
    as dedup._cap_buckets) — unlike multi-band LSH, pairs split across
    chunks are LOST (no second band to recover them), which is the
    standard SemDeDup recall/cost dial.

    Returns distinct (cell, drop_id) — each vector lives in exactly one
    cell, so drop_id is unique in the output.
    """
    planes = _hyperplanes(1, n_planes, dim)[0]
    bits = [
        F.when(
            _dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in pl])) > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for pl in planes
    ]
    cells = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                      F.concat(*bits).alias("cell"))
    if max_cell_size is not None:
        from .dedup import _cap_buckets

        cells = _cap_buckets(cells, max_cell_size, group_cols=("cell",), id_col="__id")
    # both self-join sides consume the cell assignment; without this the
    # n_planes x dim dot products run twice (no exchange reuse across the
    # differently-projected join branches) — same deliberate cache as the
    # prefix-jaccard double-consumed subplan
    cells = cells.cache()
    a = cells.select("cell", F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = cells.select("cell", F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("__va"), F.col("__vb")) >= F.lit(threshold))
    )
    return pairs.select("cell", F.col("id_b").alias("drop_id")).distinct()


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int | None = None,
):
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector space is cut
    into `m` subspaces; each subspace gets its own `k_codes`-centroid
    codebook, so a d-dim float vector compresses to m small codes
    (m bytes at k<=256) with quantization error far below a single
    global codebook of the same budget (k^m effective cells).

    Training is deterministic and driver-bounded exactly like
    `_train_ivf_centroids`: the smallest-xxhash64(id) `sample_cap` rows
    are the sample, each subspace runs `iters` numpy Lloyd steps from an
    id-ordered stratified seed.  Returns (codebooks ndarray of shape
    (m, k_codes, d//m), sample_size); only this k·d-float model ever
    sits on the driver, regardless of corpus size.
    """
    import numpy as np

    cap = int(sample_cap) if sample_cap is not None else max(k_codes * 64, 1024)
    rows = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")), F.col("id"))
        .limit(cap)
        .collect()
    )
    rows.sort(key=lambda r: r.id)
    if not rows:
        raise ValueError(
            "pq_train: empty training sample (empty corpus, or every "
            "vector was dropped upstream, e.g. by a zero-norm filter)"
        )
    mat = np.array([r.v for r in rows], dtype=np.float64)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, k_codes, dsub))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        stride = max(1, len(sub) // k_codes)
        cents = sub[::stride][:k_codes].copy()
        if len(cents) < k_codes:
            # tiny corpus (< k_codes training rows): cycle the sample so
            # the codebook keeps its declared shape — duplicate centroids
            # are harmless (argmin picks the first) and Lloyd may still
            # separate them
            cents = np.resize(cents, (k_codes, dsub))
        for _ in range(iters):
            dist = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)
            for c in range(k_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books, len(rows)


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the index of the nearest
    codebook centroid.  One vectorized numpy pass per Arrow batch against
    the broadcast (m, k, dsub) model — a narrow map, zero shuffle; output
    is (id, codes array<int>), m ints per vector (m bytes on disk after
    parquet dictionary encoding)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(codebooks))

    def enc(batches):
        books = bc.value
        m, k, dsub = books.shape
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                sub = x[:, j * dsub : (j + 1) * dsub]
                dist = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = dist.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.select(id_col, vec_col).mapInPandas(enc, f"{id_col} long, codes array<int>")


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m: int = 16,
    k_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int | None = None,
    rerank: int = 8,
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k with exact re-ranking: queries
    stay float; each query precomputes an (m × k_codes) lookup table of
    squared distances from its subvectors to every codebook centroid,
    and a corpus vector's approximate distance is just m table lookups
    summed over its codes — no float vector ever touches the scan side.
    The ADC pass shortlists ``k·rerank`` candidates per query; only that
    shortlist's float vectors are fetched (a semi-join on id) for the
    exact cosine re-rank — the classic ADC-R design (Jégou et al. 2011),
    which buys back the quantization error at the cost of reading
    q·k·rerank full vectors instead of the whole corpus.

    Scale shape: the codebooks AND the query LUTs broadcast (queries are
    the small side, as in brute_force_topk); the corpus pass reads only
    (id, m codes) — 4-32x less I/O than raw floats — computes the
    gather-sum per Arrow batch in numpy, keeps a local shortlist per
    partition, one shuffle on query_id ranks the global shortlist, and
    the re-rank join touches q·k·rerank rows.  ``rerank=0/1`` disables
    re-ranking (pure ADC order).  Approximate → rows-only check; recall
    is pytest-measured against brute force.  Ordering ties break on
    neighbor_id, so results are deterministic."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession

    # L2-normalize first: brute-force ranks by COSINE, and on the unit
    # sphere cosine order == L2 order, so the ADC approximation targets
    # the same ranking (without this, vector norms leak into the code
    # distances and recall drops ~noticeably).  JVM-side transform.
    def normed(df):
        v = F.col(vec_col)
        nrm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        return df.filter(nrm > 0).select(
            id_col,
            F.transform(v, lambda x: x.cast("double") / nrm).alias(vec_col),
        )

    corpus = normed(corpus)
    queries = normed(queries)
    books, _ = pq_train(
        corpus, m, k_codes, id_col=id_col, vec_col=vec_col, sample_cap=sample_cap
    )
    codes = pq_encode(corpus, books, id_col, vec_col)
    return _pq_adc_search(
        spark, queries, codes, books, k=k, rerank=rerank,
        id_col=id_col, vec_col=vec_col,
        refine_with=corpus if int(rerank) > 1 else None,
    )


# ADC gather chunk size (queries per block): bounds every numpy
# temporary at qchunk*n doubles (~80 MB at the default Arrow batch),
# flat in the number of queries.
_ADC_QCHUNK = 1024


def _adc_scan_block(ids, tables, c, nid, shortk):
    """Chunked ADC gather-sum + per-partition shortlist, shared by the
    flat-PQ and IVFADC probes: returns (query_id, neighbor_id, adist)
    numpy arrays.  ``tables`` is (Q, m, k) per-query LUTs; ``c`` is
    (n, m) codes; ``nid`` the n corpus ids.

    The pre-r11 implementation computed the whole distance matrix in
    one fancy-index expression, materializing the full (Q, n, m)
    gather tensor before the subspace sum — 8+ GB PER ARROW BATCH at
    the sf10 ladder point (8k probes x 8k codes x m=16), every page of
    it zeroed by the kernel (transparent-huge-page fault storm): the
    profiled stage ran 75-80% SYSTEM time across 25 workers.  Chunking
    the queries and accumulating a (qchunk, n) block per subspace
    keeps the peak temporary bounded and flat in Q, with identical
    output (same per-row argpartition over the same distances)."""
    import numpy as np

    if tables.shape[0] == 0:
        # zero queries in the broadcast set: the chunk loop would leave
        # the parts lists empty and np.concatenate([]) raises — return
        # typed empties so the kernel keeps the pre-r11 empty-frame
        # contract even if the driver-side guard ever admits Q=0
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    n, m = c.shape
    nloc = min(int(shortk) + 1, n)
    cols = [np.ascontiguousarray(c[:, j]) for j in range(m)]
    q_parts, n_parts, d_parts = [], [], []
    for q0 in range(0, tables.shape[0], _ADC_QCHUNK):
        tq = tables[q0:q0 + _ADC_QCHUNK]
        adist = tq[:, 0, cols[0]].copy()
        for j in range(1, m):
            np.add(adist, tq[:, j, cols[j]], out=adist)
        part = np.argpartition(adist, nloc - 1, axis=1)[:, :nloc]
        q_parts.append(np.repeat(ids[q0:q0 + tq.shape[0]], nloc))
        n_parts.append(nid[part].ravel())
        d_parts.append(np.take_along_axis(adist, part, axis=1).ravel())
    return (np.concatenate(q_parts), np.concatenate(n_parts),
            np.concatenate(d_parts))


def _pq_adc_search(
    spark,
    queries: DataFrame,
    codes: DataFrame,
    books,
    *,
    k: int,
    rerank: int,
    id_col: str,
    vec_col: str,
    refine_with: DataFrame | None,
) -> DataFrame:
    """Shared ADC search over an (id, codes) relation: broadcast
    per-query distance LUTs, numpy gather-sum per Arrow batch with a
    local shortlist, one shuffle on query_id, optional exact-cosine
    re-rank of the q*k*rerank shortlist against ``refine_with`` (float
    vectors).  Backs both pq_topk (codes built per call) and
    pq_index_topk (codes read from a materialized index)."""
    import numpy as np
    import pandas as pd

    books = np.asarray(books, dtype=np.float64)
    q_rows = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("vq")).collect()
    qids = np.array([r.qid for r in q_rows], dtype=np.int64)
    qmat = np.array([r.vq for r in q_rows], dtype=np.float64)
    mm, kk, dsub = books.shape
    # LUT[q, j, c] = ||q_sub_j - books[j, c]||^2
    luts = np.empty((len(qids), mm, kk))
    for j in range(mm):
        sub = qmat[:, j * dsub : (j + 1) * dsub]
        luts[:, j, :] = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
    bc_luts = spark.sparkContext.broadcast((qids, luts))
    topk = int(k)
    shortk = topk * max(int(rerank), 1)

    def scan(batches):
        ids, tables = bc_luts.value
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.array(list(pdf["codes"]), dtype=np.int64)      # (n, m)
            nid = pdf[id_col].to_numpy()
            # adist[q, n] = sum_j tables[q, j, c[n, j]], computed in
            # bounded query chunks (see _adc_scan_block); the local
            # top-(shortlist+1) per query bounds shuffle volume — +1 so
            # dropping the self-match later can never evict a true
            # candidate found in this partition
            oq, on, od = _adc_scan_block(ids, tables, c, nid, shortk)
            yield pd.DataFrame(
                {"query_id": oq, "neighbor_id": on, "adist": od}
            )

    scored = codes.mapInPandas(
        scan, "query_id long, neighbor_id long, adist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("srank", F.row_number().over(w_adc))
        .filter(F.col("srank") <= shortk)
        .drop("srank")
    )
    if refine_with is None or rerank <= 1:
        return (
            shortlist.withColumn("rank", F.row_number().over(w_adc).cast("long"))
            .filter(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", F.round("adist", 6).alias("adist"))
        )
    # exact re-rank: fetch float vectors for the q*k*rerank shortlist
    # rows only, score true cosine, final window
    cvec = refine_with.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
    qvec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    exact = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    )
    w_sim = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_sim).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def _l2_normalize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.col(vec_col)
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return df.filter(nrm > 0).select(
        id_col, F.transform(v, lambda x: x.cast("double") / nrm).alias(vec_col)
    )


def ivfadc_index_write(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 16,
    k_codes: int = 32,
    sample_cap: int | None = None,
) -> None:
    """Materialize an IVFADC index (Jégou et al. 2011's IVF + residual
    product quantization — the FAISS `IVFx,PQy` architecture and the
    standard billion-vector layout): vectors are L2-normalized, assigned
    to their nearest coarse IVF cell, the RESIDUAL v − centroid(cell) is
    PQ-encoded (residuals are small, so a fixed code budget quantizes
    them far tighter than raw vectors), and the index stores only
    (id, m codes) partitioned by `cell=N/` directories.

    At scale this is both prunings at once: a probe reads only its
    nprobe cells' DIRECTORIES (storage-level partition filter) and
    within them only m-byte codes, never floats — I/O drops by
    (nprobe/n_cells) × (m/(4·dim)) versus a flat scan.  Sidecars
    `_ivf_centroids.json` / `_pq_codebooks.json` carry the model
    (k·dim + m·k·dsub floats — trivially broadcastable)."""
    import json
    import os

    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    normed = _l2_normalize(corpus, id_col, vec_col)
    cents, _ = _train_ivf_centroids(normed, id_col, vec_col, n_cells, sample_cap)
    bc_c = spark.sparkContext.broadcast(cents)

    def residual(batches):
        c = bc_c.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            cell = d.argmin(axis=1)
            res = x - c[cell]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": cell.astype("int32"), "resid": list(res)}
            )

    resid = normed.mapInPandas(
        residual, f"{id_col} long, cell int, resid array<double>"
    )
    books, _ = pq_train(
        resid, m, k_codes, id_col=id_col, vec_col="resid", sample_cap=sample_cap
    )
    # encode inline (pq_encode would drop the cell column; a rejoin to
    # recover it would shuffle — this stays one narrow pass)
    bc_b = spark.sparkContext.broadcast(np.asarray(books))

    def enc(batches):
        bks = bc_b.value
        mm, kk, dsub = bks.shape
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["resid"]), dtype=np.float64)
            cd = np.empty((len(x), mm), dtype=np.int32)
            for j in range(mm):
                sub = x[:, j * dsub : (j + 1) * dsub]
                dist = ((sub[:, None, :] - bks[j][None, :, :]) ** 2).sum(axis=2)
                cd[:, j] = dist.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": pdf["cell"], "codes": list(cd)}
            )

    resid.mapInPandas(enc, f"{id_col} long, cell int, codes array<int>").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as fh:
        json.dump(cents.tolist(), fh)
    with open(os.path.join(path, "_pq_codebooks.json"), "w") as fh:
        json.dump(np.asarray(books).tolist(), fh)


def ivfadc_index_topk(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    refine_with: DataFrame | None = None,
    rerank: int = 4,
) -> DataFrame:
    """Search a materialized IVFADC index: assign each query its nprobe
    cells, read ONLY those `cell=N/` directories (static partition
    pruning over the collected ≤ n_cells probed ids), score codes by ADC
    against per-(query, cell) residual LUTs, keep a per-partition
    shortlist, rank globally.  With `refine_with` (the original float
    corpus) the k·rerank shortlist is exact-cosine re-ranked — FAISS's
    IVFADC-R refinement — touching only q·k·rerank full vectors."""
    import json
    import os

    import numpy as np
    import pandas as pd

    with open(os.path.join(path, "_ivf_centroids.json")) as fh:
        cents = np.array(json.load(fh), dtype=np.float64)
    with open(os.path.join(path, "_pq_codebooks.json")) as fh:
        books = np.array(json.load(fh), dtype=np.float64)
    mm, kk, dsub = books.shape

    q_rows = _l2_normalize(queries, id_col, vec_col).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("vq")
    ).collect()
    qids = np.array([r.qid for r in q_rows], dtype=np.int64)
    qmat = np.array([r.vq for r in q_rows], dtype=np.float64)
    qd = ((qmat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probe_cells = np.argsort(qd, axis=1)[:, : int(nprobe)]

    # per-(query, probed cell) residual LUTs: lut[j, c] = ||r_sub_j - book[j,c]||^2
    luts: dict[int, tuple] = {}
    for ci in sorted(set(probe_cells.flatten().tolist())):
        sel = np.nonzero((probe_cells == ci).any(axis=1))[0]
        res = qmat[sel] - cents[ci]
        lt = np.empty((len(sel), mm, kk))
        for j in range(mm):
            sub = res[:, j * dsub : (j + 1) * dsub]
            lt[:, j, :] = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        luts[int(ci)] = (qids[sel], lt)
    bc = spark.sparkContext.broadcast(luts)
    topk, shortk = int(k), int(k) * max(int(rerank), 1)

    probed = sorted(luts)
    codes = spark.read.parquet(path).filter(F.col("cell").isin(probed))

    def scan(batches):
        tables = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            parts = []
            for cell, grp in pdf.groupby("cell"):
                ent = tables.get(int(cell))
                if ent is None:
                    continue
                ids, lt = ent
                c = np.array(list(grp["codes"]), dtype=np.int64)
                nid = grp[id_col].to_numpy()
                # chunked gather-sum (see _adc_scan_block) — the same
                # (Q, n, m) tensor bomb as the flat-PQ scan, fixed once
                parts.append(_adc_scan_block(ids, lt, c, nid, shortk))
            if parts:
                yield pd.DataFrame({
                    "query_id": np.concatenate([p[0] for p in parts]),
                    "neighbor_id": np.concatenate([p[1] for p in parts]),
                    "adist": np.concatenate([p[2] for p in parts]),
                })

    scored = codes.mapInPandas(
        scan, "query_id long, neighbor_id long, adist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("srank", F.row_number().over(w_adc))
        .filter(F.col("srank") <= shortk)
        .drop("srank")
    )
    if refine_with is None:
        return (
            shortlist.withColumn("rank", F.row_number().over(w_adc).cast("long"))
            .filter(F.col("rank") <= topk)
            .select("query_id", "rank", "neighbor_id", F.round("adist", 6).alias("adist"))
        )
    cvec = refine_with.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vc"))
    qvec = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vq"))
    exact = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    )
    w_sim = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w_sim).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def pq_index_write(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    k_codes: int = 32,
    sample_cap: int | None = None,
) -> None:
    """Materialize a FLAT PQ index: L2-normalize, train the m-subspace
    codebooks once, and store only (id, m codes) parquet plus a
    `_pq_codebooks.json` sidecar (m*k*dsub floats — trivially
    broadcastable).  The storage-side counterpart of `pq_topk`: repeated
    searches pay ONLY the code scan + LUT gather (the probe), never the
    train+encode pass — the same memoization-by-materialization that
    takes `ivfadc_index_write` from train-per-call to ~1 s probes, minus
    the coarse cells (a flat ADC scan reads every code, but codes are
    already 4-32x smaller than floats; use IVFADC when storage pruning
    matters too)."""
    import json
    import os

    normed_c = _l2_normalize(corpus, id_col, vec_col)
    books, _ = pq_train(
        normed_c, m, k_codes, id_col=id_col, vec_col=vec_col, sample_cap=sample_cap
    )
    pq_encode(normed_c, books, id_col, vec_col).write.mode("overwrite").parquet(path)
    import numpy as np

    with open(os.path.join(path, "_pq_codebooks.json"), "w") as fh:
        json.dump(np.asarray(books).tolist(), fh)


def pq_index_topk(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 8,
    refine_with: DataFrame | None = None,
) -> DataFrame:
    """Search a materialized flat-PQ index: load the codebook sidecar,
    broadcast per-query LUTs, ADC-scan the stored (id, codes) relation,
    and (optionally) exact-cosine re-rank the q*k*rerank shortlist
    against ``refine_with`` float vectors (ADC-R).  Query-side work is
    q*m*k_codes LUT floats; the corpus pass reads codes only."""
    import json
    import os

    import numpy as np

    with open(os.path.join(path, "_pq_codebooks.json")) as fh:
        books = np.array(json.load(fh), dtype=np.float64)
    codes = spark.read.parquet(path)
    qn = _l2_normalize(queries, id_col, vec_col)
    return _pq_adc_search(
        spark, qn, codes, books, k=k, rerank=rerank,
        id_col=id_col, vec_col=vec_col,
        refine_with=refine_with if int(rerank) > 1 else None,
    )


def kcenter_select(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Greedy k-center (farthest-point) selection — the classic 2-approx
    coreset: pick the min-id vector, then k-1 times pick the point
    farthest from the selected set.  The curation use is DIVERSITY
    sampling: a budgeted subset whose covering radius over the corpus is
    within 2x of optimal, complementing frequency-based mixtures.

    Scale shape: the per-row state is ONE double (distance to the
    nearest selected center), updated each round by a narrow JVM
    zip_with/aggregate pass against the newest center (broadcast as a
    literal array — k·dim floats total ever leave the driver), and the
    next center is a single max_by row.  k rounds = k narrow passes + k
    1-row aggregates; lineage localCheckpoints every few rounds so round
    cost stays flat.  Deterministic (min-id seed, max-dist/min-id
    tiebreak) → partition-invariant; approximate by nature → rows-only
    with property tests (radius monotonicity, determinism).

    Returns (center_rank, id, radius_after) — radius_after is the
    corpus-wide covering radius once this center joined."""
    import math

    state = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    first = state.orderBy("id").limit(1).collect()[0]
    centers = [(1, first["id"])]
    cur_vec = list(first["v"])
    state = state.withColumn("d2", F.lit(float("inf")))
    radii = []
    out_rows = []
    for rank in range(1, int(k) + 1):
        lit_vec = F.array(*[F.lit(float(x)) for x in cur_vec])
        step = F.aggregate(
            F.zip_with("v", lit_vec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        state = state.withColumn("d2", F.least(F.col("d2"), step))
        if rank % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
        far = state.agg(
            F.max(F.struct(F.col("d2"), (-F.col("id")).alias("nid"), F.col("id"), F.col("v"))).alias("m")
        ).collect()[0]["m"]
        out_rows.append((rank, centers[-1][1], round(math.sqrt(far["d2"]), 6)))
        if rank < k:
            centers.append((rank + 1, far["id"]))
            cur_vec = list(far["v"])
    spark = corpus.sparkSession
    return spark.createDataFrame(
        out_rows, "center_rank int, vec_id long, radius_after double"
    )
