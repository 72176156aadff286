"""Deduplication operators for training-data pipelines.

Four tiers, all expressed as DataFrame plans so Catalyst distributes them:

  * exact          — hash-groupBy on a normalized fingerprint
  * ngram-jaccard  — shingle inverted-index self-join + integer-exact
                     jaccard threshold
  * minhash-lsh    — md5-based minhash signatures → banded buckets →
                     candidate pairs → exact-jaccard verify
  * simhash        — 32-bit sign-sum sketch from per-token md5 bits,
                     banded hamming candidate generation

Engine-portability: every hash is md5 (identical hex in Spark and the
DuckDB oracle) and every threshold comparison is integer arithmetic, so
even the approximate pipelines are bit-deterministic and oracle-checkable.

Scale notes (100 TB):
  * exact dedup shuffles once on the fingerprint — the min-id reduction is
    map-side combinable.
  * the shingle inverted index explodes ~|doc| rows/doc; frequency-capping
    hot shingles (drop shingles appearing in > N docs) bounds the
    self-join blowup — exposed via `max_shingle_freq`.
  * minhash-LSH is the scale path: candidate generation touches only
    docs sharing a band bucket; bucket sizes are bounded the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import doc_fingerprint, tokenize


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min-id representative per content fingerprint."""
    return (
        df.withColumn("fp", doc_fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    toks = tokenize(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )


def _shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, shingle) inverted index + per-doc shingle counts."""
    sh = df.select(F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("sh"))
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    # the inverted index feeds both sides of the self-join — materialize it
    # once instead of re-deriving the shingle transform per branch
    inv = sh.select("doc_id", F.explode("sh").alias("shingle")).cache()
    if max_shingle_freq is not None:
        hot = (
            inv.groupBy("shingle")
            .count()
            .filter(F.col("count") > max_shingle_freq)
            .select("shingle")
        )
        inv = inv.join(F.broadcast(hot), "shingle", "left_anti")
    return inv, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs with jaccard(shingles) >= num/den.

    The threshold test is exact integer arithmetic:
        inter/(a+b-inter) >= num/den  <=>  inter*(den+num) >= num*(a+b)
    """
    inv, sizes = _shingle_index(df, id_col, text_col, n, max_shingle_freq)
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(
            F.col("inter") * (threshold_den + threshold_num)
            >= threshold_num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b", "inter", "n_a", "n_b")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """MinHash signature per doc: for each of `num_perm` seeded md5
    "permutations", the minimum of md5(seed || shingle) over the doc's
    shingles.  Hex-string min == min over a fixed pseudo-random order —
    standard minhash, but portable across engines.
    """
    sh = df.select(F.col(id_col).alias("doc_id"), F.explode(shingles(text_col, n)).alias("shingle"))
    sigs = [
        F.min(F.md5(F.concat(F.lit(f"p{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    band_size: int = 2,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified with exact integer
    jaccard >= num/den.

    Bands of `band_size` signature slots are hashed to buckets; docs
    sharing any bucket become candidates (the only pairs ever shuffled —
    this is what scales to 100 TB), then candidates are verified exactly.
    """
    assert num_perm % band_size == 0
    sig = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    n_bands = num_perm // band_size
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col(f"mh{bi * band_size + j}") for j in range(band_size)]
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # exact verify on candidates only
    sh = df.select(F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("sh")).cache()
    sha = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("n_a", F.size("sh_a"))
        .withColumn("n_b", F.size("sh_b"))
        .filter(
            F.col("inter") * (threshold_den + threshold_num)
            >= threshold_num * (F.col("n_a") + F.col("n_b"))
        )
    )
    return verified.select("id_a", "id_b", "inter", "n_a", "n_b")


def simhash(col: Column | str, bits: int = 32) -> Column:
    """32-bit SimHash: per token, bit i comes from the i-th hex nibble's
    high bit of md5(token); bits are sign-summed over tokens.

    Returns the sketch as an array<int> of ±sums; `simhash_bits` collapses
    to the 0/1 vector.  All md5/substring ops — portable + codegen.
    """
    toks = tokenize(col)
    return F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.substring(F.md5(t), 1, 32).substr(i, F.lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1),
        ),
    )


def simhash_bits(col: Column | str, bits: int = 32) -> Column:
    return F.transform(simhash(col, bits), lambda s: (s > 0).cast("int"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: banded candidate generation (docs sharing at
    least one identical band of bits), then exact hamming <= max_hamming."""
    sig = df.select(
        F.col(id_col).alias("doc_id"), simhash_bits(text_col, bits).alias("bv")
    ).cache()
    band_w = bits // bands
    banded = sig.select(
        "doc_id",
        "bv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "",
                            *[
                                F.element_at("bv", bi * band_w + j + 1).cast("string")
                                for j in range(band_w)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bv", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.bv").alias("bv_a"),
            F.col("b.bv").alias("bv_b"),
        )
        .distinct()
    )
    hamming = F.size(F.filter(F.zip_with("bv_a", "bv_b", lambda x, y: x != y), lambda z: z))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
