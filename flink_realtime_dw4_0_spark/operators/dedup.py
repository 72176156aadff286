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

from .split import explode_computed
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


def shingles_of(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a pre-tokenized array column.

    Implementation note: Catalyst inlines the token expression into every
    reference inside the lambda (CollapseProject), so the tokenizer regex
    would re-run per reference.  slice+array_join references `tokens` once
    per gram (vs n element_at calls) — measured 5x faster than the
    concat_ws(element_at...) formulation."""
    idx = F.sequence(F.lit(1), F.size(tokens) - n + 1)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i, n), " "))
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document (tokenizes inline —
    prefer the staged `_shingled` path inside this module for hot loops)."""
    return shingles_of(tokenize(col), n)


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, sh) shingle table, spread across the cluster.

    Source corpora often arrive as few large files (the sf0.1 documents
    table is ONE parquet partition); shingling is CPU-bound, so fan out to
    the default parallelism before computing.

    The fan-out hashes on the id (r12): every consumer that aggregates
    or joins per document downstream (the minhash signature groupBy, the
    verify rollups) then inherits HashPartitioning(doc_id) through the
    explode and needs NO further Exchange — the signature stage's
    min(string) SortAggregate collapses from sort→partial→shuffle→sort→
    final to one complete-mode pass (measured 1.0-2.0 s → ~0.7 s at
    sf0.1; plan: 2 Exchange → 1).  Distinct ids hash evenly, so the
    spread matches the old round-robin (guide §2.4: reuse one exchange
    for everything keyed the same way)."""
    parts = df.rdd.getNumPartitions()
    target = df.sparkSession.sparkContext.defaultParallelism
    if parts < target:
        df = df.repartition(target, F.col(id_col))
    tk = df.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    return tk.select("doc_id", shingles_of(F.col("tk"), n).alias("sh"))


def _shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_freq: int | None,
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, shingle) inverted index + per-doc shingle counts."""
    sh = _shingled(df, id_col, text_col, n)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    # Cached: costs this query ~1.4s of materialization at sf0.1, but the
    # cache manager matches the identical logical subplan from the minhash
    # signature stage, saving ~7s across the dedup suite when both run in
    # one session (the common pipeline case).
    inv = explode_computed(sh, ["doc_id"], "sh", "shingle").cache()
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
        .select(
            "id_a", "id_b", "inter",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """AllPairs/PPJoin-style prefix-filtered similarity join.

    Uncapped (default): identical output to `ngram_jaccard_pairs`,
    asymptotically far less work — sets with jaccard >= t must share a
    shingle within their *prefixes* (first |s| - ceil(t*|s|) + 1 shingles
    under a global rare-first ordering), so only prefix entries are
    indexed for candidate generation; candidates then get one exact
    verification pass.  At scale this bounds the self-join to
    rare-shingle collisions instead of every co-occurring pair.

    With `max_shingle_freq`: shingles appearing in more than that many
    docs (boilerplate grams — the df-filter / stopword idea) are dropped
    FIRST, and jaccard is computed entirely over the surviving sets
    (intersection AND sizes), so a boilerplate cluster of 10^5 identical
    docs contributes no candidates at all — that is the exact tier's job
    (`exact_dedup`).  Sub-quadratic even when every doc has replicas.
    """
    from pyspark.sql.window import Window

    capped = max_shingle_freq is not None
    # Cache audit (r13): only MULTI-consumer stages persist.  Uncapped,
    # the shingle table feeds the index AND the verify stage — cached;
    # capped, verify reads the df-filtered `ranked` table instead and sh
    # has exactly one consumer, so caching it was pure materialization
    # cost (extras are timed cache-cold).  The exploded inverted index
    # has ONE consumer (the freq window) in both modes — its former
    # cache() materialized the full exploded index for nothing; the
    # minhash tier keeps its own sh-subplan cache for cross-query reuse.
    sh = _shingled(df, id_col, text_col, n)
    if not capped:
        sh = sh.cache()
    inv = explode_computed(sh, ["doc_id"], "sh", "shingle")
    # Global shingle frequency via a window (one shuffle by shingle), then
    # rank + per-doc size in a single doc_id shuffle — shingles are
    # distinct per doc, so count-over-doc == |shingle set|.
    w_freq = Window.partitionBy("shingle")
    w_doc = Window.partitionBy("doc_id")
    w_rank = w_doc.orderBy("freq", "shingle")
    ranked = inv.withColumn("freq", F.count(F.lit(1)).over(w_freq))
    if capped:
        ranked = ranked.filter(F.col("freq") <= max_shingle_freq).cache()
    # prefix test pos <= n - ceil(t*n) + 1, done in exact integer
    # arithmetic: ceil(num*n/den) <= n - pos + 1  <=>  num*n <= den*(n-pos+1)
    # (float t*n drops candidates on exact boundaries, e.g. 0.3*10 -> 3.0000000000000004)
    n_sh = F.col("n_sh")
    prefix = (
        ranked.withColumn("pos", F.row_number().over(w_rank))
        .withColumn("n_sh", F.count(F.lit(1)).over(w_doc).cast("long"))
        .filter(
            F.lit(threshold_num) * n_sh
            <= F.lit(threshold_den) * (n_sh - F.col("pos") + 1)
        )
        .select("doc_id", "shingle", "n_sh")
        # cached: the self-join consumes BOTH sides of this subplan, and
        # Catalyst does not ReusedExchange across the join — uncached, the
        # freq/rank windows run twice (measured 2x window work at sf0.1)
        .cache()
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # AllPairs length filter: jaccard >= num/den caps intersection at
    # min(|a|,|b|), so min*(den+num) >= num*(|a|+|b|) must hold — prunes
    # size-incompatible pairs before the distinct (24% fewer candidates
    # on the test corpus; far more on a length-diverse 100 TB corpus)
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n_sh"), F.col("b.n_sh"))
                * (threshold_den + threshold_num)
                >= F.lit(threshold_num) * (F.col("a.n_sh") + F.col("b.n_sh"))
            ),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # verify arrays come from the SAME universe the candidates did:
    # full shingle sets when uncapped, df-filtered sets when capped
    ver = (
        ranked.groupBy("doc_id").agg(F.collect_list("shingle").alias("sh")).cache()
        if capped
        else sh
    )
    sha = ver.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = ver.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("n_a", F.size("sh_a").cast("long"))
        .withColumn("n_b", F.size("sh_b").cast("long"))
        .filter(
            F.col("inter") * (threshold_den + threshold_num)
            >= threshold_num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b", "inter", "n_a", "n_b")
    )


def ngram_jaccard_pairs_prefix_capped(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_shingle_freq: int = 50,
) -> DataFrame:
    """The ngram tier's plan of record for duplicate-heavy corpora:
    `ngram_jaccard_pairs_prefix` with the df-filter cap on (see its
    docstring for the capped semantics — jaccard over the surviving
    shingle universe on both sides)."""
    return ngram_jaccard_pairs_prefix(
        df, id_col, text_col, n, threshold_num, threshold_den,
        max_shingle_freq=max_shingle_freq,
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
    assert num_perm % 4 == 0
    sh = explode_computed(_shingled(df, id_col, text_col, n), ["doc_id"], "sh", "shingle")
    # 4 permutations per md5: each digest yields four independent 32-bit
    # (8-hex-char) slices — 4x less hashing than one md5 per permutation
    sigs = [
        F.min(
            F.substring(
                F.md5(F.concat(F.lit(f"p{i // 4}:"), F.col("shingle"))), 1 + 8 * (i % 4), 8
            )
        ).alias(f"mh{i}")
        for i in range(num_perm)
    ]
    return sh.groupBy("doc_id").agg(*sigs)


def minhash_bands(sig: DataFrame, num_perm: int, band_size: int) -> DataFrame:
    """(doc_id, band, bucket) LSH index rows from a signature table —
    each band's bucket is md5 over its `band_size` signature slots."""
    n_bands = num_perm // band_size
    return explode_computed(
        sig,
        ["doc_id"],
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
        ),
        "bb",
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    band_size: int = 4,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + LSH near-dup candidate pairs, verified with exact integer
    jaccard >= num/den.

    Bands of `band_size` signature slots are hashed to buckets; docs
    sharing any bucket become candidates (the only pairs ever shuffled —
    this is what scales to 100 TB), then candidates are verified exactly.

    `max_bucket_size` bounds the per-(band,bucket) candidate fan-out: a
    bucket of k docs otherwise emits k*(k-1)/2 join rows, and
    duplicate-heavy corpora (the normal case for dedup — boilerplate
    clusters of 1e5 docs are routine at 100 TB) make a single hot bucket
    quadratic.  Members of an oversized bucket are deterministically
    chunked into sub-buckets of <= max_bucket_size by a PER-BAND salted
    order (row_number over md5(band:doc_id)), so each band partitions a
    hot cluster DIFFERENTLY; pairs split in one band collide in another,
    and the union of per-band chunk cliques keeps the cluster connected
    for `connected_components` (golden-tested).  Cost per bucket drops
    from O(k^2) to O(k * max_bucket_size).  The salt is md5, so the
    DuckDB oracle mirrors the capped plan bit-for-bit.
    """
    assert num_perm % band_size == 0
    sig = minhash_signatures(df, id_col, text_col, n, num_perm)
    if max_bucket_size is None:
        # only the uncapped bands⋈bands self-join consumes the signature
        # subtree twice; the capped path is one linear chain through
        # _cap_buckets/_bucket_pairs, where a cache is pure
        # materialization cost (r13 cache audit)
        sig = sig.cache()
    bands = minhash_bands(sig, num_perm, band_size)
    if max_bucket_size is not None:
        # Per-band salted deterministic order, then fixed-size chunking.
        # One extra shuffle of the (doc_id, band, bucket) table — narrow
        # rows, and the pair generation below reuses the same keys.
        bands = _cap_buckets(bands, max_bucket_size)
        # Capped path (r12): sub-buckets are bounded by max_bucket_size,
        # so per-bucket pairs can be enumerated from ONE collect_list row
        # instead of a bands⋈bands self-join — the band table (and its
        # cap window) is computed once instead of twice, and no join
        # build side is materialized.  Identical candidate set
        # (equality-tested); measured ~0.8x on the dup-stress corpus.
        # The uncapped branch keeps the self-join: without the cap a hot
        # bucket's collect_list row would be unbounded (guide §5 — never
        # put corpus-sized state in one row).
        cand = _bucket_pairs(bands)
    else:
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
    # Exact verify on candidates only: join the candidate pair list (tiny
    # after LSH — it is the point of LSH that it is) against the cached
    # shingle table twice and intersect the arrays directly.  Arrays move
    # only for matched rows, and the pair list side is broadcast-sized, so
    # the verify is two broadcast-ish joins + a codegen array_intersect —
    # measured 6x faster than rebuilding a candidate-restricted inverted
    # index (whose extra shuffles dominate when candidates are few).
    # Bucket floods are bounded upstream by `max_bucket_size`, so the
    # candidate list stays linear in corpus size even on dup-heavy data.
    sh = _shingled(df, id_col, text_col, n).cache()
    sha = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    shb = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sha, "id_a")
        .join(shb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn("n_a", F.size("sh_a").cast("long"))
        .withColumn("n_b", F.size("sh_b").cast("long"))
        .filter(
            F.col("inter") * (threshold_den + threshold_num)
            >= threshold_num * (F.col("n_a") + F.col("n_b"))
        )
        .select("id_a", "id_b", "inter", "n_a", "n_b")
    )


def _bucket_pairs(
    bands: DataFrame,
    group_cols: tuple[str, ...] = ("band", "bucket"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct within-group id pairs (id_a < id_b) for SIZE-BOUNDED
    groups: one collect_list per group, pairs enumerated from the sorted
    array.  Callers must guarantee a group-size bound (the `_cap_buckets`
    cap) — each group becomes one row carrying its member array, so an
    unbounded group would be unbounded row state.  Equivalent to the
    bands⋈bands self-join but computes the (usually window-capped) band
    table once instead of twice and builds no join hash relation."""
    ids = F.array_sort(F.collect_list(id_col))
    g = (
        bands.groupBy(*group_cols)
        .agg(ids.alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    pairs = F.flatten(
        F.transform(
            "__ids",
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + 2, F.size("__ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        g.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def simhash(col: Column | str, bits: int = 32) -> Column:
    """32-bit SimHash: per token, bit i comes from the i-th hex nibble's
    high bit of md5(token); bits are sign-summed over tokens.

    Returns the sketch as an array<int> of ±sums; `simhash_bits` collapses
    to the 0/1 vector.  All md5/substring ops — portable + codegen.
    """
    # hash each token ONCE; every bit then reads one hex nibble of the
    # cached digest (32 passes over cheap substrings, not 32x md5)
    hashes = F.transform(tokenize(col), lambda t: F.md5(t))
    return F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                h.substr(i, F.lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
            ).otherwise(-1),
        ),
    )


def simhash_bits(col: Column | str, bits: int = 32) -> Column:
    return F.transform(simhash(col, bits), lambda s: (s > 0).cast("int"))


def _cap_buckets(
    bands: DataFrame,
    max_bucket_size: int,
    group_cols: tuple[str, ...] = ("band", "bucket"),
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk oversized groups into sub-buckets of <= max_bucket_size
    under an md5-salted deterministic order — shared by the MinHash and
    SimHash candidate generators (see `minhash_lsh_pairs` for the
    recall/connectivity argument) and by
    `similarity.semantic_dedup_drops` (group_cols=('cell',)).  The salt
    mixes the first group col with the id so multi-band callers chunk
    each band differently; the chunk suffix lands on the LAST group col.
    """
    from pyspark.sql.window import Window

    chunk_col = group_cols[-1]
    salt = F.md5(
        F.concat_ws(
            ":", F.col(group_cols[0]).cast("string"), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(salt, id_col)
    return (
        bands.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            chunk_col,
            F.concat_ws(
                "#",
                chunk_col,
                F.floor((F.col("__rn") - 1) / max_bucket_size).cast("string"),
            ),
        )
        .drop("__rn")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: banded candidate generation (docs sharing at
    least one identical band of bits), then exact hamming <= max_hamming.

    `max_bucket_size` bounds per-(band,bucket) fan-out exactly like
    `minhash_lsh_pairs` — a boilerplate cluster of k identical docs shares
    every band bucket, and uncapped would emit k^2/2 candidate rows."""
    # stage 1: hash tokens once, physically (cache blocks Catalyst from
    # re-inlining the md5 array into all `bits` lambdas below)
    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokenize(text_col), lambda t: F.md5(t)).alias("hs"),
    ).cache()
    bit_sums = F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda i: F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                h.substr(i, F.lit(1)).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1
            ).otherwise(-1),
        ),
    )
    sig = hashed.select(
        "doc_id", F.transform(bit_sums, lambda s: (s > 0).cast("int")).alias("bv")
    ).cache()
    band_w = bits // bands
    banded = explode_computed(
        sig,
        ["doc_id"],
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
        ),
        "bb",
    ).select("doc_id", "bb.band", "bb.bucket")
    if max_bucket_size is not None:
        # capped groups are size-bounded: enumerate pairs per sub-bucket
        # from one collect_list row (see _bucket_pairs) — band table and
        # its cap window computed once, no self-join build side
        banded = _cap_buckets(banded, max_bucket_size)
        cand = _bucket_pairs(banded)
    else:
        a = banded.alias("a")
        b = banded.alias("b")
        # dedupe candidates on ids only — distinct over rows carrying two
        # 32-int arrays shuffles ~10x more bytes for the same answer
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
    sva = sig.select(F.col("doc_id").alias("id_a"), F.col("bv").alias("bv_a"))
    svb = sig.select(F.col("doc_id").alias("id_b"), F.col("bv").alias("bv_b"))
    # cast to long: F.size yields INT while any SQL-oracle twin's
    # sum(CASE...) aggregate widens — normalize the width Spark-side so
    # value-hash comparisons see identical types (driver contract)
    hamming = F.size(
        F.filter(F.zip_with("bv_a", "bv_b", lambda x, y: x != y), lambda z: z)
    ).cast("long")
    return (
        cand.join(sva, "id_a")
        .join(svb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _components_driver(pairs: DataFrame, rows: list) -> DataFrame:
    """Union-find on the driver for a PROVEN-small pair graph (the
    caller gates on ONE bounded collect and passes the rows — the pairs
    plan is never executed twice; same proven-small design as the cosine
    broadcast/grid hybrid).  Labels are identical to the distributed
    loops: every node -> minimum reachable id (union always attaches the
    larger root under the smaller)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        ra, rb = find(r.id_a), find(r.id_b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {r.id_a for r in rows} | {r.id_b for r in rows}
    spark = pairs.sparkSession
    from pyspark.sql.types import StructField, StructType

    dt = pairs.schema["id_a"].dataType
    schema = StructType(
        [StructField("doc_id", dt), StructField("component", dt)]
    )
    return spark.createDataFrame(
        [(n, find(n)) for n in sorted(nodes)], schema
    )


# Pair graphs below this count solve on the driver (one bounded collect);
# above it, the distributed loops run.  ~100k pairs ≈ a few MB of ids —
# far under any driver budget, while saving 10-50 iterative Spark jobs
# whose fixed launch cost dwarfs the work at the small end.
COMPONENTS_DRIVER_THRESHOLD = 100_000


def connected_components(
    pairs: DataFrame,
    max_iterations: int = 25,
    driver_threshold: int | None = COMPONENTS_DRIVER_THRESHOLD,
) -> DataFrame:
    """Connected components over a near-dup pair graph: (node, component)
    where component = the minimum doc id reachable from the node.

    Hash-min label propagation: every node starts labeled with itself;
    each round every node takes the min of its own and its neighbors'
    labels; stop when a round changes nothing.  Each round is one
    shuffle-join + map-side-combinable min-aggregation — fully
    distributed, no driver-side graph.  Rounds needed = cluster diameter,
    which for near-dup clusters is tiny (dup sets are quasi-cliques: most
    pairs connect directly).  For adversarial long-chain graphs switch to
    alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce"), which converges in O(log n)
    rounds with the same join/agg primitives.

    The per-round convergence check is one count job on the changed set —
    cheap next to the join, and it lets clean corpora exit after round 1.

    Count-gated hybrid: a pair graph proven ≤ ``driver_threshold`` rows
    solves with driver union-find — tens of iterative Spark jobs cost
    more than the data at the small end.  The gate makes this API eager
    (it runs the limited collect at call time).  The id-projected pairs
    are persisted across the gate, so partitions the gate scanned are
    NOT recomputed on the distributed path — the upstream (typically
    shuffle-heavy LSH/fuzzy-join) plan executes once per partition
    either way, and the gate's extra materialization is bounded at
    threshold+1 id rows.  Pass ``driver_threshold=None``/0 to keep the
    call fully lazy and force the distributed loop.
    """
    ids = pairs.select("id_a", "id_b")
    if driver_threshold:
        ids = ids.persist()
        head = ids.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            ids.unpersist()
            return _components_driver(pairs, head)
    e = ids.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).cache()
    labels = (
        edges.select("u").distinct().withColumn("lbl", F.col("u")).cache()
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            .cache()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("lbl", "old"), "u")
            .filter(F.col("lbl") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if not changed:
            break
    # release the edge cache: the returned labels are themselves cached,
    # and their lineage can rebuild edges if that cache is ever evicted
    edges.unpersist()
    if driver_threshold:
        ids.unpersist()
    return labels.select(F.col("u").alias("doc_id"), F.col("lbl").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    max_iterations: int = 20,
    driver_threshold: int | None = COMPONENTS_DRIVER_THRESHOLD,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the O(log n)-round alternative to `connected_components`'
    hash-min propagation, whose round count is the cluster DIAMETER.

    Near-dup clusters are quasi-cliques (diameter ~2), so hash-min is the
    default; this variant is for adversarial chain-shaped graphs (e.g.
    overlapping-window shingle chains), where diameter rounds at 100 TB
    would mean hundreds of shuffles.

    Each round:
      large-star: every node connects its LARGER neighbors to its current
        minimum neighbor (strictly decreases larger-neighbor edges);
      small-star: every node connects its smaller-or-equal neighbors to
        the minimum (contracts stars onto their centers).
    Both steps are one groupBy-min + one join each — the same shuffle
    primitives as hash-min, just fewer rounds.  Convergence: when the
    small-star step changes nothing, every node points at its component
    minimum.  Output matches `connected_components` exactly
    (equality-tested, incl. a chain where hash-min needs length rounds).
    """
    ids = pairs.select("id_a", "id_b")
    if driver_threshold:
        # same persisted-across-the-gate design as connected_components:
        # the gate's partial scan is reused, never recomputed
        ids = ids.persist()
        head = ids.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            ids.unpersist()
            return _components_driver(pairs, head)
    # canonical directed edges hi -> lo (hi > lo), one row per undirected
    # edge; both star steps emit canonically, so set-compare is exact
    e = ids.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    edges = (
        e.select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )

    def large_star(ed: DataFrame) -> DataFrame:
        # full (symmetrized) neighborhood; every neighbor v > u attaches
        # to m(u) = min(N(u) ∪ {u}); output rows are (v, m) with v > m
        sym = ed.unionByName(ed.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("mv"), F.col("u"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # edges already point hi -> lo: attach every smaller neighbor and
        # the center itself to m(u) = min of the smaller neighborhood
        mins = ed.groupBy("u").agg(F.min("v").alias("mv"))
        return (
            ed.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("mv").alias("v"))
            .unionByName(mins.select("u", F.col("mv").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(max_iterations):
        # localCheckpoint truncates lineage: iterative self-referential
        # plans otherwise double in analysis cost every round (the loop
        # would spend its time in Catalyst, not in the shuffles)
        ss = small_star(large_star(edges)).localCheckpoint(eager=True)
        # converged when small-star output == current edges (set equality
        # via two anti-join emptiness probes on the narrow pair sets)
        changed = (
            ss.join(edges, ["u", "v"], "left_anti").limit(1).count()
            or edges.join(ss, ["u", "v"], "left_anti").limit(1).count()
        )
        edges = ss
        if not changed:
            break
    # final edges form stars: u -> component minimum; minima themselves
    # appear only as targets, so add them back as their own component.
    # nodes come from the persisted id projection (not pairs) and are
    # checkpointed eagerly so the persisted gate input can be released
    # without the lazy result re-executing the upstream pairs plan
    nodes = (
        ids.select(F.col("id_a").alias("doc_id"))
        .unionByName(ids.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if driver_threshold:
        ids.unpersist()
    return (
        nodes.join(edges.withColumnRenamed("u", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("v", "doc_id").alias("component"))
    )


def keep_best_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    components_fn=None,
) -> DataFrame:
    """Quality-aware keep policy: per near-dup component, keep the BEST
    member — most whitespace tokens, then smallest id — instead of
    ``dedup_keep_list``'s arbitrary min-id representative.  This is the
    curation policy real pretraining dedup uses (among near-duplicates,
    the longest/cleanest copy survives; truncated or boilerplate-padded
    variants drop).

    Scale shape: the same components pass as ``dedup_keep_list``, one
    narrow quality projection (token count, JVM-side), and ONE window
    ranked within components — window partitions are near-dup families,
    which are bounded by the pair-graph caps, never corpus-sized."""
    from pyspark.sql.window import Window

    comps = (components_fn or connected_components)(pairs)
    eff = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokenize(text_col)).alias("__q"),
        )
        .join(comps, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc(), F.col("doc_id")
    )
    return eff.withColumn(
        "keep", (F.row_number().over(w) == 1).cast("int")
    ).select("doc_id", "component", "keep")


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    components_fn=None,
) -> DataFrame:
    """The end of the dedup pipeline: every document labeled with its
    near-dup component and a keep flag (keep the min-id representative of
    each component; docs in no pair are their own singleton component).

    This is what a 100 TB curation run actually materializes — the pair
    list is an intermediate; the keep-list joins back to the corpus as a
    single broadcast-or-shuffle equi-join on doc id.

    ``components_fn`` selects the clustering algorithm (default hash-min,
    whose round count is the cluster DIAMETER; pass
    ``connected_components_star`` for chain-shaped pair graphs — both
    produce identical min-id labels, equality-tested)."""
    comps = (components_fn or connected_components)(pairs)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
            (F.coalesce("component", "doc_id") == F.col("doc_id"))
            .cast("int")
            .alias("keep"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 5,
) -> DataFrame:
    """Benchmark decontamination — flag corpus documents sharing at least
    `min_overlap` distinct n-gram shingles with the benchmark/eval set
    (the standard guard against test-set leakage into training data).

    Scale shape: the benchmark's distinct shingle set is tiny next to the
    corpus (eval suites are thousands of docs), so it broadcasts; the
    corpus-side inverted index then needs NO shuffle for the probe — the
    only shuffle is the per-doc overlap count, map-side combinable.
    Returns every corpus doc: (doc_id, overlap, contaminated).
    """
    inv_c = explode_computed(
        _shingled(corpus, id_col, text_col, n), ["doc_id"], "sh", "shingle"
    )
    bench_sh = (
        explode_computed(
            _shingled(benchmark, id_col, text_col, n), ["doc_id"], "sh", "shingle"
        )
        .select("shingle")
        .distinct()
    )
    # shingles are distinct per doc, so count(1) == distinct overlap
    hits = (
        inv_c.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            (F.coalesce("overlap", F.lit(0)) >= min_overlap).cast("int").alias("contaminated"),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 5,
    k_hashes: int = 3,
    prefix_len: int = 4,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the fixed-size variant of
    `decontaminate`: instead of broadcasting the benchmark's raw shingle
    strings (unbounded as eval suites grow), broadcast its BLOOM FILTER:
    the set of bit positions lit by `k_hashes` md5-derived hash functions
    over an m = 16^prefix_len position space (default 65,536).  The
    broadcast is bounded by m regardless of benchmark size — the 100 TB
    contract.

    Positions are hex prefixes of md5("bloom{i}:" || shingle), compared
    as strings — engine-portable with no integer conversions.  A probe
    shingle "hits" iff all k of its positions are set; a doc is flagged
    when >= min_overlap distinct shingles hit.  One-sided error as with
    any Bloom filter: overlap_est >= true overlap (no false negatives;
    deterministic false-positive rate ~(bits_set/m)^k), so every doc the
    exact operator flags is flagged here too — property-tested.

    Returns every corpus doc: (doc_id, overlap_est, contaminated).
    """
    def positions(shingle: Column) -> list[Column]:
        return [
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}:"), shingle)), 1, prefix_len
            )
            for i in range(k_hashes)
        ]

    bench_sh = (
        explode_computed(
            _shingled(benchmark, id_col, text_col, n), ["doc_id"], "sh", "shingle"
        )
        .select("shingle")
        .distinct()
    )
    bloom = explode_computed(
        bench_sh.select(F.array(*positions(F.col("shingle"))).alias("pp")),
        [], "pp", "pos",
    ).distinct()
    probe_sh = explode_computed(
        _shingled(corpus, id_col, text_col, n), ["doc_id"], "sh", "shingle"
    )
    probe = explode_computed(
        probe_sh.select(
            "doc_id", "shingle", F.array(*positions(F.col("shingle"))).alias("pp")
        ),
        ["doc_id", "shingle"], "pp", "pos",
    )
    # per (doc, shingle): all k exploded positions must be set (duplicate
    # positions within a shingle's k-tuple match consistently, so the
    # joined-row count equals k iff every position is in the filter)
    sh_hits = (
        probe.join(F.broadcast(bloom), "pos")
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == k_hashes)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("overlap_est"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(sh_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("overlap_est", F.lit(0)).cast("long").alias("overlap_est"),
            (F.coalesce("overlap_est", F.lit(0)) >= min_overlap).cast("int").alias("contaminated"),
        )
    )


def substring_dup_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win: int = 8,
    fp_hex: int = 16,
) -> DataFrame:
    """Substring-level duplication profile — the token-window analogue of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): for every length-`win` token window in
    every document, count how many windows recur ANYWHERE in the corpus
    (cross- or intra-document).  Doc-level dedup misses exactly these —
    boilerplate headers, license blocks, quoted passages — which is why
    substring dedup is its own tier in pretraining pipelines.

    Scale shape: windows travel as `fp_hex`-char md5 fingerprints, not
    the window text, so the global frequency shuffle carries 16 bytes
    per window instead of the window itself (~64+ bytes at win=8); the
    frequency count is map-side combinable.  Two shuffles total
    (fp count, per-doc rollup).  Fingerprint collisions at 64 bits are
    ~n²/2^65 — absent at any feasible corpus size, and the oracle
    replays the same fingerprints so the check is still exact.

    Returns every doc: (doc_id, n_windows, n_dup_windows, dup_ratio).
    """
    # same fan-out as _shingled: fingerprinting is CPU-bound and source
    # corpora often arrive as one big file; hashed on the doc id (r12) so
    # the per-doc rollup and the final join inherit the partitioning
    parts = df.rdd.getNumPartitions()
    target = df.sparkSession.sparkContext.defaultParallelism
    if parts < target:
        df = df.repartition(target, F.col(id_col))
    toks = df.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    n = F.size("tk")
    fps = F.when(
        n >= win,
        F.transform(
            F.sequence(F.lit(1), n - win + 1),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice("tk", i, win), " ")), 1, fp_hex
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # cached: consumed by the frequency explode AND the final rollup join
    with_fps = toks.select("doc_id", fps.alias("fps")).cache()
    e = explode_computed(with_fps, ["doc_id"], "fps", "fp")
    freq = e.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    dup = (
        e.join(freq.filter(F.col("n") > 1), "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    return (
        with_fps.join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.size("fps").cast("long").alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.when(
                F.size("fps") > 0,
                F.round(F.coalesce("n_dup", F.lit(0)) / F.size("fps"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
        )
    )


def substring_dedup_rewrite(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    win: int = 8,
    fp_hex: int = 16,
) -> DataFrame:
    """Exact substring deduplication as a REWRITE — the actionable step
    of Lee et al. 2022 (arXiv:2107.06499) that `substring_dup_profile`
    only measures: every length-`win` token window that recurs anywhere
    in the corpus keeps its GLOBAL FIRST occurrence (ordered by
    (doc_id, pos)) and every other occurrence's tokens are cut from the
    text.  A token is removed iff at least one duplicate window covers
    it; tokens of the first copy survive.  Docs shorter than `win`
    tokens pass through untouched.

    Returns (doc_id, n_tokens, n_removed, text_clean) where text_clean
    is the kept tokens rejoined with single spaces over the NORMALIZED
    token stream (lowercased, whitespace-collapsed — the same `tokenize`
    every dedup tier uses), '' when a doc is entirely duplicate.

    Scale shape: windows travel as `fp_hex`-char md5 fingerprints; the
    first-occurrence reduction is ONE window pass over fp (row_number
    ordered by (doc, pos), r12 — the former groupBy(fp).min(struct) +
    join-back shuffled the occurrence table by fp twice and the
    min(struct) forced a SortAggregate; the window shuffles it once and
    sorts once, measured 0.55-0.72x end to end); only DUPLICATE
    occurrences fan out (×win) to covered positions, shuffled as
    (doc, int) pairs; the rebuild is one per-doc aggregation bounded by
    document length.  The initial fan-out hashes on the doc id, so the
    token explode, the anti-join's probe side, the rebuild groupBy and
    the final join all reuse one partitioning.  Nothing is ever
    quadratic in the corpus — the fp table is linear in total tokens.
    """
    parts = df.rdd.getNumPartitions()
    target = df.sparkSession.sparkContext.defaultParallelism
    if parts < target:
        df = df.repartition(target, F.col(id_col))
    toks = df.select(F.col(id_col).alias("doc_id"), tokenize(text_col).alias("tk"))
    n = F.size("tk")
    fps = F.when(
        n >= win,
        F.transform(
            F.sequence(F.lit(1), n - win + 1),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice("tk", i, win), " ")), 1, fp_hex
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = toks.select(
        "doc_id", F.posexplode(fps).alias("idx", "fp")
    ).select("doc_id", (F.col("idx") + 1).alias("pos"), "fp")
    from pyspark.sql.window import Window

    w_first = Window.partitionBy("fp").orderBy("doc_id", "pos")
    dups = (
        occ.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") > 1)
        .select("doc_id", "pos")
    )
    removed = dups.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + win - 1)).alias("p"),
    ).distinct()
    tok = toks.select("doc_id", F.posexplode("tk").alias("idx", "w")).select(
        "doc_id", (F.col("idx") + 1).alias("p"), "w"
    )
    kept = tok.join(removed, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("text_clean"),
    )
    return (
        toks.select("doc_id", n.cast("long").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_removed"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string — the candidate-generation
    key for fuzzy string matching (trigram indexing, the pg_trgm /
    Elasticsearch ngram approach)."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - n + 1), lambda i: F.substring(c, i, n)
    )
    # guard like shingles_of: sequence(1, 0) DESCENDS in Spark, so a
    # short string would emit bogus grams instead of none
    return F.when(F.length(c) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def fuzzy_join_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_edit: int = 2,
    n: int = 3,
    max_gram_freq: int | None = 50,
) -> DataFrame:
    """Fuzzy self-join (entity resolution): pairs of rows whose strings
    are within `max_edit` Levenshtein distance, found via shared
    character-trigram candidates + exact edit-distance verify — the
    classic trigram-index plan (pg_trgm), sized for clusters: no
    quadratic all-pairs compare, candidates only where a DISCRIMINATIVE
    trigram collides.

    `max_gram_freq` drops trigrams appearing in more than that many
    strings (stopgram removal — shared prefixes like 'Customer#0' would
    otherwise pair everyone); like the LSH tiers, recall is bounded by
    the candidate rule (two strings with NO surviving shared trigram are
    not compared) and the oracle mirrors the same rule, so the check is
    exact.  Candidate rows carry ids only; strings join back once for
    the O(candidates) verify.  Returns (id_a, id_b, dist).
    """
    s = df.select(F.col(id_col).alias("__id"), F.col(str_col).alias("__s"))
    g = explode_computed(
        s.select("__id", char_ngrams("__s", n).alias("__g")), ["__id"], "__g", "gram"
    )
    if max_gram_freq is not None:
        hot = (
            g.groupBy("gram")
            .count()
            .filter(F.col("count") > max_gram_freq)
            .select("gram")
        )
        g = g.join(F.broadcast(hot), "gram", "left_anti")
    a = g.select("gram", F.col("__id").alias("id_a"))
    b = g.select("gram", F.col("__id").alias("id_b"))
    cand = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = s.select(F.col("__id").alias("id_a"), F.col("__s").alias("__sa"))
    sb = s.select(F.col("__id").alias("id_b"), F.col("__s").alias("__sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("__sa", "__sb").cast("long"))
        .filter(F.col("dist") <= max_edit)
        .select("id_a", "id_b", "dist")
    )
