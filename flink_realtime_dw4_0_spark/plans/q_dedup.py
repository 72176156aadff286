"""Dedup + similarity + text + multimodal tier (the LLM-curation core):
exact/minhash/simhash/jaccard dedup, ANN over embeddings, text
features, and the multimodal container plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from ..operators import (  # noqa: F401
    dedup, etl, joins, multimodal, project, sampling, similarity, split, text,
)
from ..operators.windows import windowed_agg  # noqa: F401
from ..sources.files import load_table  # noqa: F401
from ._registry import CATALOG, QuerySpec, q, t, _DK_TOKS  # noqa: F401


# ===========================================================================
# D — deduplication (training-data pipeline operators)
# ===========================================================================

_DK_SHINGLES = """
WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk FROM documents),
sh AS (SELECT doc_id,
              CASE WHEN len(tk) >= 3
                   THEN list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] for i in range(1, len(tk) - 1)])
                   ELSE [] END AS s
       FROM toks),
inv AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(s) AS n FROM sh)
"""


@q(
    "dedup_exact",
    f"""
    SELECT md5(list_aggregate(string_split_regex(lower(trim(text)), '\\s+'), 'string_agg', ' ')) AS fp,
           min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    tags=("dedup",),
    bench=True,
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-content fingerprint; one
    shuffle, map-side combinable."""
    return dedup.exact_dedup(t(spark, sf_dir, "documents"))


@q(
    "dedup_ngram_jaccard",
    _DK_SHINGLES
    + """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT p.id_a AS id_a, p.id_b AS id_b, p.inter AS inter,
           sa.n AS n_a, sb.n AS n_b
    FROM pairs p JOIN sizes sa ON p.id_a = sa.doc_id
                 JOIN sizes sb ON p.id_b = sb.doc_id
    WHERE p.inter * 3 >= (sa.n + sb.n)
    """,
    tags=("dedup",),
    bench=True,
    scale_contract=(
        "exact-reference: uncapped AllPairs candidates grow "
        "super-linearly on dense vocab (measured exp_last 1.61 over a "
        "100x span, BENCH_SCALE.json) — plan of record at scale: "
        "dedup_ngram_capped (measured flat) or the dedup_minhash_lsh "
        "tier (exp 0.28)"
    ),
)
def dedup_jaccard_q(spark, sf_dir):
    """N-gram jaccard near-dup pairs (threshold 1/2, integer-exact test).

    Runs the AllPairs/PPJoin prefix-filtered plan — identical output to
    the naive inverted-index self-join (equality-tested) but the
    candidate join touches only rare-shingle *prefixes*, so a hot shingle
    appearing in k docs no longer costs k²/2 join rows.  This is the plan
    of record at corpus scale AND the fastest at this SF; the naive plan
    remains available as `dedup.ngram_jaccard_pairs` (the oracle mirrors
    it directly)."""
    return dedup.ngram_jaccard_pairs_prefix(t(spark, sf_dir, "documents"))


def _minhash_oracle(
    num_perm: int = 16, band_size: int = 4, max_bucket_size: int | None = None
) -> str:
    sigs = ",\n           ".join(
        f"min(substr(md5('p{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8)) AS mh{i}"
        for i in range(num_perm)
    )
    n_bands = num_perm // band_size
    band_selects = "\n      UNION ALL ".join(
        "SELECT doc_id, {bi} AS band, md5({expr}) AS bucket FROM sig".format(
            bi=bi,
            expr=" || '|' || ".join(f"mh{bi * band_size + j}" for j in range(band_size)),
        )
        for bi in range(n_bands)
    )
    # Mirror of the Spark-side hot-bucket cap: per-band salted row_number
    # chunks oversized buckets into sub-buckets of <= max_bucket_size.
    cap = (
        f""",
    bands AS (SELECT doc_id, band,
                     bucket || '#' || CAST((row_number() OVER (
                         PARTITION BY band, bucket
                         ORDER BY md5(CAST(band AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), doc_id
                     ) - 1) // {max_bucket_size} AS VARCHAR) AS bucket
              FROM bands0)"""
        if max_bucket_size is not None
        else ""
    )
    bands_name = "bands0" if max_bucket_size is not None else "bands"
    return (
        _DK_SHINGLES
        + f"""
    , sig AS (SELECT doc_id, {sigs} FROM inv GROUP BY doc_id),
    {bands_name} AS ({band_selects}){cap},
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    ver AS (SELECT c.id_a, c.id_b,
                   len(list_intersect(sa.s, sb.s)) AS inter,
                   len(sa.s) AS n_a, len(sb.s) AS n_b
            FROM cand c JOIN sh sa ON c.id_a = sa.doc_id
                        JOIN sh sb ON c.id_b = sb.doc_id)
    SELECT id_a, id_b, inter, n_a, n_b FROM ver WHERE inter * 3 >= (n_a + n_b)
    """
    )


@q(
    "dedup_minhash_lsh",
    _minhash_oracle(max_bucket_size=50),
    tags=("dedup", "lsh"),
    bench=True,
)
def dedup_minhash_q(spark, sf_dir):
    """MinHash+LSH near-dup pairs: md5-permutation signatures → banded
    buckets → candidates → exact-jaccard verify.  Deterministic and
    engine-portable, so even the LSH stage is oracle-checked.

    Runs with the hot-bucket cap on (max_bucket_size=50): a boilerplate
    cluster of k docs costs O(k*50) candidate rows instead of O(k^2) —
    the plan of record for dup-heavy corpora; the oracle mirrors the
    capped sub-bucketing bit-for-bit (per-band md5-salted chunks)."""
    return dedup.minhash_lsh_pairs(t(spark, sf_dir, "documents"), max_bucket_size=50)


@q(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    hs AS (SELECT doc_id, md5(tok) AS h FROM toks),
    bits AS (
      SELECT doc_id, g.i,
             sum(CASE WHEN substr(h, CAST(g.i AS INT), 1)
                      IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s
      FROM hs, generate_series(1, 32) AS g(i)
      GROUP BY doc_id, g.i),
    bv AS (SELECT doc_id, i, CASE WHEN s > 0 THEN 1 ELSE 0 END AS b FROM bits),
    buckets AS (
      SELECT doc_id, CAST((i - 1) // 8 AS INT) AS band,
             string_agg(CAST(b AS VARCHAR), '' ORDER BY i) AS bucket
      FROM bv GROUP BY doc_id, (i - 1) // 8),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    ham AS (
      SELECT c.id_a, c.id_b,
             CAST(sum(CASE WHEN va.b != vb.b THEN 1 ELSE 0 END) AS BIGINT) AS hamming
      FROM cand c JOIN bv va ON va.doc_id = c.id_a
                  JOIN bv vb ON vb.doc_id = c.id_b AND va.i = vb.i
      GROUP BY c.id_a, c.id_b)
    SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3
    """,
    tags=("dedup", "simhash"),
)
def dedup_simhash_q(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 3 over 32-bit sketches); banded
    candidate generation.  The sketch is md5-nibble sign sums — integer
    arithmetic end to end — so even the bit-level pipeline has a DuckDB
    twin (upgraded from r2's rows-only check); pytest additionally
    verifies recall against planted near-dups."""
    return dedup.simhash_pairs(t(spark, sf_dir, "documents"))


# ===========================================================================
# S — similarity search over embeddings
# ===========================================================================

@q(
    "ann_cosine_pairs",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.3
    """,
    tags=("similarity",),
    bench=True,
    scale_contract=(
        "output-bound: within-cluster pair count is quadratic by "
        "SEMANTICS (measured exp_last 1.84 tracks pair growth 102x for "
        "10x rows; time-per-output-row improved) — bounded variants at "
        "scale: ann_brute_force_topk / dedup_semantic_cells"
    ),
)
def ann_pairs(spark, sf_dir):
    """Brute-force cosine similarity join (threshold 0.3)."""
    return similarity.cosine_pairs(t(spark, sf_dir, "embeddings"), threshold=0.3)


@q(
    "ann_brute_force_topk",
    """
    SELECT q.vec_id AS query_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
                      c.vec_id ASC) AS rank,
           c.vec_id AS neighbor_id,
           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS sim
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id % 25 = 0
    QUALIFY rank <= 5
    """,
    tags=("similarity",),
)
def ann_topk(spark, sf_dir):
    """Exact top-k cosine neighbors for a probe subset (vec_id % 25 = 0)."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb.filter(F.col("vec_id") % 25 == 0), emb, k=5
    )


def _lsh_ann_oracle(n_tables: int = 6, n_planes: int = 4, dim: int = 64, k: int = 5) -> str:
    """DuckDB twin of `similarity.lsh_bucket_topk`: the ±1 hyperplanes
    are md5-derived CONSTANTS (emitted here as literal arrays), so the
    bucket signatures, candidate set, and cosine re-rank are all
    reproducible — sign flips would need a projection within ~1e-13 of
    zero (never observed; bucket equality verified vector-by-vector at
    sf0.01).  'Approximate' describes recall vs brute force, not
    nondeterminism."""
    from ..operators.similarity import _hyperplanes

    tables = _hyperplanes(n_tables, n_planes, dim)

    def bucket(ti: int, src: str) -> str:
        bits = " || ".join(
            "(CASE WHEN list_dot_product(CAST({src}.embedding AS DOUBLE[]), {lst}) > 0 "
            "THEN '1' ELSE '0' END)".format(
                src=src, lst="[" + ",".join(str(x) for x in pl) + "]"
            )
            for pl in tables[ti]
        )
        return f"('{ti}:' || {bits})"

    q_buckets = "\n      UNION ALL ".join(
        f"SELECT vec_id AS query_id, {bucket(ti, 'q')} AS bucket FROM probes q"
        for ti in range(n_tables)
    )
    c_buckets = "\n      UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, {bucket(ti, 'c')} AS bucket FROM embeddings c"
        for ti in range(n_tables)
    )
    return f"""
    WITH probes AS (SELECT * FROM embeddings WHERE vec_id % 25 = 0),
    qb AS ({q_buckets}),
    cb AS ({c_buckets}),
    cand AS (SELECT DISTINCT qb.query_id, cb.neighbor_id
             FROM qb JOIN cb USING (bucket)
             WHERE qb.query_id != cb.neighbor_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(n.embedding AS DOUBLE[])) AS sim
      FROM cand c JOIN embeddings q ON c.query_id = q.vec_id
                  JOIN embeddings n ON c.neighbor_id = n.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, sim,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, rank, neighbor_id, round(sim, 6) AS sim
    FROM ranked WHERE rank <= {k}
    """


@q("ann_lsh_topk", _lsh_ann_oracle(), tags=("similarity", "lsh"))
def ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (scale path).  Approximate RECALL, deterministic
    ANSWER: the md5-derived hyperplanes are constants, so the DuckDB twin
    replays buckets → candidates → cosine re-rank exactly (upgraded from
    r2's rows-only check); pytest still measures recall vs brute force."""
    emb = t(spark, sf_dir, "embeddings")
    return similarity.lsh_bucket_topk(emb.filter(F.col("vec_id") % 25 == 0), emb, k=5)


# ===========================================================================
# TX — text analysis
# ===========================================================================

def _langid_oracle() -> str:
    langs = sorted(text.LANG_STOPWORDS)
    scores = ",\n           ".join(
        "len(list_filter({toks}, x -> list_contains({lst}, x))) AS score_{lang}".format(
            toks=_DK_TOKS,
            lst="[" + ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS[lang]) + "]",
            lang=lang,
        )
        for lang in langs
    )
    greatest = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    case = "CASE WHEN " + greatest + " = 0 THEN 'und' " + " ".join(
        f"WHEN score_{lg} = {greatest} THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
    WITH scored AS (SELECT doc_id, {scores} FROM documents)
    SELECT doc_id, {case} AS pred_lang FROM scored
    """


@q("text_langid", _langid_oracle(), tags=("text",))
def text_langid_q(spark, sf_dir):
    """Language ID: stopword-hit argmax heuristic (lexicographic tiebreak,
    'und' when nothing matches)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.lang_id("text").alias("pred_lang"))


@q(
    "text_quality",
    f"""
    WITH x AS (SELECT doc_id, {_DK_TOKS} AS tk, length(text) AS nc FROM documents)
    SELECT doc_id,
           len(tk) AS n_tokens,
           round((nc - (len(tk) - 1)) / len(tk), 4) AS avg_token_len,
           round(len(list_filter(tk, t -> list_contains(['the','and','of','to','a','in','is','it','for','on'], t))) / len(tk), 4) AS stopword_ratio,
           CASE WHEN len(tk) >= 10 AND (nc - (len(tk) - 1)) / len(tk) >= 3 THEN 1 ELSE 0 END AS is_quality
    FROM x
    """,
    tags=("text",),
    bench=True,
)
def text_quality_q(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return text.quality_features(docs).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "avg_token_len", "stopword_ratio", "is_quality",
    )


@q(
    "text_token_count",
    f"""
    SELECT doc_id,
           len({_DK_TOKS}) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_tokens
    FROM documents
    """,
    tags=("text",),
)
def text_tokens_q(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count_ws("text").cast("long").alias("ws_tokens"),
        text.token_count_bpe("text").cast("long").alias("bpe_tokens"),
    )


@q(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           md5(list_aggregate({_DK_TOKS}, 'string_agg', ' ')) AS fp,
           list_reduce(list_prepend(0::BIGINT, [ord(c)::BIGINT for c in string_split(text, '')]),
                       (acc, x) -> (acc * 31 + x) % 1000000007) AS rhash
    FROM documents
    """,
    tags=("text",),
)
def text_fp_q(spark, sf_dir):
    """Document fingerprinting: md5 content fingerprint + polynomial
    rolling hash (char fold, JVM-side)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.doc_fingerprint("text").alias("fp"),
        text.rolling_hash("text").alias("rhash"),
    )


# ===========================================================================
# M — multimodal plumbing
# ===========================================================================

@q(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id, 'image' AS media_type,
           strlen(text) AS byte_len, sha256(text) AS sha256
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_meta(spark, sf_dir):
    """Binary-payload metadata (byte_len, sha256) computed without ever
    decoding the payload — the columnar fast path for media tables."""
    docs = t(spark, sf_dir, "documents")
    return multimodal.to_media(docs, "doc_id", "text", "image").select(
        "media_id", "media_type", "byte_len", "sha256"
    )


@q(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 6 WHEN 2 THEN 'audio' WHEN 5 THEN 'video'
                           ELSE 'image' END AS media_type,
           CAST(CASE doc_id % 6 WHEN 0 THEN 33 WHEN 1 THEN 26 WHEN 2 THEN 44
                           WHEN 3 THEN 35 WHEN 4 THEN 13
                           ELSE 168 END AS BIGINT) AS byte_len,
           CAST(CASE doc_id % 6 WHEN 0 THEN 16 + doc_id % 1000
                           WHEN 1 THEN 1 + doc_id % 255
                           WHEN 2 THEN 8000 + (doc_id % 100) * 50
                           WHEN 3 THEN 1 + (doc_id * 5) % 2000
                           WHEN 4 THEN 1 + (doc_id * 13) % 4000
                           ELSE 16 + (doc_id * 19) % 2000 END AS INTEGER) AS width,
           CAST(CASE doc_id % 6 WHEN 0 THEN 16 + (doc_id * 7) % 1000
                           WHEN 1 THEN 1 + (doc_id * 3) % 255
                           WHEN 2 THEN 1 + doc_id % 2
                           WHEN 3 THEN 1 + (doc_id * 11) % 2000
                           WHEN 4 THEN 1 + (doc_id * 17) % 4000
                           ELSE 16 + (doc_id * 23) % 2000 END AS INTEGER) AS height,
           CAST(CASE doc_id % 6 WHEN 2 THEN 1 + doc_id % 1000
                           WHEN 5 THEN 1 + doc_id % 500
                           ELSE 1 END AS INTEGER) AS n_frames
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_features(spark, sf_dir):
    """Header feature-extract via Arrow-batched mapInPandas over REAL
    container bytes: `synthetic_media` builds genuine PNG/BMP/WAV/JPEG/
    GIF/MP4 headers JVM-side with id-derived dimensions, and the stdlib parsers in
    operators/multimodal.py recover width/height/sample-rate/frames from
    the binary.  The oracle predicts the same dims arithmetically, so the
    binary build AND the parse are both value-checked (upgraded from the
    r2 rows-only check)."""
    docs = t(spark, sf_dir, "documents")
    media = multimodal.synthetic_media(docs, "doc_id")
    return multimodal.extract_features(media)


