"""Property-based tests (hypothesis) for the invariants the oracle can't
state: budget prefix-closure, quantization error bounds, profiler
consistency.  Spark-session-per-example would be minutes per case, so the
strategy generates SMALL frames and each property runs the real operator
once per generated dataset with a shared session."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_realtime_dw4_0_spark.operators import profiling, sampling, similarity

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),          # doc_id (may collide; op must cope)
        st.sampled_from(["a", "b", "c"]),  # source
        st.integers(1, 500),             # n_tokens
        st.integers(1, 2_000),           # n_chars (priority)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


@given(rows=docs_strategy, budget=st.integers(1, 1_000))
@settings(**_SETTINGS)
def test_token_budget_never_exceeded_and_prefix_closed(spark, rows, budget):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens", "n_chars"])
    df = spark.createDataFrame(pdf)
    out = sampling.token_budget_take(df, budget=budget).toPandas()
    # 1) no source's total exceeds the budget
    if len(out):
        assert out.groupby("source")["n_tokens"].sum().max() <= budget
    # 2) prefix-closed in priority order: if a doc is taken, every doc of
    #    the same source with strictly higher priority is taken too
    taken = set(out["doc_id"])
    for src, grp in pdf.groupby("source"):
        ordered = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        seen_missing = False
        for _, r in ordered.iterrows():
            if r["doc_id"] in taken:
                assert not seen_missing, "taken doc after a skipped one"
            else:
                seen_missing = True


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=2,
        max_size=8,
    ),
    min_size=1,
    max_size=20,
)


@given(vecs=vec_strategy)
@settings(**_SETTINGS)
def test_quantize_int8_bounds_and_roundtrip(spark, vecs):
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [[float(x) for x in v] for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    out = similarity.quantize_int8(df).toPandas()
    inp = {i: v for i, v in zip(pdf["vec_id"], pdf["embedding"])}
    for _, r in out.iterrows():
        codes, scale = list(r["q_int8"]), float(r["scale"])
        assert all(-127 <= c <= 127 for c in codes)
        # codes hit the full range: the max-|x| element maps to ±127
        assert max(abs(c) for c in codes) == 127
        # roundtrip error ≤ half a quantization step, plus the 4-dec
        # rounding of the reported scale (≤ 5e-5 absolute, amplified by
        # at most |c|/127 ≤ 1)
        step = scale / 127
        for x, c in zip(inp[int(r["vec_id"])], codes):
            assert abs(x - c * step) <= step / 2 + 6e-5 + 1e-9
    # zero vectors are dropped, everything else kept
    n_nonzero = sum(1 for v in pdf["embedding"] if any(x != 0 for x in v))
    assert len(out) == n_nonzero


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-1_000_000, 1_000_000)),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_profile_columns_matches_pandas(spark, vals):
    pdf = pd.DataFrame({"v": pd.array(vals, dtype="Int64")})
    df = spark.createDataFrame(pdf)
    out = profiling.profile_columns(df, ["v"]).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_rows"] == len(vals)
    assert r["n_nulls"] == sum(v is None for v in vals)
    non_null = [v for v in vals if v is not None]
    assert r["n_distinct"] == len(set(non_null))
    if non_null:
        assert r["min_s"] == str(min(non_null))
        assert r["max_s"] == str(max(non_null))
    else:
        assert r["min_s"] is None and r["max_s"] is None


def test_key_skew_shares_sum_and_order(spark):
    pdf = pd.DataFrame({"k": ["hot"] * 60 + [f"k{i}" for i in range(40)]})
    out = profiling.key_skew(spark.createDataFrame(pdf), "k", top_k=5).toPandas()
    assert list(out["key"])[0] == "hot"
    assert math.isclose(out["share_pct"].iloc[0], 60.0)
    assert len(out) == 5
    # counts are non-increasing in rank order
    assert list(out["cnt"]) == sorted(out["cnt"], reverse=True)


def test_kmeans_distributed_refinement(spark):
    """Distributed Lloyd: inertia non-increasing over full-data
    iterations, deterministic under re-partitioning, model-only driver
    traffic (asserted by shape)."""
    import numpy as np

    from flink_realtime_dw4_0_spark.operators import similarity
    from flink_realtime_dw4_0_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents, inertia = similarity.kmeans_fit(emb, k=4, iters=3)
    dim = len(emb.select("embedding").first()[0])
    assert cents.shape == (4, dim)
    assert len(inertia) == 3
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9), inertia
    cents2, inertia2 = similarity.kmeans_fit(emb.repartition(7), k=4, iters=3)
    assert np.allclose(cents, cents2)
    assert np.allclose(inertia, inertia2)


@given(rows=docs_strategy, n=st.integers(1, 15))
@settings(**_SETTINGS)
def test_per_group_cap_bounds_and_stability(spark, rows, n):
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens", "n_chars"])
    df = spark.createDataFrame(pdf)
    out = sampling.per_group_cap(df, group_col="source", n=n).toPandas()
    # at most n per group, never more rows than input
    if len(out):
        assert out.groupby("source").size().max() <= n
    # deterministic under re-partitioning: same selected ids
    out2 = sampling.per_group_cap(df.repartition(5), group_col="source", n=n).toPandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])
    # groups smaller than n are kept whole
    for src, grp in pdf.groupby("source"):
        if len(grp) <= n:
            assert set(grp["doc_id"]) <= set(out["doc_id"])


@given(rows=docs_strategy)
@settings(**_SETTINGS)
def test_weighted_sample_clamps_and_is_deterministic(spark, rows):
    import pyspark.sql.functions as F

    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens", "n_chars"])
    df = spark.createDataFrame(pdf)
    rate = F.col("n_chars") / 500.0
    out = sampling.weighted_sample(df, rate).toPandas()
    # rate >= 1 rows are always kept
    must_keep = set(pdf.loc[pdf["n_chars"] >= 500, "doc_id"])
    assert must_keep <= set(out["doc_id"])
    # deterministic under re-partitioning
    out2 = sampling.weighted_sample(df.repartition(5), rate).toPandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])
    # rate 0 keeps nothing, rate 1 keeps everything
    assert sampling.weighted_sample(df, F.lit(0.0)).count() == 0
    assert sampling.weighted_sample(df, F.lit(1.0)).count() == len(pdf)


# -- FMM segmentation invariants ------------------------------------------

@given(
    runs=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("苹果手机充电器小米电视洗衣华为笔记本脑智能表")
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=4,
    ),
    dict_words=st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("苹果手机充电器小米电视洗衣华为笔记本脑智能表")
            ),
            min_size=2,
            max_size=4,
        ),
        min_size=1,
        max_size=20,
    ),
)
@settings(**_SETTINGS)
def test_fmm_segments_concat_to_input(spark, runs, dict_words):
    """Dictionary FMM is a PARTITION of each Han run: concatenating the
    emitted tokens in order reproduces the input exactly — no dictionary
    (random or adversarial) can drop or duplicate characters."""
    from flink_realtime_dw4_0_spark.operators.text import tokenize_keywords_dict

    text = " ".join(runs)
    df = spark.createDataFrame([(text,)], ["kw"])
    toks = df.select(
        tokenize_keywords_dict("kw", dict_words).alias("t")
    ).collect()[0].t
    assert "".join(toks) == "".join(runs)


# -- media header round-trip ----------------------------------------------

@given(
    w=st.integers(1, 2**20),
    h=st.integers(-(2**20), 2**20).filter(lambda x: x != 0),
    sr=st.integers(1, 384_000),
    ch=st.integers(1, 8),
    frames=st.integers(0, 1_000_000),
)
@settings(**_SETTINGS)
def test_media_header_roundtrip_any_dims(w, h, sr, ch, frames):
    """struct-built containers parse back to their written parameters for
    arbitrary dimensions (BMP height sign-folded; WAV frames derived from
    data size / block align)."""
    import struct

    from flink_realtime_dw4_0_spark.operators.multimodal import _parse_media_header

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, abs(h)) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )
    assert _parse_media_header(png) == (w, abs(h), 1)

    bmp = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<I", 40) + struct.pack("<ii", w, h)
    )
    assert _parse_media_header(bmp) == (w, abs(h), 1)

    ba = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ba, ba, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", frames * ba)
    )
    assert _parse_media_header(wav) == (sr, ch, frames)


# -- window TVF membership laws -------------------------------------------

@given(offsets=st.lists(st.integers(0, 86_399), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_hop_window_membership_law(spark, offsets):
    """For ANY event times: each event lands in exactly size/slide hop
    windows, and per-window counts match a direct python replay of the
    slide-aligned membership rule."""
    import collections
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from flink_realtime_dw4_0_spark.operators.windows import windowed_agg_hop

    base = datetime(2024, 3, 1)
    rows = [(i, base + timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = windowed_agg_hop(
        df, "ts", "1 hour", "15 minutes", [], [F.count(F.lit(1)).alias("n")]
    ).collect()
    assert sum(r.n for r in out) == 4 * len(offsets)

    exp: collections.Counter = collections.Counter()
    for s in offsets:
        b = (s // 900) * 900
        for k in range(4):
            exp[b - k * 900] += 1
    got = {
        int((datetime.strptime(r.window_start, "%Y-%m-%d %H:%M:%S") - base).total_seconds()): r.n
        for r in out
    }
    assert got == dict(exp)


@given(offsets=st.lists(st.integers(0, 86_399), min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_cumulate_window_membership_law(spark, offsets):
    """For ANY event times within one anchor day: an event at offset s
    belongs to exactly the cumulate windows whose end exceeds s — counts
    match the python replay window-for-window."""
    import collections
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from flink_realtime_dw4_0_spark.operators.windows import windowed_agg_cumulate

    base = datetime(2024, 3, 1)
    rows = [(i, base + timedelta(seconds=s)) for i, s in enumerate(offsets)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = windowed_agg_cumulate(
        df, "ts", "6 hours", "1 day", [], [F.count(F.lit(1)).alias("n")]
    ).collect()

    exp: collections.Counter = collections.Counter()
    for s in offsets:
        for j in (1, 2, 3, 4):
            if j * 21_600 > s:
                exp[j * 21_600] += 1
    got = {
        int((datetime.strptime(r.window_end, "%Y-%m-%d %H:%M:%S") - base).total_seconds()): r.n
        for r in out
    }
    assert got == dict(exp)
    assert all(r.window_start == "2024-03-01 00:00:00" for r in out)


text_docs_strategy = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.text(
            alphabet=st.sampled_from(list("abcd .!?\n{«é")),
            min_size=0, max_size=120,
        ),
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda r: r[0],
)


@given(rows=text_docs_strategy)
@settings(**_SETTINGS)
def test_gopher_repetition_invariants(spark, rows):
    """All fractions in [0, 1]; counts non-negative; pass flag is
    consistent with its inputs; one output row per input doc."""
    from flink_realtime_dw4_0_spark.operators import text as t_ops

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = t_ops.gopher_repetition(df).toPandas()
    assert len(out) == len(rows)
    frac_cols = (
        ["dup_para_frac", "dup_line_char_frac", "dup_para_char_frac",
         "top3gram_char_frac", "top4gram_char_frac"]
        + [f"dup_{n}gram_char_frac" for n in range(5, 11)]
    )
    for c in frac_cols:
        assert (out[c] >= 0).all(), c
        assert (out[c] <= 1.0001).all(), c
    assert (out["n_stop_words"] >= 0).all()
    # flag consistency: recompute from the emitted columns
    import numpy as np
    expect = (
        (out["n_stop_words"] >= 2)
        & (out["dup_para_frac"] <= 0.30)
        & (out["dup_line_char_frac"] <= 0.20)
        & (out["dup_para_char_frac"] <= 0.20)
        & (out["top3gram_char_frac"] <= 0.18)
        & (out["top4gram_char_frac"] <= 0.16)
    )
    for n, thr in t_ops.GOPHER_DUP_NGRAM_MAX.items():
        expect &= out[f"dup_{n}gram_char_frac"] <= thr
    assert (out["gopher_rep_pass"] == expect.astype(int)).all()


@given(rows=text_docs_strategy)
@settings(**_SETTINGS)
def test_c4_rules_invariants(spark, rows):
    """clean_text only contains surviving lines, kept <= total, sentence
    count consistent with clean_text, keep flag consistent."""
    from flink_realtime_dw4_0_spark.operators import text as t_ops

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.asDict() for r in t_ops.c4_rules(df).collect()}
    src = dict(rows)
    for did, r in out.items():
        assert 0 <= r["n_lines_kept"] <= r["n_lines"]
        body = src[did]
        for line in (r["clean_text"].split("\n") if r["clean_text"] else []):
            assert line in body.rstrip("\n").split("\n")
        import re as _re
        assert r["n_sentences"] == len(_re.split(r"[.!?]", r["clean_text"])) - 1
        expect = int(
            r["n_sentences"] >= 3
            and r["has_lorem_ipsum"] == 0
            and r["has_curly_brace"] == 0
            and r["badword_hits"] == 0
        )
        assert r["c4_keep"] == expect


@given(
    vals=st.lists(st.floats(-100, 200, allow_nan=False), min_size=2, max_size=60),
    split_at=st.integers(1, 59),
)
@settings(**_SETTINGS)
def test_psi_drift_invariants(spark, vals, split_at):
    """p and q each sum to ~1 over emitted bins + total row consistency;
    PSI >= 0; identical splits give PSI == 0."""
    split_at = min(split_at, len(vals) - 1)
    rows = [("r", float(v)) for v in vals[:split_at]] + [
        ("c", float(v)) for v in vals[split_at:]
    ]
    from flink_realtime_dw4_0_spark.operators import quality

    df = spark.createDataFrame(rows, "split string, v double")
    out = quality.psi_drift(df, "v", "split", "r", "c", lo=-100.0, hi=200.0, n_bins=5)
    rows_out = {r.bin: r for r in out.collect()}
    total = rows_out[-1]
    per = [r for b, r in rows_out.items() if b != -1]
    assert total.n_ref == sum(r.n_ref for r in per)
    assert total.n_cur == sum(r.n_cur for r in per)
    assert total.psi_term >= -1e-6  # PSI is non-negative up to rounding
    # mirror-identical distributions -> PSI exactly 0
    sym = [("r", float(v)) for v in vals] + [("c", float(v)) for v in vals]
    df2 = spark.createDataFrame(sym, "split string, v double")
    out2 = {r.bin: r.psi_term for r in quality.psi_drift(
        df2, "v", "split", "r", "c", lo=-100.0, hi=200.0, n_bins=5).collect()}
    assert out2[-1] == 0.0


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lossless_codec_roundtrips_property(h, w, c, seed):
    """PNG, 24-bit BMP, and GIF pixel kernels are BIT-EXACT inverses on
    arbitrary small images (GIF capped at 256 unique colors by
    construction here), and WAV PCM16 round-trips arbitrary sample
    blocks — pure-Python property, no Spark."""
    import numpy as np

    from flink_realtime_dw4_0_spark.operators import multimodal as mm

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    assert np.array_equal(mm.decode_png_pixels(mm.encode_png(px)), px)
    px3 = px if c == 3 else np.repeat(px, 3, axis=2)
    assert np.array_equal(mm.decode_bmp_pixels(mm.encode_bmp(px3)), px3)
    # GIF: quantize to <= 16 distinct values to stay within a palette
    gif_px = (px3 // 16) * 16
    assert np.array_equal(mm.decode_gif_pixels(mm.encode_gif(gif_px)),
                          gif_px)
    samples = rng.randint(-32768, 32768, (max(1, h * w), c)).astype("<i2")
    rate = 8000 + (seed % 1000)
    r2, back = mm.decode_wav_samples(mm.encode_wav(samples, rate))
    assert r2 == rate and np.array_equal(back, samples)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_codec_bounded_error_property(h, w, seed):
    """The baseline JPEG codec is a BOUNDED-ERROR inverse on arbitrary
    small RGB images: with the flat Q=16 table the DCT-domain
    quantization error is <= 8 per coefficient, so pixel error stays
    well under 64 full-scale; dims always crop back exactly; and solid
    even-gray inputs (the exactness class) reconstruct EXACTLY whatever
    the dims."""
    import numpy as np

    from flink_realtime_dw4_0_spark.operators import jpeg_codec as jc

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = jc.decode_jpeg_pixels(jc.encode_jpeg(px))
    assert out.shape == (h, w, 3)
    assert int(np.abs(out.astype(int) - px.astype(int)).max()) <= 64
    v = 2 * (seed % 128)
    solid = np.full((h, w, 3), v, np.uint8)
    assert np.array_equal(jc.decode_jpeg_pixels(jc.encode_jpeg(solid)),
                          solid)
    # 4:2:0: dims crop exactly, luma keeps the full-resolution bound
    # (chroma is box-averaged — lossy by design on noise), solid
    # even-gray stays EXACT through the subsampled path too
    out420 = jc.decode_jpeg_pixels(jc.encode_jpeg(px, subsample="420"))
    assert out420.shape == (h, w, 3)
    luma = lambda a: (0.299 * a[:, :, 0].astype(float)  # noqa: E731
                      + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2])
    assert float(np.abs(luma(out420) - luma(px)).max()) <= 64
    assert np.array_equal(
        jc.decode_jpeg_pixels(jc.encode_jpeg(solid, subsample="420")),
        solid)
