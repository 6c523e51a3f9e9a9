"""Property-based tests (hypothesis): the engine's kernels against
pure-Python reference implementations.

The cross-engine exactness story (README, SURVEY §7) rests on every float
reduction being a sequential left fold in index order — these properties
pin that down bit-for-bit against a Python fold, which is the same IEEE
double semantics. String kernels (shingles, normalization) are checked
against naive implementations.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducekmean_spark.functions.vector import (
    argmin_index,
    centroid_literal_sql,
    dot,
    sq_dist,
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _seq_fold_sq_dist(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x - y) * (x - y)
    return acc


def _seq_fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=16))
def test_sq_dist_bit_exact_vs_python_fold(spark, pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    df = spark.createDataFrame([Row(a=a, b=b)])
    got = df.select(sq_dist(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert got == _seq_fold_sq_dist(a, b)  # exact, no tolerance


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=16))
def test_dot_bit_exact_vs_python_fold(spark, pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    df = spark.createDataFrame([Row(a=a, b=b)])
    got = df.select(dot(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert got == _seq_fold_dot(a, b)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=12),
)
def test_argmin_first_wins(spark, dists):
    """First-wins tie-break — the reference's strict-< loop
    (PointsMapper.java:70-74)."""
    df = spark.createDataFrame([Row(d=dists)])
    got = df.select(argmin_index(F.col("d")).alias("i")).first()["i"]
    assert got == dists.index(min(dists))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(finite, min_size=2, max_size=2), min_size=1, max_size=5
    )
)
def test_centroid_literal_sql_roundtrips_doubles(spark, cents):
    rows = spark.sql(
        f"SELECT {centroid_literal_sql(cents)} AS c"
    ).first()["c"]
    assert [list(r) for r in rows] == [list(c) for c in cents]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=1, max_size=6), max_size=12))
def test_shingles_match_naive(spark, toks):
    """shingles() == naive 3-gram join over the engine's own tokens()."""
    from mapreducekmean_spark.operators.dedup import shingles
    from mapreducekmean_spark.operators.text import tokens

    text = " ".join(toks)
    df = spark.createDataFrame([Row(text=text)])
    got = df.select(shingles().alias("sh")).first()["sh"]
    tok_list = df.select(tokens("text").alias("t")).first()["t"]
    want = [
        " ".join(tok_list[i : i + 3]) for i in range(len(tok_list) - 2)
    ]
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False))
def test_cents_rounding_matches_python(spark, v):
    """The integer-cent money kernel: Spark round(x*100) == Python's
    round-half-up on the same double (used by every money aggregate)."""
    df = spark.createDataFrame([Row(x=float(v))])
    got = df.select(
        F.round(F.col("x") * 100).cast("bigint").alias("c")
    ).first()["c"]
    want = math.floor(v * 100 + 0.5) if v >= 0 else -math.floor(-v * 100 + 0.5)
    assert got == want


asof_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=0, max_size=12
)


@settings(max_examples=10, deadline=None)
@given(asof_rows, asof_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    """asof_join == per-row brute force: the right row with the greatest
    time <= left time for the same key (ties on right time impossible —
    inputs deduplicated per (key, time))."""
    from pyspark.sql import Row

    from mapreducekmean_spark.operators.analytic import asof_join

    lrows = list({(k, t) for k, t in lrows})
    rrows = list({(k, t) for k, t in rrows})
    if not lrows:
        return
    left = spark.createDataFrame(
        [Row(k=k, lt=t, lid=i) for i, (k, t) in enumerate(lrows)]
    )
    right = spark.createDataFrame(
        [Row(k=k, rt=t, v=f"v{k}_{t}") for k, t in rrows]
    ) if rrows else spark.createDataFrame([], "k int, rt int, v string")
    got = {
        r.lid: r.v
        for r in asof_join(left, right, "k", "lt", "rt", ["v"]).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, f"v{rk}_{rt}") for rk, rt in rrows if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


join_rows = st.lists(st.integers(1, 4), min_size=0, max_size=10)


@settings(max_examples=8, deadline=None)
@given(join_rows, join_rows)
def test_salted_join_equals_plain_join(spark, big_keys, small_keys):
    """salted_join is row-identical to the plain join for any key
    multiset on either side (duplicates multiply, as in the plain join)."""
    from pyspark.sql import Row

    from mapreducekmean_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [Row(k=k, bid=i) for i, k in enumerate(big_keys)], "k int, bid int"
    ) if big_keys else spark.createDataFrame([], "k int, bid int")
    small = spark.createDataFrame(
        [Row(k=k, sid=i) for i, k in enumerate(small_keys)], "k int, sid int"
    ) if small_keys else spark.createDataFrame([], "k int, sid int")
    for how in ("inner", "left"):
        got = sorted(map(tuple, salted_join(big, small, "k", 4, how).collect()))
        want = sorted(map(tuple, big.join(small, "k", how).collect()))
        assert got == want, (how, got, want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),        # user
            st.integers(0, 40),       # seconds offset
            st.booleans(),            # purchase?
        ),
        min_size=1,
        max_size=16,
    )
)
def test_range_join_matches_bruteforce(spark, rows):
    """The bucketed range-join decomposition == brute force over every
    (purchase, view) pair: same-user views in [buy - W, buy), any
    distribution of events across bucket boundaries."""
    import datetime as dt

    from pyspark.sql import Row

    from mapreducekmean_spark.operators.events import (
        purchases_with_recent_views,
    )

    window_us = 10_000_000  # 10 s window → offsets straddle buckets
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + dt.timedelta(seconds=s),
                user_id=u,
                event_type="purchase" if is_p else "view",
                value=1.0,
            )
            for i, (u, s, is_p) in enumerate(rows)
        ]
    )
    got = {
        r.purchase_id: r.n_views
        for r in purchases_with_recent_views(ev, window_us).collect()
    }
    for i, (u, s, is_p) in enumerate(rows):
        if not is_p:
            continue
        want = sum(
            1
            for (u2, s2, is_p2) in rows
            if not is_p2
            and u2 == u
            and s - 10 <= s2 < s
        )
        assert got.get(i, 0) == want, (i, u, s, got.get(i), want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 500)),  # (type, cents)
        min_size=1,
        max_size=25,
    )
)
def test_value_quantiles_matches_sorted_pick(spark, rows):
    """histogram+cumsum quantiles == type-1 positional pick from the
    plain sorted list, for any multiset (duplicates, single rows)."""
    import math

    from pyspark.sql import Row

    from mapreducekmean_spark.operators.events import value_quantiles

    ev = spark.createDataFrame(
        [
            Row(event_id=i, event_type=f"t{t}", value=c / 100.0)
            for i, (t, c) in enumerate(rows)
        ]
    )
    got = {r.event_type: r for r in value_quantiles(ev).collect()}
    by_type: dict = {}
    for t, c in rows:
        by_type.setdefault(f"t{t}", []).append(c)
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            want = vals[math.ceil(p * n) - 1] / 100.0
            assert got[t][col] == want, (t, col, got[t][col], want)
        assert got[t].n == n


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_bigram_lm_is_a_probability_table(spark, docs):
    """Invariants of the bigram LM over arbitrary tiny corpora: for every
    w1, the conditional probabilities sum to 1 (within 6-dp rounding of
    each term), and total bigram mass equals the corpus bigram count."""
    from mapreducekmean_spark.operators.text import bigram_lm, tokens

    df = spark.createDataFrame([Row(text=t) for t in docs])
    rows = bigram_lm(df).collect()
    n_bigrams = sum(
        max(len(t.split()), 0) - 1
        for t in [" ".join(x.lower().split()) for x in docs]
        if len(t.split()) >= 2
    )
    assert sum(r.n for r in rows) == n_bigrams
    by_w1: dict = {}
    for r in rows:
        by_w1.setdefault(r.w1, []).append(r)
    for w1, grp in by_w1.items():
        assert abs(sum(r.p for r in grp) - 1.0) <= 5e-6 * len(grp), w1


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.text(alphabet="xy z9", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    )
)
def test_word_count_mass_conservation(spark, docs):
    """sum of per-token counts == total token occurrences; n_docs never
    exceeds the corpus size or the token's total count."""
    from mapreducekmean_spark.operators.text import word_count, tokens

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    rows = word_count(df).collect()
    total_tokens = sum(len(t.lower().split()) for t in docs)
    assert sum(r.n for r in rows) == total_tokens
    for r in rows:
        assert 1 <= r.n_docs <= min(len(docs), r.n)


any_finite = st.floats(allow_nan=False, allow_infinity=False, width=64)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(any_finite, any_finite), min_size=1, max_size=20))
def test_points_writer_roundtrip_bit_exact(spark, tmp_path_factory, pts):
    """The points sink's repr() serialization must round-trip ANY finite
    double bit-exactly through write -> read (subnormals, extreme
    exponents, -0.0 included — Python repr is shortest-exact and the
    reader parses with float())."""
    from mapreducekmean_spark.sources.points_datasource import register

    register(spark)
    out = str(tmp_path_factory.mktemp("pts_prop"))
    df = spark.createDataFrame(
        [Row(x=float(a), y=float(b)) for a, b in pts], "x double, y double"
    )
    df.write.format("points").mode("overwrite").save(out)
    got = sorted(
        (r["x"], r["y"])
        for r in spark.read.format("points").load(out).collect()
    )
    want = sorted((float(a), float(b)) for a, b in pts)
    # compare via repr to make -0.0 vs 0.0 and exact bits observable
    assert [tuple(map(repr, p)) for p in got] == [
        tuple(map(repr, p)) for p in want
    ]


@settings(max_examples=12, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.booleans(),
)
def test_jpeg_roundtrip_property(h, w, seed, subsample):
    """Any image size (including 1x1 and non-multiple-of-8/16 edges)
    must round-trip through the baseline JPEG codec pair at q=1 within
    the DCT/YCbCr float-rounding bound for 4:4:4 and a chroma-averaging
    bound for 4:2:0 — the luma channel is tight either way."""
    import numpy as np

    from mapreducekmean_spark import multimodal as mm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = mm._decode_jpeg_rgb(mm._encode_jpeg(img, subsample=subsample, q=1))
    assert out is not None and out.shape == img.shape
    if not subsample:
        # three independent rounding stages chain through the 4:4:4
        # round trip — YCbCr forward round, q=1 coefficient-quantizer
        # round, YCbCr inverse round — each worth up to ~1 count, so
        # the tight bound is 3, not 2 (hypothesis found a max-error-3
        # example at h=8 w=28 seed=22881 in round 13; the r12 bound of
        # 2 was empirical over the examples seen until then)
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3
        return
    # 4:2:0 reference: the decode of a q=1 stream is analytically the
    # original luma + 2x2-mean chroma, upsampled by replication,
    # converted and clipped — compare against exactly that (a naive
    # per-channel bound fails legitimately when averaged chroma leaves
    # the RGB gamut and clipping bites)
    rgbf = img.astype(np.float64)
    y = 0.299 * rgbf[:, :, 0] + 0.587 * rgbf[:, :, 1] + 0.114 * rgbf[:, :, 2]
    cb = (
        -0.168736 * rgbf[:, :, 0] - 0.331264 * rgbf[:, :, 1]
        + 0.5 * rgbf[:, :, 2] + 128.0
    )
    cr = (
        0.5 * rgbf[:, :, 0] - 0.418688 * rgbf[:, :, 1]
        - 0.081312 * rgbf[:, :, 2] + 128.0
    )
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    pad = lambda p: np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    y, cb, cr = pad(y), pad(cb), pad(cr)
    cb = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4
    cr = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4
    cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
    cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    y = y[:h, :w]
    ref = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=2,
    )
    ref = np.clip(np.round(ref), 0, 255)
    assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= 3


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-3000, max_value=3000),  # doc_id
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=150),  # token count
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_pack_sequences_matches_naive_python(spark, rows):
    """The two-level distributed prefix sum against a dict-based running
    sum, over arbitrary (including negative) doc_ids that land in
    arbitrary buckets — placement algebra must agree exactly."""
    from mapreducekmean_spark.operators.text import (
        PACK_BUDGET,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(d, s, " ".join(["w"] * n)) for d, s, n in rows],
        "doc_id bigint, source string, text string",
    )
    got = {r.doc_id: r for r in pack_sequences(docs).collect()}
    cum: dict = {}
    for d, s, n in sorted(rows):
        start = cum.get(s, 0)
        cum[s] = start + n
        r = got[d]
        assert (r.n_tok, r.start_tok) == (n, start), (d, s)
        if n == 0:
            assert r.first_seq is None and r.n_seqs == 0
        else:
            assert r.first_seq == start // PACK_BUDGET
            assert r.last_seq == (start + n - 1) // PACK_BUDGET
            assert r.seq_offset == start % PACK_BUDGET


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
def test_cms_never_undercounts_property(spark, texts):
    """CMS guarantee over arbitrary tiny-alphabet corpora (maximal
    bucket collisions): estimate >= exact count for EVERY token, and
    per-hash-row mass equals the token total."""
    import re

    from mapreducekmean_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from mapreducekmean_spark.operators.text import TOKEN_RE

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )
    exact: dict = {}
    for t in texts:
        for w in re.findall(TOKEN_RE, t.lower()):
            exact[w] = exact.get(w, 0) + 1
    counters = cms_counters(docs)
    if not exact:
        assert counters.count() == 0
        return
    q = spark.createDataFrame(
        [(w,) for w in exact], "token string"
    )
    got = {r.token: r.est for r in cms_estimate(q, counters).collect()}
    assert set(got) == set(exact)
    for w, n in exact.items():
        assert got[w] >= n, w
    total = sum(exact.values())
    per_row: dict = {}
    for r in counters.collect():
        per_row[r.j] = per_row.get(r.j, 0) + r.cnt
    assert all(v == total for v in per_row.values())


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    n_colors=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    interlace=st.booleans(),
)
def test_gif_roundtrip_property(h, w, n_colors, seed, interlace):
    """GIF encode→decode is pixel-exact for ANY dimensions (including
    1×1 and single-row/column edge shapes the fixed tests skip), any
    palette size, interlaced or not."""
    import numpy as np

    from mapreducekmean_spark import multimodal as mm

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, n_colors, (h, w))]
    out = mm._decode_gif_rgb(mm._encode_gif(img, interlace=interlace))
    assert out is not None and out.shape == img.shape
    assert (out == img).all()


def _ref_chunks(words: list[str], size: int, stride: int):
    """Pure-Python reference for chunk_documents windowing."""
    out = []
    start = 0  # 0-based
    cid = 0
    while start < len(words):
        piece = words[start : start + size]
        out.append((cid, start + 1, len(piece), " ".join(piece)))
        cid += 1
        start += stride
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc012", min_size=1, max_size=4),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
)
def test_chunk_documents_matches_python_reference(spark, words, size, stride):
    from mapreducekmean_spark.operators.text import chunk_documents

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = sorted(
        (r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text)
        for r in chunk_documents(df, size=size, stride=stride).collect()
    )
    # the engine tokenizer lowercases+extracts [a-z0-9]+ runs; the
    # alphabet above makes each hypothesis word one token already
    want = sorted(_ref_chunks(words, size, stride))
    assert got == want


@given(
    st.lists(
        st.integers(min_value=0, max_value=255), min_size=65, max_size=65
    ),
    st.sampled_from([1, 7]),
)
@settings(max_examples=8, deadline=None)
def test_audio_segments_partition_windows_property(spark, data, fmt):
    """Activity segmentation invariants over arbitrary 65-sample WAV
    payloads (both codec branches): the emitted segments PARTITION
    [0, FP_WINDOWS) exactly (contiguous, non-overlapping, covering),
    consecutive segments alternate active flags (maximality), and
    every window's flag equals the decoder-side reference computed
    directly from the shared energy envelope."""
    import struct

    from mapreducekmean_spark.multimodal import (
        AUDIO_ACTIVE_THRESHOLD,
        FP_WINDOWS,
        _audio_window_energies,
        _decode_audio_wav,
        audio_activity_segments,
    )

    body = bytes(data)
    fmt_body = struct.pack("<HHIIHH", fmt, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt_body
        + b"data" + struct.pack("<I", len(body)) + body
    )
    assets = spark.createDataFrame(
        [(1, "audio", payload)],
        "asset_id bigint, modality string, payload binary",
    )
    segs = sorted(
        (r.seg_start, r.seg_end, r.n_windows, r.active)
        for r in audio_activity_segments(assets).collect()
    )
    # partition of [0, FP_WINDOWS): contiguous and covering
    assert segs[0][0] == 0 and segs[-1][1] == FP_WINDOWS - 1
    for (s, e, n, _a), (s2, _e2, _n2, _a2) in zip(segs, segs[1:]):
        assert e + 1 == s2 and n == e - s + 1
    # maximality: flags alternate
    for (_s, _e, _n, a), (_s2, _e2, _n2, a2) in zip(segs, segs[1:]):
        assert a != a2
    # reference flags from the shared envelope
    ref = (
        _audio_window_energies(_decode_audio_wav(payload)[0])
        >= AUDIO_ACTIVE_THRESHOLD
    )
    for s, e, _n, a in segs:
        assert all(bool(ref[w]) == a for w in range(s, e + 1))
