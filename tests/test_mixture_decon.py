"""Fuzzy decontamination (operators/dedup.py:decontaminate_fuzzy) and
temperature-flattened mixture sampling
(operators/text.py:dataset_mixture_temp) — the properties the oracle
twins can't state: fuzzy-vs-exact discrimination on paraphrases, and
rate monotonicity in source token mass."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fuzzy_flags_paraphrase_exact_misses(spark):
    """A training doc that copies an eval doc but swaps every 4th word
    shares NO verbatim 8-gram (exact decon passes it) yet keeps a high
    trigram-overlap ratio (fuzzy flags it). An unrelated doc passes
    both. This is the discrimination the fuzzy screen exists for."""
    from mapreducekmean_spark.operators.dedup import (
        decontaminate,
        decontaminate_fuzzy,
    )

    eval_words = [f"w{i}" for i in range(40)]
    para = list(eval_words)
    for i in range(0, 40, 4):
        para[i] = f"sub{i}"
    unrelated = [f"z{i}" for i in range(40)]
    rows = [
        (0, " ".join(eval_words)),          # doc_id % 20 == 0 → eval
        (1, " ".join(para)),                # paraphrased copy
        (2, " ".join(unrelated)),           # clean
    ]
    docs = _docs(spark, rows)
    exact = {r.doc_id: r.contaminated for r in decontaminate(docs).collect()}
    fuzzy = {
        r.doc_id: r.contaminated_fuzzy
        for r in decontaminate_fuzzy(docs).collect()
    }
    assert exact == {1: False, 2: False}  # no verbatim 8-gram survives
    assert fuzzy[1] is True and fuzzy[2] is False
    ratios = {
        r.doc_id: r.overlap_ratio
        for r in decontaminate_fuzzy(docs).collect()
    }
    assert ratios[1] > 0.2 > ratios[2]


def test_temp_mixture_rates_monotone_and_min_keeps_all(spark):
    """Keep rate must be 1.0 for the token-lightest source, strictly
    decrease as source token mass grows (sqrt(min/n)), and every doc of
    the min source must be kept via the explicit branch."""
    from mapreducekmean_spark.operators.text import dataset_mixture_temp

    rows = []
    did = 0
    # source s_k holds 10 docs of (k+1)*8 tokens each
    for k in range(4):
        for _ in range(10):
            rows.append((did, f"s{k}", " ".join(["tok"] * ((k + 1) * 8))))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    out = dataset_mixture_temp(docs)
    per_src = {
        r.source: (r.n_source, r.target_frac)
        for r in out.select("source", "n_source", "target_frac")
        .distinct()
        .collect()
    }
    fracs = [per_src[f"s{k}"][1] for k in range(4)]
    assert fracs[0] == 1.0
    assert all(a > b for a, b in zip(fracs, fracs[1:]))
    # sqrt law: n_source quadruples from s0 to s3 → rate halves
    assert abs(fracs[3] - 0.5) < 1e-9
    kept_min = out.filter("source = 's0'").agg(
        F.min(F.col("kept").cast("int"))
    ).collect()[0][0]
    assert kept_min == 1


def test_temp_mixture_is_deterministic_and_rate_faithful(spark):
    """The coin is md5-deterministic: two runs agree row-for-row, and
    the realized keep fraction of a big downsampled source lands near
    its target rate (binomial 3-sigma band)."""
    from mapreducekmean_spark.operators.text import dataset_mixture_temp

    rows = [(i, "small", "a b c d") for i in range(50)]
    rows += [(1000 + i, "big", " ".join(["x"] * 16)) for i in range(2000)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    a = sorted(tuple(r) for r in dataset_mixture_temp(docs).collect())
    b = sorted(tuple(r) for r in dataset_mixture_temp(docs).collect())
    assert a == b
    big = [r for r in a if r[1] == "big"]
    rate = big[0][3]
    kept = sum(1 for r in big if r[4])
    import math

    sigma = math.sqrt(len(big) * rate * (1 - rate))
    assert abs(kept - len(big) * rate) < 3 * sigma


def test_repeated_spans_exact_boundaries_and_islands(spark):
    """Two docs share a pasted 24-token paragraph at different offsets
    → each gets ONE span covering exactly the paragraph (start at its
    first token, end at its last). A doc with two separated pasted
    regions gets TWO island rows. Unique docs get none."""
    from mapreducekmean_spark.operators.dedup import repeated_ngram_spans

    para = " ".join(f"p{i}" for i in range(24))
    para2 = " ".join(f"q{i}" for i in range(22))
    u = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    rows = [
        (0, u("a", 7) + " " + para + " " + u("b", 5)),
        (1, para + " " + u("c", 9)),
        (2, u("d", 4) + " " + para + " " + u("e", 3) + " " + para2),
        (3, para2 + " " + u("f", 6)),
        (4, u("g", 30)),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in repeated_ngram_spans(docs, n=20, min_dup=2).collect()
    )
    # doc0: para at tokens 7..30 -> grams 7..11 flagged (5 grams)
    # doc1: para at 0..23 -> grams 0..4; doc3: para2 at 0..21 -> 0..2
    # doc2: para at 4..27 (grams 4..8) AND para2 at 31..52 (grams 31..33)
    assert got == [
        (0, 7, 30, 5),
        (1, 0, 23, 5),
        (2, 4, 27, 5),
        (2, 31, 52, 3),
        (3, 0, 21, 3),
    ]


def test_apply_substring_dedup_removes_exact_spans(spark):
    """The apply step composes with the span report: kept text is the
    original token stream minus exactly the flagged spans, in order;
    overlapping spans (islands < n apart) both apply; clean docs pass
    through verbatim (tokenizer-space)."""
    from mapreducekmean_spark.operators.dedup import (
        apply_substring_dedup,
        repeated_ngram_spans,
    )

    para = " ".join(f"p{i}" for i in range(24))
    u = lambda tag, k: " ".join(f"{tag}{i}" for i in range(k))
    rows = [
        (0, u("a", 7) + " " + para + " " + u("b", 5)),
        (1, para + " " + u("c", 9)),
        (2, u("g", 30)),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in repeated_ngram_spans(docs, n=20, min_dup=2).collect()
    }
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in apply_substring_dedup(docs, n=20, min_dup=2).collect()
    }
    for did, text in rows:
        toks = text.split()
        if did in spans:
            s, e = spans[did]
            kept = toks[:s] + toks[e + 1:]
        else:
            kept = toks
        assert got[did] == (
            len(toks),
            len(toks) - len(kept),
            " ".join(kept),
        )
    assert got[2][1] == 0 and got[2][2] == rows[2][1]
    assert got[0][1] == 24  # exactly the pasted paragraph


def test_edit_verify_discriminates_from_jaccard(spark):
    """Edit distance and shingle Jaccard disagree in BOTH directions,
    which is why both verifiers exist: scattered single-character typos
    destroy 3 shingles each (Jaccard refuses at 0.5) while moving edit
    distance a few characters (edit flags); block ROTATION keeps the
    shingle bag nearly intact (Jaccard flags) while most characters
    move (edit refuses). Both pairs come out of the SAME LSH candidate
    set."""
    import random

    from mapreducekmean_spark.operators.dedup import (
        edit_verified_pairs,
        minhash_verified_dedup,
    )

    rng = random.Random(3)
    words = [
        "".join(rng.choice("abcdefghijklmnop") for _ in range(6))
        for _ in range(40)
    ]
    typo = list(words)
    for i in range(0, 40, 6):
        typo[i] = typo[i][:-1] + "z"
    rot = words[20:] + words[:20]
    docs = spark.createDataFrame(
        [(0, " ".join(words)), (1, " ".join(typo)), (2, " ".join(rot))],
        "doc_id bigint, text string",
    )
    ev = {
        (r.doc_a, r.doc_b): (r.edit_dist, r.is_dup)
        for r in edit_verified_pairs(docs).collect()
    }
    assert ev[(0, 1)] == (7, True)  # typos: edit flags
    assert ev[(0, 2)][1] is False  # rotation: edit refuses (218 edits)
    jac = {r.doc_id: (r.kept, r.dup_of) for r in minhash_verified_dedup(docs).collect()}
    assert jac[1] == (True, None)  # typos: Jaccard refuses
    assert jac[2] == (False, 0)  # rotation: Jaccard flags


def test_containment_catches_embedded_doc(spark):
    """The asymmetric catch: a short doc pasted verbatim into a much
    longer one scores containment 1.0 while Jaccard sits far below the
    0.5 verify threshold — the pair a symmetric pipeline never flags.
    (Content chosen so the pair still shares an LSH band: the embed
    preserves the base's gram set, and these extras don't displace the
    shared minhash minima.)"""
    from mapreducekmean_spark.operators.dedup import containment_pairs

    base = " ".join(f"alpha{i} beta{i}" for i in range(40))
    extra = " ".join(f"zz2w{j}" for j in range(120))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, base + " " + extra, "en", "s", 1),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.containment == 1.0
    assert r.jaccard < 0.5


def test_dedup_lines_removes_boilerplate_corpus_wide(spark):
    """The C4-style pinned case: a boilerplate line pasted across docs
    (and repeated inside one) survives ONLY at its first (doc_id,
    line_no) occurrence; unique lines are untouched; reassembly keeps
    line order and emits a row for every doc (the all-boilerplate doc
    collapses to '')."""
    from mapreducekmean_spark.operators.dedup import (
        dedup_lines,
        dedup_lines_apply,
        line_rows,
    )

    docs = spark.createDataFrame(
        [
            (1, "subscribe to our newsletter\nalpha beta\ngamma"),
            (2, "delta\nsubscribe to our newsletter\nepsilon"),
            (3, "subscribe to our newsletter\nsubscribe to our newsletter"),
            (4, "zeta eta"),
        ],
        "doc_id bigint, text string",
    )
    lines = line_rows(docs)  # real newline splitting
    removed = {
        (r.doc_id, r.line_no, r.keep_doc_id, r.keep_line_no)
        for r in dedup_lines(lines).collect()
    }
    # every later paste points at the first occurrence (doc 1, line 0)
    assert removed == {(2, 1, 1, 0), (3, 0, 1, 0), (3, 1, 1, 0)}

    out = {
        r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
        for r in dedup_lines_apply(docs, lines, sep="\n").collect()
    }
    assert out[1] == (3, 0, "subscribe to our newsletter\nalpha beta\ngamma")
    assert out[2] == (3, 1, "delta\nepsilon")
    assert out[3] == (2, 2, "")  # all-boilerplate doc
    assert out[4] == (1, 0, "zeta eta")


def test_boilerplate_nl_docs_drives_the_real_newline_path(spark):
    """The oracle-facing newline synthesis: each doc becomes
    header/body/header-again, the repeated header is removed within
    every doc, an exact-dup doc loses ALL its lines to the first copy
    — and the line derivation itself is the PRODUCTION ``line_rows``
    split: a narrow projection with NO exchange (the framed path pays
    one), pinned on the physical plan."""
    from mapreducekmean_spark.operators.dedup import (
        boilerplate_nl_docs,
        dedup_lines,
        framed_line_rows,
        line_rows,
    )
    from mapreducekmean_spark.plans.inspect import formatted_plan

    long_a = "alpha beta gamma " * 20  # > BOILER_HEAD chars
    docs = spark.createDataFrame(
        [(1, long_a), (2, long_a), (3, "tiny")],
        "doc_id bigint, text string",
    )
    nl = boilerplate_nl_docs(docs)
    lines = {
        (r.doc_id, r.line_no): r.line for r in line_rows(nl).collect()
    }
    # three lines per doc; header repeats at line 2
    assert lines[(1, 0)] == long_a[:120]
    assert lines[(1, 1)] == long_a
    assert lines[(1, 2)] == long_a[:120]
    removed = {
        (r.doc_id, r.line_no, r.keep_doc_id, r.keep_line_no)
        for r in dedup_lines(line_rows(nl)).collect()
    }
    # doc 1: repeated header → line 2 removed; doc 2 (exact dup of 1):
    # all three lines removed toward doc 1; doc 3: text < head chars,
    # so header == body == header — lines 1 and 2 removed within-doc.
    assert removed == {
        (1, 2, 1, 0),
        (2, 0, 1, 0),
        (2, 1, 1, 1),
        (2, 2, 1, 0),
        (3, 1, 3, 0),
        (3, 2, 3, 0),
    }
    # the plan pin: the real-newline line derivation shuffles NOTHING
    # (scan → project → generate), while the framed derivation pays
    # its doc/line groupBy exchange.
    assert "Exchange" not in formatted_plan(line_rows(nl))
    assert "Exchange" in formatted_plan(framed_line_rows(docs))


def test_framed_line_rows_partitions_the_token_stream(spark):
    """The fixture-corpus line derivation: fixed win-token frames in
    position order, short trailing frame kept, and the apply round-trip
    over a duplicate-free corpus reconstitutes the token stream."""
    from mapreducekmean_spark.operators.dedup import (
        dedup_lines_apply,
        framed_line_rows,
    )

    docs = spark.createDataFrame(
        [(7, "a b c d e f g h i j k")],  # 11 tokens, win=4 → 4+4+3
        "doc_id bigint, text string",
    )
    lines = {
        r.line_no: r.line
        for r in framed_line_rows(docs, win=4).collect()
    }
    assert lines == {0: "a b c d", 1: "e f g h", 2: "i j k"}
    out = dedup_lines_apply(
        docs, framed_line_rows(docs, win=4)
    ).collect()[0]
    assert (out.n_lines, out.n_removed) == (3, 0)
    assert out.clean_text == "a b c d e f g h i j k"


def test_dataset_importance_edges_and_coin(spark):
    """Edge semantics of the DSIR resampler: a doc with <2 tokens has
    no grams, weighs exactly 1.0, and keeps by the rate-1.0 branch; a
    target-slice doc keeps by definition; weights reproduce the
    paper's FULL gram product computed independently in Python as the
    same position-ordered IEEE multiply chain from the same bucket
    counts (the r13 k=8 pivot bound is lifted — doc 3 has 10 grams
    and every one of them participates)."""
    import hashlib

    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.text import (
        DSIR_TARGET_MOD,
        dataset_importance,
    )

    rows = [
        (0, "alpha beta alpha beta gamma"),       # target (0 % 20 == 0)
        (1, "alpha beta gamma delta alpha beta"),  # raw
        (2, "solo"),                               # raw, no grams
        (3, "zz yy xx ww vv uu tt ss rr qq pp"),   # raw, >8 grams
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in dataset_importance(docs).collect()}
    assert got[0].is_target and got[0].kept
    assert not got[2].is_target
    assert got[2].weight == 1.0 and got[2].kept  # rate-1.0 branch

    # independent python replay of the weight arithmetic
    def toks(t):
        import re

        return re.findall(r"[a-z0-9]+", t.lower())

    def grams(t):
        ts = toks(t)
        return [f"{a} {b}" for a, b in zip(ts, ts[1:])]

    def bucket(g):
        return hashlib.md5(g.encode()).hexdigest()[:2]

    c_t, c_r = {}, {}
    for did, t in rows:
        tgt = did % DSIR_TARGET_MOD == 0
        for g in grams(t):
            b = bucket(g)
            (c_t if tgt else c_r)[b] = (c_t if tgt else c_r).get(b, 0) + 1
    t_total, r_total = sum(c_t.values()), sum(c_r.values())
    for did, t in rows:
        w = 1.0
        for g in grams(t):
            b = bucket(g)
            ratio = ((c_t.get(b, 0) + 1) / (t_total + 256)) * (
                (r_total + 256) / (c_r.get(b, 0) + 1)
            )
            w = w * ratio
        assert got[did].weight == round(w, 6), (did, got[did].weight, w)


def test_dataset_importance_sees_signal_past_position_8(spark):
    """The fidelity gap the r13 verdict flagged: a raw document whose
    domain signal sits ONLY past gram position 8 (front-loaded
    off-domain preamble) must be upsampled by the full product — the
    old k=8 pivot (still reachable via the ``k`` parameter) is blind
    to it. Target docs speak vocabulary A; the late-signal raw doc
    opens with 9 neutral preamble tokens (8 grams) and then speaks A;
    the control raw doc has the same preamble and then speaks a
    disjoint vocabulary B."""
    from mapreducekmean_spark.operators.text import dataset_importance

    body_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    body_b = "one two three four five six seven eight nine ten"
    pre = "p0 p1 p2 p3 p4 p5 p6 p7 p8"
    rows = (
        # target slice (doc_id % 20 == 0): vocabulary A, replicated so
        # the A-gram buckets dominate the target distribution
        [(20 * i, body_a) for i in range(1, 9)]
        # raw controls: vocabulary B bulk
        + [(20 * i + 1, body_b) for i in range(1, 9)]
        # the two probes: identical preamble, divergent tail
        + [(1001, f"{pre} {body_a}"), (1003, f"{pre} {body_b}")]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    full = {r.doc_id: r.weight for r in dataset_importance(docs).collect()}
    # full product separates the tails: the late A-signal doc must
    # outweigh the late B-signal doc decisively
    assert full[1001] > full[1003] * 10, (full[1001], full[1003])

    bounded = {
        r.doc_id: r.weight
        for r in dataset_importance(docs, k=8).collect()
    }
    # the k=8 pivot sees only the shared preamble: both probes get the
    # SAME weight — the blindness the full product fixes
    assert bounded[1001] == bounded[1003], (bounded[1001], bounded[1003])
