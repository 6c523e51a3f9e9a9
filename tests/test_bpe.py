"""Distributed BPE (operators/bpe.py) pinned EXACTLY against a
pure-Python Sennrich reference: same tie-break (weight desc, pair
lexicographic asc), same greedy-left merge application, same
hapax-pair stop rule."""

import random
import re

from mapreducekmean_spark.operators.bpe import (
    END_WORD,
    MIN_PAIR_COUNT,
    bpe_token_stats,
    bpe_train,
)


def _ref_bpe(texts, n_merges):
    """Sennrich reference on the word-frequency dict."""
    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    d = {w: list(w) + [END_WORD] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for w, syms in d.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < MIN_PAIR_COUNT:
            break
        (a, b), _ = best
        merges.append((a, b))
        for w, syms in d.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            d[w] = out
    return merges, d, wc


def _spark_docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def test_bpe_merges_and_dict_match_reference(spark):
    """Merge list AND final segmentation identical to the reference on
    a corpus with repeated stems (so merges chain: s-t, st-e, ...) and
    an overlapping-run word (aaaa — the greedy-left edge)."""
    texts = [
        "test testing tested tests rest rested",
        "test rest resting testing tests",
        "aaaa aa aaa test",
    ] * 3
    ref_merges, ref_dict, _ = _ref_bpe(texts, 25)
    merges, d = bpe_train(_spark_docs(spark, texts), 25)
    assert merges == ref_merges and merges
    got = {r.word: list(r.syms) for r in d.collect()}
    assert got == ref_dict


def test_bpe_matches_reference_on_random_corpora(spark):
    rng = random.Random(5)
    stems = ["walk", "jump", "read", "code"]
    sufs = ["", "s", "ed", "ing", "er"]
    for trial in range(2):
        texts = [
            " ".join(
                rng.choice(stems) + rng.choice(sufs) for _ in range(12)
            )
            for _ in range(15)
        ]
        ref_merges, ref_dict, _ = _ref_bpe(texts, 30)
        merges, d = bpe_train(_spark_docs(spark, texts), 30)
        assert merges == ref_merges
        assert {r.word: list(r.syms) for r in d.collect()} == ref_dict


def test_bpe_token_stats_counts_encoded_tokens(spark):
    """Per-doc n_tokens must equal summing the reference dict's
    segment counts over the doc's words; frequent stems compress
    (tokens-per-word < chars-per-word) — the point of BPE."""
    texts = [
        "test testing tested tests rest rested",
        "test rest resting testing tests",
        "zq",
    ] * 2
    ref_merges, ref_dict, _ = _ref_bpe(texts, 25)
    out = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_merges_used)
        for r in bpe_token_stats(_spark_docs(spark, texts), 25).collect()
    }
    for did, text in enumerate(texts):
        words = re.findall(r"[a-z0-9]+", text.lower())
        want = sum(len(ref_dict[w]) for w in words)
        assert out[did] == (len(words), want, len(ref_merges))
    # compression actually happened for the stem-heavy doc
    words0 = re.findall(r"[a-z0-9]+", texts[0].lower())
    chars0 = sum(len(w) + 1 for w in words0)  # +1 end-of-word sentinel
    assert out[0][1] < chars0


def test_pack_sequences_bpe_matches_naive_reference(spark):
    """Packing over BPE counts pinned against a pure-Python naive pack
    (sequential prefix sum per source in doc_id order over the
    reference tokenizer's counts) — independent of both the two-level
    prefix sum AND the distributed trainer."""
    from mapreducekmean_spark.operators.bpe import pack_sequences_bpe
    from mapreducekmean_spark.operators.text import PACK_BUDGET

    texts = [
        "test testing tested tests rest rested",
        "test rest resting testing tests",
        "aaaa aa aaa test",
        "",
        "walk walked walking walks rest",
        "zq zq zq test tests",
    ]
    docs = spark.createDataFrame(
        [
            (i, t, f"src{i % 2}")
            for i, t in enumerate(texts)
        ],
        "doc_id bigint, text string, source string",
    )
    _, ref_dict, _ = _ref_bpe(texts, 40)
    tpw = {w: len(s) for w, s in ref_dict.items()}
    want = {}
    offset = {}
    b = PACK_BUDGET
    for did, t in enumerate(texts):
        src = f"src{did % 2}"
        words = re.findall(r"[a-z0-9]+", t.lower())
        n_tok = sum(tpw[w] for w in words)
        start = offset.get(src, 0)
        offset[src] = start + n_tok
        if n_tok > 0:
            fs, ls = start // b, (start + n_tok - 1) // b
            want[did] = (src, n_tok, start, fs, ls, ls - fs + 1, start % b)
        else:
            want[did] = (src, 0, start, None, None, 0, None)
    got = {
        r.doc_id: (
            r.source,
            r.n_tok,
            r.start_tok,
            r.first_seq,
            r.last_seq,
            r.n_seqs,
            r.seq_offset,
        )
        for r in pack_sequences_bpe(docs).collect()
    }
    assert got == want


def test_bpe_local_equals_distributed(spark):
    """The adaptive cutover must be invisible: the driver-local loop
    (small-dict fast path) and the distributed per-round loop produce
    identical merges and identical final segmentations on the same
    corpus — same tie-breaks, same hapax stop rule."""
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
        "low new wide lowest",
    ]
    docs = _spark_docs(spark, texts)
    m_loc, d_loc = bpe_train(docs, 12)  # vocab << threshold → local
    m_dist, d_dist = bpe_train(docs, 12, local_vocab_threshold=0)
    assert m_loc == m_dist and m_loc  # merges identical, loop ran
    loc = {r.word: (r.cnt, tuple(r.syms)) for r in d_loc.collect()}
    dist = {r.word: (r.cnt, tuple(r.syms)) for r in d_dist.collect()}
    assert loc == dist
