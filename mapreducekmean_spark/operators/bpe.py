"""Distributed byte-pair encoding: train a real BPE merge table on the
corpus and tokenize with it.

The reference engine has nothing like this (its 3 Java files run one
K-Means job); the engine's own `token_count` query counts
whitespace/regex tokens, which is the stand-in every pipeline starts
with. This module is the upgrade a training-data pipeline actually
runs: learn subword merges from the corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") and
count REAL tokenizer tokens.

Scale design — the classic observation that makes BPE distributable:
training operates on the DISTINCT-WORD frequency table, never the
corpus. A 100 TB corpus has millions of distinct words, not billions
of rows, and every merge round is

  (1) one distributed pair-count over the word dict
      (explode adjacent symbol pairs, weight by word count),
  (2) a 1-row bounded collect (the best pair — the only thing that
      ever reaches the driver),
  (3) one greedy-left fold over each word's symbol array applying the
      merge (HOF lambda per DICT row — bounded by the dict, not the
      corpus; the round-5 HOF lesson does not bite because the hot
      relation is the small one),

with the dict localCheckpoint-ed per round (the ``kmeans`` loop
stance). Encoding then never touches merges at all: the training loop
already terminated with every dict word fully merged, so tokenizing
the corpus is ONE broadcast-join of corpus words against the encoded
dict — the standard "encode the vocabulary once, join" design.

Determinism: ties in pair frequency break lexicographically on
(first, second); training stops early when the best pair occurs only
once (merging hapax pairs memorizes the corpus). Both rules are
mirrored by the pure-Python reference in tests/test_bpe.py, which
pins merges, encoded dict, and per-doc token counts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreducekmean_spark.operators.text import tokens

#: default merge budget for the declared query; real vocab sizes are
#: 10k-100k — the budget is a fixture-scale stand-in, the loop is the
#: same at any budget.
BPE_MERGES = 40

#: end-of-word sentinel (Sennrich's </w>): distinguishes "est" inside
#: "restless" from "est</w>" ending "smallest".
END_WORD = "</w>"

#: stop early when the best pair's weighted count drops below this —
#: merging pairs that occur once memorizes the corpus.
MIN_PAIR_COUNT = 2

#: word dicts at or below this many distinct words train DRIVER-LOCALLY:
#: the training loop is inherently sequential (each merge depends on the
#: last), so at small dict sizes its cost is n_merges × Spark job
#: overhead, not data — the 40-round fixture loop spent ~6 s on ~150 ms
#: rounds over a few-thousand-row dict. Collecting a bounded dict and
#: running the identical greedy loop in Python is the same adaptive move
#: as kmeans collecting k centroid rows; past the threshold the
#: distributed loop engages unchanged (a pure-Python round over a big
#: dict would itself be the bottleneck: ~2M pair increments per round
#: at 200k words). Both paths are pinned identical (tests/test_bpe.py)
#: — same tie-breaks, same stop rule.
BPE_LOCAL_VOCAB = 20_000


def word_counts(docs: DataFrame) -> DataFrame:
    """(word, cnt) over the corpus tokenizer — the relation BPE trains
    on. One explode + one aggregate; dict-sized output."""
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def _initial_dict(wc: DataFrame) -> DataFrame:
    """word → (cnt, syms): characters plus the end-of-word sentinel."""
    return wc.select(
        "word",
        "cnt",
        F.concat(
            F.filter(F.split("word", ""), lambda c: c != ""),
            F.array(F.lit(END_WORD)),
        ).alias("syms"),
    )


def _pair_counts(d: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the dict's symbol arrays."""
    return (
        d.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                )
            ).alias("p"),
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("w"))
    )


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _apply_merge(d: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy-left merge of the adjacent pair (a, b) into one symbol,
    as a single fold expression over each word's symbol array: append
    each symbol unless the accumulator's tail is ``a`` and the symbol
    is ``b``, in which case replace the tail with the merged token.
    Greedy-left matches the reference BPE exactly (pinned in tests,
    including the overlapping 'a a a' case)."""
    qa, qb = _sql_quote(a), _sql_quote(b)
    qm = _sql_quote(a + b)
    return d.withColumn(
        "syms",
        F.expr(
            "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' "
            f"AND s = '{qb}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qm}')) "
            "ELSE concat(acc, array(s)) END)"
        ),
    )


def _bpe_train_local(
    spark, wc_rows: list, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Driver-local training over a collected (word, cnt) dict — the
    exact greedy loop of the distributed path (max weighted pair, ties
    lexicographic on (a, b), stop below MIN_PAIR_COUNT, greedy-left
    merge), so merges and segmentations are identical by construction
    and pinned so by test_bpe_local_equals_distributed."""
    wc = {r["word"]: int(r["cnt"]) for r in wc_rows}
    d = {w: list(w) + [END_WORD] for w in wc}
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in d.items():
            c = wc[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (a, b), w_best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if w_best < MIN_PAIR_COUNT:
            break
        merges.append((a, b))
        m = a + b
        for w, syms in d.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = m
                else:
                    out.append(s)
            d[w] = out
    enc = spark.createDataFrame(
        [(w, wc[w], d[w]) for w in sorted(d)],
        "word string, cnt bigint, syms array<string>",
    )
    return merges, enc


def bpe_train(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    local_vocab_threshold: int = BPE_LOCAL_VOCAB,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Returns
    ``(merges, encoded_dict)`` where ``encoded_dict`` is the word dict
    with each word's final subword segmentation — training's own end
    state, so encoding costs nothing extra.

    Adaptive execution: a dict at or below ``local_vocab_threshold``
    distinct words trains driver-locally (the sequential loop's cost at
    small dicts is pure job overhead — see BPE_LOCAL_VOCAB); a larger
    dict takes the distributed per-round loop. Results are identical
    either way (pinned)."""
    # checkpoint the word dict BEFORE the threshold gate: the gate's
    # count() materializes it once, and whichever branch runs (collect
    # or _initial_dict) reuses the materialized blocks instead of
    # re-aggregating the corpus a second time.
    wc = word_counts(docs).localCheckpoint(eager=False)
    if local_vocab_threshold and wc.count() <= int(local_vocab_threshold):
        return _bpe_train_local(
            docs.sparkSession, wc.collect(), n_merges
        )
    d = _initial_dict(wc).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best = (
            _pair_counts(d)
            .orderBy(F.desc("w"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["w"] < MIN_PAIR_COUNT:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        d = _apply_merge(d, a, b).localCheckpoint()
    return merges, d


def bpe_token_stats(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Per-document REAL-tokenizer statistics: train BPE on the corpus,
    then tokenize every document by joining its words against the
    encoded dict (broadcast — the dict is vocabulary-sized). Output:
    ``(doc_id, n_words, n_tokens, n_merges_used)`` with ``n_tokens``
    the document's BPE token count — the number a sequence-packing or
    token-budget stage actually needs.

    Declared rows-only: the merge table is corpus-derived state, so a
    DuckDB twin would have to replay the whole training loop; the
    training loop and greedy merge are instead pinned exactly against
    a pure-Python Sennrich reference in tests/test_bpe.py."""
    merges, d = bpe_train(docs, n_merges)
    enc = d.select("word", F.size("syms").alias("toks_per_word"))
    per_doc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("word"))
        .join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("toks_per_word").cast("bigint").alias("n_tokens"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).alias("n_words"),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.lit(len(merges)).cast("bigint").alias("n_merges_used"),
    )


def bpe_fertility_by_source(
    docs: DataFrame, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Tokenizer fertility report by source — the mixture diagnostic a
    pretraining pipeline reads when a tokenizer is trained or a new
    source lands: per source, word/token/char totals plus
    ``fertility`` (BPE tokens per word) and ``chars_per_token``, both
    6-dp rounds of ONE IEEE division of exact integer totals. High
    fertility flags sources the tokenizer serves poorly (wrong
    script, code, noise) — exactly what drives mixture and tokenizer
    re-training decisions.

    Chars are counted over the tokenized words (alphanumeric runs),
    so all three totals share one definition with
    :func:`bpe_token_stats` and the twin. A source whose documents
    contain no tokens contributes no row (GROUP BY semantics, both
    engines).

    Scale shape: the training replay is corpus-size-independent
    (rounds over the distinct-word dict — the ``bpe_train`` note);
    the report is one token-keyed explode joined against the
    broadcast vocabulary-sized dict, partial-agg'd to one row per
    source."""
    _merges, d = bpe_train(docs, n_merges)
    enc = d.select(
        "word",
        F.size("syms").alias("toks_per_word"),
        F.length("word").alias("chars_per_word"),
    )
    per_src = (
        docs.select("source", F.explode(tokens("text")).alias("word"))
        .join(F.broadcast(enc), "word")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("toks_per_word").cast("bigint").alias("n_tokens"),
            F.sum("chars_per_word").cast("bigint").alias("n_chars"),
        )
    )
    return per_src.select(
        "source",
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(
            F.col("n_tokens").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("chars_per_token"),
    )


def pack_sequences_bpe(
    docs: DataFrame, budget: int | None = None, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Sequence packing over REAL tokenizer counts: train BPE on the
    corpus (``bpe_token_stats``), then drive the shared two-level
    prefix-sum packer (``text.pack_from_counts``) with each document's
    BPE token count instead of the whitespace/regex stand-in. This is
    the composition a pretraining data pipeline actually runs — the
    packed-sequence index must be measured in the tokens the model will
    see, and whitespace counts can be 3-4x off on subword-heavy text.

    Scale shape: training is dict-bound (never corpus-bound), the
    per-doc count is one broadcast dict join, and the join back to
    (doc_id, source) is co-keyed on doc_id; packing itself keeps the
    bounded-window guarantee of ``pack_sequences``."""
    from mapreducekmean_spark.operators.text import (
        PACK_BUDGET,
        pack_from_counts,
    )

    stats = bpe_token_stats(docs, n_merges)
    counts = docs.select("doc_id", "source").join(
        stats.select("doc_id", F.col("n_tokens").alias("n_tok")), "doc_id"
    )
    return pack_from_counts(
        counts, PACK_BUDGET if budget is None else budget
    )
