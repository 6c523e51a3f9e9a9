"""doc_classifier semantics on a hand-built corpus where the classes
actually separate (the fixture's synthetic texts share one vocabulary
across langs — the lang_id caveat — so separation must be proven
here, determinism by the DuckDB oracle)."""

from __future__ import annotations

from mapreducekmean_spark.operators.text import doc_classifier


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_disjoint_vocabularies_separate_perfectly(spark):
    en = [("the cat sat on the mat", "en"), ("a dog and the cat ran", "en")]
    de = [("der hund lief im park", "de"), ("im park sitzt der hund", "de")]
    out = {r.doc_id: r for r in doc_classifier(_docs(spark, en + de)).collect()}
    # en docs: every term's df_pos == df_all → score 1.0, above the 0.5 prior
    for i in (0, 1):
        assert out[i].clf_num == out[i].clf_den
        assert out[i].clf_score == 1.0 and out[i].pred_pos
    # de docs: no term ever appears in an en doc → score 0.0
    for i in (2, 3):
        assert out[i].clf_num == 0
        assert out[i].clf_score == 0.0 and not out[i].pred_pos


def test_shared_terms_weight_by_positive_df(spark):
    """One shared term pulls the negative doc's score up by exactly its
    positive document frequency share."""
    rows = [
        ("alpha beta", "en"),
        ("alpha gamma", "de"),
    ]
    out = {r.doc_id: r for r in doc_classifier(_docs(spark, rows)).collect()}
    # doc 0: alpha df_pos=1 df_all=2, beta 1/1 → num=2 den=3
    assert (out[0].clf_num, out[0].clf_den) == (2, 3)
    # doc 1: alpha 1/2, gamma 0/1 → num=1 den=3; prior num*2 > den*1 fails
    assert (out[1].clf_num, out[1].clf_den) == (1, 3)
    assert out[0].pred_pos and not out[1].pred_pos


def test_zero_token_docs_are_omitted(spark):
    rows = [("real words here", "en"), ("!!!", "en")]
    got = doc_classifier(_docs(spark, rows)).collect()
    assert [r.doc_id for r in got] == [0]
