"""Python UDTF surface — the table-function off-ramp.

The reference has no UDF/UDAF/UDTF surface at all (SURVEY.md §2.2: all
logic lives in its MR classes), and this engine's core deliberately uses
**zero** row-at-a-time Python in hot paths (higher-order functions and
Arrow-batched Pandas stages cover everything). This module demonstrates
the remaining extension API — ``@udtf`` table functions, usable from SQL
via ``LATERAL``/table-argument syntax — for the cases where a user needs
row→rows logic that truly has no relational formulation.

Performance note (why core operators never use this): a Python UDTF is
row-at-a-time across the Python worker boundary. ``explode_ngrams``
exists as the API demo and correctness twin of the ``shingles()``
higher-order expression; the HOF version is the production path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, ngram: string")
class ExplodeNgrams:
    """Word n-grams of a text, one output row per gram.

    SQL: ``SELECT t.doc_id, g.pos, g.ngram
    FROM docs t, LATERAL explode_ngrams(t.text, 3) g``.
    Matches ``operators.dedup.shingles`` (tokens = [a-z0-9]+ runs of the
    lowercased text, space-joined grams) — pinned by a differential test.
    """

    def eval(self, text: str, n: int = 3):  # noqa: D102 (API shape)
        import re

        toks = re.findall(r"[a-z0-9]+", (text or "").lower())
        for i in range(len(toks) - n + 1):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark) -> None:
    """Idempotently register the UDTF surface for SQL use."""
    from mapreducekmean_spark.shipping import ship_package

    ship_package(spark)  # ExplodeNgrams pickles by reference
    spark.udtf.register("explode_ngrams", ExplodeNgrams)
