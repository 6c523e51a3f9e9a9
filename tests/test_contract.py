"""Differential oracle tests — the driver's t2 gate, run locally at
sf0.001 for every contract query that declares an oracle."""

from __future__ import annotations

import pytest

from mapreducekmean_spark.contract import registry
from tests.oracle_util import compare_query

QUERIES = registry()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match_small(spark, sf_small, name):
    problems = compare_query(spark, sf_small, QUERIES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match_sf001(spark, sf_oracle, name):
    problems = compare_query(spark, sf_oracle, QUERIES[name])
    assert not problems, f"{name}: " + "; ".join(problems)
