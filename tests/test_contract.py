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


def test_hll_sketch_accuracy(spark, sf_oracle):
    """events_hll_users: HLL++ estimate within 3x the configured rsd of
    the exact distinct count for every event type."""
    df = QUERIES["events_hll_users"].fn(spark, sf_oracle)
    for r in df.collect():
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.06, (r.event_type, rel_err)
