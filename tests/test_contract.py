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


@pytest.mark.sweep
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_match_bench_scale(spark, sf_bench, name):
    """Opt-in bench-scale sweep (``pytest -m sweep``): every oracle
    query hash-compared at sf0.1 — a 10× scale-up over the driver's
    gate. Last full run: 130/130 OK in 300 s (round 8)."""
    problems = compare_query(spark, sf_bench, QUERIES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_hll_sketch_accuracy(spark, sf_oracle):
    """Raw HLL++ estimate within 3x the configured rsd of the exact
    distinct count for every event type (the contract query emits the
    boolean verdict of this same bound; here the raw estimate is
    checked directly)."""
    from mapreducekmean_spark.operators.events import (
        approx_user_counts,
        events,
    )

    df = approx_user_counts(events(spark, sf_oracle))
    for r in df.collect():
        assert r.exact_users > 0
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err <= 0.06, (r.event_type, rel_err)


def _recall_at_k(spark, sf_dir, name):
    truth: dict = {}
    for r in QUERIES["cosine_topk"].fn(spark, sf_dir).collect():
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in QUERIES[name].fn(spark, sf_dir).collect():
        got.setdefault(r.q_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


@pytest.mark.parametrize("name,floor", [("ann_ivf", 0.20), ("ann_lsh", 0.03)])
def test_ann_recall_beats_random(spark, sf_oracle, name, floor):
    """ANN recall@5 vs the brute-force ground truth. Fixture embeddings
    are near-random (max pairwise cosine ~0.48), so absolute recall is
    intrinsically modest — the invariant is that each index is an order
    of magnitude above the random-candidate baseline (5/n ~ 0.0025), and
    above a measured regression floor (ivf 0.34, lsh 0.06 at sf0.01)."""
    rec = _recall_at_k(spark, sf_oracle, name)
    assert rec >= floor, rec


def test_ann_recall_full_probe_is_exact(spark, sf_oracle):
    """``ann_recall`` ground-truthing: probing EVERY cell makes IVF the
    brute-force scan (all candidates considered), so recall@k must be
    exactly 1.0 for every query; recall is also monotone in nprobe."""
    from mapreducekmean_spark.operators import kmeans as km
    from mapreducekmean_spark.operators.similarity import ann_recall

    full = ann_recall(spark, sf_oracle, nprobe=km.DEFAULT_K).collect()
    assert full and all(r.recall == 1.0 for r in full)
    lo = {
        r.q_id: r.n_hit
        for r in ann_recall(spark, sf_oracle, nprobe=1).collect()
    }
    mid = {
        r.q_id: r.n_hit
        for r in ann_recall(spark, sf_oracle, nprobe=2).collect()
    }
    assert set(lo) == set(mid)
    assert all(lo[q] <= mid[q] for q in lo)


def test_capped_range_join_exact_below_cap(spark, sf_oracle):
    """The capped range join's documented contract: identical to the
    uncapped join whenever no (user, bucket) exceeds the view cap —
    which holds on the fixtures."""
    a = sorted(
        tuple(r) for r in QUERIES["events_range_join"].fn(spark, sf_oracle).collect()
    )
    b = sorted(
        tuple(r)
        for r in QUERIES["events_range_join_capped"].fn(spark, sf_oracle).collect()
    )
    assert a == b and len(a) > 0


def test_capped_range_join_truncates_above_cap(spark):
    """Above the cap the most-recent-K truncation applies: 100 views in
    one bucket before a purchase → n_views == cap, and the value sum
    covers exactly the 64 most recent views."""
    from pyspark.sql import functions as F

    from mapreducekmean_spark.operators.events import (
        RANGE_JOIN_VIEW_CAP,
        purchases_with_recent_views_capped,
    )

    base_us = 50 * 24 * 3600 * 1_000_000  # mid-bucket, no edge effects
    rows = [
        (i, 1, "view", base_us + i * 1_000_000, 1.0) for i in range(100)
    ] + [(1000, 1, "purchase", base_us + 200 * 1_000_000, 5.0)]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, "
        "us bigint, value double",
    ).withColumn("ts", F.timestamp_micros("us"))
    out = purchases_with_recent_views_capped(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_views == RANGE_JOIN_VIEW_CAP
    assert r.view_value == float(RANGE_JOIN_VIEW_CAP)


def test_semantic_dedup_invariants(spark, sf_oracle):
    """Structural invariants beyond the oracle twin: a duplicate always
    points at a LOWER id in its OWN cell (SemDeDup keeps the smallest
    id per similarity neighborhood); kept rows have no dup_of."""
    rows = QUERIES["dedup_semantic"].fn(spark, sf_oracle).collect()
    assert len(rows) == len({r.vec_id for r in rows})
    cell_of = {r.vec_id: r.cell for r in rows}
    n_dups = 0
    for r in rows:
        if r.kept:
            assert r.dup_of is None
        else:
            n_dups += 1
            assert r.dup_of < r.vec_id
            assert cell_of[r.dup_of] == r.cell
    assert 0 < n_dups < len(rows)


def test_semantic_dedup_cell_guard_trips_on_skew(spark, sf_small):
    """The sigma-n_cell^2 linearity contract is self-enforcing: a
    deliberately degenerate cell distribution (ncells=1 funnels the
    whole fixture into ONE cell, the worst skew possible) must refuse
    with an actionable error instead of quietly scoring a quadratic
    cell, while the same bound that the skewed run violates passes once
    cells are re-bounded by raising ncells."""
    from mapreducekmean_spark.operators.similarity import semantic_dedup

    with pytest.raises(ValueError, match=r"Raise ncells"):
        semantic_dedup(spark, sf_small, ncells=1, max_cell_rows=100)
    # same bound, enough cells: the guard's count pass finds no
    # violation and the operator still yields the full row set.
    ok = semantic_dedup(spark, sf_small, max_cell_rows=100)
    n = km_embeddings_count(spark, sf_small)
    assert ok.count() == n


def km_embeddings_count(spark, sf_dir) -> int:
    from mapreducekmean_spark.operators import kmeans as km

    return km.embeddings(spark, sf_dir).count()


def test_registry_order_is_exact_permutation():
    """_CHECK_FIRST/_CHECK_LAST must stay in sync with the query groups:
    the audit-priority reorder yields every declared query exactly once,
    with the priority block leading and the proven-green tail trailing."""
    from mapreducekmean_spark import contract as c

    names = list(registry())
    assert len(names) == len(set(names))
    assert names[: len(c._CHECK_FIRST)] == list(c._CHECK_FIRST)
    assert names[-len(c._CHECK_LAST):] == list(c._CHECK_LAST)


def test_rotation_covers_stale_queries():
    """Registry-order rotation invariant: external drivers check only the
    FIRST 50 registry entries, so every declared query that has no row in
    the LATEST driver correctness artifact (= stale evidence) must sit
    inside that window. This test fails at the start of a new round if
    the rotation in contract._CHECK_FIRST/_CHECK_LAST wasn't refreshed
    against the new CORRECTNESS_r*.json — re-rotate before shipping."""
    import glob
    import json
    import os

    from mapreducekmean_spark import contract as c

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    if not arts:
        return  # no driver artifact yet (fresh clone) — nothing to pin
    latest = json.load(open(arts[-1]))
    names = list(registry())
    stale = [n for n in names if n not in latest]
    cap = 50
    if len(stale) > cap:  # more stale than slots: rotation can't cover all
        stale = stale[:cap]
    misplaced = [
        n for n in stale if names.index(n) >= cap and n not in c._STALE_OK
    ]
    assert not misplaced, (
        f"queries with no row in {os.path.basename(arts[-1])} sit past the "
        f"driver's {cap}-entry check window: {misplaced}; rotate them into "
        "_CHECK_FIRST in contract.py"
    )
    # the cap-trade list is not a free pass: every _STALE_OK entry must
    # be value-hash green in one of the LAST TWO driver artifacts —
    # two-round-old evidence at worst, exactly what the contract.py
    # comment promises. A green row from five rounds ago does NOT
    # qualify (that would make the exemption a permanent opt-out — r6
    # review); anything staler must rotate into the window instead.
    recent = [json.load(open(a)) for a in arts[-2:]]
    for n in c._STALE_OK:
        greens = [
            r.get(n)
            for r in recent
            if r.get(n)
            and r[n].get("hash_match")
            and not r[n].get("err")
        ]
        assert greens, (
            f"_STALE_OK exempts {n!r} from the check window but neither "
            f"of the last two driver artifacts has a green value-hash "
            f"row for it — its evidence is older than the two-round "
            f"bound the exemption is defined by; rotate it in"
        )


def test_rotation_matches_generator():
    """The committed _CHECK_FIRST/_STALE_OK/_CHECK_LAST tuples must be
    exactly what scripts/rotate_window.py derives from the checked-in
    CORRECTNESS artifacts — the rotation is a generated diff, not a
    hand edit (r13 verdict #2). Queries declared mid-round (no driver
    row yet, not in the window) legitimately sit mid-registry until the
    next round-start rotation adopts them, so the comparison is
    restricted to queries the artifacts (or the window itself) know."""
    import importlib.util
    import os

    from mapreducekmean_spark import contract as c

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "rotate_window", os.path.join(repo, "scripts", "rotate_window.py")
    )
    rw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rw)

    artifacts = rw.load_artifacts(repo)
    if not artifacts:
        return
    seen = {n for art in artifacts.values() for n in art}
    known = seen | set(c._CHECK_FIRST)
    declared = [n for n in registry() if n in known]
    first, stale_ok, last = rw.rotate(declared, artifacts)
    assert list(c._CHECK_FIRST) == first, (
        "rotation drift: regenerate with `python scripts/rotate_window.py`"
    )
    assert list(c._STALE_OK) == stale_ok
    assert list(c._CHECK_LAST) == last
