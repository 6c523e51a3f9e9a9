"""data_expectations: every check must FIRE on corrupted input (the
fixtures are clean, so the oracle only proves the all-pass path)."""

from __future__ import annotations

from mapreducekmean_spark.operators.validate import expectations_report


def test_every_expectation_fires_on_corruption(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 5.0, "2020-01-01"),
            (1, 11, -2.0, "2020-01-02"),  # dup key + non-positive price
            (2, 99, None, "2020-01-03"),  # null price + dangling custkey
        ],
        "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
        " o_orderdate string",
    )
    lineitem = spark.createDataFrame(
        [(1, 50.0), (7, 150.0), (8, 0.0)],  # dangling order, qty bounds ×2
        "l_orderkey bigint, l_quantity double",
    )
    customer = spark.createDataFrame(
        [(10,), (10,), (11,)], "c_custkey bigint"
    )  # dup key
    events = spark.createDataFrame(
        [(1, None), (1, "2020-01-01 00:00:00")],  # dup id + null ts
        "event_id bigint, ts string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts")
    documents = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ok")], "doc_id bigint, text string"
    )
    rows = {
        (r.tbl, r.check): (r.violations, r.ok)
        for r in expectations_report(
            orders, lineitem, customer, events, documents
        ).collect()
    }
    assert rows[("orders", "o_orderkey_unique")] == (1, False)
    assert rows[("orders", "o_totalprice_positive")] == (2, False)
    assert rows[("orders", "o_custkey_in_customer")] == (1, False)
    assert rows[("lineitem", "quantity_in_bounds")] == (2, False)
    assert rows[("lineitem", "orderkey_in_orders")] == (2, False)
    assert rows[("customer", "c_custkey_unique")] == (1, False)
    assert rows[("events", "event_id_unique")] == (1, False)
    assert rows[("events", "ts_not_null")] == (1, False)
    assert rows[("documents", "text_nonempty")] == (2, False)
    assert len(rows) == 9
