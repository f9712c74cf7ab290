"""Semantic tests for the round-5 operators (k-means, SCD2, column
profiling, calendar-range rolling window) on hand-built frames.

The oracle gate proves Spark/DuckDB agreement; these pin intended
semantics (Lloyd convergence on separable data, validity stitching,
native-type min/max, peer-inclusive range frames) so both engines can't
drift together.
"""

from __future__ import annotations

from datetime import datetime

from cloud_data_sync_spark.operators.analytics import (
    q_profile_columns,
    q_scd2,
    q_window_time_range,
)
from cloud_data_sync_spark.operators.ml import q_kmeans

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _t(day, h=0):
    return datetime(2024, 1, day, h)


def test_kmeans_separable_clusters(spark, tmp_path):
    # Two tight blobs at ±1 on every dim. vec_ids are chosen so every %8
    # seed cluster is sign-pure (ids 0-5 → seeds 0-5 all "+", ids 6,7,14,15
    # → seeds 6,7 all "−"); two Lloyd rounds must keep blobs separated, so
    # every cluster's mean distance stays at blob-spread scale (a merged
    # cluster would sit at avg_dist ≈ 8 = ||±1 blob to centroid 0||₂).
    plus = [(i, [1.0 + 0.001 * i] * 64, 0) for i in range(6)]
    minus = [(i, [-1.0 - 0.001 * i] * 64, 1) for i in (6, 7, 14, 15)]
    sf = _write(
        spark,
        tmp_path,
        "embeddings",
        plus + minus,
        "vec_id long, embedding array<float>, label int",
    )
    out = q_kmeans(spark, sf).collect()
    sizes = sorted(r.n_members for r in out)
    assert sum(sizes) == 10  # every vector assigned exactly once
    assert all(float(r.avg_dist) < 0.5 for r in out)  # no cross-blob merge


def test_scd2_segments_and_stitching(spark, tmp_path):
    # user 1: a,a,b,a → segments a[1,3) b[3,4) a[4,∞)
    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            (1, _t(1), 1, "a", 0.0, "{}"),
            (2, _t(2), 1, "a", 0.0, "{}"),
            (3, _t(3), 1, "b", 0.0, "{}"),
            (4, _t(4), 1, "a", 0.0, "{}"),
        ],
        EV_SCHEMA,
    )
    rows = sorted(q_scd2(spark, sf).collect(), key=lambda r: r.seg_id)
    assert [(r.event_type, r.valid_from, r.valid_to, r.is_current, r.n_events) for r in rows] == [
        ("a", _t(1), _t(3), False, 2),
        ("b", _t(3), _t(4), False, 1),
        ("a", _t(4), None, True, 1),
    ]


def test_scd2_tied_timestamps_use_event_id(spark, tmp_path):
    # same ts, types ordered by event_id: b(1), a(2) → two segments, b first
    sf = _write(
        spark,
        tmp_path,
        "events",
        [(1, _t(1), 1, "b", 0.0, "{}"), (2, _t(1), 1, "a", 0.0, "{}")],
        EV_SCHEMA,
    )
    rows = sorted(q_scd2(spark, sf).collect(), key=lambda r: r.seg_id)
    assert [r.event_type for r in rows] == ["b", "a"]


def test_profile_null_and_minmax_semantics(spark, tmp_path):
    sf = _write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 10, "O", 5.0, _t(1), "HIGH"),
            (2, 11, None, 100.0, _t(9), "LOW"),
        ],
        ORD_SCHEMA,
    )
    rows = {r.col_name: r for r in q_profile_columns(spark, sf).collect()}
    assert rows["o_orderstatus"].n_null == 1
    assert rows["o_orderstatus"].n_distinct == 1
    # numeric min/max computed BEFORE string rendering: 5.00 < 100.00
    assert rows["o_totalprice"].min_s == "5.00"
    assert rows["o_totalprice"].max_s == "100.00"
    assert rows["o_orderdate"].min_s.startswith("2024-01-01")


def test_time_range_window_trailing_30d(spark, tmp_path):
    # orders on day 1, 15, 40: day-40 window [day10..day40] excludes day 1
    sf = _write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 7, "O", 10.0, _t(1), "H"),
            (2, 7, "O", 20.0, _t(15), "H"),
            (3, 7, "O", 40.0, datetime(2024, 2, 9), "H"),
        ],
        ORD_SCHEMA,
    )
    rows = {r.o_orderkey: r for r in q_window_time_range(spark, sf).collect()}
    assert float(rows[1].spend_30d) == 10.0 and rows[1].n_orders_30d == 1
    assert float(rows[2].spend_30d) == 30.0 and rows[2].n_orders_30d == 2
    assert float(rows[3].spend_30d) == 60.0 and rows[3].n_orders_30d == 2


LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
    " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
    " l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_pagerank_sink_node_accumulates(spark, tmp_path):
    # 3 nations; both 0 and 1 trade only with supplier-nation 2 → node 2
    # must outrank its sources after any number of iterations.
    from cloud_data_sync_spark.operators.ml import q_pagerank

    _write(spark, tmp_path, "nation", [(0, "A", 0), (1, "B", 0), (2, "C", 0)],
           "n_nationkey long, n_name string, n_regionkey long")
    _write(spark, tmp_path, "customer", [(1, "c1", 0, 0.0, "M"), (2, "c2", 1, 0.0, "M")],
           "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "supplier", [(1, "s1", 2, 0.0)],
           "s_suppkey long, s_name string, s_nationkey long, s_acctbal double")
    _write(spark, tmp_path, "orders",
           [(1, 1, "O", 1.0, _t(1), "H"), (2, 2, "O", 1.0, _t(2), "H")],
           ORD_SCHEMA.replace("o_orderkey long, o_custkey long",
                              "o_orderkey long, o_custkey long"))
    _write(spark, tmp_path, "lineitem",
           [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(1)),
            (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(2))],
           LI_SCHEMA)
    pr = {r.nation: float(r.pagerank) for r in q_pagerank(spark, str(tmp_path)).collect()}
    assert set(pr) == {"A", "B", "C"}
    assert pr["C"] > pr["A"] and pr["C"] > pr["B"]
    # C is dangling (no out-edges), so the simple variant leaks its mass
    # each round: total < 1, but every node keeps the (1-d)/N base.
    assert sum(pr.values()) < 1.0
    assert all(v >= 0.05 - 1e-9 for v in pr.values())


def test_temporal_join_assigns_each_event_once(spark, tmp_path):
    from cloud_data_sync_spark.operators.analytics import q_temporal_join

    sf = _write(
        spark,
        tmp_path,
        "events",
        [
            (1, _t(1), 1, "a", 0.0, "{}"),
            (2, _t(2), 1, "b", 0.0, "{}"),
            (3, _t(3), 1, "b", 0.0, "{}"),
        ],
        EV_SCHEMA,
    )
    rows = {r.event_id: r for r in q_temporal_join(spark, sf).collect()}
    assert len(rows) == 3  # exactly one segment per event
    assert rows[1].segment_type == "a" and not rows[1].in_current_segment
    assert rows[2].segment_type == "b" and rows[2].in_current_segment
    assert rows[3].segment_type == "b" and rows[3].in_current_segment


def test_anomaly_mad_flags_only_extremes(spark, tmp_path):
    from cloud_data_sync_spark.operators.analytics import q_anomaly_mad

    # values 1..9 (med=5, mad=2) plus a wild 100 → exactly one outlier
    rows = [(i, _t(1, i % 24), 1, "buy", float(v), "{}") for i, v in enumerate(list(range(1, 10)) + [100])]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    r = q_anomaly_mad(spark, sf).collect()[0]
    assert float(r.med) == 5.5 and r.n == 10
    assert r.n_outliers == 1


def test_skew_report_orders_by_weight(spark, tmp_path):
    from cloud_data_sync_spark.operators.analytics import q_skew_report

    # supplier 7 holds 8 of 12 rows → top row, share 2/3, 2x the mean key load
    rows = [(i, 1, 7 if i < 8 else 100 + i, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(1)) for i in range(12)]
    sf = _write(spark, tmp_path, "lineitem", rows, LI_SCHEMA)
    out = q_skew_report(spark, sf).collect()
    assert out[0].l_suppkey == 7 and out[0].cnt == 8
    assert abs(float(out[0].share) - 8 / 12) < 1e-6
    # 5 distinct keys, mean load 12/5 → 8 / (12/5) = 10/3
    assert abs(float(out[0].x_mean) - round(8 * 5 / 12, 4)) < 1e-9
