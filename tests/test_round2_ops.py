"""Semantic tests for the round-2 breadth operators (range join, grouping
sets, TF-IDF, histogram, vector stats) on hand-built frames.

The oracle gate proves Spark/DuckDB agreement; these pin the intended
semantics (strict overlap, bucket-boundary candidates, tie-breaks, bin
edges) so both engines can't drift together.
"""

from __future__ import annotations

from datetime import datetime

from cloud_data_sync_spark.operators.relational import (
    q_grouping_sets,
    q_histogram,
    q_join_range,
)
from cloud_data_sync_spark.operators.similarity import q_vector_stats
from cloud_data_sync_spark.operators.text import q_tfidf

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_range_join_overlap_and_strict_boundary(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # a-side (id % 23 == 0): [10:00, 11:00)
            (23, _t(10), 1, "view", 60.0, "{}"),
            # b-side (id % 29 == 0): [10:30, 11:30) → overlaps 30 min
            (29, _t(10, 30), 1, "view", 60.0, "{}"),
            # b-side starting exactly at a's end: strict < ⇒ NO match
            (58, _t(11), 1, "view", 30.0, "{}"),
            # far-away a-side: no match
            (46, _t(20), 1, "view", 10.0, "{}"),
        ],
    )
    rows = {(r.a_id, r.b_id): r.overlap_sec for r in q_join_range(spark, sf).collect()}
    assert rows == {(23, 29): 1800}


def test_range_join_pair_spanning_bucket_boundary_dedupes(spark, tmp_path):
    sf = _write_events(
        spark,
        tmp_path,
        [
            # a: [09:50, 10:20) covers hour-buckets 9 and 10
            (69, _t(9, 50), 1, "view", 30.0, "{}"),
            # b: [09:55, 10:15) also covers buckets 9 and 10 → candidate
            # pair appears under BOTH buckets; distinct must collapse it
            (87, _t(9, 55), 1, "view", 20.0, "{}"),
        ],
    )
    out = q_join_range(spark, sf).collect()
    assert len(out) == 1 and out[0].overlap_sec == 20 * 60


def test_grouping_sets_lattice_and_gid(spark, tmp_path):
    spark.createDataFrame(
        [("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0), ("B", "F", 4.0)],
        "l_returnflag string, l_linestatus string, l_quantity double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = q_grouping_sets(spark, str(tmp_path)).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # ((flag, status)) → gid 0: 3 distinct pairs
    assert len(by_gid[0]) == 3
    # ((flag)) → gid 1: two flags
    assert {r.l_returnflag for r in by_gid[1]} == {"A", "B"}
    # (()) → gid 3: one grand-total row covering all 4 input rows
    [total] = by_gid[3]
    assert total.n == 4 and float(total.sum_qty) == 10.0


def test_histogram_bin_edges(spark, tmp_path):
    spark.createDataFrame(
        [(1, 10.0), (2, 24999.99), (3, 25000.0), (4, 99999.0)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    rows = {r.bin: r for r in q_histogram(spark, str(tmp_path)).collect()}
    assert rows[0].n == 2 and rows[0].bin_lo == 0
    assert rows[1].n == 1 and rows[1].bin_lo == 25000
    assert rows[3].n == 1 and rows[3].bin_lo == 75000


def test_tfidf_common_term_scores_zero_and_rare_term_wins(spark, tmp_path):
    docs = [
        (0, "apple apple common", "en", "s", 18),
        (1, "banana common", "en", "s", 13),
        (2, "cherry common", "en", "s", 13),
        (20, "durian durian common", "en", "s", 20),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = q_tfidf(spark, str(tmp_path)).collect()
    # only doc_ids % 20 == 0 are emitted
    assert {r.doc_id for r in out} == {0, 20}
    top = {r.doc_id: r for r in out if r.n_td == 2}
    # tf=2 on a 1-of-4-docs term beats everything; 'common' (df=N) scores 0
    assert top[0].term == "apple" and top[20].term == "durian"
    common = [r for r in out if r.term == "common"]
    assert all(float(r.score) == 0.0 for r in common)


def test_vector_stats_per_dimension(spark, tmp_path):
    spark.createDataFrame(
        [(1, [1.0, 10.0], 0), (2, [3.0, 30.0], 0)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    rows = {r.dim: r for r in q_vector_stats(spark, str(tmp_path)).collect()}
    assert rows[0].n == 2 and float(rows[0].mean_v) == 2.0
    assert float(rows[1].mean_v) == 20.0 and float(rows[1].max_v) == 30.0
