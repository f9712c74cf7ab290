"""Semantic tests for the late-round-3 operators (mode, full join,
substring spans, phash, CMS, Bloom, batch session_window, running totals)
on hand-built frames — pinning intended behavior independent of the
DuckDB oracle so both engines can't drift together.
"""

from __future__ import annotations

from datetime import datetime

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _t(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


def test_agg_mode_breaks_ties_on_smallest_value(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_agg_mode

    rows = [
        # flag A: 2.0 ×2, 5.0 ×2 (tie) → smallest (2.0) wins
        (1, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "A", "O", _t(1)),
        (2, 1, 1, 1, 2.0, 1.0, 0.0, 0.0, "A", "O", _t(1)),
        (3, 1, 1, 1, 5.0, 1.0, 0.0, 0.0, "A", "O", _t(1)),
        (4, 1, 1, 1, 5.0, 1.0, 0.0, 0.0, "A", "O", _t(1)),
        # flag B: clear mode 7.0 ×2 vs 1.0 ×1
        (5, 1, 1, 1, 7.0, 1.0, 0.0, 0.0, "B", "O", _t(1)),
        (6, 1, 1, 1, 7.0, 1.0, 0.0, 0.0, "B", "O", _t(1)),
        (7, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "B", "O", _t(1)),
    ]
    sf = _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    got = {r.l_returnflag: (r.mode_qty, r.n) for r in q_agg_mode(spark, sf).collect()}
    assert got == {"A": (2.0, 2), "B": (7.0, 2)}


def test_join_full_flags_both_null_sides(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_join_full

    _write(
        spark, tmp_path, "customer",
        [(1, "alice", 0, 0.0, "S"), (2, "bob", 0, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    # order for customer 1 (match), order for missing customer 9 (orphan);
    # customer 2 has no qualifying orders
    sf = _write(
        spark, tmp_path, "orders",
        [(10, 1, "O", 200000.0, _t(1), "P"), (11, 9, "O", 300000.0, _t(1), "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = {
        r.custkey: (r.n_orders, r.orphan_order, r.customer_no_orders)
        for r in q_join_full(spark, sf).collect()
    }
    assert got == {1: (1, False, False), 2: (0, False, True), 9: (1, True, False)}


def test_dedup_substring_flags_shared_block(spark, tmp_path):
    from cloud_data_sync_spark.operators.dedup import q_dedup_substring

    shared_block = "x" * 120  # spans a full 100-char window at stride 50
    rows = [
        (1, shared_block + " unique tail one " + "a" * 60, "en", "w", 200),
        (2, shared_block + " another ending " + "b" * 60, "en", "w", 200),
        (3, "entirely different text " + "c" * 150, "en", "w", 175),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {r.doc_id: r.n_shared for r in q_dedup_substring(spark, sf).collect()}
    assert got[1] > 0 and got[2] > 0  # the shared block is detected
    assert got[3] == 0  # the unique doc has no repeated spans


def test_multimodal_phash_groups_identical_payloads(spark, tmp_path):
    from cloud_data_sync_spark.operators.multimodal import q_multimodal_phash

    text = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, text, "en", "w", len(text)),
        (2, text, "en", "w", len(text)),
        (3, "zzz completely other payload bytes " * 4, "en", "w", 140),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {r.doc_id: (r.phash, r.canonical_id, r.group_size) for r in q_multimodal_phash(spark, sf).collect()}
    assert got[1][0] == got[2][0]  # identical payloads → identical phash
    assert got[1][1:] == (1, 2) and got[2][1:] == (1, 2)
    assert len(got[1][0]) == 16 and set(got[1][0]) <= {"0", "1"}


def test_sketch_cms_never_undercounts(spark, tmp_path):
    from cloud_data_sync_spark.functions.udfs import q_sketch_cms

    rows = [(i, "alpha beta beta gamma", "en", "w", 21) for i in range(4)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    out = q_sketch_cms(spark, sf).collect()
    assert {r.term for r in out} == {"alpha", "beta", "gamma"}
    for r in out:
        assert r.never_undercounts
        assert r.cms_est >= r.exact_n
    exact = {r.term: r.exact_n for r in out}
    assert exact == {"alpha": 4, "beta": 8, "gamma": 4}


def test_bloom_prune_passes_all_true_matches(spark, tmp_path):
    from cloud_data_sync_spark.functions.udfs import q_bloom_prune

    _write(
        spark, tmp_path, "customer",
        [(i, f"c{i}", 0, 7000.0 if i % 2 == 0 else 100.0, "S") for i in range(1, 21)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    sf = _write(
        spark, tmp_path, "orders",
        [(100 + i, i, "O", 1.0, _t(1), "P") for i in range(1, 21)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    r = q_bloom_prune(spark, sf).collect()[0]
    assert r.n_orders == 20
    assert r.n_true == 10  # even custkeys qualify
    assert r.n_passed >= r.n_true  # the Bloom guarantee
    assert r.fp_rate >= 0.0


def test_session_window_batch_merge_and_end_semantics(spark, tmp_path):
    from cloud_data_sync_spark.streaming.windows import q_session_window_batch

    rows = [
        # user 1: events 29 min apart merge into one session
        (1, _t(1, 10, 0), 1, "view", 1.0, "{}"),
        (2, _t(1, 10, 29), 1, "view", 2.0, "{}"),
        # then a 31-min gap → a second session
        (3, _t(1, 11, 0), 1, "view", 4.0, "{}"),
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = sorted(
        (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in q_session_window_batch(spark, sf).collect()
    )
    assert got == [
        (_t(1, 10, 0), _t(1, 10, 59), 2, 3.0),   # end = last event + 30 min
        (_t(1, 11, 0), _t(1, 11, 30), 1, 4.0),
    ]


def test_stream_running_totals_accumulate(spark, tmp_path):
    from cloud_data_sync_spark.streaming.stateful import q_stream_running_totals

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpointLocation", str(tmp_path / "ckpt")
    )
    rows = [
        (1, _t(1, 10), 7, "view", 1.5, "{}"),
        (2, _t(1, 11), 7, "view", 2.5, "{}"),
        (3, _t(1, 12), 8, "view", 10.0, "{}"),
    ]
    # the file-source stream globs on the literal FILE name events.parquet
    # (the driver's testdata layout); Spark's writer would make a directory
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(cols[0], pa.int64()),
                "ts": pa.array(
                    [int(t.timestamp() * 1_000_000) for t in cols[1]], pa.int64()
                ).cast(pa.timestamp("us")),
                "user_id": pa.array(cols[2], pa.int64()),
                "event_type": pa.array(cols[3], pa.string()),
                "value": pa.array(cols[4], pa.float64()),
                "props": pa.array(cols[5], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    sf = str(tmp_path)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in q_stream_running_totals(spark, sf).collect()
    }
    assert got == {7: (2, 4.0), 8: (1, 10.0)}
