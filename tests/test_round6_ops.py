"""Semantic tests for the round-3 additions (gaps-islands, BPE
tokenization, shard layout, distribution windows, prefix-filter dedup,
corpus curation, triangle count, incremental sync, UDTF surface) on
hand-built frames.

The oracle gate proves Spark/DuckDB agreement; these pin intended
semantics on crafted inputs so both engines can't drift together.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _t(day, h=0, m=0):
    return datetime(2024, 1, day, h, m)


def test_gaps_islands_merges_overlapping_intervals(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_gaps_islands

    # event_id must be % 7 == 0 to enter the interval subset; value =
    # duration minutes. user 1: [10:00,10:10) overlaps [10:05,10:15) →
    # one island; [11:00,11:05) is a second island.
    rows = [
        (0, _t(1, 10, 0), 1, "view", 10.0, "{}"),
        (7, _t(1, 10, 5), 1, "view", 10.0, "{}"),
        (14, _t(1, 11, 0), 1, "view", 5.0, "{}"),
        (3, _t(1, 10, 1), 1, "view", 500.0, "{}"),  # id%7!=0 → excluded
    ]
    sf = _write(spark, tmp_path, "events", rows, EV_SCHEMA)
    got = {
        (r.user_id, r.island): (r.island_start, r.island_end, r.n_intervals)
        for r in q_gaps_islands(spark, sf).collect()
    }
    us = lambda dt: int(dt.timestamp() * 1_000_000)  # noqa: E731
    assert got == {
        (1, 1): (us(_t(1, 10, 0)), us(_t(1, 10, 15)), 2),
        (1, 2): (us(_t(1, 11, 0)), us(_t(1, 11, 5)), 1),
    }


def test_token_bpe_classes(spark, tmp_path):
    from cloud_data_sync_spark.operators.text import q_token_bpe

    rows = [(1, "ab 12 !x", "en", "web", 8)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    r = q_token_bpe(spark, sf).collect()[0]
    # tokens: ab | 12 | ! | x
    assert (r.n_tokens, r.n_word, r.n_num, r.n_mark) == (4, 2, 1, 1)
    assert r.chars_per_token == 2.0


def test_shard_layout_is_deterministic_and_dense(spark, tmp_path):
    from cloud_data_sync_spark.operators.text import q_shard_layout

    rows = [(i, f"doc {i} text", "en", "web", 10) for i in range(1, 101)]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    a = {(r.doc_id): (r.shard, r.pos) for r in q_shard_layout(spark, sf).collect()}
    b = {(r.doc_id): (r.shard, r.pos) for r in q_shard_layout(spark, sf).collect()}
    assert a == b  # deterministic across runs
    # positions are dense 1..n within each shard
    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # shard matches the portable md5 derivation
    for doc_id, (shard, _) in a.items():
        want = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:6], 16) % 32
        assert shard == want


def test_window_distribution_quartiles(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_window_distribution

    rows = [(i, f"c{i}", 0, float(i * 100), "SEG") for i in range(1, 9)]
    sf = _write(
        spark,
        tmp_path,
        "customer",
        rows,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    got = {r.c_custkey: (r.quartile, r.pr, r.cd) for r in q_window_distribution(spark, sf).collect()}
    assert [got[i][0] for i in range(1, 9)] == [1, 1, 2, 2, 3, 3, 4, 4]
    assert got[1][1] == 0.0 and got[8][1] == 1.0  # percent_rank endpoints
    assert got[8][2] == 1.0  # cume_dist endpoint


def test_prefix_filter_finds_planted_duplicate(spark, tmp_path):
    from cloud_data_sync_spark.operators.dedup import q_dedup_prefix_filter

    # even ids (the query scopes to doc_id % 2 == 0) chosen to dodge the
    # corpus augmentation (not % 7 / % 10 / % 9 == 0)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (2, base, "en", "web", len(base)),
        (4, base, "en", "web", len(base)),  # exact copy → Jaccard 1.0
        (8, "one two three four five six seven eight", "en", "web", 39),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in q_dedup_prefix_filter(spark, sf).collect()}
    assert got == {(2, 4): 1.0}


def test_corpus_curation_gates(spark, tmp_path):
    from cloud_data_sync_spark.operators.text import q_corpus_curation

    long_text = " ".join(f"tok{i}" for i in range(20))
    rows = [
        (4, long_text, "en", "web", len(long_text)),   # canonical → survives
        (12, long_text, "en", "web", len(long_text)),  # exact dup → dropped
        (6, "too short", "en", "web", 9),               # <10 tokens → dropped
        (8, " ".join(["x" * 40] * 12), "en", "web", 491),  # 40 chars/token → dropped
    ]
    # doc 4 (the dup group's min-id canonical) must clear the 80% hash
    # sample — pin the expectation explicitly
    assert int(hashlib.md5(b"4").hexdigest()[:6], 16) % 100 < 80
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = q_corpus_curation(spark, sf).collect()
    assert [r.doc_id for r in got] == [4]
    assert got[0].pos == 1


def test_triangle_count_on_crafted_graph(spark, tmp_path):
    from cloud_data_sync_spark.operators.ml import q_triangle_count

    # trade edges (0,1), (1,2), (0,2) → one triangle touching all 3 nations
    nations = [(0, "N0", 0), (1, "N1", 0), (2, "N2", 0), (3, "N3", 0)]
    _write(
        spark, tmp_path, "nation", nations, "n_nationkey int, n_name string, n_regionkey int"
    )
    custs = [(10, "c", 0, 0.0, "S"), (11, "c", 1, 0.0, "S"), (12, "c", 0, 0.0, "S")]
    _write(
        spark,
        tmp_path,
        "customer",
        custs,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    supps = [(20, "s", 1, 0.0), (21, "s", 2, 0.0), (22, "s", 2, 0.0)]
    _write(
        spark, tmp_path, "supplier", supps,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    # orders/lineitems wiring cust-nation → supp-nation: (0→1), (1→2), (0→2)
    orders = [(100, 10, "O", 1.0, _t(1), "P"), (101, 11, "O", 1.0, _t(1), "P"), (102, 12, "O", 1.0, _t(1), "P")]
    _write(spark, tmp_path, "orders", orders, ORD_SCHEMA)
    lis = [(100, 1, 20, 1, 1.0), (101, 1, 21, 1, 1.0), (102, 1, 22, 1, 1.0)]
    _write(
        spark, tmp_path, "lineitem", lis,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double",
    )
    got = {r.nation: r.n_triangles for r in q_triangle_count(spark, tmp_path.as_posix()).collect()}
    assert got == {"N0": 1, "N1": 1, "N2": 1, "N3": 0}


def test_sync_incremental_classifies_only_drift(spark, tmp_path):
    from cloud_data_sync_spark.sync import q_sync_incremental

    rows = [
        (k, k, "O", float(k), _t(1 + (k % 20)), "P") for k in range(1, 101)
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORD_SCHEMA)
    got = {
        (r.action, r.reason): r.n_objects
        for r in q_sync_incremental(spark, sf).collect()
    }
    # keys 1..100: tick-2 source drops %50 (50,100) and %90 (90); rewrites
    # %17 (17,34,51,68,85). state covers everything else at success.
    assert got == {
        ("copy", "etag_changed"): 5,
        ("delete", "removed_from_source"): 1,  # k=90
        ("skip", "unchanged"): 92,
    }


def test_udtf_surface_word_counts(spark, tmp_path):
    from cloud_data_sync_spark.functions.udfs import q_udtf_surface

    rows = [
        (97, "a b a", "en", "web", 5),      # 97 % 97 == 0 → included
        (98, "z z z", "en", "web", 5),      # excluded by the % 97 gate
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {(r.doc_id, r.tok): r.n for r in q_udtf_surface(spark, sf).collect()}
    assert got == {(97, "a"): 2, (97, "b"): 1}
