"""Semantic unit tests for operator helpers on hand-built frames.

The DuckDB oracle gate proves Spark/DuckDB *agreement*; these tests pin the
*intended* semantics (tie-breaks, candidate pruning) so both engines can't
drift together.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from cloud_data_sync_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signatures,
)
from cloud_data_sync_spark.operators.relational import asof_attribute


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, 0, minute)


def test_asof_same_instant_click_counts(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(10), 1, "click", 0.0, "{}"),
            (2, _ts(10), 1, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = asof_attribute(ev).collect()
    assert row.purchase_id == 2 and row.click_id == 1


def test_asof_purchase_before_any_click_gets_null(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(5), 1, "purchase", 1.0, "{}"),
            (2, _ts(10), 1, "click", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = asof_attribute(ev).collect()
    assert row.purchase_id == 1 and row.click_id is None


def test_asof_equal_time_clicks_resolve_to_larger_event_id(spark):
    ev = spark.createDataFrame(
        [
            (3, _ts(1), 2, "click", 0.0, "{}"),
            (4, _ts(1), 2, "click", 0.0, "{}"),
            (5, _ts(2), 2, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = asof_attribute(ev).collect()
    assert row.click_id == 4


def test_asof_ignores_other_event_types_and_later_clicks(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1), 3, "view", 0.0, "{}"),
            (2, _ts(2), 3, "purchase", 1.0, "{}"),
            (3, _ts(3), 3, "click", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    [row] = asof_attribute(ev).collect()
    assert row.purchase_id == 2 and row.click_id is None


def test_minhash_lsh_finds_identical_docs_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    pairs = (
        lsh_candidate_pairs(minhash_signatures(docs))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    )
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_minhash_signature_identical_for_reordered_shingleless_docs(spark):
    # <3 tokens ⇒ no shingles ⇒ doc drops out entirely (oracle parity).
    docs = spark.createDataFrame(
        [(1, "just two"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    sig = minhash_signatures(docs)
    assert [r.doc_id for r in sig.select("doc_id").collect()] == [2]
    assert sig.filter(F.exists("sig", lambda s: s.isNull())).count() == 0


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (one component, min label 1) + island pair 10-11;
    # run BOTH strategies: driver-side union-find (default at this size)
    # and the distributed propagation path (forced via local_max_edges=0)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}
    got_local = {(r.v, r.label) for r in connected_components(edges).collect()}
    got_dist = {
        (r.v, r.label)
        for r in connected_components(edges, local_max_edges=0).collect()
    }
    assert got_local == want
    assert got_dist == want
