"""Semantic tests for the round-4 additions: the dedup audit queries and
the training-mixture reweighting."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_lsh_recall_bounds_and_consistency(spark):
    from cloud_data_sync_spark.registry import all_queries

    row = all_queries()["q_dedup_lsh_recall"].fn(spark, SF).collect()[0]
    assert row.n_caught <= row.n_true
    if row.n_true:
        assert 0.0 <= row.recall <= 1.0
        assert math.isclose(
            row.recall,
            math.floor(row.n_caught / row.n_true * 10000) / 10000,
            abs_tol=1e-9,
        )
    # exact copies are LSH-guaranteed (identical signatures collide in
    # every band), so recall over a corpus containing exact copies can
    # never be 0 while truth pairs exist
    if row.n_true:
        assert row.n_caught > 0


def test_minhash_calibration_error_bounds(spark):
    from cloud_data_sync_spark.registry import all_queries

    row = all_queries()["q_dedup_minhash_calibration"].fn(spark, SF).collect()[0]
    if row.n_pairs:
        # |est - exact| is a difference of two [0,1] quantities
        assert 0.0 <= row.mean_abs_err <= row.max_abs_err <= 1.0
        # 16 permutations: estimates are k/16, so max error is bounded away
        # from 1 on candidate pairs (they share at least one full band)
        assert row.mean_abs_err < 0.5


def test_data_mixture_shares_and_rates(spark):
    from cloud_data_sync_spark.registry import all_queries

    rows = all_queries()["q_data_mixture"].fn(spark, SF).collect()
    assert rows, "mixture over non-empty corpus must produce groups"
    total_share = sum(r.actual_share for r in rows)
    assert math.isclose(total_share, 1.0, abs_tol=1e-3)
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0
        assert r.expected_docs <= r.n_docs
        assert math.isclose(r.target_share, rows[0].target_share, abs_tol=1e-9)


def test_exact_jaccard_pairs_finds_exact_copies(spark):
    """Every exact copy (doc_id+2M, %7) in the audit subset must appear as
    a truth pair with jaccard == 1.0."""
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.dedup import (
        _audit_docs,
        exact_jaccard_pairs,
    )

    docs = _audit_docs(spark, SF)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in exact_jaccard_pairs(spark, SF, docs=docs).collect()
    }
    from cloud_data_sync_spark.operators.dedup import AUG_OFFSET

    base_ids = [
        r.doc_id
        for r in docs.filter(
            (F.col("doc_id") % 7 == 0) & (F.col("doc_id") < AUG_OFFSET)
        ).collect()
        # copies of docs with <3 tokens produce no shingles; skip those
        if len(r.text.split()) >= 3
    ]
    assert base_ids, "fixture corpus should contain %7 copies in the subset"
    for b in base_ids:
        assert pairs.get((b, b + 2 * AUG_OFFSET)) == 1.0


def test_ivf_recall_bounds_and_consistency(spark):
    import math

    from cloud_data_sync_spark.operators.similarity import TOP_K
    from cloud_data_sync_spark.registry import all_queries

    qs = all_queries()
    row = qs["q_sim_ivf_recall"].fn(spark, SF).collect()[0]
    assert row.n_caught <= row.n_true
    # ground truth is the exact top-k of every capped query: n_true is
    # exactly TOP_K per query (corpus >> TOP_K at every test scale)
    n_queries = (
        qs["q_sim_topk"].fn(spark, SF).select("query_id").distinct().count()
    )
    assert row.n_true == n_queries * TOP_K
    if row.n_true:
        assert 0.0 <= row.recall <= 1.0
        assert math.isclose(
            row.recall,
            math.floor(row.n_caught / row.n_true * 10000) / 10000,
            abs_tol=1e-9,
        )
