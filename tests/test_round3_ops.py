"""Semantic tests for the round-3 operators (repetition signals, PII
scrub, bigram LM scoring, unpivot, funnel) on hand-built frames.

The oracle gate proves Spark/DuckDB agreement; these pin the intended
semantics (fraction definitions, redaction patterns, LM probabilities,
strict funnel ordering) so both engines can't drift together.
"""

from __future__ import annotations

import math
from datetime import datetime

from cloud_data_sync_spark.operators.relational import q_funnel, q_unpivot
from cloud_data_sync_spark.operators.text import (
    q_ngram_lm,
    q_pii_scrub,
    q_text_repetition,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_repetition_fractions(spark, tmp_path):
    # tokens: a a a b → 4 tokens, 2 distinct → dup_token_frac = 0.5
    # bigrams: "a a","a a","a b" → 3 bigrams, 2 distinct, top count 2
    sf = _write_docs(spark, tmp_path, [(1, "a a a b", "en", "s", 7)])
    r = q_text_repetition(spark, sf).collect()[0]
    assert r.n_tokens == 4
    import math

    # fractions are floor-truncated to 6 dp (registry.floor_ratio), not
    # rounded — mode-free so Spark and DuckDB agree on dyadic ratios
    assert float(r.dup_token_frac) == 0.5
    assert float(r.dup_bigram_frac) == math.floor((1 - 2 / 3) * 1e6) / 1e6
    assert float(r.top_bigram_frac) == math.floor(2 / 3 * 1e6) / 1e6


def test_repetition_distinct_doc_is_zero(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, "a b c d", "en", "s", 7)])
    r = q_text_repetition(spark, sf).collect()[0]
    assert float(r.dup_token_frac) == 0.0
    assert float(r.dup_bigram_frac) == 0.0
    # every bigram unique → the top one is 1 of 3
    assert float(r.top_bigram_frac) == round(1 / 3, 6)


def test_pii_scrub_counts_and_redaction(spark, tmp_path):
    # doc 0: 0 % 7 == 0 and 0 % 11 == 0 → email AND phone injected
    # doc 1: neither → clean
    sf = _write_docs(
        spark, tmp_path, [(0, "hello", "en", "src0", 5), (1, "world", "en", "src0", 5)]
    )
    rows = {r.doc_id: r for r in q_pii_scrub(spark, sf).collect()}
    assert rows[0].n_emails == 1 and rows[0].n_phones == 1
    assert rows[1].n_emails == 0 and rows[1].n_phones == 0
    # same scrub on equal redacted content → hashes of the literal strings
    import hashlib

    scrubbed0 = "hello contact <EMAIL> call <PHONE>"
    assert rows[0].scrub_hash == hashlib.md5(scrubbed0.encode()).hexdigest()
    assert rows[1].scrub_hash == hashlib.md5(b"world").hexdigest()


def test_ngram_lm_mean_log_probability(spark, tmp_path):
    # corpus: "a b", "a b", "a c" → c(a,b)=2, c(a,c)=1; c(a)=3
    # doc 0 scored: single bigram (a,b) → avg_logp = ln(2/3)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "a b", "en", "s", 3),
            (1, "a b", "en", "s", 3),
            (2, "a c", "en", "s", 3),
        ],
    )
    rows = {r.doc_id: r for r in q_ngram_lm(spark, sf).collect()}
    assert set(rows) == {0}  # only doc_id % 10 == 0 sampled
    assert rows[0].n_bigrams == 1
    assert float(rows[0].avg_logp) == round(math.log(2 / 3), 4)


def test_unpivot_melts_measures(spark, tmp_path):
    li = [(1, 1, 1, "N", "O", 2.0, 10.0, datetime(2024, 1, 1))]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string,"
        " l_linestatus string, l_quantity double, l_extendedprice double,"
        " l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    rows = {(r.l_returnflag, r.measure): r.value for r in q_unpivot(spark, str(tmp_path)).collect()}
    assert rows[("N", "sum_qty")] == 2.0
    assert rows[("N", "sum_price")] == 10.0
    assert rows[("N", "n_rows")] == 1.0


def test_funnel_strict_ordering(spark, tmp_path):
    ev = [
        # user 1 completes view < click < purchase
        (1, _t(9), 1, "view", 0.0, "{}"),
        (2, _t(10), 1, "click", 0.0, "{}"),
        (3, _t(11), 1, "purchase", 0.0, "{}"),
        # user 2 clicks BEFORE viewing → stops at stage 1
        (4, _t(10), 2, "click", 0.0, "{}"),
        (5, _t(11), 2, "view", 0.0, "{}"),
        # user 3 views then clicks, never purchases → stage 2
        (6, _t(9), 3, "view", 0.0, "{}"),
        (7, _t(10), 3, "click", 0.0, "{}"),
        # user 4 purchases out of nowhere → stage 0 only if viewed; not viewed
        (8, _t(9), 4, "purchase", 0.0, "{}"),
    ]
    spark.createDataFrame(ev, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    rows = {r.stage: r.n_users for r in q_funnel(spark, str(tmp_path)).collect()}
    assert rows == {
        "viewed": 3,
        "clicked_after_view": 2,
        "purchased_after_click": 1,
    }


def test_retention_cohorts(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_retention

    ev = [
        # user 1 first seen week of Jan 1 (Mon), active again week of Jan 8
        (1, datetime(2024, 1, 2), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 9), 1, "view", 0.0, "{}"),
        # user 2 first seen week of Jan 8, never returns
        (3, datetime(2024, 1, 10), 2, "view", 0.0, "{}"),
    ]
    spark.createDataFrame(ev, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    rows = {
        (str(r.cohort_week), r.week_n): r.n_users
        for r in q_retention(spark, str(tmp_path)).collect()
    }
    assert rows == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_approx_quantiles_within_tolerance(spark, tmp_path):
    from cloud_data_sync_spark.operators.relational import q_agg_approx_quantiles

    li = [
        (i, 1, 1, "N", "O", 1.0, float(i), datetime(2024, 1, 1))
        for i in range(1, 102)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_returnflag string,"
        " l_linestatus string, l_quantity double, l_extendedprice double,"
        " l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    r = q_agg_approx_quantiles(spark, str(tmp_path)).collect()[0]
    # exact interpolated median of 1..101 is 51
    assert float(r.p50_exact) == 51.0
    assert r.within_tolerance is True
