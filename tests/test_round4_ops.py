"""Semantic tests for the round-4 operators (TPC-H shapes, gap-fill,
entropy, vocab, chunking, decontamination) on hand-built frames.

The oracle gate proves Spark/DuckDB agreement; these pin the intended
semantics (bucket alignment + forward fill, entropy closed form, chunk
boundaries/overlap, contamination counting) so both engines can't drift
together.
"""

from __future__ import annotations

import math
from datetime import datetime

from cloud_data_sync_spark.operators.analytics import q_resample_gapfill
from cloud_data_sync_spark.operators.corpus import (
    q_doc_chunk,
    q_text_entropy,
    q_vocab,
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


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_entropy_uniform_and_skewed(spark, tmp_path):
    # doc 1: 4 distinct tokens, uniform → entropy = ln(4)
    # doc 2: "a a a b" → H = ln(4) - (3*ln3 + 1*ln1)/4
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "a b c d", "en", "s", 7), (2, "a a a b", "en", "s", 7)],
    )
    rows = {r.doc_id: r for r in q_text_entropy(spark, sf).collect()}
    assert rows[1].n_tokens == 4 and rows[1].n_distinct == 4
    assert float(rows[1].entropy) == round(math.log(4), 6)
    assert float(rows[2].entropy) == round(math.log(4) - 3 * math.log(3) / 4, 6)


def test_entropy_single_token_is_zero(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, "x x x", "en", "s", 5)])
    r = q_text_entropy(spark, sf).collect()[0]
    assert float(r.entropy) == 0.0


def test_vocab_rank_order_and_ties(spark, tmp_path):
    # b appears 3×, a 2×, c 1× → ids 1,2,3; df counts distinct docs
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "b a b", "en", "s", 5), (2, "b a c", "en", "s", 5)],
    )
    rows = q_vocab(spark, sf).collect()
    assert [(r.token_id, r.term, r.tf, r.df) for r in rows] == [
        (1, "b", 3, 2),
        (2, "a", 2, 2),
        (3, "c", 1, 1),
    ]


def test_chunk_boundaries_and_overlap(spark, tmp_path):
    # 400 chars → positions 1, 161, 321: chunks of 200, 200, 80.
    text = "x" * 400
    sf = _write_docs(spark, tmp_path, [(1, text, "en", "s", 400)])
    rows = sorted(q_doc_chunk(spark, sf).collect(), key=lambda r: r.chunk_id)
    assert [(r.chunk_id, r.chunk_len) for r in rows] == [(0, 200), (1, 200), (2, 80)]
    # consecutive chunks overlap by 40 chars (step 160 < width 200)
    assert rows[0].chunk_hash == rows[1].chunk_hash  # same repeated char


def test_chunk_short_doc_single_chunk(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [(1, "short", "en", "s", 5)])
    rows = q_doc_chunk(spark, sf).collect()
    assert len(rows) == 1 and rows[0].chunk_len == 5 and rows[0].chunk_id == 0


def _t(day, h):
    return datetime(2024, 1, day, h)


def test_gapfill_dense_grid_and_forward_fill(spark, tmp_path):
    # user 10 (passes %10 filter): events at 00:xx and 18:xx on Jan 1 →
    # grid 00,06,12,18; middle buckets filled with last observed value.
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, _t(1, 0), 10, "click", 5.0, "{}"),
            (2, _t(1, 1), 10, "click", 3.0, "{}"),
            (3, _t(1, 18), 10, "buy", 7.0, "{}"),
        ],
    )
    rows = sorted(q_resample_gapfill(spark, sf).collect(), key=lambda r: r.bucket)
    assert len(rows) == 4  # 00, 06, 12, 18 — gaps materialized
    assert [r.n_events for r in rows] == [2, 0, 0, 1]
    assert [float(r.bucket_value) for r in rows] == [8.0, 0.0, 0.0, 7.0]
    assert [float(r.filled_value) for r in rows] == [8.0, 8.0, 8.0, 7.0]


def test_gapfill_excludes_unselected_users(spark, tmp_path):
    sf = _write_events(spark, tmp_path, [(1, _t(1, 0), 7, "click", 1.0, "{}")])
    assert q_resample_gapfill(spark, sf).count() == 0


def test_decontaminate_flags_planted_copy(spark, tmp_path):
    # doc 0 is eval (0 % 97 == 0) AND 0 % 7 == 0, so the augmented corpus
    # plants exact copy 2*AUG_OFFSET in train; it must be flagged with
    # every 8-gram shared. 10 tokens → 3 distinct 8-grams.
    toks = " ".join(f"w{i}" for i in range(10))
    filler = " ".join(f"z{i}" for i in range(10))
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, toks, "en", "s", len(toks)), (1, filler, "en", "s", len(filler))],
    )
    from cloud_data_sync_spark.operators.corpus import q_decontaminate
    from cloud_data_sync_spark.operators.dedup import AUG_OFFSET

    rows = {r.doc_id: r.n_shared for r in q_decontaminate(spark, sf).collect()}
    assert rows[2 * AUG_OFFSET] == 3  # exact copy shares all 3 8-grams
    assert 1 not in rows  # unrelated doc untouched
