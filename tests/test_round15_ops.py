"""Round-15 operators: segment scrub apply layer, suffix-run spans,
IVF-PQ, bucket-count conf."""

from __future__ import annotations

import pandas as pd


def _write_docs(tmp_path, texts):
    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "source": ["t"] * len(texts),
            "lang": ["en"] * len(texts),
            "text": texts,
        }
    ).to_parquet(sf / "documents.parquet", index=False)
    return str(sf)


def test_sentence_scrub_drops_shared_segments_from_all_docs(spark, tmp_path):
    from cloud_data_sync_spark.operators.dedup import q_dedup_sentence_scrub

    boiler = "terms of service apply to all users of the site."  # 10 toks
    # two docs share the 10-token boilerplate sentence; each has a unique
    # 10-token sentence that must be retained
    a = boiler + " alpha beta gamma delta epsilon zeta eta theta iota kappa."
    b = boiler + " one two three four five six seven eight nine ten."
    c = "totally unique content with not enough tokens."  # 7 toks, one seg
    sf = _write_docs(tmp_path, [a, b, c])
    rows = {r.doc_id: r for r in q_dedup_sentence_scrub(spark, sf).collect()}
    assert rows[1].n_toks_total == 20
    assert rows[1].n_toks_retained == 10  # boilerplate dropped
    assert rows[2].n_toks_retained == 10
    # doc 3's segment is unique -> fully retained
    assert rows[3].n_toks_retained == rows[3].n_toks_total == 7
    # corpus rate identical on every row: (10+10+7)/(20+20+7)
    assert {r.corpus_retained_frac for r in rows.values()} == {
        int(27 / 47 * 1e6) / 1e6
    }


def test_sentence_scrub_retains_subminimum_fragments(spark, tmp_path):
    """Fragments under the 5-token minimum are not dedup-eligible: two
    docs sharing a 3-token sentence keep every token."""
    from cloud_data_sync_spark.operators.dedup import q_dedup_sentence_scrub

    sf = _write_docs(tmp_path, ["same tiny frag.", "same tiny frag."])
    rows = q_dedup_sentence_scrub(spark, sf).collect()
    assert all(r.n_toks_retained == r.n_toks_total == 3 for r in rows)
    assert all(r.retained_frac == 1.0 for r in rows)


def test_substring_spans_chain_adjacent_windows(spark, tmp_path):
    """A 250-char region shared by two docs (at offsets compatible with the
    50-char stride) must chain into ONE maximal span of 250 chars in each
    doc, not four separate window hits."""
    import random

    from cloud_data_sync_spark.operators.dedup import q_dedup_substring_spans

    rng = random.Random(7)

    def blob(n):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    shared = blob(250)
    a = shared + blob(300)          # shared at pos 1
    b = blob(150) + shared          # shared at pos 151 (1 mod 50)
    c = blob(400)                   # nothing shared
    sf = _write_docs(tmp_path, [a, b, c])
    rows = {r.doc_id: r for r in q_dedup_substring_spans(spark, sf).collect()}
    assert set(rows) == {1, 2}, "doc 3 has no repeated span"
    assert rows[1].n_spans == 1 and rows[1].max_span_chars == 250
    assert rows[2].n_spans == 1 and rows[2].max_span_chars == 250
    assert rows[1].total_span_chars == 250
