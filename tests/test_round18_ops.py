"""Round-18 operators: exact substring dedup at suffix-group granularity
(q_dedup_suffix_groups) — invariants beyond the oracle hash match."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from cloud_data_sync_spark.session import get_spark

    return get_spark("test-round18")


@pytest.fixture(scope="module")
def suffix_rows(spark):
    from cloud_data_sync_spark.operators.dedup import q_dedup_suffix_groups

    return q_dedup_suffix_groups(spark, SF_DIR).collect()


def test_suffix_groups_per_doc_arithmetic(suffix_rows):
    """cut + retained = total; fractions consistent; extents bounded."""
    assert suffix_rows, "sf0.001 corpus has duplicate windows by construction"
    for r in suffix_rows:
        assert r.n_cut_extents >= 1
        assert 0 <= r.n_chars_cut <= r.n_chars_total
        assert r.n_chars_cut + r.n_chars_retained == r.n_chars_total
        assert r.max_extent_chars <= r.n_chars_cut
        # extents are clamped at doc end, so no extent exceeds the doc
        assert r.max_extent_chars <= r.n_chars_total
        assert 0.0 <= r.retained_frac <= 1.0


def test_suffix_groups_keep_one_copy_semantics(spark):
    """DEDUP (keep one copy), not SCRUB (cut all): for every duplicate
    window group, exactly the first (doc_id, pos) occurrence survives —
    so total cut positions = total occurrences - number of groups."""
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.dedup import _SUB_CHUNK, _SUB_STEP
    from cloud_data_sync_spark.tables import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.length("text") - (_SUB_CHUNK - _SUB_STEP), F.lit(1)
                    ),
                    F.lit(_SUB_STEP),
                )
            ).alias("pos"),
            "text",
        )
        .select("doc_id", "pos", F.expr(f"substring(text, pos, {_SUB_CHUNK})").alias("wkey"))
    )
    grp = docs.groupBy("wkey").agg(F.count("*").alias("n"))
    dup = grp.filter(F.col("n") >= 2).agg(
        F.sum(F.col("n") - 1).alias("cut_positions")
    ).collect()[0]

    # recount cut positions through the operator's own ranking
    from pyspark.sql import Window

    wg = Window.partitionBy("wkey").orderBy("doc_id", "pos")
    ranked_cut = (
        docs.select(F.row_number().over(wg).alias("rn"))
        .filter(F.col("rn") >= 2)
        .count()
    )
    assert ranked_cut == dup.cut_positions


def test_suffix_groups_corpus_rate_matches_per_doc_sums(spark, suffix_rows):
    """The broadcast 1-row corpus pack equals the recomputed rate over
    ALL docs (unaffected docs contribute total chars, zero cut)."""
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.tables import load_table

    total = (
        load_table(spark, SF_DIR, "documents")
        .agg(F.sum(F.length("text")).alias("t"))
        .collect()[0]
        .t
    )
    cut = sum(r.n_chars_cut for r in suffix_rows)
    import math

    want = math.floor((total - cut) / total * 1_000_000) / 1_000_000
    rates = {r.corpus_retained_frac for r in suffix_rows}
    assert rates == {want}


def test_augment_docs_carries_extra_columns(spark):
    """Non-(doc_id, text) columns ride every augmentation branch — the
    q_dup_inflation source attachment depends on it."""
    from cloud_data_sync_spark.operators.dedup import augment_docs

    df = spark.createDataFrame(
        [(0, "a b", "s1"), (7, "c d", "s2")],
        "doc_id long, text string, source string",
    )
    from cloud_data_sync_spark.operators.dedup import AUG_OFFSET

    rows = {r.doc_id: r.source for r in augment_docs(df).collect()}
    # 0: %7 exact twin, %10 near twin, %9 reorder twin; 7: %7 exact twin
    assert rows == {
        0: "s1",
        7: "s2",
        AUG_OFFSET: "s1",
        2 * AUG_OFFSET: "s1",
        2 * AUG_OFFSET + 7: "s2",
        3 * AUG_OFFSET: "s1",
    }


def test_augmented_documents_guards_offset_id_space(spark, tmp_path):
    """Original ids at/above the branch offset (2^42 since r10 — a
    ceiling no real corpus hits) must fail LOUDLY: the modulo base-id
    recovery downstream (cross_source, band_sweep) would silently
    mis-attribute, and the oracles share the assumption so the
    dual-engine gate cannot catch it (r8 ADVICE)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from cloud_data_sync_spark.operators.dedup import AUG_OFFSET

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    shifted = t.set_column(
        t.schema.get_field_index("doc_id"),
        "doc_id",
        pc.add(t["doc_id"], AUG_OFFSET),
    )
    pq.write_table(shifted, str(tmp_path / "documents.parquet"))

    from cloud_data_sync_spark.operators.dedup import augmented_documents

    with pytest.raises(ValueError, match="mis-attribute"):
        augmented_documents(spark, str(tmp_path))
