"""Semantic tests for the cross-source duplication matrix and the
survivorship selection — each asserts the operator's defining invariant
against an independent recomputation over the same cluster/pair data."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from cloud_data_sync_spark.registry import all_queries

    return all_queries()[name].fn(spark, SF).collect()


def test_cross_source_accounts_every_dup_pair(spark):
    from cloud_data_sync_spark.operators.dedup import _minhash_dups

    rows = _run(spark, "q_dedup_cross_source")
    n_pairs = _minhash_dups(spark, SF).count()
    # every estimated-duplicate pair lands in exactly one (src, src) cell
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        # pair normalized, intra flag consistent with it
        assert r.src_a <= r.src_b
        assert r.is_intra == (r.src_a == r.src_b)


def test_cluster_size_dist_accounts_every_labeled_doc(spark):
    from cloud_data_sync_spark.operators.dedup import _cluster_labels

    rows = _run(spark, "q_cluster_size_dist")
    n_docs = _cluster_labels(spark, SF).count()
    # the histogram partitions the labeled docs exactly
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.cluster_size >= 2  # every CC node has at least one edge


def test_split_leakage_matches_independent_recount(spark):
    import hashlib

    from cloud_data_sync_spark.operators.dedup import _VAL_NIBBLES, _minhash_dups

    (row,) = _run(spark, "q_split_leakage")
    pairs = _minhash_dups(spark, SF).select("doc_a", "doc_b").collect()

    def side(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return "val" if h[0] in _VAL_NIBBLES else "train"

    n_cross = sum(1 for p in pairs if side(p.doc_a) != side(p.doc_b))
    assert row.n_pairs == len(pairs)
    assert row.n_cross_split == n_cross


def test_survivor_is_longest_member_of_its_cluster(spark):
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.dedup import (
        _cluster_labels,
        augmented_documents,
    )

    rows = {r.cluster_id: r for r in _run(spark, "q_dedup_survivors")}
    members = (
        _cluster_labels(spark, SF)
        .join(
            augmented_documents(spark, SF).select(
                "doc_id", F.coalesce(F.length("text"), F.lit(0)).alias("len")
            ),
            "doc_id",
        )
        .collect()
    )
    by_cluster: dict[int, list] = {}
    for m in members:
        by_cluster.setdefault(m.cluster_id, []).append(m)
    assert set(rows) == set(by_cluster)
    for cid, ms in by_cluster.items():
        r = rows[cid]
        assert r.n_members == len(ms)
        assert r.n_dropped == len(ms) - 1
        # keep-the-richest rule: longest text, doc_id tiebreak
        want = min(ms, key=lambda m: (-m.len, m.doc_id)).doc_id
        assert r.survivor_id == want
        # the survivor is a member of its own cluster
        assert any(m.doc_id == r.survivor_id for m in ms)
