"""Session-substrate cache semantics (tables.session_substrate).

The substrate contract: a deterministic intermediate is built + checkpointed
at most once per (session, key); a changed key (new sf dir, new input-file
vintage) misses the cache; dead-session entries are purged rather than
accumulating. The consumers' VALUE correctness is covered by the oracle
gate — these tests pin the caching behavior itself.
"""

from __future__ import annotations

import pytest

from cloud_data_sync_spark.tables import purge_dead_sessions, session_substrate

SF_DIR = "/root/testdata/sf0.001"


def test_same_key_returns_cached_frame(spark):
    cache: dict = {}
    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    a = session_substrate(spark, cache, ("k1",), build)
    b = session_substrate(spark, cache, ("k1",), build)
    assert a is b
    assert len(calls) == 1
    assert a.count() == 5


def test_different_key_rebuilds(spark):
    cache: dict = {}
    a = session_substrate(spark, cache, ("k1",), lambda: spark.range(3))
    b = session_substrate(spark, cache, ("k2",), lambda: spark.range(4))
    assert a is not b
    assert (a.count(), b.count()) == (3, 4)
    assert len(cache) == 2


def test_checkpointed_result_is_scan_not_recompute(spark):
    # the cached frame must be a materialized checkpoint: its plan should
    # not re-run the build pipeline (an in-memory/checkpoint scan has no
    # parquet relation in the logical plan)
    from cloud_data_sync_spark.operators.dedup import corpus_signatures

    df = corpus_signatures(spark, SF_DIR)
    df.count()  # force materialization (lazy checkpoint)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_corpus_signatures_cached_per_session(spark):
    from cloud_data_sync_spark.operators.dedup import corpus_signatures

    assert corpus_signatures(spark, SF_DIR) is corpus_signatures(spark, SF_DIR)


def test_purge_drops_dead_entries(spark):
    class _DeadCtx:
        _jsc = None

    class _DeadSession:
        class sparkSession:  # noqa: N801 - attribute-shaped stand-in
            pass

    dead = _DeadSession()
    dead.sparkSession = type("S", (), {"sparkContext": _DeadCtx()})()
    live = spark.range(1)
    cache = {("dead",): dead, ("live",): live}
    purge_dead_sessions(cache)
    assert ("dead",) not in cache
    assert ("live",) in cache


def test_substrate_matches_inline_pipeline(spark):
    # the substrate is a pure materialization: row-for-row identical to
    # building the signature pipeline inline
    from cloud_data_sync_spark.operators.dedup import (
        augmented_documents,
        corpus_signatures,
        minhash_signatures,
    )

    sub = corpus_signatures(spark, SF_DIR).select("doc_id", "sig")
    inline = minhash_signatures(
        augmented_documents(spark, SF_DIR), hashed_shingles=True
    ).select("doc_id", "sig")
    assert sub.exceptAll(inline).count() == 0
    assert inline.exceptAll(sub).count() == 0


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
