"""Unit tests for the reconciliation plan — mirrors the reference's
sync_test.go:78-127 scenarios plus the classification matrix the reference
never covered (README.md:353-356 admits no error-path tests)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cloud_data_sync_spark.sync import (
    ACTION_COPY,
    ACTION_DELETE,
    ACTION_SKIP,
    sync_counts,
    sync_diff,
)

T1 = datetime(2024, 1, 1, 12, 0, 0)
T2 = datetime(2024, 1, 2, 12, 0, 0)

CAT_SCHEMA = (
    "mapping_id string, object_name string, size long, etag string, "
    "last_modified timestamp"
)
ST_SCHEMA = (
    "mapping_id string, object_name string, etag string, "
    "last_modified timestamp, sync_status string"
)


def _cat(spark, rows):
    return spark.createDataFrame([("m1", *r) for r in rows], CAT_SCHEMA)


def _state(spark, rows):
    return spark.createDataFrame([("m1", *r) for r in rows], ST_SCHEMA)


@pytest.fixture()
def plan(spark):
    src = _cat(
        spark,
        [
            ("new.txt", 1, "e1", T1),
            ("changed_etag.txt", 2, "e2b", T1),
            ("changed_mtime.txt", 3, "e3", T2),
            ("retry.txt", 4, "e4", T1),
            ("unchanged.txt", 5, "e5", T1),
        ],
    )
    tgt = _cat(spark, [("unchanged.txt", 5, "e5", T1), ("stale.txt", 9, "e9", T1)])
    state = _state(
        spark,
        [
            ("changed_etag.txt", "e2a", T1, "success"),
            ("changed_mtime.txt", "e3", T1, "success"),
            ("retry.txt", "e4", T1, "failed_upload"),
            ("unchanged.txt", "e5", T1, "success"),
        ],
    )
    df = sync_diff(src, tgt, state)
    return {r["object_name"]: (r["action"], r["reason"]) for r in df.collect()}, df


def test_classification_matrix(plan):
    actions, _ = plan
    assert actions["new.txt"] == (ACTION_COPY, "new")
    assert actions["changed_etag.txt"] == (ACTION_COPY, "etag_changed")
    assert actions["changed_mtime.txt"] == (ACTION_COPY, "mtime_changed")
    assert actions["retry.txt"] == (ACTION_COPY, "status_retry")
    assert actions["unchanged.txt"] == (ACTION_SKIP, "unchanged")
    assert actions["stale.txt"] == (ACTION_DELETE, "removed_from_source")
    assert len(actions) == 6


def test_counts(plan):
    _, df = plan
    counts = {r["action"]: r["n_objects"] for r in sync_counts(df).collect()}
    assert counts == {ACTION_COPY: 4, ACTION_SKIP: 1, ACTION_DELETE: 1}


def test_empty_state_copies_everything(spark):
    src = _cat(spark, [("a", 1, "e1", T1), ("b", 2, "e2", T1)])
    tgt = _cat(spark, [])
    state = _state(spark, [])
    out = sync_diff(src, tgt, state).collect()
    assert all(r["action"] == ACTION_COPY and r["reason"] == "new" for r in out)
    assert len(out) == 2
