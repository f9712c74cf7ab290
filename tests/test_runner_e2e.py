"""End-to-end local sync — the Spark twin of the reference's
sync_test.go:78-127 (one object copied, bytes compared, state row asserted)
extended with re-run idempotency, change detection, and the delete phase."""

from __future__ import annotations

import os

import pytest

from cloud_data_sync_spark import state as state_mod
from cloud_data_sync_spark.config import BucketMapping, Config
from cloud_data_sync_spark.runner import sync_all, sync_buckets


@pytest.fixture()
def env(tmp_path):
    src = tmp_path / "src" / "bucket-a"
    tgt = tmp_path / "tgt" / "bucket-b"
    src.mkdir(parents=True)
    (src / "a.txt").write_bytes(b"hello world")
    (src / "nested" / "b.txt").parent.mkdir()
    (src / "nested" / "b.txt").write_bytes(b"nested content")
    cfg = Config(
        providers=[
            {"id": "s", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "src")}},
            {"id": "t", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "tgt")}},
        ],
        mappings=[
            BucketMapping(
                source_provider_id="s",
                source_bucket="bucket-a",
                target_provider_id="t",
                target_bucket="bucket-b",
            )
        ],
    )
    return cfg, src, tgt, str(tmp_path / "state")


def test_first_sync_copies_everything(spark, env):
    cfg, src, tgt, state_path = env
    reports = sync_all(spark, cfg, state_path)
    assert len(reports) == 1
    assert reports[0].counts.get("copy_success") == 2
    assert (tgt / "a.txt").read_bytes() == b"hello world"
    assert (tgt / "nested" / "b.txt").read_bytes() == b"nested content"
    st = {r["object_name"]: r for r in state_mod.load_state(spark, state_path).collect()}
    assert st["a.txt"]["sync_status"] == "success"
    assert st["a.txt"]["mapping_id"] == "s:bucket-a->t:bucket-b"
    assert st["a.txt"]["size"] == 11
    assert len(st) == 2


def test_second_sync_skips_unchanged(spark, env):
    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    r2 = sync_all(spark, cfg, state_path)[0]
    assert r2.counts.get("skip") == 2
    assert "copy_success" not in r2.counts


def test_changed_object_resynced(spark, env):
    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    (src / "a.txt").write_bytes(b"changed content!")
    r2 = sync_all(spark, cfg, state_path)[0]
    assert r2.counts.get("copy_success") == 1
    assert r2.counts.get("skip") == 1
    assert (tgt / "a.txt").read_bytes() == b"changed content!"


def test_delete_phase_removes_vanished_objects(spark, env):
    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    os.remove(src / "a.txt")
    r2 = sync_all(spark, cfg, state_path)[0]
    assert r2.counts.get("delete_success") == 1
    assert not (tgt / "a.txt").exists()
    st = {r["object_name"] for r in state_mod.load_state(spark, state_path).collect()}
    assert st == {"nested/b.txt"}


def test_source_read_failure_recorded(spark, env, tmp_path):
    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    # make the source unreadable after listing: swap file for a directory
    os.remove(src / "a.txt")
    (src / "a.txt").mkdir()  # listing skips dirs; state row remains + tgt keeps file
    r2 = sync_all(spark, cfg, state_path)[0]
    # a.txt no longer listed as a file → delete phase removes it from target
    assert not (tgt / "a.txt").is_file()
    assert r2.counts.get("delete_success") == 1


def test_mapping_failure_isolated(spark, env):
    cfg, src, tgt, state_path = env
    cfg.mappings.insert(
        0,
        BucketMapping(
            source_provider_id="missing",
            source_bucket="nope",
            target_provider_id="t",
            target_bucket="bucket-b",
        ),
    )
    reports = sync_all(spark, cfg, state_path)
    assert len(reports) == 2  # continue-on-error (sync.go:43-47)
    assert reports[1].counts.get("copy_success") == 2
