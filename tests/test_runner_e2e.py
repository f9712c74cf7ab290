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


def test_distributed_listing_syncs_identically(spark, env):
    """binaryFile-index listing (the very-large-bucket path) drives the same
    reconciliation: first run copies all, second run skips all."""
    cfg, src, tgt, state_path = env
    r1 = sync_all(spark, cfg, state_path, distributed_listing=True)[0]
    assert r1.counts.get("copy_success") == 2
    assert (tgt / "a.txt").read_bytes() == b"hello world"
    r2 = sync_all(spark, cfg, state_path, distributed_listing=True)[0]
    assert r2.counts.get("skip") == 2
    assert "copy_success" not in r2.counts


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


def test_ensure_bucket_and_existence_probes(spark, tmp_path):
    """Create-if-absent + existence introspection through Hadoop FS
    (sync.go:88-91; database.go tableExists analog)."""
    from cloud_data_sync_spark.sources.listing import ensure_bucket_exists, path_exists

    root = str(tmp_path / "new-bucket")
    assert not path_exists(spark, root)
    assert ensure_bucket_exists(spark, root) is True
    assert path_exists(spark, root)
    assert ensure_bucket_exists(spark, root) is False
    assert not state_mod.state_exists(spark, str(tmp_path / "no-state"))


def test_content_type_recorded_for_copies(spark, env):
    """database.go:144-157 stores ContentType; copied rows get extension-
    sniffed types, delete rows stay null."""
    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    st = {r["object_name"]: r for r in state_mod.load_state(spark, state_path).collect()}
    assert st["a.txt"]["content_type"] == "text/plain"
    assert st["nested/b.txt"]["content_type"] == "text/plain"


def test_count_actions_accumulates_failure_variants(spark):
    """failed_get and failed_upload both fold into copy_failed — they must
    sum, not overwrite (the reference's counters, sync.go:166-170)."""
    from cloud_data_sync_spark.runner import count_actions

    results = spark.createDataFrame(
        [
            ("m", "o1", "copy", "failed_get"),
            ("m", "o2", "copy", "failed_upload"),
            ("m", "o3", "copy", "success"),
            ("m", "o4", "delete", "failed_delete"),
        ],
        "mapping_id string, object_name string, action string, status string",
    )
    assert count_actions(results) == {
        "copy_failed": 2,
        "copy_success": 1,
        "delete_failed": 1,
    }


def test_state_version_mismatch_detected(spark, env):
    """A version bump between runs fails loudly (the migration-runner
    replacement, database.go:45-313 → marker file)."""
    import json

    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    marker = os.path.join(state_path, "_state_version.json")
    assert json.load(open(marker))["version"] == state_mod.STATE_VERSION
    with open(marker, "w") as f:
        json.dump({"version": state_mod.STATE_VERSION + 99}, f)
    with pytest.raises(state_mod.StateVersionError):
        state_mod.load_state(spark, state_path)


def test_structured_log_records(spark, env, caplog):
    """Per-mapping JSON log records — parity with the reference's slog
    output (main.go:27-28, sync.go:34-39)."""
    import json
    import logging

    cfg, src, tgt, state_path = env
    with caplog.at_level(logging.INFO, logger="cloud_data_sync_spark"):
        sync_all(spark, cfg, state_path)
    synced = [r for r in caplog.records if json.loads(r.message)["event"] == "mapping_synced"]
    assert len(synced) == 1
    payload = json.loads(synced[0].message)
    assert payload["mapping_id"] == "s:bucket-a->t:bucket-b"
    assert payload["counts"]["copy_success"] == 2


def test_sigterm_stops_continuous_mode(spark, env):
    """SIGTERM between ticks exits cleanly (main.go:71-72, 108-113)."""
    import signal
    import threading
    import time as time_mod

    from cloud_data_sync_spark.runner import run_continuous

    cfg, src, tgt, state_path = env
    pid = os.getpid()
    before = signal.getsignal(signal.SIGTERM)
    threading.Timer(1.0, lambda: os.kill(pid, signal.SIGTERM)).start()
    t0 = time_mod.monotonic()
    reports = run_continuous(spark, cfg, state_path, interval_sec=60, max_ticks=None)
    assert len(reports) == 1  # first run finished, no second tick
    assert time_mod.monotonic() - t0 < 30  # did not sleep out the interval
    # the EXACT pre-call handler is restored (not the leaked closure)
    assert signal.getsignal(signal.SIGTERM) is before


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


def test_corrupt_state_version_marker_raises(spark, tmp_path):
    import pytest as _pytest

    from cloud_data_sync_spark.state import (
        StateVersionError,
        check_state_version,
        _version_path,
    )

    state_dir = tmp_path / "state.parquet"
    state_dir.mkdir()
    # cleanly absent marker: accepted
    check_state_version(str(state_dir))
    # torn/corrupt marker: must fail loudly, not silently bypass the gate
    with open(_version_path(str(state_dir)), "w") as f:
        f.write('{"version": 1')  # truncated JSON
    with _pytest.raises(StateVersionError):
        check_state_version(str(state_dir))


def test_binaryfile_listing_strips_regex_metachar_roots(spark, tmp_path):
    from cloud_data_sync_spark.sources.listing import list_objects_binaryfile

    root = tmp_path / "archive (2024)" / "bucket+a"
    root.mkdir(parents=True)
    (root / "obj.bin").write_bytes(b"x")
    (root / "sub").mkdir()
    (root / "sub" / "deep.bin").write_bytes(b"y")
    rows = {
        r.object_name
        for r in list_objects_binaryfile(spark, f"file://{root}", "m").collect()
    }
    assert rows == {"obj.bin", "sub/deep.bin"}


def test_metadata_and_content_type_survive_copy(spark, env):
    """The reference carries ObjectInfo.Metadata + ContentType onto the
    uploaded object (interfaces/provider.go:16; gcp/client.go:107-138).
    Local analog: user.* xattrs. Assert list -> plan -> copy -> re-list
    round-trips them, and the state row records both."""
    cfg, src, tgt, state_path = env
    import os as _os

    try:
        _os.setxattr(src / "a.txt", "user.content-type", b"text/x-custom")
        _os.setxattr(src / "a.txt", "user.cache-control", b"max-age=60")
    except OSError:
        pytest.skip("filesystem has no user-xattr support")

    from cloud_data_sync_spark.sources.listing import list_objects, object_meta_local

    listed = {
        r["object_name"]: r
        for r in list_objects(spark, str(src), "m").collect()
    }
    assert listed["a.txt"]["content_type"] == "text/x-custom"
    assert listed["a.txt"]["metadata"] == {"cache-control": "max-age=60"}

    sync_all(spark, cfg, state_path)

    # target object carries the metadata (re-listable, durable)
    ct, md = object_meta_local(str(tgt / "a.txt"))
    assert ct == "text/x-custom"
    assert md == {"cache-control": "max-age=60"}
    # state row records what was uploaded
    st = {r["object_name"]: r for r in state_mod.load_state(spark, state_path).collect()}
    assert st["a.txt"]["content_type"] == "text/x-custom"
    assert st["a.txt"]["metadata"] == {"cache-control": "max-age=60"}
    # object without explicit metadata falls back to extension sniffing
    assert st["nested/b.txt"]["content_type"] == "text/plain"
    assert st["nested/b.txt"]["metadata"] in ({}, None)


def test_removed_source_metadata_clears_from_target(spark, env):
    """Overwrites reuse the target inode, so a metadata key REMOVED on the
    source must be actively cleared from the target — otherwise a stale
    xattr survives the re-copy and disagrees with the state row."""
    cfg, src, tgt, state_path = env
    import os as _os

    try:
        _os.setxattr(src / "a.txt", "user.content-type", b"text/x-custom")
        _os.setxattr(src / "a.txt", "user.cache-control", b"max-age=60")
    except OSError:
        pytest.skip("filesystem has no user-xattr support")

    from cloud_data_sync_spark.sources.listing import object_meta_local

    sync_all(spark, cfg, state_path)
    ct, md = object_meta_local(str(tgt / "a.txt"))
    assert md == {"cache-control": "max-age=60"}

    # drop the metadata key on the source, change content so it re-copies
    _os.removexattr(src / "a.txt", "user.cache-control")
    (src / "a.txt").write_text("changed payload")
    _os.setxattr(src / "a.txt", "user.content-type", b"text/x-custom")
    sync_all(spark, cfg, state_path)

    ct, md = object_meta_local(str(tgt / "a.txt"))
    assert ct == "text/x-custom"
    assert md == {}, f"stale metadata survived the overwrite: {md}"


def test_empty_source_with_nonempty_target_refuses_mass_delete(spark, env):
    """A typo'd or unmounted source lists empty; the plan would then delete
    every target object. The guard refuses unless explicitly overridden."""
    import shutil as _shutil

    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    assert (tgt / "a.txt").exists()

    _shutil.rmtree(src)
    src.mkdir(parents=True)
    # guarded call: mapping fails, target untouched
    reports = sync_all(spark, cfg, state_path)
    assert reports[0].counts.get("mapping_failed") == 1
    assert (tgt / "a.txt").exists()
    # explicit override: the emptied source is actioned
    reports = sync_all(spark, cfg, state_path, allow_empty_source=True)
    assert reports[0].counts.get("delete_success", 0) >= 2
    assert not (tgt / "a.txt").exists()


def test_emptied_mapping_state_partition_is_cleared(spark, env):
    """Dynamic overwrite cannot clear a no-rows partition; the runner must
    delete it so removed state rows don't resurrect on the next load."""
    import shutil as _shutil

    cfg, src, tgt, state_path = env
    sync_all(spark, cfg, state_path)
    mid = cfg.mappings[0].mapping_id
    assert (
        state_mod.load_state(spark, state_path)
        .filter(f"mapping_id = '{mid}'")
        .count()
        > 0
    )

    _shutil.rmtree(src)
    src.mkdir(parents=True)
    sync_all(spark, cfg, state_path, allow_empty_source=True)
    remaining = state_mod.load_state(spark, state_path).filter(
        f"mapping_id = '{mid}'"
    )
    assert remaining.count() == 0, "deleted state rows resurrected"


def test_load_state_raises_on_unreadable_table(spark, tmp_path):
    """Absent path -> empty state; present-but-corrupt table must RAISE,
    not silently classify the whole corpus as 'new'."""
    import pytest as _pytest

    state_path = str(tmp_path / "state")
    assert state_mod.load_state(spark, state_path).count() == 0

    import os as _os

    _os.makedirs(f"{state_path}/mapping_id=m", exist_ok=True)
    with open(f"{state_path}/mapping_id=m/part-corrupt.parquet", "wb") as f:
        f.write(b"this is not parquet")
    with _pytest.raises(Exception):
        state_mod.load_state(spark, state_path).collect()
