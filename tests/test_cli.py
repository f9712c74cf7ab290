"""CLI parity tests (reference: cmd/cloud-data-sync/main.go flags)."""

from __future__ import annotations

import json

from cloud_data_sync_spark.__main__ import main


def test_generate_config(tmp_path):
    path = str(tmp_path / "config.json")
    assert main(["--generate-config", "--config", path]) == 0
    cfg = json.loads(open(path).read())
    assert {"databasePath", "providers", "mappings"} <= set(cfg)


def test_once_end_to_end(spark, tmp_path):
    src = tmp_path / "src" / "bucket-a"
    src.mkdir(parents=True)
    (src / "a.txt").write_bytes(b"payload")
    cfg = {
        "databasePath": str(tmp_path / "state"),
        "providers": [
            {"id": "s", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "src")}},
            {"id": "t", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "tgt")}},
        ],
        "mappings": [
            {
                "sourceProviderId": "s",
                "sourceBucket": "bucket-a",
                "targetProviderId": "t",
                "targetBucket": "bucket-b",
            }
        ],
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main(["--config", str(cfg_path), "--once"]) == 0
    assert (tmp_path / "tgt" / "bucket-b" / "a.txt").read_bytes() == b"payload"
    # the --once run must not tear down the embedding caller's session
    assert spark.range(1).count() == 1


def test_package_root_exports_public_api():
    """The library-embedding surface (SURVEY.md §3.3): every documented
    entry point resolves lazily from the package root, and the lazy
    __getattr__ rejects unknown names with AttributeError."""
    import cloud_data_sync_spark as pkg

    for name in pkg.__all__:
        assert getattr(pkg, name) is not None
    assert callable(pkg.load_config)
    assert callable(pkg.sync_all)
    assert callable(pkg.all_queries)
    assert isinstance(pkg.__version__, str)
    try:
        pkg.definitely_not_an_export
    except AttributeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("unknown attribute must raise AttributeError")


def test_cli_checkpoint_dir_flag_sets_conf(tmp_path, spark):
    from cloud_data_sync_spark.__main__ import main
    from cloud_data_sync_spark.tables import CHECKPOINT_DIR_CONF

    src = tmp_path / "src" / "bucket-a"
    src.mkdir(parents=True)
    (src / "a.txt").write_bytes(b"payload")
    cfg = {
        "databasePath": str(tmp_path / "state"),
        "providers": [
            {"id": "s", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "src")}},
            {"id": "t", "type": "minio", "minioConfig": {"endpoint": str(tmp_path / "tgt")}},
        ],
        "mappings": [
            {
                "sourceProviderId": "s",
                "sourceBucket": "bucket-a",
                "targetProviderId": "t",
                "targetBucket": "bucket-a",
            }
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    ck = str(tmp_path / "ck")
    rc = main(["--config", str(cfg_path), "--once", "--checkpoint-dir", ck])
    assert rc == 0
    assert spark.conf.get(CHECKPOINT_DIR_CONF, None) == ck
    spark.conf.unset(CHECKPOINT_DIR_CONF)
