"""State-table upsert/delete semantics (database_test.go analog) and the
config validation table (config_test.go:9-98 analog)."""

from __future__ import annotations

from datetime import datetime

import pytest

from cloud_data_sync_spark import state as state_mod
from cloud_data_sync_spark.config import (
    BucketMapping,
    Config,
    ConfigError,
    load_config,
    save_default_config,
    validate_config,
)

T1 = datetime(2024, 1, 1)
T2 = datetime(2024, 1, 2)


def _state(spark, rows):
    return spark.createDataFrame(
        [
            ("m1", name, 1, T1, etag, None, {}, synced, status)
            for name, etag, synced, status in rows
        ],
        state_mod.STATE_SCHEMA,
    )


def test_upsert_latest_wins(spark):
    old = _state(spark, [("a", "e1", T1, "success"), ("b", "e2", T1, "success")])
    new = _state(spark, [("a", "e9", T2, "success"), ("c", "e3", T2, "failed_get")])
    out = {r["object_name"]: r for r in state_mod.upsert(old, new).collect()}
    assert out["a"]["etag"] == "e9"
    assert out["b"]["etag"] == "e2"
    assert out["c"]["sync_status"] == "failed_get"
    assert len(out) == 3


def test_upsert_tie_prefers_update(spark):
    old = _state(spark, [("a", "old", T1, "success")])
    new = _state(spark, [("a", "new", T1, "success")])  # same last_synced
    out = state_mod.upsert(old, new).collect()
    assert len(out) == 1
    assert out[0]["etag"] == "new"


def test_delete_keys(spark):
    st = _state(spark, [("a", "e1", T1, "success"), ("b", "e2", T1, "success")])
    gone = _state(spark, [("a", "e1", T1, "success")])
    left = state_mod.delete_keys(st, gone).collect()
    assert [r["object_name"] for r in left] == ["b"]


def test_state_roundtrip(spark, tmp_path):
    path = str(tmp_path / "state")
    st = _state(spark, [("a", "e1", T1, "success")])
    state_mod.save_state(st, path)
    back = state_mod.load_state(spark, path).collect()
    assert len(back) == 1 and back[0]["etag"] == "e1"


def test_load_missing_state_is_empty(spark, tmp_path):
    assert state_mod.load_state(spark, str(tmp_path / "nope")).count() == 0


# -- config validation table (config_test.go cases) --------------------------

_P = {"id": "p1", "type": "minio", "minioConfig": {"endpoint": "file:///x"}}
_M = BucketMapping("p1", "a", "p1", "b")


def test_valid_config_passes():
    validate_config(Config(providers=[_P], mappings=[_M]))


@pytest.mark.parametrize(
    "cfg, msg",
    [
        (Config(providers=[], mappings=[_M]), "no providers"),
        (Config(providers=[_P, dict(_P)], mappings=[_M]), "duplicate provider ID"),
        (
            Config(providers=[{"id": "p1", "type": "minio"}], mappings=[_M]),
            "missing minioConfig",
        ),
        (
            Config(providers=[{"id": "p1", "type": "alien", "minioConfig": {}}], mappings=[_M]),
            "unknown provider type",
        ),
        (Config(providers=[_P], mappings=[]), "no mappings"),
        (
            Config(providers=[_P], mappings=[BucketMapping("ghost", "a", "p1", "b")]),
            "unknown source provider",
        ),
        (
            Config(providers=[_P], mappings=[BucketMapping("p1", "a", "ghost", "b")]),
            "unknown target provider",
        ),
    ],
)
def test_invalid_configs_rejected(cfg, msg):
    with pytest.raises(ConfigError, match=msg):
        validate_config(cfg)


def test_mapping_id_format():
    assert _M.mapping_id == "p1:a->p1:b"  # sync.go:93-95


def test_default_config_roundtrip(tmp_path):
    p = str(tmp_path / "cfg.json")
    save_default_config(p)
    cfg = load_config(p)
    assert cfg.database_path == "data.db"
    assert cfg.mappings[0].mapping_id == "local-src:bucket-a->local-tgt:bucket-b"


# -- provider conf contract ---------------------------------------------------
# The sandbox can never execute s3a://gs://abfss:// reads, so this contract
# test is the strongest available check that a reference-style provider
# config lands on the session as the Hadoop FS settings those schemes read
# (storage/factory.go:24-77 becomes session conf, sources/listing.py).


def test_provider_conf_minio_maps_to_s3a(spark):
    from cloud_data_sync_spark.sources.listing import provider_conf

    provider_conf(
        spark,
        {
            "type": "minio",
            "minioConfig": {
                "endpoint": "http://minio.local:9000",
                "accessKey": "ak",
                "secretKey": "sk",
            },
        },
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://minio.local:9000"
    assert conf.get("fs.s3a.access.key") == "ak"
    assert conf.get("fs.s3a.secret.key") == "sk"
    assert conf.get("fs.s3a.path.style.access") == "true"


def test_provider_conf_aws_maps_to_s3a(spark):
    from cloud_data_sync_spark.sources.listing import provider_conf

    provider_conf(
        spark,
        {"type": "aws", "awsConfig": {"accessKey": "AKID", "secretKey": "SECRET"}},
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.access.key") == "AKID"
    assert conf.get("fs.s3a.secret.key") == "SECRET"


def test_provider_conf_azure_maps_account_key(spark):
    from cloud_data_sync_spark.sources.listing import provider_conf

    provider_conf(
        spark,
        {
            "type": "azure",
            "azureConfig": {"accountName": "acct", "accountKey": "KEY=="},
        },
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.azure.account.key.acct.blob.core.windows.net") == "KEY=="


def test_provider_conf_file_provider_is_noop(spark):
    from cloud_data_sync_spark.sources.listing import provider_conf

    conf = spark.sparkContext._jsc.hadoopConfiguration()
    before = conf.get("fs.s3a.endpoint")
    provider_conf(spark, {"type": "file"})
    assert conf.get("fs.s3a.endpoint") == before


def test_provider_conf_bucket_scoped_s3a(spark):
    """Two s3-scheme providers in one mapping (aws → minio) must not
    clobber each other: with a bucket argument the settings land on
    fs.s3a.bucket.<bucket>.* (review finding: global keys let the second
    provider_conf call overwrite the first's endpoint/credentials)."""
    from cloud_data_sync_spark.sources.listing import provider_conf

    provider_conf(
        spark,
        {
            "type": "aws",
            "awsConfig": {"accessKey": "src-ak", "secretKey": "src-sk"},
        },
        bucket="src-bucket",
    )
    provider_conf(
        spark,
        {
            "type": "minio",
            "minioConfig": {
                "endpoint": "http://minio.local:9000",
                "accessKey": "tgt-ak",
                "secretKey": "tgt-sk",
            },
        },
        bucket="tgt-bucket",
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.bucket.src-bucket.access.key") == "src-ak"
    assert conf.get("fs.s3a.bucket.tgt-bucket.access.key") == "tgt-ak"
    assert conf.get("fs.s3a.bucket.tgt-bucket.endpoint") == "http://minio.local:9000"
    # the source bucket's credentials survived the target's configuration
    assert conf.get("fs.s3a.bucket.src-bucket.secret.key") == "src-sk"


def test_list_objects_refuses_file_root(spark, tmp_path):
    """A mapping root that resolves to a FILE must refuse loudly: the old
    fall-through emitted the absolute path as object_name, and the copy
    phase's os.path.join would then truncate the SOURCE file to 0 bytes
    (review finding, reproduced before the fix)."""
    import pytest

    from cloud_data_sync_spark.sources.listing import list_objects

    f = tmp_path / "a.txt"
    f.write_text("precious data")
    with pytest.raises(Exception, match="not under the mapping root"):
        list_objects(spark, f"file://{f}", "m1").collect()
    assert f.read_text() == "precious data"


def test_read_marker_raises_on_unreadable_not_missing(tmp_path):
    """An EXISTING but unreadable version marker must not be treated as
    cleanly absent — that would silently pass the version gate."""
    import os

    import pytest

    from cloud_data_sync_spark.state import _read_marker, _version_path

    state_dir = tmp_path / "state"
    state_dir.mkdir()
    assert _read_marker(str(state_dir)) is None  # genuinely absent → None
    marker = _version_path(str(state_dir))
    with open(marker, "w", encoding="utf-8") as fh:
        fh.write("v1")
    os.chmod(marker, 0)
    try:
        if os.geteuid() == 0:  # root ignores mode bits; can't simulate EACCES
            assert _read_marker(str(state_dir)) == "v1"
        else:
            with pytest.raises(OSError):
                _read_marker(str(state_dir))
    finally:
        os.chmod(marker, 0o644)


def test_config_shape_errors_raise_config_error(tmp_path):
    """Valid-JSON-wrong-shape configs surface as ConfigError diagnostics,
    never raw AttributeError/TypeError tracebacks."""
    import json

    import pytest

    from cloud_data_sync_spark.config import ConfigError, load_config

    cases = [
        {"providers": ["p1"], "mappings": []},
        {"providers": [{"id": "a", "type": "minio", "minioConfig": {}}],
         "mappings": [None]},
        {"providers": {}, "mappings": []},
        [],
    ]
    for i, raw in enumerate(cases):
        p = tmp_path / f"cfg{i}.json"
        p.write_text(json.dumps(raw))
        with pytest.raises(ConfigError):
            load_config(str(p))
