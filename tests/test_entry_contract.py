"""Contract invariants the driver relies on (__spark_entry__.py)."""

from __future__ import annotations

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_oracle_keys_subset_of_queries():
    mod = _load_entry()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert q, "queries() must not be empty"


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert {"mapping_id", "object_name", "action"} <= set(df.columns)


def test_events_ts_normalized_to_timestamp(spark):
    from cloud_data_sync_spark.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    # Spark 3.x + nanosAsLong reads TIMESTAMP(NANOS) as bigint (normalized to
    # timestamp by load_table); Spark 4.x reads it directly as timestamp_ntz
    # with µs truncation. Both are µs-exact and match DuckDB's naive TIMESTAMP.
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
