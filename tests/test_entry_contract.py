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


def test_bench_inline_line_fits_tail_buffer():
    """The driver parses bench's stdout JSON from a 2000-char tail buffer;
    an overflowing line records parsed=null (round-2 regression). Simulate
    the worst case: every registered query present at max value width."""
    import json

    from cloud_data_sync_spark.registry import all_queries

    timings = {name: 99.99 for name in all_queries()}
    inline = dict(timings)
    omitted = 0

    def line(q, om):
        payload = {
            "metric": "total_query_wall_sec",
            "value": 9999.999,
            "unit": "sec",
            "queries": q,
            "sf": 0.1,
        }
        if om:
            payload["omitted_cheap_queries"] = om
            payload["full"] = "BENCH_FULL.json"
        return json.dumps(payload, separators=(",", ":"))

    order = sorted(inline)
    while len(line(inline, omitted)) > 1900 and inline:
        inline.pop(order[omitted])
        omitted += 1
    assert len(line(inline, omitted)) <= 1900
    # the drop loop must terminate with a healthy number still inline
    assert len(inline) >= 40
