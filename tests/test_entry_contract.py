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
    an overflowing line records parsed=null (round-2 regression). Exercise
    bench.py's REAL builder (not a reimplementation — r3 advice) with the
    worst case: every registered query present at max value width."""
    import json

    from bench import build_inline_line
    from cloud_data_sync_spark.registry import all_queries

    timings = {name: 99.99 for name in all_queries()}
    line = build_inline_line(timings, total=9999.999, sf=0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # the drop loop must terminate with a healthy number still inline
    assert len(parsed["queries"]) >= 40
    assert "failed_queries" not in parsed


def test_bench_inline_line_pins_failures():
    """Failed queries (-1.0 sentinels) must survive trimming and be counted,
    so the driver's one-line view can never show a clean run that wasn't."""
    import json

    from bench import build_inline_line
    from cloud_data_sync_spark.registry import all_queries

    timings = {name: 99.99 for name in all_queries()}
    failed = sorted(timings)[:3]
    for name in failed:
        timings[name] = -1.0
    line = build_inline_line(timings, total=9999.999, sf=0.1)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["failed_queries"] == 3
    for name in failed:
        assert parsed["queries"][name] == -1.0


def test_bench_inline_line_survives_catastrophic_failure_count():
    """Enough pinned -1.0 failures to overflow the budget must degrade to a
    summary line (failed count, no per-query map), never an unparseable
    overflow (the r2 parsed=null regression)."""
    import json

    from bench import build_inline_line

    timings = {f"q_very_long_query_name_number_{i:04d}": -1.0 for i in range(150)}
    line = build_inline_line(timings, total=-1.0, sf=0.1)
    assert len(line) <= 1900
    payload = json.loads(line)
    assert payload["failed_queries"] == 150
    assert payload["queries"] == {}
    assert payload["full"] == "BENCH_FULL.json"
