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


def test_sweep_timings_min_across_separated_sweeps():
    from bench import sweep_timings

    walls = {"q_a": iter([3.0, 1.0]), "q_b": iter([0.5, 0.7])}
    loads = iter([0.3, 0.5])
    timings, total, sweep_totals, meta = sweep_timings(
        ["q_a", "q_b"],
        lambda n: next(walls[n]),
        on_error=lambda n, e: None,
        load_fn=lambda: next(loads),
    )
    # each sweep's start load is stamped so an asymmetric pair names
    # the poisoned sweep
    assert meta["loads"] == [0.3, 0.5]
    # min is taken per query ACROSS sweeps (q_a's spike-poisoned first
    # sample is discarded by its clean second-sweep sample)
    assert timings == {"q_a": 1.0, "q_b": 0.5}
    assert abs(total - 1.5) < 1e-9
    # both raw sweep totals are surfaced so the artifact shows the noise
    # the min hid (3.0+0.5, then 1.0+0.7)
    assert sweep_totals == [3.5, 1.7]


def test_sweep_timings_failure_pins_sentinel_and_skips_remaining_sweeps():
    from bench import sweep_timings

    calls = []

    def run_one(name):
        calls.append(name)
        if name == "q_bad":
            raise RuntimeError("boom")
        return 0.1

    timings, total, sweep_totals, _ = sweep_timings(
        ["q_bad", "q_ok"], run_one, on_error=lambda n, e: None
    )
    # failed queries are excluded from BOTH sweep totals, not just the min
    assert sweep_totals == [0.1, 0.1]
    # a failure on ANY run is a -1.0 sentinel excluded from the total,
    # and the query is not retried on later sweeps
    assert timings["q_bad"] == -1.0
    assert timings["q_ok"] == 0.1
    assert abs(total - 0.1) < 1e-9
    assert calls.count("q_bad") == 1
    assert calls.count("q_ok") == 2


def test_sweep_timings_succeed_then_throw_is_failed():
    from bench import sweep_timings

    seen = []

    def run_one(name):
        seen.append(name)
        if len(seen) > 1:
            raise RuntimeError("flake on sweep 2")
        return 2.5

    timings, total, _, _ = sweep_timings(
        ["q_x"], run_one, on_error=lambda n, e: None
    )
    # sweep-1 success must NOT survive a sweep-2 throw
    assert timings == {"q_x": -1.0}
    assert total == 0.0


def _stamps(ext_per_sweep, cores=0.0):
    """Scripted cpu_stamp pairs: each sweep consumes two stamps; the
    pair is built so external_cores() reads the scripted value."""
    seq = []
    wall = 0.0
    busy = 0.0
    for ext in ext_per_sweep:
        seq.append((busy, 0.0, wall))
        wall += 10.0
        busy += ext * 10.0
        seq.append((busy, 0.0, wall))
    it = iter(seq)
    return lambda: next(it)


def test_sweep_timings_retries_contaminated_sweep():
    from bench import sweep_timings

    walls = {"q_a": iter([4.0, 1.0, 1.1])}
    timings, total, sweep_totals, meta = sweep_timings(
        ["q_a"],
        lambda n: next(walls[n]),
        on_error=lambda n, e: None,
        load_fn=lambda: 0.2,
        ext_gate=1.5,
        stamp_fn=_stamps([6.0, 0.3, 0.2]),
    )
    # sweep 1 measured 6 external cores -> contaminated -> two more
    # sweeps run until 2 clean ones exist; min still spans all samples
    assert meta["ext_cores"] == [6.0, 0.3, 0.2]
    assert meta["clean"] == [False, True, True]
    assert timings == {"q_a": 1.0}
    assert sweep_totals == [4.0, 1.0, 1.1]


def test_sweep_timings_retry_budget_bounded():
    from bench import sweep_timings

    n_runs = []
    timings, total, sweep_totals, meta = sweep_timings(
        ["q_a"],
        lambda n: n_runs.append(n) or 1.0,
        on_error=lambda n, e: None,
        load_fn=lambda: 9.9,
        ext_gate=1.5,
        max_extra_sweeps=2,
        stamp_fn=_stamps([8.0] * 10),
    )
    # a persistently busy box stops at passes + max_extra_sweeps sweeps
    # and the artifact records every sweep dirty (contaminated by
    # construction) instead of spinning forever
    assert len(n_runs) == 4
    assert meta["clean"] == [False, False, False, False]
    assert timings == {"q_a": 1.0}


def test_sweep_timings_pre_sweep_called_per_sweep():
    from bench import sweep_timings

    pre = []
    sweep_timings(
        ["q_a"],
        lambda n: 0.1,
        on_error=lambda n, e: None,
        load_fn=lambda: 0.2,
        ext_gate=1.5,
        stamp_fn=_stamps([0.0, 0.0]),
        pre_sweep=lambda: pre.append(1) or [0.1, 2.0, True],
    )
    assert pre == [1, 1]


def test_external_cores_subtracts_own_tree_and_clamps():
    from bench import external_cores

    # 10s window: box burned 80 core-sec total, our tree burned 75 ->
    # 0.5 external cores
    assert abs(external_cores((0, 0, 0), (80, 75, 10)) - 0.5) < 1e-9
    # sampling skew (own > busy) clamps at 0, never negative
    assert external_cores((0, 0, 0), (10, 12, 10)) == 0.0
    # zero-width window reads 0
    assert external_cores((5, 5, 7), (5, 5, 7)) == 0.0


def test_wait_for_external_idle_waits_out_contention():
    from bench import wait_for_external_idle

    stamp = _stamps([4.0, 2.0, 0.3])
    ext, waited, ok = wait_for_external_idle(
        1.5,
        60,
        sample_sec=2.0,
        stamp_fn=stamp,
        sleep_fn=lambda s: None,
        on_wait=lambda e, w: None,
    )
    assert ok and abs(ext - 0.3) < 1e-9 and waited == 6.0


def test_wait_for_external_idle_gives_up_and_flags():
    from bench import wait_for_external_idle

    ext, waited, ok = wait_for_external_idle(
        1.5,
        4.0,
        sample_sec=2.0,
        stamp_fn=_stamps([5.0] * 10),
        sleep_fn=lambda s: None,
        on_wait=lambda e, w: None,
    )
    assert not ok and waited == 4.0 and abs(ext - 5.0) < 1e-9


def test_cpu_stamp_reads_real_proc():
    """Integration smoke on the real /proc: our own busy loop must show
    up in the TREE counter (so the subtraction actually removes our own
    work from the external reading)."""
    import bench

    s0 = bench.cpu_stamp()
    t0 = __import__("time").monotonic()
    x = 0
    while __import__("time").monotonic() - t0 < 0.3:
        x += 1
    s1 = bench.cpu_stamp()
    busy_d, tree_d = s1[0] - s0[0], s1[1] - s0[1]
    assert busy_d >= 0.0 and s1[2] > s0[2]
    # our ~0.3s single-core spin is visible in the tree counter
    assert tree_d >= 0.1
    # external reading exists and is sane for a 32-core box
    assert 0.0 <= bench.external_cores(s0, s1) <= 64.0


def test_wait_for_idle_passes_immediately_on_idle_box():
    from bench import wait_for_idle

    slept = []
    load, waited, ok = wait_for_idle(
        1.5,
        300,
        load_fn=lambda: 0.4,
        sleep_fn=slept.append,
        on_wait=lambda l, w: None,
    )
    assert ok and waited == 0.0 and load == 0.4 and slept == []


def test_wait_for_idle_polls_until_box_idles():
    from bench import wait_for_idle

    loads = iter([3.0, 2.2, 0.9])
    load, waited, ok = wait_for_idle(
        1.5,
        300,
        poll_sec=30,
        load_fn=lambda: next(loads),
        sleep_fn=lambda s: None,
        on_wait=lambda l, w: None,
    )
    # two waits burned before the third reading clears the gate
    assert ok and waited == 60.0 and load == 0.9


def test_wait_for_idle_gives_up_after_max_wait_and_flags_it():
    from bench import wait_for_idle

    load, waited, ok = wait_for_idle(
        1.5,
        90,
        poll_sec=30,
        load_fn=lambda: 4.0,
        sleep_fn=lambda s: None,
        on_wait=lambda l, w: None,
    )
    # a box that never idles still returns (the driver needs SOME
    # artifact) but gate_ok=False marks it load-contaminated
    assert not ok and waited == 90.0 and load == 4.0
