"""Benchmark harness: times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is fully executed into the noop sink (computes everything,
transfers nothing to the driver) after a warm-up of the input file listing.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cloud_data_sync_spark.registry import all_queries  # noqa: E402
from cloud_data_sync_spark.session import get_spark  # noqa: E402


def build_inline_line(
    timings: dict[str, float],
    total: float,
    sf: float,
    budget: int = 1900,
    extras: dict | None = None,
) -> str:
    """Build the one-line stdout payload, dropping the cheapest *successful*
    queries until it fits the driver's bounded tail buffer.

    Failed queries (recorded as -1.0) are pinned: they must never be trimmed
    away, or the inline view would show a clean run while BENCH_FULL.json
    holds -1 sentinels (r3 advice). A ``failed_queries`` count is surfaced
    whenever any exist. Importable so tests exercise the real drop loop.
    """
    inline = {k: round(v, 2) for k, v in timings.items()}
    n_failed = sum(1 for v in timings.values() if v < 0)
    omitted = 0

    def _line(q: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "total_query_wall_sec",
            "value": round(total, 3),
            "unit": "sec",
            "queries": q,
            "sf": sf,
        }
        if extras:
            payload.update(extras)
        if n_failed:
            payload["failed_queries"] = n_failed
        if omitted:
            payload["omitted_cheap_queries"] = omitted
            payload["full"] = "BENCH_FULL.json"
        return json.dumps(payload, separators=(",", ":"))

    # ascending wall, failures (-1.0) sorted last so they survive trimming
    by_cost = sorted(inline, key=lambda k: (inline[k] < 0, inline[k], k))
    while len(_line(inline, omitted)) > budget and omitted < len(by_cost):
        key = by_cost[omitted]
        if inline.get(key, -1.0) < 0:
            break  # only pinned failures remain
        inline.pop(key)
        omitted += 1
    out = _line(inline, omitted)
    if len(out) > budget:
        # Catastrophic runs: enough pinned failures that even the
        # failures-only map overflows the tail buffer. Per-query detail
        # lives in BENCH_FULL.json; keep the line parseable — a
        # parsed=null round (r2) is worse than a summarized one.
        omitted += len(inline)
        out = _line({}, omitted)
    return out


def wait_for_idle(
    threshold: float,
    max_wait_sec: float,
    poll_sec: float = 30.0,
    load_fn=lambda: os.getloadavg()[0],
    sleep_fn=time.sleep,
    on_wait=lambda load, waited: print(
        f"bench: load_avg {load:.2f} > gate — waited {waited:.0f}s, retrying",
        file=sys.stderr,
    ),
) -> tuple[float, float, bool]:
    """Refuse to measure on a loaded box: poll the 1-minute load average
    until it drops below ``threshold`` or ``max_wait_sec`` elapses.

    Same-code bench totals have swung 63→91 s purely with shared-host
    load (r4/r5/r7/r8 each needed a box-window adjudication narrative);
    this turns that narrative into a mechanical gate (r8 verdict item
    1). Must run BEFORE any Spark work — our own warm-up pushes the
    1-minute load to ~ncpus, so a post-warm-up reading measures us, not
    the box. Returns (final_load, waited_sec, gate_ok). If the box never
    idles within ``max_wait_sec`` the caller proceeds anyway — the
    driver still needs an artifact — but the recorded ``load_gate_ok:
    false`` marks the artifact as load-contaminated by construction.
    Injectable clock/load for tests.
    """
    waited = 0.0
    load = load_fn()
    while load > threshold and waited < max_wait_sec:
        on_wait(load, waited)
        sleep_fn(poll_sec)
        waited += poll_sec
        load = load_fn()
    return load, waited, load <= threshold


def proc_stat_busy_sec() -> float:
    """CPU-seconds consumed across ALL cores since boot (non-idle jiffies
    from the aggregate ``cpu`` line of /proc/stat). Paired with
    :func:`proc_tree_cpu_sec` deltas this yields the CPU that OTHER
    processes burned over an interval — the contamination signal the
    1-minute load average cannot provide mid-run, because our own
    local[32] Spark work dominates the load average the moment the
    warm-up starts (BENCH_r09: start gate green at 1.04, then both
    timed sweeps poisoned at loads 3.05/6.86 with no way to tell our
    load from the intruder's)."""
    with open("/proc/stat", encoding="ascii") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def proc_tree_cpu_sec(root_pid: int | None = None) -> float:
    """CPU-seconds of OUR process tree: this process, every live
    descendant (the py4j-launched Spark JVM and its Python worker
    daemons), plus each tree member's reaped dead children (cutime/
    cstime — workers churn mid-sweep and their time migrates into the
    JVM's dead-child counters at reap, so the walk stays monotone).
    Live descendants carry their own utime/stime and only DEAD children
    land in a parent's cutime/cstime, so nothing double-counts."""
    root = root_pid if root_pid is not None else os.getpid()
    cpu: dict[int, int] = {}
    kids: dict[int, list[int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat", "rb") as f:
                raw = f.read().decode("ascii", "replace")
            # comm (field 2) may embed spaces/parens: parse after the
            # LAST ')' — fields from there are whitespace-clean
            rest = raw[raw.rindex(")") + 2 :].split()
            ppid = int(rest[1])
            t = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        except (OSError, ValueError, IndexError):
            continue  # process exited mid-walk
        pid = int(entry)
        cpu[pid] = t
        kids.setdefault(ppid, []).append(pid)
    total, stack, seen = 0, [root], set()
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += cpu.get(p, 0)
        stack.extend(kids.get(p, ()))
    return total / os.sysconf("SC_CLK_TCK")


def cpu_stamp() -> tuple[float, float, float]:
    """(all-cores busy CPU-sec, own process-tree CPU-sec, wall clock) —
    take one before and one after a region; :func:`external_cores` turns
    the pair into the average number of cores OTHER processes held during
    it. Returns zeros where /proc is unavailable (non-Linux dev boxes):
    external load then reads 0 and the gate is a documented no-op."""
    try:
        return proc_stat_busy_sec(), proc_tree_cpu_sec(), time.monotonic()
    except OSError:
        return 0.0, 0.0, time.monotonic()


def external_cores(
    s0: tuple[float, float, float], s1: tuple[float, float, float]
) -> float:
    """Average cores burned by processes OUTSIDE our tree between two
    :func:`cpu_stamp` readings: (Δall-busy − Δown-tree) / Δwall, clamped
    at 0 (sampling skew can put own a hair above busy on an idle box)."""
    wall = s1[2] - s0[2]
    if wall <= 0:
        return 0.0
    return max(0.0, (s1[0] - s0[0]) - (s1[1] - s0[1])) / wall


def wait_for_external_idle(
    threshold: float,
    max_wait_sec: float,
    sample_sec: float = 2.0,
    stamp_fn=cpu_stamp,
    sleep_fn=time.sleep,
    on_wait=lambda ext, waited: print(
        f"bench: external load {ext:.2f} cores > gate — waited "
        f"{waited:.0f}s, retrying",
        file=sys.stderr,
    ),
) -> tuple[float, float, bool]:
    """Between-sweep twin of :func:`wait_for_idle`, measuring EXTERNAL
    cores over short samples instead of the 1-minute load average — the
    load average is useless mid-run (it still carries our own warm-up
    and prior sweep for a minute or more), while a 2 s /proc delta taken
    while our tree sits idle reads only the intruders. Returns
    (last_external_cores, waited_sec, gate_ok)."""
    waited = 0.0
    while True:
        s0 = stamp_fn()
        sleep_fn(sample_sec)
        waited += sample_sec
        ext = external_cores(s0, stamp_fn())
        if ext <= threshold or waited >= max_wait_sec:
            return ext, waited, ext <= threshold
        on_wait(ext, waited)


def sweep_timings(
    names: list[str],
    run_one,
    passes: int = 2,
    on_error=lambda name, exc: print(
        f"bench: {name} failed: {exc}", file=sys.stderr
    ),
    load_fn=lambda: os.getloadavg()[0],
    ext_gate: float | None = None,
    max_extra_sweeps: int = 2,
    stamp_fn=cpu_stamp,
    pre_sweep=None,
) -> tuple[dict[str, float], float, list[float], dict]:
    """Min-of-N per query, taken as N SEPARATE full sweeps over the query
    list (pass 1 times everything, then pass 2 re-times everything)
    rather than back-to-back repeats: the box is shared, and a sustained
    CPU-contention spike spans many seconds — back-to-back repeats of one
    query both land inside the spike and min-of-N records the inflated
    cost anyway (observed: a ~60 s spike inflated the whole alphabetical
    q_s* band 2-8x in one run). With full-sweep separation the same
    query's samples are minutes apart, so a localized spike can poison at
    most one of them.

    r10, after BENCH_r09 shipped with BOTH sweeps poisoned behind a green
    start gate: each sweep is now bracketed by :func:`cpu_stamp` pairs
    and judged CLEAN iff the external-CPU average over the sweep stayed
    at or under ``ext_gate`` cores; the loop keeps sweeping (up to
    ``max_extra_sweeps`` beyond ``passes``) until ``passes`` clean sweeps
    exist, calling ``pre_sweep()`` (the external-idle wait) before each
    one. Poisoned sweeps' samples are KEPT — min-of-N only improves with
    more samples and an inflated sample never wins the min — the retry
    exists so the committed artifact always contains ``passes`` sweeps
    measured on a quiet box when one is available within the retry
    budget. ``ext_gate=None`` disables gating (legacy behavior).

    A failure on ANY run marks the query failed (-1.0, excluded from the
    total) and skips its remaining sweeps: a succeed-then-throw flake
    previously kept run 1's time and reported green while stderr said
    otherwise. NaN would serialize as bare `NaN` — invalid JSON — hence
    the -1 sentinel. Importable so tests exercise the real sweep loop.

    Also returns the raw PER-SWEEP totals (over queries that completed
    every sweep) so the committed artifact carries both decorrelated
    samples, not just the min: cross-round comparisons can then separate
    a real regression (both sweeps up) from box contention (one sweep
    poisoned) without re-running anything (r5 advice — bench totals
    swing ±20-40% with shared-host load). The 1-min load at each sweep
    START is returned alongside (r9): with the start gate green, an
    asymmetric sweep pair plus its load stamps names WHICH sweep was
    poisoned as recorded fact instead of reconstruction.
    """
    samples: dict[str, list[float]] = {}
    failed: set[str] = set()
    meta: dict = {"loads": [], "ext_cores": [], "clean": [], "pre_gate": []}
    clean = 0
    n_sweeps = 0
    while clean < passes and n_sweeps < passes + max_extra_sweeps:
        if pre_sweep is not None:
            meta["pre_gate"].append(pre_sweep())
        meta["loads"].append(round(load_fn(), 2))
        s0 = stamp_fn()
        for name in names:
            if name in failed:
                continue
            try:
                dt = run_one(name)
            except Exception as exc:  # noqa: BLE001
                on_error(name, exc)
                failed.add(name)
                continue
            samples.setdefault(name, []).append(dt)
        ext = external_cores(s0, stamp_fn())
        is_clean = ext_gate is None or ext <= ext_gate
        meta["ext_cores"].append(round(ext, 2))
        meta["clean"].append(is_clean)
        clean += 1 if is_clean else 0
        n_sweeps += 1
        if not is_clean:
            print(
                f"bench: sweep {n_sweeps} contaminated "
                f"(external {ext:.2f} cores > gate {ext_gate}) — "
                + (
                    "re-sweeping"
                    if n_sweeps < passes + max_extra_sweeps
                    else "retry budget exhausted"
                ),
                file=sys.stderr,
            )
    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        if name in failed or not samples.get(name):
            timings[name] = -1.0
        else:
            best = min(samples[name])
            timings[name] = round(best, 3)
            total += best
    complete = [n for n in names if len(samples.get(n, [])) == n_sweeps]
    sweep_totals = [
        round(sum(samples[n][i] for n in complete), 3)
        for i in range(n_sweeps)
    ]
    return timings, total, sweep_totals, meta


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    # load gate FIRST (before the session starts doing work — see
    # wait_for_idle); conservative threshold. Default max wait is 10
    # minutes, not longer: the full run itself takes ~15 min and an
    # unattended harness may cap total wall — a gate_ok=false artifact
    # (self-documented as load-contaminated) beats NO artifact from a
    # timeout. Interactive runs override via env (the r9 close used
    # GATE=0.8 WAIT=3600 to insist on a deep-idle window).
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_GATE", "1.5"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "600"))
    load_start, load_waited, load_gate_ok = wait_for_idle(gate, max_wait)

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Debug subset (comma-separated keys): lets harness changes be
    # smoke-tested end-to-end without a full 254-key sweep. Never set by
    # the driver; the committed artifact always covers the registry.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    keys = sorted(
        set(only.split(",")) & set(all_queries()) if only else all_queries()
    )

    # warm-up: JVM JIT, parquet footer reads, Python worker pool — so the
    # first measured query doesn't absorb session start-up costs
    from cloud_data_sync_spark.tables import load_tables

    for df in load_tables(spark, sf_dir, register_views=False).values():
        df.count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # run every query once at the smallest sf: JIT-compiles each query's
    # generated code paths (shingles, HOFs, window exec) so the timed runs
    # measure steady-state throughput, not one-time codegen compilation
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in keys:
            try:
                all_queries()[name].fn(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 - warm-up is best-effort
                pass
    # one untimed sweep AT THE MEASURED SF: session substrates (shared
    # tokenized documents, dedup signatures, embedding pairs, bucketed
    # layouts) materialize once per (session, sf, vintage), and without
    # this pass their build cost lands on whichever family member the
    # timed pass reaches first — per-query walls then drift round-over-
    # round as families grow (r4 verdict watch item). With the warm sweep
    # both timed passes measure steady-state plans only; min-of-N already
    # hid most of it, this removes it from pass 1 as well.
    for name in keys:
        try:
            all_queries()[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 - warm-up is best-effort
            pass

    def _run_one(name: str) -> float:
        t0 = time.perf_counter()
        all_queries()[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # Per-sweep contamination defense (r9 verdict item: both timed
    # sweeps ran at loads 3.05/6.86 behind a green START gate). Each
    # sweep waits for EXTERNAL cpu (other processes' cores, measured by
    # /proc deltas — the load average is blind mid-run, it mostly reads
    # our own local[32] work) to idle, is stamped with its own external-
    # core average, and is re-run (bounded) when that average breaches
    # the gate — so a committed min-of-N can no longer consist entirely
    # of poisoned sweeps while every recorded stamp looks green.
    ext_gate = float(os.environ.get("SPARK_GRAFT_BENCH_SWEEP_GATE", "1.5"))
    sweep_wait = float(os.environ.get("SPARK_GRAFT_BENCH_SWEEP_WAIT", "180"))

    def _pre_sweep() -> list:
        ext, waited, ok = wait_for_external_idle(ext_gate, sweep_wait)
        return [round(ext, 2), round(waited, 1), ok]

    timings, total, sweep_totals, sweep_meta = sweep_timings(
        keys,
        _run_one,
        ext_gate=ext_gate,
        pre_sweep=_pre_sweep,
    )
    sweep_loads = sweep_meta["loads"]

    # Full per-query map goes to BENCH_FULL.json (the one-line stdout
    # contract is read from a bounded tail buffer — observed 2000 chars in
    # BENCH_r02.json, whose 89-query line overflowed it and failed to parse,
    # so the inline map must stay comfortably under that).
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_FULL.json"), "w", encoding="utf-8") as f:
            json.dump(
                {
                    "metric": "total_query_wall_sec",
                    "value": round(total, 3),
                    # r10 verdict item 4: make the artifact self-describing —
                    # `value` is the sum over queries of each query's
                    # MIN-of-sweeps wall (per-query min, then sum), which is
                    # why it can undercut every entry of sweep_totals;
                    # min_sweep_total is the best SINGLE coherent sweep,
                    # the number to quote when comparing whole runs.
                    "value_semantics": "sum of per-query min-of-sweeps walls",
                    "min_sweep_total": (
                        round(min(sweep_totals), 3) if sweep_totals else None
                    ),
                    # r10 ADVICE: a SPARK_GRAFT_BENCH_ONLY debug subset must
                    # be visible in the artifact itself — a filtered run
                    # was previously distinguishable from a full one only
                    # by counting keys. null ⇒ full registry.
                    "bench_only": sorted(keys) if only else None,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    # raw totals of each decorrelated sweep (queries that
                    # completed every sweep): value is the min-of-sweeps
                    # total; these expose how much box noise the min hid
                    "sweep_totals": sweep_totals,
                    # 1-min load at each timed sweep's START: names the
                    # poisoned sweep when the pair is asymmetric
                    "sweep_loads": sweep_loads,
                    # r10: average EXTERNAL cores (other processes, /proc
                    # deltas) during each sweep, whether each sweep
                    # passed the gate, the gate value, and each sweep's
                    # pre-wait [ext_cores, waited_sec, ok]. A sweep with
                    # clean=false was retried (bounded at +2); an
                    # artifact whose clean list has < 2 trues is load-
                    # contaminated by construction.
                    "sweep_ext_cores": sweep_meta["ext_cores"],
                    "sweep_clean": sweep_meta["clean"],
                    "sweep_ext_gate": ext_gate,
                    "sweep_pre_gate": sweep_meta["pre_gate"],
                    # shared-host load at run end (1/5/15-min averages):
                    # the machine-readable noise context — same-code
                    # totals have swung 63-89 s purely with box load, so
                    # cross-round comparisons need this alongside the
                    # sweep totals (r7 verdict item 7)
                    "load_avg": [round(x, 2) for x in os.getloadavg()],
                    # the load gate (r8 verdict item 1): 1-min load at
                    # measurement START (pre-Spark), how long the gate
                    # waited for the box to idle, the threshold, and
                    # whether the gate was satisfied — gate_ok false
                    # marks the artifact load-contaminated by
                    # construction (max-wait exhausted on a busy box)
                    "load_avg_start": round(load_start, 2),
                    "load_gate": gate,
                    "load_gate_waited_sec": round(load_waited, 1),
                    "load_gate_ok": load_gate_ok,
                },
                f,
                indent=1,
                sort_keys=True,
            )
            f.write("\n")
    except OSError:
        pass

    # Inline: compact separators, 2-decimal walls, and if needed drop the
    # cheapest successful queries until the line fits — heavy hitters and
    # failures always survive (see build_inline_line).
    print(
        build_inline_line(
            timings,
            total,
            sf,
            extras={
                # self-describing semantics (r10 verdict item 4): `value`
                # is the sum of per-query min-of-sweeps walls; the best
                # single coherent sweep rides alongside for whole-run
                # comparisons, and a debug subset stamps itself.
                "value_semantics": "sum of per-query min-of-sweeps walls",
                "min_sweep_total": (
                    round(min(sweep_totals), 3) if sweep_totals else None
                ),
                **({"bench_only": sorted(keys)} if only else {}),
            },
        )
    )


if __name__ == "__main__":
    main()
