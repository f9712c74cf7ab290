"""Semantic tests for the round-5 additions: the SemDeDup threshold
sweep, the probe calibration bins, the deterministic bootstrap CI, and
the bucketed-layout aggregation — each asserting the operator's defining
invariant against an independent recomputation."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from cloud_data_sync_spark.registry import all_queries

    return all_queries()[name].fn(spark, SF).collect()


def test_semdedup_sweep_is_monotone_and_anchored(spark):
    from cloud_data_sync_spark.registry import all_queries

    rows = sorted(_run(spark, "q_semdedup_sweep"), key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == [0.4, 0.5, 0.6, 0.7, 0.8]
    # tightening the threshold can only shrink pairs and drops
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_dropped >= b.n_dropped
    # the 0.4 row must agree with the q_semdedup keep-policy totals
    sem = _run(spark, "q_semdedup")
    assert rows[0].n_dropped == sum(r.n_dropped for r in sem)
    assert rows[0].n_vecs == sum(r.n_vecs for r in sem)
    # and with the raw pair count at the emission floor
    pairs = all_queries()["q_dedup_embedding"].fn(spark, SF).count()
    assert rows[0].n_pairs == pairs
    for r in rows:
        assert abs(r.drop_frac - math.floor(r.n_dropped / r.n_vecs * 1e6) / 1e6) < 1e-12


def test_calibration_bins_partition_the_scored_set(spark):
    from cloud_data_sync_spark.operators.ml import _probe_pipeline

    rows = _run(spark, "q_logreg_calibration")
    _, s2 = _probe_pipeline(spark, SF)
    scored = s2.select("y", "p2").collect()
    assert sum(r.n for r in rows) == len(scored)
    # recompute each bin independently
    by_bin: dict[int, list] = {}
    for s in scored:
        by_bin.setdefault(min(int(s.p2 * 10), 9), []).append(s)
    assert sorted(by_bin) == sorted(r.bin for r in rows)
    for r in rows:
        members = by_bin[r.bin]
        assert r.n == len(members)
        avg_p = sum(m.p2 for m in members) / len(members)
        assert abs(r.avg_pred - math.floor(avg_p * 1e4) / 1e4) < 1e-9
        frac = sum(m.y for m in members) / len(members)
        assert abs(r.frac_pos - math.floor(frac * 1e6) / 1e6) < 1e-9
        # bin membership: mean prediction lies inside the bin's interval
        assert r.bin / 10 - 1e-9 <= r.avg_pred <= (r.bin + 1) / 10 + 1e-9


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    import hashlib

    from cloud_data_sync_spark.tables import load_table

    (row,) = _run(spark, "q_bootstrap_ci")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).collect()
    assert row.n_rows == len(li)
    assert row.n_resamples == 32
    mu = sum(r.l_extendedprice for r in li) / len(li)
    assert abs(row.point_est - math.floor(mu * 1e4) / 1e4) < 1e-6
    assert row.ci_lo < row.point_est < row.ci_hi
    assert row.boot_sd > 0
    # CI width is symmetric by construction (normal approximation)
    assert abs((row.ci_hi - row.point_est) - (row.point_est - row.ci_lo)) < 1e-3
    # the resampler is the documented md5-byte-window Poisson surrogate:
    # replay resample r=1 (chunk 0, parse window 0, byte 0 — i.e. the
    # digest's FIRST byte) in pure Python and check its weighted mean is
    # plausible (within 5 sd of the point estimate)
    from cloud_data_sync_spark.operators.analytics import _POIS8

    tot_w = tot_wx = 0
    for r in li:
        key = f"{r.l_orderkey}-{r.l_linenumber}#0".encode()
        v = int(hashlib.md5(key).hexdigest()[:2], 16)
        w = next(
            (i for i, t in enumerate(_POIS8) if v < t), len(_POIS8)
        )
        tot_w += w
        tot_wx += w * r.l_extendedprice
    m1 = tot_wx / tot_w
    assert abs(m1 - mu) < 5 * (row.boot_sd + 1)


def test_agg_bucketed_matches_raw_aggregation(spark):
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.tables import load_table

    rows = _run(spark, "q_agg_bucketed")
    assert len(rows) == 20
    raw = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in raw]
