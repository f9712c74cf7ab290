"""Round-16 operators: the persisted ANN index layout, the IVF
operating-point sweep, and the index balance audit."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from cloud_data_sync_spark.session import get_spark

    return get_spark("test-round16")


def test_ann_layout_written_once_and_covering(spark):
    """The layout is written once per (session, sf_dir, vintage): a second
    call returns the same catalog names without rewriting, and the index
    is a COVERING row set (vec_id, v, nrm, cell, codes) equal in count to
    the non-degenerate corpus."""
    from cloud_data_sync_spark.operators.similarity import (
        _vectors,
        ann_index_tables,
    )

    n1 = ann_index_tables(spark, SF_DIR)
    n2 = ann_index_tables(spark, SF_DIR)
    assert n1 == n2
    for name in n1.values():
        assert spark.catalog.tableExists(name)
    idx = spark.table(n1["index"])
    assert set(idx.columns) == {"vec_id", "v", "nrm", "cell", "codes"}
    assert idx.count() == _vectors(spark, SF_DIR).count()
    # bucketed layout: the catalog entry carries the bucket spec
    ddl = spark.sql(f"DESCRIBE EXTENDED {n1['index']}").collect()
    info = {r.col_name: r.data_type for r in ddl}
    assert "Num Buckets" in info
    assert "cell" in info.get("Bucket Columns", "")


def test_ivf_sweep_monotone_and_consistent_with_recall_audit(spark):
    """The sweep is a valid recall-vs-cost curve: recall and candidate
    counts are non-decreasing in probe depth, the full-depth recall is
    1.0 (all cells probed == brute force membership), and the row at
    r = N_PROBE reproduces q_sim_ivf_recall's numbers exactly — the
    sweep and the fixed-point audit cannot disagree."""
    from cloud_data_sync_spark.operators.similarity import (
        N_PROBE,
        q_sim_ivf_recall,
        q_sim_ivf_sweep,
    )

    rows = sorted(
        q_sim_ivf_sweep(spark, SF_DIR).collect(), key=lambda r: r.n_probe
    )
    assert rows, "sweep must emit one row per probe depth"
    recalls = [r.recall for r in rows]
    cands = [r.mean_candidates for r in rows]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)
    assert rows[-1].recall == pytest.approx(1.0)
    fixed = q_sim_ivf_recall(spark, SF_DIR).collect()[0]
    at_nprobe = [r for r in rows if r.n_probe == N_PROBE][0]
    assert at_nprobe.n_true == fixed.n_true
    assert at_nprobe.n_caught == fixed.n_caught
    assert at_nprobe.recall == pytest.approx(fixed.recall)
    for r in rows:
        assert 0 <= r.corpus_frac <= 1


def test_index_stats_accounting(spark):
    """Seeds partition into populated + empty cells; the mean cell size
    times populated cells reconstructs the corpus count."""
    from cloud_data_sync_spark.operators.similarity import (
        _vectors,
        q_sim_index_stats,
    )

    row = q_sim_index_stats(spark, SF_DIR).collect()[0]
    assert row.n_seeds == row.n_cells + row.n_empty_cells
    assert row.min_cell <= row.mean_cell <= row.max_cell
    n = _vectors(spark, SF_DIR).count()
    assert row.mean_cell * row.n_cells == pytest.approx(n, abs=row.n_cells)
    assert 0 < row.max_cell_frac <= 1


def test_sweep_on_clustered_corpus_saturates_early(spark, tmp_path):
    """On a tightly 4-clustered corpus the true neighbors concentrate in
    the query's own cell region, so recall saturates to 1.0 well before
    full depth — the curve a REAL embedding corpus produces, and the
    evidence basis for choosing a small N_PROBE."""
    import numpy as np
    import pandas as pd

    from cloud_data_sync_spark.operators.similarity import q_sim_ivf_sweep

    rng = np.random.default_rng(7)
    centers = [rng.normal(0, 1, 64) for _ in range(4)]
    rows = []
    for i in range(100, 900):
        c = centers[i % 4]
        rows.append(
            (
                i,
                str(i % 4),
                (c + rng.normal(0, 0.005, 64)).astype("float32").tolist(),
            )
        )
    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(rows, columns=["vec_id", "label", "embedding"]).to_parquet(
        sf / "embeddings.parquet", index=False
    )
    out = sorted(
        q_sim_ivf_sweep(spark, str(sf)).collect(), key=lambda r: r.n_probe
    )
    full_depth = len(out)
    first_perfect = next(r.n_probe for r in out if r.recall >= 1.0)
    assert first_perfect < full_depth, (
        "clustered corpus must saturate recall before probing every cell"
    )
    # cost axis: the saturating depth touches less than the whole corpus
    sat = [r for r in out if r.n_probe == first_perfect][0]
    assert sat.corpus_frac < 1.0


def test_compaction_plan_over_real_listing(spark, tmp_path):
    """compaction_plan is generic over the REAL listing substrate: a
    list_objects catalog of an actual directory tree packs correctly —
    bins never exceed target + one file, totals reconcile, and a prefix
    of many tiny files projects a large reduction."""
    from cloud_data_sync_spark.operators.maintenance import compaction_plan
    from cloud_data_sync_spark.sources.listing import list_objects

    root = tmp_path / "bucket"
    small = root / "logs"
    big = root / "data"
    small.mkdir(parents=True)
    big.mkdir(parents=True)
    for i in range(40):
        (small / f"part_{i:03d}.log").write_bytes(b"x" * 100)
    for i in range(3):
        (big / f"blob_{i}.bin").write_bytes(b"y" * 5000)
    listing = list_objects(spark, f"file://{root}")
    out = {
        r.prefix: r
        for r in compaction_plan(listing, target_bytes=1000).collect()
    }
    logs = out["logs"]
    assert logs.n_files == 40
    assert logs.total_bytes == 4000
    assert logs.n_bins == 4  # 40 x 100 B into 1000 B bins
    assert logs.max_bin_bytes == 1000
    assert logs.reduction_frac == 0.9
    data = out["data"]
    assert data.n_files == 3
    # each 5000 B file spans past the target: next-fit gives it its own
    # start-offset bin (oversize files are never merged)
    assert data.n_bins == 3


def test_compaction_plan_deterministic_and_reconciles(spark):
    """The registered synthetic inventory: totals reconcile with orders
    and repeated runs are identical (window ordering is pinned)."""
    from cloud_data_sync_spark.operators.maintenance import q_compaction_plan
    from cloud_data_sync_spark.tables import load_table

    a = sorted(map(tuple, q_compaction_plan(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q_compaction_plan(spark, SF_DIR).collect()))
    assert a == b
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r[1] for r in a) == n_orders
    for r in a:
        assert r[5] <= r[1]  # n_bins <= n_files


def test_band_sweep_nesting_invariants(spark):
    """Band layouts nest (a (b,r) band is a union of (2b,r/2) bands), so
    candidate and caught counts must be monotone in band count; and any
    above-threshold pair (>=8 of 16 lanes) must collide under 16x1, so
    that layout's recall is exactly 1.0."""
    from cloud_data_sync_spark.operators.dedup import q_dedup_band_sweep

    rows = {r.bands: r for r in q_dedup_band_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 4, 8, 16}
    n_pairs = {r.n_pairs for r in rows.values()}
    assert len(n_pairs) == 1  # one shared pair population
    for coarse, fine in [(1, 2), (2, 4), (4, 8), (8, 16)]:
        assert rows[coarse].n_candidates <= rows[fine].n_candidates
        assert rows[coarse].n_caught <= rows[fine].n_caught
    assert rows[16].recall == 1.0
    assert rows[16].n_caught == rows[16].n_above


def test_logreg_auc_matches_bruteforce(spark):
    """The distributed Mann-Whitney AUC equals the O(n^2) definitional
    AUC (ties counted 1/2) computed driver-side on the same scores."""
    from cloud_data_sync_spark.operators.ml import (
        _probe_pipeline,
        q_logreg_auc,
    )

    got = q_logreg_auc(spark, SF_DIR).collect()[0]
    _, s2 = _probe_pipeline(spark, SF_DIR)
    pts = [(r.m2, r.y) for r in s2.select("m2", "y").collect()]
    pos = [m for m, y in pts if y == 1.0]
    neg = [m for m, y in pts if y == 0.0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    import math

    expect = math.floor(wins / (len(pos) * len(neg)) * 1e6) / 1e6
    assert got.auc == expect
    assert 0.5 < got.auc <= 1.0  # the probe must actually rank


def test_retention_plan_monotone_in_horizon(spark):
    """Per prefix: totals are horizon-invariant, expired counts/bytes
    shrink as the horizon grows, and fractions stay in [0, 1]."""
    from collections import defaultdict

    from cloud_data_sync_spark.operators.maintenance import q_retention_plan

    by_prefix = defaultdict(dict)
    for r in q_retention_plan(spark, SF_DIR).collect():
        by_prefix[r.prefix][r.horizon_days] = r
    assert len(by_prefix) == 8
    for rows in by_prefix.values():
        assert set(rows) == {30, 90, 365}
        assert len({r.n_total for r in rows.values()}) == 1
        assert rows[30].n_expired >= rows[90].n_expired >= rows[365].n_expired
        assert (
            rows[30].bytes_expired
            >= rows[90].bytes_expired
            >= rows[365].bytes_expired
        )
        for r in rows.values():
            assert 0 <= r.bytes_frac <= 1
            assert r.bytes_expired <= r.bytes_total
