"""Round-17 operators: governance (k-anonymity, deletion propagation,
coherent sampling) — invariants beyond the oracle hash match."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from cloud_data_sync_spark.session import get_spark

    return get_spark("test-round17")


def test_k_anonymity_monotone_in_k(spark):
    """Rows/classes below k are non-decreasing in k; totals and min_l are
    k-invariant; risk_frac in [0, 1]."""
    from cloud_data_sync_spark.operators.governance import q_k_anonymity

    rows = sorted(q_k_anonymity(spark, SF_DIR).collect(), key=lambda r: r.k)
    assert [r.k for r in rows] == [2, 5, 10, 25]
    assert len({(r.n_classes, r.n_rows, r.min_l) for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert a.classes_below_k <= b.classes_below_k
        assert a.rows_below_k <= b.rows_below_k
    for r in rows:
        assert 0.0 <= r.risk_frac <= 1.0
        assert r.rows_below_k <= r.n_rows
        assert r.min_l >= 1


def test_forget_plan_cascade_consistent(spark):
    """The cascade is internally consistent: affected counts equal direct
    recomputation through the victim set, and fractions match counts."""
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.governance import (
        FORGET_BUCKET_LT,
        bucket16,
        q_forget_plan,
    )
    from cloud_data_sync_spark.tables import load_table

    got = {r.tbl: r for r in q_forget_plan(spark, SF_DIR).collect()}
    assert set(got) == {"customer", "orders", "lineitem"}

    victims = (
        load_table(spark, SF_DIR, "customer")
        .select("c_custkey")
        .filter(bucket16(F.col("c_custkey")) < FORGET_BUCKET_LT)
    )
    n_vic = victims.count()
    assert got["customer"].n_affected == n_vic
    o = load_table(spark, SF_DIR, "orders")
    o_aff = o.join(victims, o.o_custkey == victims.c_custkey, "left_semi")
    assert got["orders"].n_affected == o_aff.count()
    li = load_table(spark, SF_DIR, "lineitem")
    li_aff = li.join(
        o_aff.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_semi",
    )
    assert got["lineitem"].n_affected == li_aff.count()
    for r in got.values():
        assert 0 <= r.n_affected <= r.n_total
        assert abs(r.affected_frac - r.n_affected / r.n_total) < 2e-6


def test_coherent_sample_join_commutes(spark):
    """The defining property: filtering both tables by the same hash of
    the join key commutes with the join — every sampled order's custkey
    is inside the sampled customers (orphans == 0), and the realized
    fractions sit near the 10% design point."""
    from cloud_data_sync_spark.operators.governance import q_sample_coherent

    got = {r.tbl: r for r in q_sample_coherent(spark, SF_DIR).collect()}
    assert set(got) == {"customer", "orders"}
    assert got["orders"].orphans == 0
    assert got["customer"].orphans == 0
    for r in got.values():
        assert 0.02 < r.samp_frac < 0.25  # ~10%, loose at sf0.001
