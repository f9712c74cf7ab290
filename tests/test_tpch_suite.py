"""Semantic invariants for the completed TPC-H suite (operators/tpch.py).

The DuckDB oracle gate proves value equality; these tests pin the
*semantics* that survive a data refresh — bound checks, ordering, class
vocabularies, and cross-query consistency — at sf0.001 so CI stays fast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloud_data_sync_spark.registry import all_queries
from cloud_data_sync_spark.tables import load_table

SF = "/root/testdata/sf0.001"

PRIORITIES = {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"}


def _run(spark, name):
    return all_queries()[name].fn(spark, SF)


def test_priority_counts_partition_the_window(spark):
    rows = _run(spark, "q_tpch_priority").collect()
    assert {r.o_orderpriority for r in rows} <= PRIORITIES
    assert all(r.order_count > 0 for r in rows)
    # semi-join can only shrink: total counted orders <= orders in window
    window_orders = (
        load_table(spark, SF, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .count()
    )
    assert sum(r.order_count for r in rows) <= window_orders


def test_forecast_revenue_is_a_subset_sum(spark):
    row = _run(spark, "q_tpch_forecast").collect()[0]
    all_rev = (
        load_table(spark, SF, "lineitem")
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
        .collect()[0][0]
    )
    assert 0.0 <= row.revenue <= all_rev + 0.01


def test_nationtrade_pairs_and_years(spark):
    rows = _run(spark, "q_tpch_nationtrade").collect()
    for r in rows:
        assert {r.supp_nation, r.cust_nation} == {"NATION_1", "NATION_2"}
        assert r.supp_nation != r.cust_nation
        assert r.l_year in (1996, 1997)
        assert r.revenue > 0


def test_mktshare_is_a_proper_fraction(spark):
    rows = _run(spark, "q_tpch_mktshare").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert 1995 <= r.o_year <= 2001


def test_profit_groups_are_nation_year(spark):
    rows = _run(spark, "q_tpch_profit").collect()
    assert rows
    for r in rows:
        assert r.nation.startswith("NATION_")
        assert 1995 <= r.o_year <= 2001


def test_returns_topk_is_sorted_and_capped(spark):
    rows = _run(spark, "q_tpch_returns").collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # tiebreak: equal revenues ordered by custkey ascending
    for a, b in zip(rows, rows[1:]):
        if a.revenue == b.revenue:
            assert a.c_custkey < b.c_custkey


def test_promo_share_is_a_percentage(spark):
    row = _run(spark, "q_tpch_promo").collect()[0]
    assert 0.0 <= row.promo_revenue <= 100.0


def test_topsupplier_matches_independent_max(spark):
    rows = _run(spark, "q_tpch_topsupplier").collect()
    assert rows
    best = (
        load_table(spark, SF, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
        .agg(F.max("rev"))
        .collect()[0][0]
    )
    for r in rows:
        assert r.total_revenue == best


def test_partsuppliers_classes_and_counts(spark):
    rows = _run(spark, "q_tpch_partsuppliers").collect()
    assert rows
    n_suppliers = load_table(spark, SF, "supplier").count()
    for r in rows:
        assert r.p_brand != "Brand#5"
        assert r.p_size in (1, 14, 23, 45)
        assert 1 <= r.supplier_cnt <= n_suppliers


def test_smallqty_below_unfiltered_brand_revenue(spark):
    row = _run(spark, "q_tpch_smallqty").collect()[0]
    part = load_table(spark, SF, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, SF, "lineitem")
    brand_rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.sum("l_extendedprice"))
        .collect()[0][0]
    )
    assert 0.0 <= row.avg_yearly <= (brand_rev or 0.0) / 7.0 + 0.01


def test_brackets_single_nonnegative_row(spark):
    rows = _run(spark, "q_tpch_brackets").collect()
    assert len(rows) == 1
    assert rows[0].revenue is None or rows[0].revenue >= 0.0


def test_priorityclass_partitions_window_lines(spark):
    rows = _run(spark, "q_tpch_priorityclass").collect()
    assert {r.l_returnflag for r in rows} <= {"A", "N", "R"}
    window_lines = (
        load_table(spark, SF, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .count()
    )
    # every window line has an order (FK integrity), so the class counts
    # partition the window exactly
    assert sum(r.high_line_count + r.low_line_count for r in rows) == window_lines


def test_minsupplier_keeps_per_part_minimum(spark):
    rows = _run(spark, "q_tpch_minsupplier").collect()
    if not rows:  # size-15 x EUROPE may be empty at tiny sf
        return
    by_part: dict[int, list] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r)
    for grp in by_part.values():
        # ties all share the same (minimal) balance
        assert len({r.s_acctbal for r in grp}) == 1


def test_importance_keeps_only_heavy_parts(spark):
    rows = _run(spark, "q_tpch_importance").collect()
    if not rows:
        return
    total_kept = sum(r.value for r in rows)
    # every kept part exceeds 2x the mean part value, so fewer than half
    # the parts can qualify and each kept value is positive
    n_parts = load_table(spark, SF, "part").count()
    assert len(rows) < n_parts / 2
    assert all(r.value > 0 for r in rows)
    assert total_kept > 0


def test_excess_is_a_strict_supplier_subset(spark):
    rows = _run(spark, "q_tpch_excess").collect()
    n_sup = load_table(spark, SF, "supplier").count()
    # the volume floor makes the filter discriminating, never vacuous
    assert len(rows) < n_sup
    assert len({r.s_suppkey for r in rows}) == len(rows)


def test_waiting_topk_sorted_and_sole_fault_semantics(spark):
    rows = _run(spark, "q_tpch_waiting").collect()
    assert len(rows) <= 10
    counts = [r.numwait for r in rows]
    assert counts == sorted(counts, reverse=True)
    for a, b in zip(rows, rows[1:]):
        if a.numwait == b.numwait:
            assert a.s_name < b.s_name
