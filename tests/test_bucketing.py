"""Bucketed co-located join: the 100 TB shuffle-elimination strategy.

Big fact-fact joins shuffle both sides on every run. Bucketing both
tables by the join key at write time pre-partitions them once; every
subsequent join on that key is exchange-free (each task zips bucket i
with bucket i). This test writes orders + customer bucketed by custkey
and proves the join plan contains a SortMergeJoin with NO Exchange.
"""

from __future__ import annotations

import pytest

from cloud_data_sync_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    names = []
    for table, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        name = f"bkt_{table}"
        (
            load_table(spark, SF_DIR, table)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    orders, customer = (spark.table(n) for n in bucketed_tables)
    # forbid broadcast so the test exercises the co-located sort-merge path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).select("o_orderkey", "c_name")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_on_bucket_key_is_exchange_free(spark, bucketed_tables):
    orders = spark.table(bucketed_tables[0])
    agg = orders.groupBy("o_custkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_registered_bucketed_join_plan_is_shuffle_free(spark):
    """q_join_bucketed: the REGISTERED demonstration — whole plan free of
    shuffle Exchange nodes (broadcast dim exchange is the wanted shape)."""
    import re

    from cloud_data_sync_spark.operators.bucketed import q_join_bucketed

    df = q_join_bucketed(spark, SF_DIR)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert not re.search(r"^\(\d+\) Exchange$", plan, re.MULTILINE), plan
    rows = df.collect()
    assert 0 < len(rows) <= 10


def test_bucketed_layout_substrate_reused_within_session(spark):
    from cloud_data_sync_spark.operators import bucketed

    first = bucketed.bucketed_fact_tables(spark, SF_DIR)
    again = bucketed.bucketed_fact_tables(spark, SF_DIR)
    assert first == again
    for name in first.values():
        assert spark.catalog.tableExists(name)
    # a dropped catalog table (fresh session replaying cached names) must
    # trigger a rewrite, not a stale-table read error
    spark.sql(f"DROP TABLE {first['orders']}")
    rebuilt = bucketed.bucketed_fact_tables(spark, SF_DIR)
    assert spark.catalog.tableExists(rebuilt["orders"])
