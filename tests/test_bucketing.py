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


def test_bucket_count_conf_respected_and_exchange_free_at_both(spark):
    """spark.cloud_data_sync.bucket_count parameterizes the layout (r6
    verdict item 6): a non-default count writes a FRESH layout with that
    many buckets, the registered join stays zero-Exchange at both counts,
    and results are layout-independent (identical rows)."""
    from cloud_data_sync_spark.operators import bucketed
    from cloud_data_sync_spark.operators.bucketed import (
        BUCKET_COUNT_CONF,
        q_join_bucketed,
    )

    base_rows = [tuple(r) for r in q_join_bucketed(spark, SF_DIR).collect()]
    base_tables = bucketed.bucketed_fact_tables(spark, SF_DIR)
    spark.conf.set(BUCKET_COUNT_CONF, "4")
    try:
        t4 = bucketed.bucketed_fact_tables(spark, SF_DIR)
        assert t4 != base_tables, "new count must write a fresh layout"
        # catalog metadata carries the requested bucket count
        ddl = spark.sql(
            f"DESCRIBE TABLE EXTENDED {t4['lineitem']}"
        ).collect()
        buckets = [r for r in ddl if r.col_name == "Num Buckets"]
        assert buckets and buckets[0].data_type.strip() == "4"
        import re

        df = q_join_bucketed(spark, SF_DIR)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # broadcast dim exchange is the wanted shape; shuffle Exchange is not
        assert not re.search(r"^\(\d+\) Exchange$", plan, re.MULTILINE), plan
        assert "SortMergeJoin" in plan
        assert [tuple(r) for r in df.collect()] == base_rows
    finally:
        spark.conf.unset(BUCKET_COUNT_CONF)
