"""Empty-input robustness: EVERY registered query vs its DuckDB oracle on
zero-row tables (correct schemas, no data).

The ultimate degenerate input — and one every 100 TB pipeline serves up
constantly (an empty partition, a filter that matches nothing, a fresh
source before first ingest, a day with no events). Each key must agree
with its oracle on empty tables; a Spark-only crash is a pipeline-killer
precisely where the pipeline should trivially succeed.

The r9 enrollment probe of all 254 keys caught ELEVEN defects this gate
now pins forever: four job-killing crashes (ANSI DIVIDE_BY_ZERO in
q_dedup_minhash_sweep / q_semdedup_sweep / q_expectations, a DRIVER-side
Python ZeroDivisionError in q_pagerank's 1/N seed) and seven silent
divergences — Spark's sum() over empty input is NULL where the oracles'
count semantics say 0 (q_bloom_prune, q_forget_plan, q_funnel,
q_sample_coherent, q_spend_gini), and Spark's Expand-based grouping sets
drop the SQL-mandated grand-total () row on empty input where
DuckDB/Postgres emit it (q_grouping_sets, q_rollup_cube — both now union
an explicit ungrouped aggregate).
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from cloud_data_sync_spark.registry import all_queries
from cloud_data_sync_spark.tables import TABLE_NAMES, table_path

from tests.test_adversarial_corpus import SF_SRC, _norm


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for name in TABLE_NAMES:
        t = pq.read_table(table_path(SF_SRC, name))
        pq.write_table(t.slice(0, 0), table_path(d, name))
    return d


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(empty_dir, t)}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark():
    from cloud_data_sync_spark.session import get_spark

    return get_spark("test-empty-inputs")


@pytest.mark.parametrize("key", sorted(all_queries()))
def test_matches_oracle_on_empty_tables(spark, empty_dir, empty_duck, key):
    spec = all_queries()[key]
    sdf = spec.fn(spark, empty_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    orel = empty_duck.execute(spec.oracle)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _norm(srows, scols) == _norm(orows, ocols)
