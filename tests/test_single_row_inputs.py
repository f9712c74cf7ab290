"""Single-row-input robustness: EVERY registered query vs its DuckDB
oracle on one-row tables.

The boundary between empty and plural — where (n-1) denominators vanish,
sample variances are undefined, leave-one-out folds have nothing left
out, train splits can be empty while test isn't, and referential joins
dangle (row 1 of orders need not reference row 1 of customer). The r9
enrollment probe of all 254 keys caught SIX defects this gate now pins:
four ANSI job-killers (q_bootstrap_ci all-zero Poisson weight columns,
q_corpus_dsir zero target-token mass, q_heaps_law single-point OLS,
q_target_encode empty leave-one-out folds — all now try_divide) and two
divergences (q_pivot leaving absent COUNT cells NULL where count(*)
FILTER semantics say 0; q_gaussian_nb emitting NULL predictions from an
empty train split where the oracle's model join correctly yields no
rows).
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from cloud_data_sync_spark.registry import all_queries
from cloud_data_sync_spark.tables import TABLE_NAMES, table_path

from tests.test_adversarial_corpus import SF_SRC, _norm


@pytest.fixture(scope="module")
def one_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("one_sf"))
    for name in TABLE_NAMES:
        t = pq.read_table(table_path(SF_SRC, name))
        pq.write_table(t.slice(0, 1), table_path(d, name))
    return d


@pytest.fixture(scope="module")
def one_duck(one_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(one_dir, t)}')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark():
    from cloud_data_sync_spark.session import get_spark

    return get_spark("test-single-row")


@pytest.mark.parametrize("key", sorted(all_queries()))
def test_matches_oracle_on_single_row_tables(spark, one_dir, one_duck, key):
    spec = all_queries()[key]
    sdf = spec.fn(spark, one_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    orel = one_duck.execute(spec.oracle)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _norm(srows, scols) == _norm(orows, ocols)
