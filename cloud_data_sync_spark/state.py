"""Sync-state table: the Spark-native replacement for the reference's SQLite
``file_metadata`` table (database.go:144-157 DDL, 346-364 upsert).

Layout: Parquet partitioned by ``mapping_id``. That single choice replaces
the reference's composite index (database.go:156-157) — partition pruning
makes per-mapping scans free — and with
``spark.sql.sources.partitionOverwriteMode=dynamic`` an upsert rewrites only
the partitions it touches, giving batch-level atomicity per mapping.

Upsert semantics (INSERT .. ON CONFLICT(mapping_id, object_name) DO UPDATE):
union + window-dedup, latest ``last_synced`` wins, deterministic tiebreak on
status then etag. At 100 TB the window shuffles only the state table (a
metadata table: ~100 bytes/object), never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

STATE_SCHEMA = StructType(
    [
        StructField("mapping_id", StringType(), False),
        StructField("object_name", StringType(), False),
        StructField("size", LongType(), True),
        StructField("last_modified", TimestampType(), True),
        StructField("etag", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("last_synced", TimestampType(), True),
        StructField("sync_status", StringType(), True),
    ]
)

KEYS = ["mapping_id", "object_name"]


def empty_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], STATE_SCHEMA)


def load_state(spark: SparkSession, path: str) -> DataFrame:
    """Load the state table, or an empty frame if it doesn't exist yet."""
    try:
        return spark.read.schema(STATE_SCHEMA).parquet(path)
    except Exception:  # noqa: BLE001 - missing path on first run
        return empty_state(spark)


def upsert(existing: DataFrame, updates: DataFrame) -> DataFrame:
    """Latest-wins merge on (mapping_id, object_name).

    Ties on ``last_synced`` resolve updates-first via a priority column, then
    deterministically on (sync_status, etag) — the idempotency requirement
    from SURVEY.md §7 risk register.
    """
    tagged_new = updates.select(*STATE_SCHEMA.fieldNames()).withColumn(
        "_prio", F.lit(1)
    )
    tagged_old = existing.select(*STATE_SCHEMA.fieldNames()).withColumn(
        "_prio", F.lit(0)
    )
    w = Window.partitionBy(*KEYS).orderBy(
        F.desc_nulls_last("last_synced"),
        F.desc("_prio"),
        F.asc_nulls_last("sync_status"),
        F.asc_nulls_last("etag"),
    )
    return (
        tagged_new.unionByName(tagged_old)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def delete_keys(state: DataFrame, gone: DataFrame) -> DataFrame:
    """DELETE FROM file_metadata WHERE key IN gone — as an anti-join
    (database.go:405-415 ≙ sync.go:226-229 delete phase)."""
    return state.join(gone.select(*KEYS), on=KEYS, how="left_anti")


def save_state(state: DataFrame, path: str) -> None:
    """Rewrite touched mapping_id partitions only (dynamic overwrite)."""
    (
        state.repartition("mapping_id")
        .write.mode("overwrite")
        .partitionBy("mapping_id")
        .parquet(path)
    )


def state_for_mapping(state: DataFrame, mapping_id: str) -> DataFrame:
    """Partition-pruned per-mapping scan (ListFileMetadataByMapping,
    database.go:366-403)."""
    return state.filter(F.col("mapping_id") == mapping_id)
