"""Stream enrichment and streaming upsert.

Two production streaming shapes the window/stateful modules don't cover:

- ``q_stream_enrich``: stream⋈static broadcast join — every micro-batch
  joins the live events stream against a small dimension (per-user
  lifetime-value tiers derived from history). The dim broadcasts once; the
  per-batch join is map-only, so enrichment adds zero shuffles to the
  stream. This is the canonical "decorate events with reference data"
  pipeline.
- ``q_stream_upsert``: ``foreachBatch`` latest-wins upsert — each batch
  appends its per-user latest rows to a log directory; the final read
  resolves the global winner per key. Appending instead of
  read-modify-write keeps every batch idempotent-safe (a replayed batch
  adds duplicate log rows; the terminal latest-wins dedup absorbs them) —
  the same union + window-dedup algebra the sync state table uses
  (state.py:57-81), driven from a stream.

Both drain with availableNow and register batch-equivalent oracles, like
every stream query here (windows.py): the streaming plan is real, the
result deterministic.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_data_sync_spark.registry import register
from cloud_data_sync_spark.streaming.runner import (
    keep_first,
    read_events_stream,
)
from cloud_data_sync_spark.tables import load_table

# LTV tier width: users bucket by floor(lifetime_value / 500), capped at 4.
_TIER_WIDTH = 500


@register(
    "q_stream_enrich",
    oracle=f"""
WITH dim AS (
  SELECT user_id,
         least(CAST(floor(sum(value) / {_TIER_WIDTH}) AS BIGINT), 4) AS tier
  FROM events GROUP BY user_id
)
SELECT d.tier, e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 2) AS total_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.tier, e.event_type
""",
    doc=(
        "Stream⋈static enrichment: the live events stream broadcast-joins "
        "a per-user lifetime-value tier dimension (built from history), "
        "then aggregates per (tier, event_type). The static side ships to "
        "executors once; each micro-batch enriches map-only. Complete "
        "mode is scale-safe HERE, unlike the time windows it was removed "
        "from: the aggregation state is one row per (tier, event_type) — "
        "a BOUNDED key domain (5 tiers x a fixed type vocabulary) that "
        "does not grow with stream length, the textbook case where "
        "complete mode is the right output mode."
    ),
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # drains concurrently with the window family (windows._window_family):
    # same conf profile (default partitions, terminal batch on), same one
    # input vintage — a third concurrent drain on the shared pass
    from cloud_data_sync_spark.streaming.windows import _window_family

    return _window_family(spark, sf_dir)[0]["enrich"]


def build_enrich_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming enrich plan: live events broadcast-join the per-user
    LTV tier dim (built from history), aggregated per (tier, event_type)."""
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.least(
                F.floor(F.sum("value") / _TIER_WIDTH).cast("bigint"), F.lit(4)
            ).alias("tier")
        )
    )
    enriched = read_events_stream(spark, sf_dir).join(F.broadcast(dim), "user_id")
    return enriched.groupBy("tier", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "q_stream_upsert",
    oracle="""
SELECT user_id, event_id, event_type, round(value, 2) AS value
FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    doc=(
        "foreachBatch streaming upsert: each micro-batch reduces to its "
        "per-user latest row (ts desc, event_id desc) and APPENDS to a "
        "parquet log; the terminal read resolves the cross-batch winner "
        "with the same window dedup. Append + terminal-dedup keeps batch "
        "replays harmless — the streaming twin of the state table's "
        "latest-wins upsert (state.py:57-81)."
    ),
)
def q_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom-sink member of the stateful family: the foreachBatch drain
    # runs concurrently with the applyInPandasWithState drains in ONE
    # group pass, cached per (session, events vintage)
    from cloud_data_sync_spark.streaming.stateful import _stateful_family

    return _stateful_family(spark, sf_dir)[0]["upsert"]


def build_upsert_member(spark: SparkSession, sf_dir: str):
    """(starter, finalize) pair for the stateful family's custom-sink
    slot (runner.drained_family output_mode='custom').

    Stable per-(process, session, sf_dir) log dir, wiped when the family
    REBUILDS (cache miss — fresh session or new events vintage); cache
    hits keep serving the already-resolved frame over the same log. The
    pid component keeps two concurrent processes (which CAN collide on
    hash((id(spark), ...)) under a pinned PYTHONHASHSEED) from
    rmtree-ing each other's live log."""
    log_dir = os.path.join(
        tempfile.gettempdir(),
        f"stream_upsert_log_{os.getpid()}_{abs(hash((id(spark), sf_dir)))}",
    )
    shutil.rmtree(log_dir, ignore_errors=True)
    latest = (["user_id"], [F.col("ts").desc(), F.col("event_id").desc()])

    def upsert_batch(batch: DataFrame, epoch_id: int) -> None:
        keep_first(batch, *latest).write.mode("append").parquet(log_dir)

    def starter(ckpt: str):
        return (
            read_events_stream(spark, sf_dir)
            .writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def finalize() -> DataFrame:
        if not os.path.isdir(log_dir):
            # zero micro-batches executed (no file matched the source
            # glob): name the real problem instead of a PATH_NOT_FOUND
            raise RuntimeError(
                f"stream upsert drained zero batches from {sf_dir!r} — no "
                "events file matched the stream source; nothing was upserted"
            )
        log = spark.read.parquet(log_dir)
        return keep_first(log, *latest).select(
            "user_id",
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
        )

    return starter, finalize
