"""Event-time windowing over the ``events`` table.

These are the *batch-checkable twins* of the Structured Streaming pipeline in
``streaming/runner.py`` (same ``F.window`` / ``session_window`` expressions
run there under ``readStream`` + watermark). Spark's batch and streaming
window semantics are identical by construction, so the DuckDB oracle verifies
the streaming aggregation logic too — the reference's only "streaming" was a
wall-clock ticker (main.go:85-115); event-time windows + watermarks are the
Spark-native upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_data_sync_spark.registry import register
from cloud_data_sync_spark.tables import load_table


@register(
    "q_stream_tumbling",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""",
    doc=(
        "Tumbling 1-hour event-time windows per event_type over the REAL "
        "file-source stream (readStream, availableNow drain, complete "
        "mode — deterministic full window table, matching the batch "
        "oracle byte-for-byte)."
    ),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL readStream drain (complete mode): the full deterministic window
    # table, byte-identical to the batch twin the oracle computes. Complete
    # mode needs no watermark for a bounded drain (state holds all windows);
    # an unbounded production stream runs append + withWatermark instead —
    # that finalization path is what q_stream_session_native exercises.
    from cloud_data_sync_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=None)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return run_available_now(
        agg, "t_stream_tumbling", output_mode="complete", no_data_batch=False
    )


@register(
    "q_stream_sliding",
    oracle="""
WITH expanded AS (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
           AS window_start,
         value
  FROM events
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM expanded GROUP BY 1
""",
    doc=(
        "Sliding windows (1h long, 30m slide; each event lands in 2 "
        "windows) over the REAL file-source stream, complete-mode "
        "availableNow drain."
    ),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    # REAL readStream drain, complete mode (see q_stream_tumbling)
    from cloud_data_sync_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=None)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )
    return run_available_now(
        agg, "t_stream_sliding", output_mode="complete", no_data_batch=False
    )


@register(
    "q_stream_session",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM gaps
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM sessions GROUP BY user_id, session_id
""",
    doc=(
        "Sessionization with 30-minute inactivity gap (lag-gap form — the "
        "deterministic batch twin of session_window; runner.py runs the real "
        "session_window under a watermark)."
    ),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w_order)
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        # full microsecond precision: cast-to-long truncates to SECONDS,
        # which under-measures a gap like 1800.5s as 1800 and merges
        # sessions the oracle's INTERVAL comparison splits (latent on the
        # seed data, real on any dataset with a gap in (1800s, 1801s])
        F.when(
            prev.isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(prev.cast("timestamp"))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # event_id tiebreaker matches the lag window's ordering — with tied
    # timestamps an ORDER BY ts alone makes session_id nondeterministic.
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def _stream_click_purchase_join(
    spark: SparkSession, sf_dir: str, hours: int, how: str, query_name: str
) -> DataFrame:
    """THE click->purchase stream-stream join used by q_stream_join
    (inner, 6h) and q_stream_left_join (left_outer, 1h): one definition so
    a watermark-delay, range-condition, or gap_sec fix cannot drift
    between the two (the keep_first rationale).

    Single-batch drain: with per-file triggers, a multi-file events dir
    that is not globally time-ordered would let the watermark drop older
    files' rows from join state, diverging from the batch oracle. The
    availableNow terminal no-data batch advances the watermark to
    (joint max - 10min) and flushes finalized left-outer nulls
    deterministically. drain_partitions=2: stream-stream joins run 4
    state stores per side per partition, so fewer partitions win (1 is
    worse: the drain loses all scan/build parallelism).
    """
    from cloud_data_sync_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=None)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {hours} HOURS")
        )
        & (F.col("click_ts") <= F.col("purchase_ts")),
        how,
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (
            (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("gap_sec"),
    )
    return run_available_now(
        joined,
        query_name,
        output_mode="append",
        # 4 state stores per side per partition: 2 partitions measured
        # fastest (2.54 s vs 2.75 s at 4, 4.14 s at 1, sf0.1 left join)
        drain_partitions=2,
        # inner join: every match emits during data batches; the terminal
        # no-data batch only evicts state (oracle-verified identical).
        # left_outer: the terminal batch IS the null-emission flush — keep.
        no_data_batch=(how != "inner"),
    )




@register(
    "q_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_sec
FROM events p
JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts <= p.ts
""",
    doc=(
        "Watermarked stream-stream inner join: purchases joined to the "
        "clicks that preceded them within 6 hours, per user. Runs as a "
        "REAL two-stream join (readStream x2, per-side watermarks; the "
        "event-time range condition lets Spark expire join state past the "
        "bound — without it, stream-stream join state grows forever). "
        "Equi-key user_id keeps the join hash-partitioned; the time bound "
        "is a within-partition filter. Oracle: the equivalent batch "
        "interval join."
    ),
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_click_purchase_join(
        spark, sf_dir, hours=6, how="inner", query_name="t_stream_join"
    )


@register(
    "q_stream_session_native",
    oracle="""
WITH wm AS (
  SELECT max(ts) - INTERVAL 10 MINUTE AS frontier FROM events
),
seq AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
),
agg AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) + INTERVAL 30 MINUTE AS session_end,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 2) AS total_value
  FROM sessions GROUP BY user_id, sid
)
SELECT user_id, session_start, session_end, n_events, total_value
FROM agg, wm WHERE session_end < frontier
""",
    doc=(
        "Native session windows on the REAL stream: readStream + "
        "10-minute watermark + session_window(30 min), append mode — "
        "sessions emit ONLY when the event-time watermark passes their "
        "end, the production finalization path (complete mode cannot "
        "express session windows at all). The oracle encodes the "
        "emission frontier exactly: the availableNow terminal no-data "
        "batch advances the watermark to (max ts - 10 min), and a "
        "session emits iff session_end < frontier STRICTLY (verified on "
        "a boundary fixture where end == frontier stays pending — '<=' "
        "would claim a row Spark holds back). Session semantics mirror "
        "q_session_window_batch: gaps strictly under 30 minutes merge, "
        "reported end = last event + gap. The held-back tail is the "
        "honest cost of append mode on a bounded drain — the same "
        "pending-row accounting q_stream_left_join's oracle does for "
        "outer-join nulls."
    ),
)
def q_stream_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloud_data_sync_spark.streaming.runner import (
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, sf_dir, max_files_per_trigger=None)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    # append mode: the terminal no-data batch IS the finalization flush
    return run_available_now(
        agg, "t_stream_session_native", output_mode="append"
    )


@register(
    "q_session_window_batch",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM seq
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM sessions GROUP BY user_id, sid
""",
    doc=(
        "Native session_window in BATCH mode — the API-parity twin of "
        "q_stream_session's lag-gap formulation, exercising Spark's "
        "built-in session-merging operator outside a stream. Semantics "
        "differences the oracle mirrors exactly: events merge while the "
        "gap is STRICTLY below 30 minutes (the lag-gap twin breaks at "
        "> 1800 s), and the reported window end is last-event + gap, not "
        "last-event. One user_id shuffle; Spark's SessionWindow exec "
        "merges sorted runs per key — the same state machine the "
        "streaming side uses under a watermark."
    ),
)
def q_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_left_join",
    oracle="""
WITH wm AS (
  SELECT least(
           max(CASE WHEN event_type = 'click' THEN ts END),
           max(CASE WHEN event_type = 'purchase' THEN ts END)
         ) - INTERVAL 10 MINUTE AS w
  FROM events
)
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
WHERE c.event_id IS NOT NULL OR p.ts < (SELECT w FROM wm)
""",
    doc=(
        "Watermarked stream-stream LEFT OUTER join — the shape the inner "
        "join (q_stream_join) cannot express: purchases with NO click in "
        "the preceding hour still emit, with nulls, once the watermark "
        "proves no matching click can arrive. Null emission is the hard "
        "part of streaming outer joins: a row is held in state until the "
        "joint watermark (min of both sides' max event time, minus the "
        "10-minute delay) passes its join window, so end-of-stream leaves "
        "the youngest unmatched purchases PENDING, not nulled. The oracle "
        "encodes exactly that finalization frontier — matched rows "
        "unconditionally, null rows only where purchase_ts < joint "
        "watermark — making the stream's visible output, pending "
        "semantics included, batch-checkable (verified row-identical at "
        "sf0.001 and sf0.01, stable across repeated drains). Same state "
        "bounds as the inner join: per-side watermarks + the event-time "
        "range condition expire join state; without them outer-join "
        "state grows forever."
    ),
)
def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_click_purchase_join(
        spark, sf_dir, hours=1, how="left_outer", query_name="t_stream_left_join"
    )
