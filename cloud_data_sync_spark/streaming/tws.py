"""Custom stateful streaming operator via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

Per-user, per-event-type running (count, sum) maintained in **MapState** —
composite per-key state the flat ``GroupState`` tuple of the older API
cannot express without serializing a whole dict into one value. The
processor keys by ``user_id`` and keeps a state map
``event_type -> (n, total)``; each micro-batch updates only the touched
sub-keys and emits superseding rows for them.

This is the incremental per-tenant/per-metric breakdown shape (usage
meters, per-endpoint error counters). Scale notes: state lives in the
state store partitioned by the group key; MapState reads/writes touch
only the sub-keys present in the batch (not the whole map, unlike a
ValueState-of-dict); with unbounded users a TTL on the state
(``ttlDurationMs``) bounds the store. Arrow batches in and out — no
row-at-a-time Python.

Reference parity: the keyed-upsert state family (database.go:346-364)
lifted to two-level keys in Structured Streaming.

ENVIRONMENT GATE: the transformWithState state-server protocol speaks
protobuf between the JVM and the Python driver worker; this container has
no ``google.protobuf``, so the query registers only where the import
succeeds (a real cluster). The processor logic itself is pure
pandas-over-Arrow and is unit-tested against a fake state handle
(tests/test_streaming.py). The composite-state OPERATOR itself does not
wait on protobuf: ``q_stream_per_type_totals`` (stateful.py) delivers
the same per-(user, event_type) accumulators through
``applyInPandasWithState``'s map-typed state column in any environment —
this module remains the Spark-4 API twin whose MapState touches only
the sub-keys present in a batch (the flat-tuple API rewrites the whole
map value per update).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from cloud_data_sync_spark.registry import register
from cloud_data_sync_spark.streaming.runner import (
    keep_first,
    read_events_stream,
    run_available_now,
)

TWS_OUT_SCHEMA = "user_id long, event_type string, n_events long, total_value double"


class PerTypeTotals(StatefulProcessor):
    """MapState processor: event_type -> (n, total) per user key."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._per_type = handle.getMapState(
            "per_type", "event_type string", "n long, total double"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        touched: dict[str, tuple[int, float]] = {}
        for pdf in rows:
            if pdf.empty:
                continue
            # 'size' counts ROWS (matching the oracle's count(*)); 'count'
            # would skip null/NaN values and diverge by one per null row.
            # 'sum' skips NaN like SQL sum skips NULL (an all-null group
            # yields 0.0 here vs SQL NULL — acceptable for a non-null
            # value column, noted for reuse). dropna=False: SQL GROUP BY
            # keeps a NULL group; pandas' default silently discards it.
            g = pdf.groupby("event_type", dropna=False)["value"].agg(
                ["size", "sum"]
            )
            for etype, row in g.iterrows():
                n, total = touched.get(etype) or (
                    self._per_type.getValue((etype,)) or (0, 0.0)
                )
                touched[etype] = (int(n + row["size"]), float(total + row["sum"]))
        if not touched:
            return
        for etype, (n, total) in touched.items():
            self._per_type.updateValue((etype,), (n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(touched),
                "event_type": list(touched),
                "n_events": [v[0] for v in touched.values()],
                "total_value": [v[1] for v in touched.values()],
            }
        )

    def close(self) -> None:
        pass


def tws_supported() -> bool:
    """transformWithState needs protobuf for its JVM<->Python state server."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def q_stream_map_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = read_events_stream(spark, sf_dir).select("user_id", "event_type", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=PerTypeTotals(),
        outputStructType=TWS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    drained = run_available_now(
        out,
        "t_stream_map_state",
        output_mode="update",
        # MapState updates emit per input batch; timeMode="None" means no
        # timer-driven emission for the terminal no-data batch to fire
        no_data_batch=False,
    )
    return keep_first(
        drained, ["user_id", "event_type"], [F.desc("n_events")]
    ).select(
        "user_id",
        "event_type",
        "n_events",
        F.round("total_value", 2).alias("total_value"),
    )


if tws_supported():  # pragma: no cover - container has no protobuf
    register(
        "q_stream_map_state",
        oracle="""
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id, event_type
""",
        doc=(
            "Custom stateful streaming via transformWithStateInPandas "
            "(the Spark-4 stateful-processor API): per-user MapState "
            "keyed by event_type accumulates (count, sum) across "
            "micro-batches, emitting superseding rows per touched "
            "sub-key. Update-mode drain keeps each (user, type)'s final "
            "row (max n_events — counts are monotone). The dedup window "
            "partitions by the same two keys the state uses — one "
            "exchange, no global sort."
        ),
    )(q_stream_map_state)
