"""Property-based tests (hypothesis) for the sync core.

The e2e tests pin concrete scenarios; these pin the ALGEBRA: invariants
that must hold for any catalog/state contents, not just the fixtures.
Strategies draw small random catalogs; Spark jobs per example are tiny, so
examples are capped to keep the suite fast.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cloud_data_sync_spark.state import STATE_SCHEMA, upsert
from cloud_data_sync_spark.sync import sync_diff

BASE_TS = datetime(2024, 1, 1)

_names = st.lists(
    st.sampled_from([f"obj{i}.bin" for i in range(6)]), min_size=0, max_size=6, unique=True
)


def _catalog_rows(names: list[str], seed: int) -> list[tuple]:
    return [
        ("m1", n, 10 + i, f"etag{(seed + i) % 3}", BASE_TS + timedelta(minutes=(seed + i) % 4))
        for i, n in enumerate(names)
    ]


CATALOG_SCHEMA = (
    "mapping_id string, object_name string, size long, etag string,"
    " last_modified timestamp"
)


def _state_rows(names: list[str], seed: int) -> list[tuple]:
    return [
        (
            "m1",
            n,
            10 + i,
            BASE_TS + timedelta(minutes=(seed + i) % 4),
            f"etag{(seed + i + 1) % 3}",
            "text/plain",
            BASE_TS + timedelta(hours=1),
            ["success", "failed_get"][(seed + i) % 2],
        )
        for i, n in enumerate(names)
    ]


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(src_names=_names, tgt_names=_names, st_names=_names, seed=st.integers(0, 7))
def test_sync_diff_partitions_the_namespace(spark, src_names, tgt_names, st_names, seed):
    src = spark.createDataFrame(_catalog_rows(src_names, seed), CATALOG_SCHEMA)
    tgt = spark.createDataFrame(_catalog_rows(tgt_names, seed + 1), CATALOG_SCHEMA)
    state = spark.createDataFrame(_state_rows(st_names, seed), STATE_SCHEMA).select(
        "mapping_id", "object_name", "etag", "last_modified", "sync_status"
    )
    plan = sync_diff(src, tgt, state).collect()
    by_action: dict[str, set] = {"copy": set(), "skip": set(), "delete": set()}
    for r in plan:
        by_action[r.action].add(r.object_name)
    # every source object is classified exactly once, as copy or skip
    assert by_action["copy"] | by_action["skip"] == set(src_names)
    assert not (by_action["copy"] & by_action["skip"])
    # deletes are exactly the target-only objects
    assert by_action["delete"] == set(tgt_names) - set(src_names)
    # plan rows = |src| + |tgt \\ src| (no duplicates, no losses)
    assert len(plan) == len(src_names) + len(set(tgt_names) - set(src_names))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(a_names=_names, b_names=_names, seed=st.integers(0, 7))
def test_upsert_idempotent_and_key_unique(spark, a_names, b_names, seed):
    existing = spark.createDataFrame(_state_rows(a_names, seed), STATE_SCHEMA)
    updates = spark.createDataFrame(_state_rows(b_names, seed + 2), STATE_SCHEMA)
    merged = upsert(existing, updates)
    rows = merged.collect()
    # one row per key, keys = union of inputs
    keys = [(r.mapping_id, r.object_name) for r in rows]
    assert len(keys) == len(set(keys))
    assert {k[1] for k in keys} == set(a_names) | set(b_names)
    # applying the same updates again changes nothing (idempotency)
    again = {tuple(r) for r in upsert(merged, updates).collect()}
    assert again == {tuple(r) for r in rows}
    # an update never loses to an equal-or-older existing row
    upd = {(r.mapping_id, r.object_name): r for r in updates.collect()}
    for r in rows:
        k = (r.mapping_id, r.object_name)
        if k in upd and upd[k].last_synced >= (r.last_synced or upd[k].last_synced):
            assert tuple(r) == tuple(upd[k])
