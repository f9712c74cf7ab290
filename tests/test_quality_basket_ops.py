"""Semantic tests for the basket-similarity / data-quality / lateness
operators added in round 5: item-item co-occurrence cosine (and the
shared basket substrates behind it), the Deequ-style expectations suite,
and the watermark-lateness audit — each checked against an independent
pure-Python recomputation."""

from __future__ import annotations

import math
from collections import defaultdict

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from cloud_data_sync_spark.registry import all_queries

    return all_queries()[name].fn(spark, SF).collect()


def _baskets(spark):
    from cloud_data_sync_spark.tables import load_table

    rows = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict[int, set] = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    return baskets


def _pair_supports(baskets, min_item_sup):
    support: dict[int, int] = defaultdict(int)
    for items in baskets.values():
        for it in items:
            support[it] += 1
    frequent = {it for it, s in support.items() if s >= min_item_sup}
    pairs: dict[tuple, int] = defaultdict(int)
    for items in baskets.values():
        kept = sorted(it for it in items if it in frequent)
        for i, a in enumerate(kept):
            for b in kept[i + 1:]:
                pairs[(a, b)] += 1
    return support, pairs


def test_item_cosine_matches_pure_python(spark):
    from cloud_data_sync_spark.operators.ml import (
        _COS_MIN_PAIR,
        _PAIR_MIN_ITEM_SUP,
        _PAIR_TOPK,
    )

    rows = _run(spark, "q_item_cosine")
    support, pairs = _pair_supports(_baskets(spark), _PAIR_MIN_ITEM_SUP)
    scored = sorted(
        (
            (
                -math.floor(n / math.sqrt(support[a] * support[b]) * 1e6)
                / 1e6,
                a,
                b,
                n,
            )
            for (a, b), n in pairs.items()
            if n >= _COS_MIN_PAIR
        ),
    )[:_PAIR_TOPK]
    assert len(rows) == len(scored)
    for r, (neg_cos, a, b, n) in zip(rows, scored):
        assert (r.item_a, r.item_b, r.pair_support) == (a, b, n)
        assert (r.sup_a, r.sup_b) == (support[a], support[b])
        assert abs(r.cosine - (-neg_cos)) < 1e-9
        # cosine of binary incidence vectors is bounded
        assert 0.0 < r.cosine <= 1.0


def test_itemset_pairs_substrate_matches_direct_builder(spark):
    from cloud_data_sync_spark.operators.ml import (
        _basket_pairs_build,
        _item_support_build,
    )

    direct = {
        (r.item_a, r.item_b): r.pair_support
        for r in _basket_pairs_build(
            spark, SF, _item_support_build(spark, SF)
        ).collect()
    }
    cached = {
        (r.item_a, r.item_b): r.pair_support
        for r in __import__(
            "cloud_data_sync_spark.operators.ml", fromlist=["basket_pairs"]
        ).basket_pairs(spark, SF).collect()
    }
    assert direct == cached


def test_expectations_suite_metrics_and_verdicts(spark):
    from cloud_data_sync_spark.tables import load_table

    rows = {r.check_name: r for r in _run(spark, "q_expectations")}
    orders = load_table(spark, SF, "orders").collect()
    cust = {
        r.c_custkey
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    }
    n = len(orders)
    expected = {
        "completeness_custkey": (
            sum(o.o_custkey is not None for o in orders) / n,
            0.99,
        ),
        "uniqueness_orderkey": (
            len({o.o_orderkey for o in orders}) / n,
            1.0,
        ),
        "positive_totalprice": (
            sum(o.o_totalprice > 0 for o in orders) / n,
            1.0,
        ),
        "accepted_status_values": (
            sum(o.o_orderstatus in ("O", "F", "P") for o in orders) / n,
            1.0,
        ),
        "orderdate_in_range": (
            sum(
                o.o_orderdate.year >= 1992 and o.o_orderdate.year <= 1998
                for o in orders
            )
            / n,
            1.0,
        ),
        "referential_custkey": (
            1.0 - sum(o.o_custkey not in cust for o in orders) / n,
            1.0,
        ),
    }
    assert sorted(rows) == sorted(expected)
    for name, (metric, threshold) in expected.items():
        r = rows[name]
        assert abs(r.metric - math.floor(metric * 1e6) / 1e6) < 1e-9
        assert r.threshold == threshold
        assert r.passed == int(metric >= threshold)


def test_late_events_matches_pure_python_frontier_walk(spark):
    from cloud_data_sync_spark.tables import load_table

    rows = {r.event_type: r for r in _run(spark, "q_late_events")}
    events = load_table(spark, SF, "events").select(
        "event_type", "event_id", "ts"
    ).collect()
    by_type: dict[str, list] = defaultdict(list)
    for e in events:
        by_type[e.event_type].append((e.event_id, e.ts))
    assert sorted(rows) == sorted(by_type)
    for etype, seq in by_type.items():
        seq.sort()
        frontier = None
        lats = []
        for _, ts in seq:
            frontier = ts if frontier is None or ts > frontier else frontier
            lats.append((frontier - ts).total_seconds())
        r = rows[etype]
        assert r.n_events == len(lats)
        assert r.ooo_count == sum(x > 0 for x in lats)
        assert abs(
            r.ooo_frac - math.floor(r.ooo_count / len(lats) * 1e6) / 1e6
        ) < 1e-9
        assert abs(r.max_lateness_s - math.floor(max(lats) * 1e6) / 1e6) < 1e-9
        assert r.late_over_1m == sum(x > 60 for x in lats)
        assert r.late_over_10m == sum(x > 600 for x in lats)
