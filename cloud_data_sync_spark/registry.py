"""Query registry: single source of truth behind ``__spark_entry__.py``.

Every operator in the engine registers a ``QuerySpec`` — a Spark query
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. The driver's correctness gate runs both and
compares row-count + schema + order-insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded identically on both sides;
- double→integer conversions go through ``floor``/``cast`` identically
  (DuckDB CAST rounds, Spark CAST truncates — never rely on bare CAST of a
  fractional double to an integer type);
- NEVER ``round()`` a ratio whose denominator can be of the form 2^a·5^b
  (rank ratios k/n, averages over power-of-ten-ish group sizes): such
  ratios land on EXACT decimal halves where Spark rounds half-up and
  DuckDB half-even (caught at sf0.1: cume_dist over a 640-row partition).
  Use ``floor(x * 1e6) / 1e6`` on both sides — floor has no rounding mode
  and both engines produce bit-identical IEEE doubles for the product.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def floor_ratio(expr, digits: int):
    """Mode-free fixed-point truncation for emitted ratios (see module
    docstring): ``floor(x * 10^d) / 10^d``. Use for ANY ratio whose
    denominator can be dyadic (rank ratios, count fractions, set-overlap
    ratios) — ``round()`` diverges between Spark (half-up) and DuckDB
    (half-even) on the exact decimal halves such ratios produce. The SQL
    twin is ``floor(x * 10^d) / 10^d`` verbatim."""
    from pyspark.sql import functions as F

    p = 10 ** digits
    return F.floor(expr * p) / p

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    # The plan the audit pins. A query whose registered result IS a shared
    # session substrate explains as `Scan ExistingRDD` once the substrate
    # exists — structurally uncheckable. `plan_fn` exposes the substrate's
    # BUILDER pipeline (the plan that actually executes at scale, where
    # the substrate is a written table and every consumer's shape is this
    # one) so tools/plan_audit.py and tests/test_plans.py keep auditing
    # the real shuffle/join structure. None ⇒ audit `fn`'s own plan.
    plan_fn: QueryFn | None = None


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    plan: QueryFn | None = None,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            plan_fn=plan,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register queries.
    from cloud_data_sync_spark import sync  # noqa: F401
    from cloud_data_sync_spark.functions import udfs  # noqa: F401
    from cloud_data_sync_spark.operators import (  # noqa: F401
        analytics,
        bucketed,
        corpus,
        dedup,
        governance,
        maintenance,
        ml,
        multimodal,
        optstats,
        relational,
        similarity,
        text,
        tpch,
    )
    from cloud_data_sync_spark.streaming import (  # noqa: F401
        crawl,
        enrich,
        stateful,
        tws,
        windows,
    )

    return dict(_REGISTRY)
