"""Data-governance operators: privacy audits, deletion propagation,
and coordination-free coherent sampling.

A 100 TB lake is governed, not just queried. Three primitives every
platform team schedules:

- **k-anonymity / l-diversity audit** (``q_k_anonymity``): before a
  table is shared, measure how identifiable its quasi-identifier
  combinations are. The expensive part at scale is NOT the math — it is
  one hash aggregate over the quasi-identifier tuple (map-side
  combinable; the equivalence-class frame that leaves the shuffle is
  bounded by the QI domain, here nation x segment, never by row count).
- **deletion propagation plan** (``q_forget_plan``): a
  right-to-be-forgotten batch must know the blast radius BEFORE it
  rewrites files — how many rows per table cascade from the victim key
  set. Each fact table is measured in ONE scan via a null-producing
  left join against the (small) key set and a conditional count: no
  second count(*) pass, no row materialization. The victim set
  broadcasts; the orders->lineitem hop is a key-projection join that
  AQE plans by actual size at scale.
- **coherent sampling** (``q_sample_coherent``): dev/staging slices of
  a petabyte lake must preserve referential integrity WITHOUT
  cross-table coordination. Filtering every table by the SAME
  deterministic hash of the JOIN KEY it carries commutes with the join
  (hash(k) < t on both sides of an equi-join samples the join itself),
  so each table is sampled map-only, independently, on different days
  or different clusters — and the audit that proves it (orphan count
  via anti-join) is emitted, not asserted.

All hashes are the engine's portable md5-prefix idiom (see
``q_sample_hash``) so the DuckDB oracles reproduce them bit-for-bit;
at deployment the same plans run on xxhash64 for speed — the contract
is "deterministic hash of the join key", not a specific digest.

Reference parity note: the reference engine (cloud-data-sync) manages
object lifecycles but has no row-level governance surface; these
operators extend the engine along SURVEY.md's training-data-pipeline
axis (driver mandate), reusing the sync/state substrates' portable-hash
discipline.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cloud_data_sync_spark.registry import floor_ratio, register
from cloud_data_sync_spark.tables import load_table

# k thresholds audited (one output row per k). Production policies pick
# one k per sharing tier; the audit is threshold-generic.
K_THRESHOLDS = (2, 5, 10, 25)

# ~5% victim set / ~10% sample: 16-bit md5-prefix buckets, same idiom as
# q_sample_hash (65536 buckets).
FORGET_BUCKET_LT = 3277
SAMPLE_BUCKET_LT = 6554


def bucket16(col: Column) -> Column:
    """Portable 16-bit hash bucket of a key column: first 4 hex chars of
    md5(key-as-string) as an integer in [0, 65536). Identical on DuckDB
    as ``CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 4) AS INTEGER)``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast(
        "long"
    )


def _bucket16_sql(col: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4) AS INTEGER)"


@register(
    "q_k_anonymity",
    oracle=f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS cls_n,
         count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l_div
  FROM customer
  GROUP BY c_nationkey, c_mktsegment
),
ks AS (SELECT unnest([{", ".join(str(k) for k in K_THRESHOLDS)}]) AS k)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(cls_n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN cls_n < k THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k,
       CAST(sum(CASE WHEN cls_n < k THEN cls_n ELSE 0 END) AS BIGINT)
         AS rows_below_k,
       floor(sum(CASE WHEN cls_n < k THEN cls_n ELSE 0 END)
             / CAST(sum(cls_n) AS DOUBLE) * 1000000) / 1000000
         AS risk_frac,
       CAST(min(l_div) AS BIGINT) AS min_l
FROM classes, ks
GROUP BY k
""",
    doc=(
        "k-anonymity / l-diversity audit over the customer "
        "quasi-identifiers (nation, market segment) with acctbal-bucket "
        "as the sensitive attribute: per k threshold, how many "
        "equivalence classes (and rows) fall below k, the at-risk row "
        "fraction, and the worst-class l-diversity. ONE hash aggregate "
        "over the QI tuple does all the work (map-side combinable; the "
        "class frame leaving the shuffle is bounded by the QI domain, "
        "not row count) — the k-threshold expansion is a constant-size "
        "explode over that tiny frame. The audit a platform runs before "
        "any table share; re-identification risk is a first-class "
        "pipeline metric at 100 TB, not a one-off notebook."
    ),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sens = F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    classes = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("cls_n"),
            F.countDistinct(sens).alias("l_div"),
        )
    )
    ks = F.explode(F.array(*[F.lit(k) for k in K_THRESHOLDS])).alias("k")
    below = F.col("cls_n") < F.col("k")
    rows_below = F.sum(F.when(below, F.col("cls_n")).otherwise(0))
    return (
        classes.select("cls_n", "l_div", ks)
        .groupBy(F.col("k").cast("long").alias("k"))
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("cls_n").cast("long").alias("n_rows"),
            F.sum(F.when(below, 1).otherwise(0))
            .cast("long")
            .alias("classes_below_k"),
            rows_below.cast("long").alias("rows_below_k"),
            floor_ratio(
                F.try_divide(
                    rows_below.cast("double"), F.sum("cls_n").cast("double")
                ),
                6,
            ).alias("risk_frac"),
            F.min("l_div").cast("long").alias("min_l"),
        )
    )


def _affected_one_scan(
    fact: DataFrame, fact_key: Column, keys: DataFrame, key_col: str, tbl: str
) -> DataFrame:
    """One-scan affected/total counts: left-join ``fact`` to the marked
    key set and count hits conditionally — no second count(*) pass over
    a fact table that is the whole point of not scanning twice at
    100 TB."""
    marked = keys.withColumn("_hit", F.lit(1))
    joined = fact.join(
        F.broadcast(marked), fact_key == F.col(key_col), "left"
    )
    return joined.agg(
        F.lit(tbl).alias("tbl"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
        .cast("long")
        .alias("n_affected"),
        F.count("*").alias("n_total"),
    )


@register(
    "q_forget_plan",
    oracle=f"""
WITH victims AS (
  SELECT c_custkey FROM customer
  WHERE {_bucket16_sql("c_custkey")} < {FORGET_BUCKET_LT}
),
o_aff AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM victims)
),
counts AS (
  SELECT 'customer' AS tbl,
         (SELECT count(*) FROM victims) AS n_affected,
         (SELECT count(*) FROM customer) AS n_total
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM o_aff),
         (SELECT count(*) FROM orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem
          WHERE l_orderkey IN (SELECT o_orderkey FROM o_aff)),
         (SELECT count(*) FROM lineitem)
)
SELECT tbl,
       CAST(n_affected AS BIGINT) AS n_affected,
       CAST(n_total AS BIGINT) AS n_total,
       floor(n_affected / CAST(n_total AS DOUBLE) * 1000000) / 1000000
         AS affected_frac
FROM counts
""",
    doc=(
        "Deletion-propagation (right-to-be-forgotten) planner: given a "
        "deterministic ~5% victim key set, the cascade blast radius per "
        "table — customer rows, their orders, those orders' lineitems — "
        "as affected/total counts and fractions. Each fact table is "
        "measured in ONE scan (left join against the marked key set + "
        "conditional count; no separate count(*) pass), the victim set "
        "broadcasts, and the orders->lineitem hop joins only projected "
        "keys. This is the sizing pass a forget batch runs BEFORE "
        "rewriting files: at 100 TB the rewrite is priced per affected "
        "file, and this plan prices it from key sets alone."
    ),
)
def q_forget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    victims = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .filter(bucket16(F.col("c_custkey")) < FORGET_BUCKET_LT)
    )
    orders = load_table(spark, sf_dir, "orders")
    o_aff = orders.join(
        F.broadcast(victims), orders.o_custkey == victims.c_custkey, "left_semi"
    ).select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        _affected_one_scan(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("k")
            ),
            F.col("k"),
            victims,
            "c_custkey",
            "customer",
        ),
        _affected_one_scan(
            orders.select("o_custkey"),
            F.col("o_custkey"),
            victims,
            "c_custkey",
            "orders",
        ),
        _affected_one_scan(
            li.select("l_orderkey"),
            F.col("l_orderkey"),
            o_aff,
            "o_orderkey",
            "lineitem",
        ),
    ]
    out = reduce(DataFrame.unionByName, parts)
    return out.select(
        "tbl",
        "n_affected",
        "n_total",
        floor_ratio(
            F.try_divide(
                F.col("n_affected").cast("double"),
                F.col("n_total").cast("double"),
            ),
            6,
        ).alias("affected_frac"),
    )


@register(
    "q_sample_coherent",
    oracle=f"""
WITH c_s AS (
  SELECT c_custkey FROM customer
  WHERE {_bucket16_sql("c_custkey")} < {SAMPLE_BUCKET_LT}
),
o_s AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE {_bucket16_sql("o_custkey")} < {SAMPLE_BUCKET_LT}
),
stats AS (
  SELECT 'customer' AS tbl,
         (SELECT count(*) FROM c_s) AS n_sampled,
         (SELECT count(*) FROM customer) AS n_total,
         0 AS orphans
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM o_s),
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM o_s
          WHERE o_custkey NOT IN (SELECT c_custkey FROM c_s))
)
SELECT tbl,
       CAST(n_sampled AS BIGINT) AS n_sampled,
       CAST(n_total AS BIGINT) AS n_total,
       floor(n_sampled / CAST(n_total AS DOUBLE) * 1000000) / 1000000
         AS samp_frac,
       CAST(orphans AS BIGINT) AS orphans
FROM stats
""",
    doc=(
        "Coordination-free coherent sampling: customer and orders are "
        "each filtered MAP-ONLY by the same deterministic hash of the "
        "JOIN KEY they carry (hash(custkey) < t), which commutes with "
        "the equi-join — the join of the samples IS a sample of the "
        "join, so a dev-slice of a petabyte lake preserves referential "
        "integrity with zero cross-table coordination (tables sampled "
        "on different days/clusters still line up). The invariant is "
        "EMITTED, not asserted: orphans = sampled orders whose custkey "
        "escaped the customer sample, counted via anti-join semantics "
        "and oracle-checked to 0. Per-table sampled/total counts and "
        "realized fractions round out the audit."
    ),
)
def q_sample_coherent(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = SAMPLE_BUCKET_LT
    c_s = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey")
        .filter(bucket16(F.col("c_custkey")) < t)
    )
    orders = load_table(spark, sf_dir, "orders")
    o_s = orders.select("o_orderkey", "o_custkey").filter(
        bucket16(F.col("o_custkey")) < t
    )
    orphans = (
        o_s.join(F.broadcast(c_s), o_s.o_custkey == c_s.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    c_row = (
        load_table(spark, sf_dir, "customer")
        .agg(
            F.lit("customer").alias("tbl"),
            F.sum(
                F.when(bucket16(F.col("c_custkey")) < t, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_sampled"),
            F.count("*").alias("n_total"),
        )
        .withColumn("orphans", F.lit(0).cast("long"))
    )
    o_row = (
        orders.agg(
            F.lit("orders").alias("tbl"),
            F.sum(
                F.when(bucket16(F.col("o_custkey")) < t, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_sampled"),
            F.count("*").alias("n_total"),
        )
        .crossJoin(F.broadcast(orphans))
        .select("tbl", "n_sampled", "n_total", F.col("orphans").cast("long"))
    )
    return c_row.unionByName(o_row).select(
        "tbl",
        "n_sampled",
        "n_total",
        floor_ratio(
            F.try_divide(
                F.col("n_sampled").cast("double"),
                F.col("n_total").cast("double"),
            ),
            6,
        ).alias("samp_frac"),
        "orphans",
    )
