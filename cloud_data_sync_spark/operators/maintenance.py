"""Storage-layout maintenance: the compaction planner.

Small-files pathology is the #1 real-world listing/scan killer at 100 TB:
object stores and HDFS namenodes degrade with file COUNT, parquet footer
reads dominate scans when files are KB-sized, and every downstream task
pays per-file open cost. The fix every lakehouse runs on a schedule is a
COMPACTION pass — group each prefix's small files into ~target-size
rewrite bins — and the expensive part at scale is not the rewrite, it's
deciding WHAT to rewrite without scanning payloads. That decision needs
only the catalog listing (``sources/listing.py`` produces exactly the
input: object_name + size, metadata-only), which makes the planner free
to run on every sync tick.

``compaction_plan`` is generic over any catalog listing; the registered
query runs it on a deterministic synthetic inventory derived from
``orders`` (the sync.py oracle-checkability pattern — DuckDB cannot list
a filesystem, so the reconciliation family derives listings both engines
can reproduce; ``tests`` additionally run the planner over a REAL
``list_objects`` listing of the testdata directory).

Plan shape at scale: one window partitioned by prefix (listing-sized
metadata rows — never payloads), one (prefix, bin) aggregate, one prefix
rollup. All shuffles carry listing rows; a table with millions of files
keeps its window partition-local to its prefix. The bin assignment is
the running-sum form (a file lands in the bin its cumulative start
offset falls in): deterministic under the (object_name) ordering, one
pass, no iteration — the standard SQL approximation of next-fit packing
(an exact first-fit-decreasing pack is iterative and buys ~single-digit
percent bin-count improvement that no scheduled compactor bothers with).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud_data_sync_spark.registry import floor_ratio, register
from cloud_data_sync_spark.tables import load_table

# Target rewrite-bin size. Production uses the table's block/rowgroup
# target (~128 MB); the synthetic inventory's "files" are order-priced
# (~1-600 KB), so the checked constant is 1 MB — the plan SHAPE is
# byte-count-independent.
TARGET_BIN_BYTES = 1_000_000


def compaction_plan(
    listing: DataFrame, target_bytes: int = TARGET_BIN_BYTES
) -> DataFrame:
    """Per-prefix compaction plan over a catalog listing.

    ``listing`` needs ``object_name`` (prefix = first '/'-segment, the
    table/partition directory in a lake layout) and ``size``. Returns one
    row per prefix: file count + byte totals + file-size extremes, the
    packed bin count, the largest bin, and the projected file-count
    reduction — everything a compaction scheduler ranks prefixes by.
    """
    pref = listing.select(
        F.substring_index("object_name", "/", 1).alias("prefix"),
        "object_name",
        "size",
    )
    w = (
        Window.partitionBy("prefix")
        .orderBy("object_name")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # a file joins the bin its cumulative START offset falls in: floor of
    # a non-negative double, so Spark/DuckDB div semantics cannot diverge
    assigned = pref.withColumn(
        "bin",
        F.floor(
            (F.sum("size").over(w) - F.col("size"))
            / F.lit(float(target_bytes))
        ),
    )
    bins = assigned.groupBy("prefix", "bin").agg(
        F.sum("size").alias("bin_bytes"),
        F.count("*").alias("nf"),
        F.min("size").alias("mnf"),
        F.max("size").alias("mxf"),
    )
    return bins.groupBy("prefix").agg(
        F.sum("nf").cast("long").alias("n_files"),
        F.sum("bin_bytes").cast("long").alias("total_bytes"),
        F.min("mnf").alias("min_file"),
        F.max("mxf").alias("max_file"),
        F.count("*").alias("n_bins"),
        F.max("bin_bytes").alias("max_bin_bytes"),
        floor_ratio(
            F.lit(1.0) - F.count("*") / F.sum("nf").cast("double"), 6
        ).alias("reduction_frac"),
    )


def synthetic_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic file inventory both engines can derive: every order
    becomes an object under one of 8 table prefixes, sized by its
    floored total price, last-modified at its order date — the sync.py
    synthetic-catalog pattern."""
    k = F.col("o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("tbl_"),
            (k % 8).cast("string"),
            F.lit("/obj_"),
            k.cast("string"),
        ).alias("object_name"),
        F.floor(F.col("o_totalprice")).cast("long").alias("size"),
        F.col("o_orderdate").alias("last_modified"),
    )


@register(
    "q_compaction_plan",
    oracle=f"""
WITH files AS (
  SELECT 'tbl_' || CAST(o_orderkey % 8 AS VARCHAR) || '/obj_' ||
         CAST(o_orderkey AS VARCHAR) AS object_name,
         CAST(floor(o_totalprice) AS BIGINT) AS size
  FROM orders
),
pref AS (
  SELECT split_part(object_name, '/', 1) AS prefix, object_name, size
  FROM files
),
assigned AS (
  SELECT prefix, size,
         CAST(floor((sum(size) OVER (PARTITION BY prefix ORDER BY object_name
              ROWS UNBOUNDED PRECEDING) - size)
              / {float(TARGET_BIN_BYTES)}) AS BIGINT) AS bin
  FROM pref
),
bins AS (
  SELECT prefix, bin, sum(size) AS bin_bytes, count(*) AS nf,
         min(size) AS mnf, max(size) AS mxf
  FROM assigned GROUP BY prefix, bin
)
SELECT prefix,
       CAST(sum(nf) AS BIGINT) AS n_files,
       CAST(sum(bin_bytes) AS BIGINT) AS total_bytes,
       CAST(min(mnf) AS BIGINT) AS min_file,
       CAST(max(mxf) AS BIGINT) AS max_file,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(max(bin_bytes) AS BIGINT) AS max_bin_bytes,
       floor((1.0 - count(*) / CAST(sum(nf) AS DOUBLE)) * 1000000) / 1000000
         AS reduction_frac
FROM bins GROUP BY prefix
""",
    doc=(
        "Compaction planner (r7 verdict item 5) — the operational layout "
        "primitive the listing substrate makes free: per table prefix, "
        "the file-size distribution, the bin-packed rewrite groups "
        "(running-sum window over name-ordered files into target-size "
        "bins — a file joins the bin its cumulative start offset falls "
        "in), and the projected file-count reduction a scheduler ranks "
        "prefixes by. Metadata-only end to end: the planner touches "
        "listing rows, never payloads, so it rides every sync tick. One "
        "prefix-partitioned window + two hash aggregates; all shuffles "
        "are listing-sized. The registered inventory is the "
        "deterministic orders-derived catalog (the q_sync_diff "
        "oracle-checkability pattern); compaction_plan itself is generic "
        "over any sources/listing.py catalog DataFrame (tested against "
        "a real list_objects listing)."
    ),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compaction_plan(synthetic_inventory(spark, sf_dir))


# Retention horizons (days). Production lifecycle policies tier these
# (IA at 30, archive at 90, delete at 365); the planner is horizon-generic.
RETENTION_HORIZONS = (30, 90, 365)


def retention_plan(
    listing: DataFrame, horizons: tuple[int, ...] = RETENTION_HORIZONS
) -> DataFrame:
    """Per-(prefix, horizon) lifecycle projection over a catalog listing:
    how many files/bytes fall past each age horizon, measured against
    the listing's OWN newest object (deterministic — no wall clock in a
    query both engines must reproduce; a production run passes its
    policy evaluation instant the same way)."""
    pack = listing.agg(F.max("last_modified").alias("mx"))
    pref = listing.select(
        F.substring_index("object_name", "/", 1).alias("prefix"),
        "size",
        "last_modified",
    )
    h = F.explode(
        F.array(*[F.lit(d) for d in horizons])
    ).alias("horizon_days")
    rows = pref.crossJoin(F.broadcast(pack)).select(
        "prefix", "size", "last_modified", "mx", h
    )
    expired = F.col("last_modified") < F.expr(
        "mx - make_interval(0, 0, 0, horizon_days)"
    )
    exp_bytes = F.sum(F.when(expired, F.col("size")).otherwise(0))
    return rows.groupBy(
        "prefix", F.col("horizon_days").cast("long").alias("horizon_days")
    ).agg(
        F.count("*").alias("n_total"),
        F.sum("size").cast("long").alias("bytes_total"),
        F.sum(F.when(expired, 1).otherwise(0)).cast("long").alias(
            "n_expired"
        ),
        exp_bytes.cast("long").alias("bytes_expired"),
        floor_ratio(
            F.try_divide(
                exp_bytes.cast("double"), F.sum("size").cast("double")
            ),
            6,
        ).alias("bytes_frac"),
    )


@register(
    "q_retention_plan",
    oracle=f"""
WITH files AS (
  SELECT 'tbl_' || CAST(o_orderkey % 8 AS VARCHAR) || '/obj_' ||
         CAST(o_orderkey AS VARCHAR) AS object_name,
         CAST(floor(o_totalprice) AS BIGINT) AS size,
         o_orderdate AS last_modified
  FROM orders
),
mx AS (SELECT max(last_modified) AS mx FROM files),
h AS (SELECT unnest([{", ".join(str(d) for d in RETENTION_HORIZONS)}])
        AS horizon_days),
r AS (
  SELECT split_part(object_name, '/', 1) AS prefix, size, last_modified,
         h.horizon_days, mx.mx
  FROM files, h, mx
)
SELECT prefix,
       CAST(horizon_days AS BIGINT) AS horizon_days,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(size) AS BIGINT) AS bytes_total,
       CAST(sum(CASE WHEN last_modified < mx - INTERVAL (horizon_days) DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
       CAST(sum(CASE WHEN last_modified < mx - INTERVAL (horizon_days) DAY
                     THEN size ELSE 0 END) AS BIGINT) AS bytes_expired,
       floor(sum(CASE WHEN last_modified < mx - INTERVAL (horizon_days) DAY
                      THEN size ELSE 0 END)
             / CAST(sum(size) AS DOUBLE) * 1000000) / 1000000 AS bytes_frac
FROM r GROUP BY prefix, horizon_days
""",
    doc=(
        "Retention/lifecycle planner — the compaction planner's sibling "
        "and the other scheduled maintenance decision a 100 TB lake "
        "runs on listings alone: per (table prefix, age horizon), the "
        "file count and byte volume already past the horizon, measured "
        "against the listing's own newest object (deterministic; a "
        "production evaluation passes its policy instant explicitly). "
        "One metadata-only pass: the max-mtime scalar is ONE broadcast "
        "row, horizons explode a config-constant array (x3), and the "
        "(prefix, horizon) hash aggregate map-side combines — shuffles "
        "carry listing rows, never payloads, so the projection that "
        "drives tiering/expiry jobs costs a sync tick, not a scan. "
        "retention_plan itself is generic over any sources/listing.py "
        "catalog (last_modified rides CATALOG_SCHEMA); the registered "
        "inventory is the orders-derived synthetic catalog."
    ),
)
def q_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_plan(synthetic_inventory(spark, sf_dir))


# -- zone-map pruning audit ----------------------------------------------------

# Synthetic file assignment: orders sharded into 64 "files" by orderkey
# (the q_sync_diff derive-it-on-both-engines pattern). A real lake reads
# these stats from parquet footers; the AUDIT is layout-independent.
_ZM_FILES = 64
# Probe predicates: month-start cutoffs a reporting workload filters by.
_ZM_CUTS = ("1997-01-01", "1999-01-01", "2000-06-01", "2001-06-01")


@register(
    "q_zone_map_prune",
    oracle=f"""
WITH zones AS (
  SELECT 'key_sharded' AS layout, o_orderkey % {_ZM_FILES} AS file_id,
         max(o_orderdate) AS mx, count(*) AS n_rows
  FROM orders GROUP BY file_id
  UNION ALL
  SELECT 'date_sharded', 100 * year(o_orderdate) + month(o_orderdate),
         max(o_orderdate), count(*)
  FROM orders GROUP BY 100 * year(o_orderdate) + month(o_orderdate)
),
cuts AS (SELECT unnest(['{"', '".join(_ZM_CUTS)}']) AS cut),
hits AS (
  SELECT layout, CAST(cut AS DATE) AS cut_date, file_id, n_rows,
         CASE WHEN mx >= CAST(cut AS TIMESTAMP) THEN 1 ELSE 0 END AS touched
  FROM zones, cuts
)
SELECT layout, cut_date,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(touched) AS BIGINT) AS files_read,
       CAST(sum(CASE WHEN touched = 0 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       floor((1.0 - sum(touched) / CAST(count(*) AS DOUBLE)) * 1000000)
         / 1000000 AS prune_frac
FROM hits GROUP BY layout, cut_date
""",
    doc=(
        "Zone-map (min/max) pruning audit — the statistic that decides "
        "whether a 100 TB scan touches 100 TB or 1: per file, the "
        "min/max of the filter column (what parquet footers store); per "
        "candidate predicate (ts >= cut), how many files a zone-map- "
        "aware reader must open and how many rows it skips outright — "
        "for BOTH layouts at once: key-sharded files (time uncorrelated "
        "with key order -> prune_frac 0, the worst case) vs month-"
        "sharded files (prune_frac tracks the cut, the layout a "
        "re-clustering pass would produce). The two rows per predicate "
        "ARE the before/after evidence a layout decision is made on. "
        "Two (file) aggregates over metadata-width rows, a 4-element "
        "literal explode, one tiny rollup."
    ),
)
def q_zone_map_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    zones_key = orders.groupBy(
        (F.col("o_orderkey") % _ZM_FILES).alias("file_id")
    ).agg(F.max("o_orderdate").alias("mx"), F.count("*").alias("n_rows"))
    zones_date = orders.groupBy(
        (
            100 * F.year("o_orderdate") + F.month("o_orderdate")
        ).alias("file_id")
    ).agg(F.max("o_orderdate").alias("mx"), F.count("*").alias("n_rows"))
    zones = zones_key.select(
        F.lit("key_sharded").alias("layout"),
        F.col("file_id").cast("long").alias("file_id"),
        "mx",
        "n_rows",
    ).unionByName(
        zones_date.select(
            F.lit("date_sharded").alias("layout"),
            F.col("file_id").cast("long").alias("file_id"),
            "mx",
            "n_rows",
        )
    )
    cuts = F.explode(
        F.array(*[F.lit(c) for c in _ZM_CUTS])
    ).alias("cut")
    hits = zones.select("layout", "file_id", "n_rows", "mx", cuts).select(
        "layout",
        F.col("cut").cast("date").alias("cut_date"),
        "n_rows",
        F.when(
            F.col("mx") >= F.col("cut").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("touched"),
    )
    return hits.groupBy("layout", "cut_date").agg(
        F.count("*").alias("n_files"),
        F.sum("touched").cast("long").alias("files_read"),
        F.sum(F.when(F.col("touched") == 0, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_skipped"),
        floor_ratio(
            F.lit(1.0)
            - F.sum("touched") / F.count("*").cast("double"),
            6,
        ).alias("prune_frac"),
    )


# -- incremental view maintenance ---------------------------------------------


@register(
    "q_view_maintenance",
    oracle="""
WITH base AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
         coalesce(sum(CAST(value AS DECIMAL(18,2))), 0) AS sv
  FROM events WHERE event_id % 10 <> 0 GROUP BY event_type, d
),
delta AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
         coalesce(sum(CAST(value AS DECIMAL(18,2))), 0) AS sv
  FROM events WHERE event_id % 10 = 0 GROUP BY event_type, d
),
merged AS (
  SELECT coalesce(b.event_type, dl.event_type) AS event_type,
         coalesce(b.d, dl.d) AS d,
         coalesce(b.n, 0) + coalesce(dl.n, 0) AS n,
         coalesce(b.sv, 0) + coalesce(dl.sv, 0) AS sv
  FROM base b FULL OUTER JOIN delta dl
    ON b.event_type IS NOT DISTINCT FROM dl.event_type AND b.d = dl.d
),
full_r AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n,
         coalesce(sum(CAST(value AS DECIMAL(18,2))), 0) AS sv
  FROM events GROUP BY event_type, d
)
SELECT m.event_type, m.d,
       CAST(m.n AS BIGINT) AS n,
       floor(CAST(m.sv AS DOUBLE) * 1000000) / 1000000 AS sv,
       CAST(CASE WHEN m.n = f.n AND m.sv = f.sv
            THEN 1 ELSE 0 END AS BIGINT) AS consistent
FROM merged m JOIN full_r f
  ON m.event_type IS NOT DISTINCT FROM f.event_type AND m.d = f.d
""",
    doc=(
        "Incremental view maintenance — the pattern that lets a 100 TB "
        "daily rollup absorb a new batch by touching ONLY the delta: "
        "base aggregate (90% split) + delta aggregate (10% split) "
        "merged by additive-agg algebra (counts and sums compose; the "
        "same algebra the engine's partial/final aggregation uses "
        "inside one query, applied ACROSS materializations), then "
        "audited cell-by-cell against the full recompute with the "
        "consistency verdict EMITTED, not asserted. The merge is a "
        "full outer join of two aggregate frames keyed by (type, day) "
        "— both bounded by group cardinality, never event count; "
        "null-safe key equality keeps NULL event_type groups mergeable. "
        "Sums accumulate in DECIMAL because additive maintenance is "
        "only exact when the aggregate is: double sums re-associate "
        "differently in (base + delta) vs the full recompute and "
        "flipped 12/150 consistency cells before the decimal fix — "
        "the audit catching the exact defect it exists to catch."
    ),
)
def q_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").alias("d"),
        "value",
    )

    def agg(df: DataFrame) -> DataFrame:
        # DECIMAL accumulation: additive maintenance is only EXACT if
        # the aggregate is exact — double sums re-associate differently
        # in (base + delta) vs the full recompute and genuinely diverge
        # in the last ulp (12/150 cells flipped the consistency flag
        # before this). The decimal sum makes merge == recompute an
        # identity, which is the operator's whole claim.
        return df.groupBy("event_type", "d").agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.col("value").cast("decimal(18,2)")), F.lit(0)
            ).alias("sv"),
        )

    base = agg(ev.filter(F.col("event_id") % 10 != 0))
    delta = agg(ev.filter(F.col("event_id") % 10 == 0))
    full_r = agg(ev)
    b, dl = base.alias("b"), delta.alias("dl")
    merged = b.join(
        dl,
        F.col("b.event_type").eqNullSafe(F.col("dl.event_type"))
        & (F.col("b.d") == F.col("dl.d")),
        "full_outer",
    ).select(
        F.coalesce(F.col("b.event_type"), F.col("dl.event_type")).alias(
            "event_type"
        ),
        F.coalesce(F.col("b.d"), F.col("dl.d")).alias("d"),
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("dl.n"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("b.sv"), F.lit(0))
            + F.coalesce(F.col("dl.sv"), F.lit(0))
        ).alias("sv"),
    )
    m, f = merged.alias("m"), full_r.alias("f")
    return m.join(
        f,
        F.col("m.event_type").eqNullSafe(F.col("f.event_type"))
        & (F.col("m.d") == F.col("f.d")),
    ).select(
        F.col("m.event_type").alias("event_type"),
        F.col("m.d").alias("d"),
        F.col("m.n").cast("long").alias("n"),
        (
            F.floor(F.col("m.sv").cast("double") * 1_000_000) / 1_000_000
        ).alias("sv"),
        F.when(
            (F.col("m.n") == F.col("f.n"))
            & (F.col("m.sv") == F.col("f.sv")),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias("consistent"),
    )
