"""Similarity search over the ``embeddings`` table.

Two paths, as a 100 TB design requires:

- **Brute-force cosine top-k** (``q_sim_topk``): the exactness baseline.
  Queries are broadcast; every executor scans its partition of the corpus
  once — O(corpus × queries) FLOPs but a single pass, no shuffle of the
  corpus itself, no driver collect. Right answer for small query sets.
- **LSH-bucketed ANN** (``q_sim_ann_lsh``): random-hyperplane signatures
  (deterministic ±1 weights from md5) bucket the corpus; candidate scan is
  only the query's bucket (~N/2^planes of the corpus). The scale path.

Ranking is by *rounded* cosine (6 dp) with vec_id tiebreak so both engines
rank identical values — full-precision cross-engine float accumulation is
not bit-stable, rounded values are.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cloud_data_sync_spark.registry import floor_ratio, register
from cloud_data_sync_spark.tables import load_table, session_substrate, spread

N_PLANES = 8
DIM = 64
TOP_K = 5


def _rank_topk(scored):
    """THE per-query ranking contract, shared by all three ANN variants:
    rank by cosine descending with vec_id tiebreak, keep rank <= TOP_K.
    One definition so a tiebreak/dtype change cannot diverge per family."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )
# Query set: vec_id % 100 == 0 AND vec_id < QUERY_CAP — at most
# QUERY_CAP/QUERY_MOD queries regardless of corpus size, so the broadcast of
# the query side is a constant, not a corpus fraction (round-1 verdict:
# fraction-sized query sets grow the broadcast with N).
QUERY_MOD = 100
QUERY_CAP = 1000
# IVF coarse centroids: fixed-K deterministic pseudo-random sample (the K
# smallest md5(vec_id) — reproducible in any engine). K independent of corpus
# size keeps the seed broadcast bounded; production would use 256-4096 with
# k-means refinement, same plan shape.
K_CENTROIDS = 32
# cells each QUERY probes (its own + next-nearest): the standard IVF
# recall/cost lever. Corpus vectors still index into exactly one cell.
N_PROBE = 2


_VEC_SUBSTRATE: dict[tuple, DataFrame] = {}


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, v double[], nrm) — the normalized-vector table every
    similarity query starts from, materialized once per (session,
    embeddings vintage) via the shared substrate helper: the cast + norm
    pass is identical across q_sim_topk / q_sim_ann_lsh / q_sim_ivf /
    q_sim_ivf_recall, and a production pipeline stores exactly this table
    next to the raw embeddings rather than recomputing norms per query."""

    def _build() -> DataFrame:
        emb = spread(load_table(spark, sf_dir, "embeddings")).select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        # nrm > 0 excludes degenerate rows — NULL embeddings (NULL nrm)
        # and zero vectors — from the index and query sets on BOTH
        # engines (oracle `n` CTE carries the same WHERE): a row with no
        # direction has no meaningful neighbors, and keeping it would
        # pin engine-specific NULL bucket/rank tie-breaks into results.
        return emb.withColumn(
            "nrm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
        ).filter(F.col("nrm") > 0)

    return session_substrate(
        spark, _VEC_SUBSTRATE, sf_dir, "sim-vectors", "embeddings", _build
    )


def _cosine(va: Column, vb: Column, na: Column, nb: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    # try_divide: a zero-norm vector (failed embedder, padding row — a
    # certainty at corpus scale) makes the denominator 0, and ANSI mode
    # turns the plain division into a job-killing DIVIDE_BY_ZERO; DuckDB's
    # division by zero yields NULL, so NULL is the cross-engine cosine for
    # degenerate vectors (NULLs sort last under both engines' DESC rank).
    return F.try_divide(dot, na * nb)


_ORACLE_VECS = """
vecs AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
  FROM vecs
  WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
)
"""


# Brute-force exact top-k pipeline as named CTEs — shared by q_sim_topk
# and (as the ground-truth side) q_sim_ivf_recall, so the query set,
# rounding, and tiebreak contracts cannot drift between them.
_BF_TOPK_CTES = f"""
bf_pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(list_sum(list_transform(range(1, len(q.v) + 1),
               i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim
  FROM n q JOIN n c ON q.vec_id % {QUERY_MOD} = 0 AND q.vec_id < {QUERY_CAP}
                    AND q.vec_id <> c.vec_id
),
bf_ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM bf_pairs
),
bf_topk AS (
  SELECT query_id, vec_id, cos_sim, rank FROM bf_ranked WHERE rank <= {TOP_K}
)
"""


def _bf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-k result set, materialized once per (session,
    embeddings vintage): q_sim_topk IS this table, and q_sim_ivf_recall
    scores the IVF result against it — the audit reuses the audited
    pipeline's rows verbatim (k×|queries| ids, KB-sized) instead of
    re-running the corpus×queries cosine pass."""
    return session_substrate(
        spark, _VEC_SUBSTRATE, sf_dir, "sim-bf-topk", "embeddings",
        lambda: _bf_topk_build(spark, sf_dir),
    )


def _bf_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(
        (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = vecs.join(
        F.broadcast(queries), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
        ).alias("cos_sim"),
    )
    return _rank_topk(pairs)


@register(
    "q_sim_topk",
    oracle=f"""
WITH {_ORACLE_VECS},
{_BF_TOPK_CTES}
SELECT query_id, vec_id, cos_sim, rank FROM bf_topk
""",
    doc="Brute-force cosine top-k: broadcast queries × one corpus pass.",
    plan=lambda spark, sf_dir: _bf_topk_build(spark, sf_dir),
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bf_topk(spark, sf_dir)


def _plane_signs() -> list[list[float]]:
    """Deterministic ±1 hyperplane weights from md5 parity — reproducible on
    any engine (the oracle recomputes the same md5s in SQL)."""
    return [
        [
            1.0 if int(hashlib.md5(f"{j}_{d}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for d in range(DIM)
        ]
        for j in range(N_PLANES)
    ]


def _bucket_col() -> Column:
    """8-bit '01' bucket string over the shared ``_vectors`` column ``v``:
    bit_j = [Σ_d w_jd·x_d > 0].

    The weights are compile-time constants baked in as array literals, so
    the signature is one map-side projection — no weight table, no
    posexplode, no join, no shuffle. zip_with/aggregate keeps the
    expression tree small (a 512-term unrolled sum measured slower: every
    stage that embeds it pays seconds of codegen compilation). The
    float-origin doubles have 24-bit mantissas, so a 64-term ±1 sum is
    exact and summation order can't flip a bit against the oracle's
    aggregate.
    """
    # one parsed text expression (the q_bootstrap_ci py4j lesson): the
    # Column form (8 planes x 64 F.lit weights + fold builders) issued
    # ~560 driver round trips per consumer build; the resolved plan is
    # identical. The SQL text hardcodes the column name "v", so the
    # helper is deliberately zero-arg: it can only be applied to a frame
    # that exposes the shared _vectors column ``v`` (misuse fails at
    # analysis time with an unresolved-column error naming "v").
    bits = []
    for signs in _plane_signs():
        w = "array(" + ", ".join(f"{x!r}D" for x in signs) + ")"
        bits.append(
            f"CASE WHEN aggregate(zip_with(v, {w}, (x, y) -> x * y),"
            " 0.0D, (a, x) -> a + x) > 0 THEN '1' ELSE '0' END"
        )
    return F.expr("concat(" + ", ".join(bits) + ")")


_ORACLE_SIG = f"""
weights AS (
  SELECT CAST(j.j AS INTEGER) AS j, CAST(d.d AS INTEGER) AS d,
         CASE WHEN (instr('0123456789abcdef',
              substr(md5(CAST(j.j AS VARCHAR) || '_' || CAST(d.d AS VARCHAR)), 1, 1))
              - 1) % 2 = 0 THEN 1.0 ELSE -1.0 END AS w
  FROM range(0, {N_PLANES}) j(j), range(0, {DIM}) d(d)
),
comp AS (
  SELECT n.vec_id, w.j, w.w * n.v[w.d + 1] AS t
  FROM n, weights w
),
bits AS (
  SELECT vec_id, j, CASE WHEN sum(t) > 0 THEN '1' ELSE '0' END AS bit
  FROM comp GROUP BY vec_id, j
),
sig AS (
  SELECT vec_id, string_agg(bit, '' ORDER BY j) AS bucket
  FROM bits GROUP BY vec_id
)
"""


@register(
    "q_sim_ann_lsh",
    oracle=f"""
WITH {_ORACLE_VECS},
{_ORACLE_SIG},
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(list_sum(list_transform(range(1, len(qn.v) + 1),
               i -> qn.v[i] * cn.v[i])) / (qn.nrm * cn.nrm), 6) AS cos_sim
  FROM sig q
  JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  JOIN n qn ON qn.vec_id = q.vec_id
  JOIN n cn ON cn.vec_id = c.vec_id
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id < {QUERY_CAP}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM cand
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
""",
    doc=(
        "ANN via random-hyperplane LSH: signature bucket join shrinks the "
        "candidate set ~2^planes-fold; approximate recall, scale-linear cost."
    ),
)
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir)
    with_sig = vecs.withColumn("bucket", _bucket_col())
    q = with_sig.filter(
        (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "bucket",
    )
    cand = with_sig.join(F.broadcast(q), "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6).alias(
            "cos_sim"
        ),
    )
    return _rank_topk(scored)


# -- coarse-quantizer column helpers (shared write-time / probe-time) ---------


def _seed_rows(vecs: DataFrame) -> DataFrame:
    """(seed_id, sv, snrm): the IVF coarse centroids — the K_CENTROIDS
    smallest md5(vec_id), a fixed-K deterministic sample reproducible on
    any engine (TakeOrderedAndProject, bounded at any corpus size)."""
    return (
        vecs.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(K_CENTROIDS)
        .select(
            F.col("vec_id").alias("seed_id"),
            F.col("v").alias("sv"),
            F.col("nrm").alias("snrm"),
        )
    )


def _seeds_pack(seeds: DataFrame) -> DataFrame:
    """ONE broadcast row holding the (seed_id-sorted) seed array."""
    return seeds.select(
        F.struct(
            F.col("seed_id").alias("seed_id"),
            F.col("sv").alias("sv"),
            F.col("snrm").alias("snrm"),
        ).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("seeds"))


def _ranked_cells_col() -> Column:
    """EVERY seed cell ranked for the row's vector, as a sorted array of
    struct(nsim, seed_id) over the broadcast ``seeds`` pack:
    element 1 is the assignment cell (argmax sim, tie → min seed),
    slice(1, N_PROBE) the probe set, and a posexplode the full
    probe-depth ranking q_sim_ivf_sweep sweeps over. Sims are rounded to
    6 dp BEFORE the sort so both engines break ties identically (the
    module-wide convention). Requires columns ``v``, ``nrm``, ``seeds``."""
    v, nrm = F.col("v"), F.col("nrm")
    scored = F.transform(
        F.col("seeds"),
        lambda s: F.struct(
            F.round(
                # try_divide for the same zero-norm reason as _cosine
                F.try_divide(
                    F.aggregate(
                        F.zip_with(v, s["sv"], lambda x, y: x * y),
                        F.lit(0.0),
                        lambda a, x: a + x,
                    ),
                    nrm * s["snrm"],
                ),
                6,
            ).alias("sim"),
            s["seed_id"].alias("seed_id"),
        ),
    )
    return F.array_sort(
        F.transform(
            scored,
            lambda s: F.struct(
                (-s["sim"]).alias("nsim"), s["seed_id"].alias("seed_id")
            ),
        )
    )


# -- index-as-layout: the persisted ANN index (r7 verdict item 4) -------------

# (applicationId, sf_dir, embeddings vintage) -> catalog table names. The
# bucketed.py layout-cache pattern: a fresh session, a rewritten input, or a
# missing catalog entry rewrites; otherwise every ANN consumer reads the
# already-written layout.
_ANN_LAYOUT_CACHE: dict[tuple, dict[str, str]] = {}


def ann_index_tables(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Write-once ANN index layout; returns catalog table names.

    At 100 TB the ANN index is A TABLE YOU BUILD ONCE AND PROBE MANY
    TIMES, not a per-query computation — this persists exactly that
    artifact set, once per (session, sf_dir, embeddings vintage):

    - ``index``: (vec_id, v, nrm, cell, codes) — every corpus vector with
      its IVF cell and PQ codes, written ``bucketBy(8, cell)`` + sorted,
      so probe-side cell joins and per-cell scans read a co-located
      layout (cell-pruned file groups at cluster scale; 8 buckets only
      keeps local files readable — the bucketed.py rationale). Carrying
      v/nrm makes it a COVERING index: exact in-cell rerank (q_sim_ivf)
      needs no join back to the corpus, and ADC scoring (q_sim_ivf_pq)
      reads codes off the same row instead of a vec_id shuffle join.
    - ``seeds``: (seed_id, sv, snrm) — the coarse quantizer, K rows.
    - ``codebook``: (m, k, c) — the trained PQ codebook, M*K rows.

    Probe time reads these tables only: no seed re-derivation, no
    codebook retraining, no re-assignment (the r7 verdict's gap — the
    stack recomputed all three per session). Values are identical to the
    in-flight pipeline by construction (the write runs that pipeline),
    so every oracle is unchanged."""
    from cloud_data_sync_spark.tables import _file_vintage, table_path

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _file_vintage(table_path(sf_dir, "embeddings")),
    )
    hit = _ANN_LAYOUT_CACHE.get(key)
    if hit is not None and all(
        spark.catalog.tableExists(n) for n in hit.values()
    ):
        return hit
    tag = hashlib.md5(repr(key).encode()).hexdigest()[:10]
    scratch = os.path.join(tempfile.gettempdir(), f"cds_ann_{tag}")
    names = {
        "index": f"ann_index_{tag}",
        "seeds": f"ann_seeds_{tag}",
        "codebook": f"ann_codebook_{tag}",
    }
    vecs = _vectors(spark, sf_dir)
    if not spark.catalog.tableExists(names["seeds"]):
        _seed_rows(vecs).write.option(
            "path", os.path.join(scratch, "seeds")
        ).mode("overwrite").saveAsTable(names["seeds"])
    if not spark.catalog.tableExists(names["codebook"]):
        _pq_codebook_build(spark, sf_dir).write.option(
            "path", os.path.join(scratch, "codebook")
        ).mode("overwrite").saveAsTable(names["codebook"])
    if not spark.catalog.tableExists(names["index"]):
        codes = _pq_codes_from(
            _pq_subvectors(vecs), spark.table(names["codebook"])
        )
        (
            _ivf_with_cell(spark, sf_dir)
            .select("vec_id", "v", "nrm", "cell")
            .join(codes, "vec_id")
            .write.bucketBy(8, "cell")
            .sortBy("cell")
            .option("path", os.path.join(scratch, "index"))
            .mode("overwrite")
            .saveAsTable(names["index"])
        )
    _ANN_LAYOUT_CACHE[key] = names
    return names


def _ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.table(ann_index_tables(spark, sf_dir)["index"])


def _ann_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded query set, read FROM the index layout (queries are
    corpus members; their v/nrm/codes ride the covering index rows)."""
    return _ann_index(spark, sf_dir).filter(
        (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_CAP)
    )


def _query_ranked_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, qv, qn, ranked): each query with ALL seed cells ranked,
    against the PERSISTED seeds table (no re-derivation)."""
    seeds_row = _seeds_pack(
        spark.table(ann_index_tables(spark, sf_dir)["seeds"])
    )
    return (
        _ann_queries(spark, sf_dir)
        .select("vec_id", "v", "nrm")
        .crossJoin(F.broadcast(seeds_row))
        .withColumn("ranked", _ranked_cells_col())
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            "ranked",
        )
    )


def _query_probe_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, qv, qn, cell): one row per (query, probed cell) — the
    N_PROBE nearest cells per query, the standard IVF recall/cost lever."""
    return _query_ranked_cells(spark, sf_dir).select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.transform(
                F.slice("ranked", 1, N_PROBE), lambda p: p["seed_id"]
            )
        ).alias("cell"),
    )


# IVF pipeline as named CTEs — shared by q_sim_ivf and (as the approximate
# side) q_sim_ivf_recall.
_IVF_TOPK_CTES = f"""
seeds AS (
  SELECT vec_id AS seed_id, v AS sv, nrm AS snrm
  FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {K_CENTROIDS}
),
assign AS (
  SELECT n.vec_id, s.seed_id,
         round(list_sum(list_transform(range(1, len(n.v) + 1),
               i -> n.v[i] * s.sv[i])) / (n.nrm * s.snrm), 6) AS sim
  FROM n, seeds s
),
cell AS (
  SELECT vec_id, seed_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, seed_id) AS rn
    FROM assign) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id, seed_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, seed_id) AS rn
    FROM assign WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_CAP}
  ) WHERE rn <= {N_PROBE}
),
ivf_cand AS (
  SELECT qc.vec_id AS query_id, cc.vec_id,
         round(list_sum(list_transform(range(1, len(qn.v) + 1),
               i -> qn.v[i] * cn.v[i])) / (qn.nrm * cn.nrm), 6) AS cos_sim
  FROM qprobe qc
  JOIN cell cc ON qc.cell = cc.cell AND qc.vec_id <> cc.vec_id
  JOIN n qn ON qn.vec_id = qc.vec_id
  JOIN n cn ON cn.vec_id = cc.vec_id
),
ivf_ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM ivf_cand
),
ivf_topk AS (
  SELECT query_id, vec_id, cos_sim, rank FROM ivf_ranked WHERE rank <= {TOP_K}
)
"""


@register(
    "q_sim_ivf",
    oracle=f"""
WITH {_ORACLE_VECS},
{_IVF_TOPK_CTES}
SELECT query_id, vec_id, cos_sim, rank FROM ivf_topk
""",
    doc=(
        "IVF-style ANN (nprobe=2): every vector indexes into its nearest "
        "coarse centroid; queries probe their TWO nearest cells (the "
        "standard recall/cost lever). Centroids are "
        "a FIXED-K deterministic sample (K smallest md5(vec_id) — "
        "TakeOrderedAndProject, bounded at any corpus size) shipped to every "
        "executor as ONE broadcast row holding the seed array, so cell "
        "assignment is a per-row argmax — no explode, no shuffle, no window. "
        "The assignment sim is rounded to 6 dp before the argmax so both "
        "engines break ties identically (then by seed_id)."
    ),
    plan=lambda spark, sf_dir: _ivf_topk_build(spark, sf_dir),
)
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spark, sf_dir)


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF result set, materialized once per (session, embeddings vintage):
    q_sim_ivf IS this table and q_sim_ivf_recall scores it against the
    brute-force truth — the audit reads the audited pipeline's rows
    (k×|queries| ids, KB-sized) instead of re-running assignment+probe."""
    return session_substrate(
        spark, _VEC_SUBSTRATE, sf_dir, "sim-ivf-topk", "embeddings",
        lambda: _ivf_topk_build(spark, sf_dir),
    )


def _ivf_with_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every vector with its IVF cell — the coarse-quantizer assignment,
    run at LAYOUT WRITE time (ann_index_tables); probe-time consumers
    read the persisted index instead of re-assigning. Cell = rank-1 of
    the shared _ranked_cells_col ordering, so write-time assignment and
    probe-time query ranking cannot drift on rounding/tie-break."""
    vecs = _vectors(spark, sf_dir)
    seeds_row = _seeds_pack(_seed_rows(vecs))
    return (
        vecs.crossJoin(F.broadcast(seeds_row))
        .withColumn("cell", F.element_at(_ranked_cells_col(), 1)["seed_id"])
        .drop("seeds")
    )


def _ivf_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-side IVF: broadcast the (bounded) query probe set against the
    persisted covering index — cell-equi join, exact in-cell cosines off
    the index row (no corpus join-back), shared ranking contract."""
    idx = _ann_index(spark, sf_dir)
    q = _query_probe_cells(spark, sf_dir)
    cand = (
        idx.select("cell", "vec_id", "v", "nrm")
        .join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6).alias(
            "cos_sim"
        ),
    )
    return _rank_topk(scored)


@register(
    "q_sim_ivf_recall",
    oracle=f"""
WITH {_ORACLE_VECS},
{_BF_TOPK_CTES},
{_IVF_TOPK_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_caught,
       floor(avg(CASE WHEN a.vec_id IS NULL THEN 0.0 ELSE 1.0 END) * 10000)
         / 10000 AS recall
FROM bf_topk t
LEFT JOIN ivf_topk a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
""",
    doc=(
        "Recall@k audit of the IVF ANN path: the brute-force exact top-"
        f"{TOP_K} per query is ground truth; the IVF(nprobe={N_PROBE}) "
        f"result set is scored against it. One summary row (n_true, "
        "n_caught, recall) — the similarity-side twin of "
        "q_dedup_lsh_recall, and the measure-don't-guess gate that "
        "decides whether K_CENTROIDS/nprobe are adequate before trusting "
        "the index at corpus scale. On THIS corpus it measures 0.14 at "
        "sf0.1 — and that is the audit working, not the index breaking: "
        "the synthetic embeddings are isotropic (measured mean pairwise "
        "cosine ~0.001 within labels and ~-0.002 across — no cluster "
        "structure), and coarse quantization cannot concentrate the true "
        "neighbors of structureless vectors into few cells, so recall "
        "degenerates toward the scanned-fraction floor (~nprobe/K). A "
        "real embedding corpus concentrates; a number like this one says "
        "probe more cells, train better centroids, or fall back to "
        "brute force — exactly the decision the gate exists to force "
        "BEFORE shipping the index. Both sides reuse "
        "their audited pipelines verbatim (shared CTEs on the oracle "
        "side, shared query functions on the Spark side) so the query "
        "set, 6 dp rounding, and vec_id tiebreak contracts cannot drift; "
        "the scoring join is a pair-key left join on ids only, and the "
        "query set is capped (vec_id % "
        f"{QUERY_MOD} = 0, < {QUERY_CAP}) so the audit cost is bounded "
        "regardless of corpus size."
    ),
)
def q_sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = (
        q_sim_ivf(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return truth.join(approx, ["query_id", "vec_id"], "left").agg(
        F.count("*").alias("n_true"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_caught"),
        floor_ratio(
            F.avg(F.coalesce("hit", F.lit(0)).cast("double")), 4
        ).alias("recall"),
    )


# -- product quantization (PQ) ------------------------------------------------

# M subspaces x SUBD dims (M*SUBD = DIM); K codewords per subspace; codebooks
# trained with the q_kmeans static-DAG pattern (deterministic vec_id % K
# seeding, 2 unrolled Lloyd rounds — no iteration-count data dependence).
_PQ_M, _PQ_SUBD, _PQ_K = 4, 16, 16


def _pq_d2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _pq_subvectors(vecs: DataFrame) -> DataFrame:
    """(vec_id, m, sv): the UNIT-normalized vector split into _PQ_M
    subvectors — PQ trains on normalized vectors so the asymmetric dot
    against codewords approximates cosine directly."""
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    return vecs.select("vec_id", "v", "nrm", ms).select(
        "vec_id",
        "m",
        F.transform(
            F.slice("v", F.col("m") * _PQ_SUBD + 1, _PQ_SUBD),
            lambda x: x / F.col("nrm"),
        ).alias("sv"),
    )


def _pq_centroids_of(assigned: DataFrame) -> DataFrame:
    """(m, k, c): per-dim means per (subspace, codeword) — the subspace
    variant of ml._centroids_of. The shuffle carries M*K*SUBD groups
    (constant) regardless of corpus size; partial avgs combine map-side."""
    per_dim = (
        assigned.select("m", "k", F.posexplode("sv").alias("dim", "x"))
        .groupBy("m", "k", "dim")
        .agg(F.avg("x").alias("v"))
    )
    return per_dim.groupBy("m", "k").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "v"))), lambda s: s["v"]
        ).alias("c")
    )


def _pq_assign(subv: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, m, sv, k): nearest codeword per subvector, map-only — the
    whole codebook (M*K = 64 rows) collapses to ONE broadcast row;
    argmin is array_min over rounded (d2, k) structs. d2 rounds to 6 dp
    BEFORE the argmin so both engines break ties identically (the
    q_sim_ivf convention — raw float avgs differ in the last ulp across
    engines' aggregation orders)."""
    packed = cents.agg(F.collect_list(F.struct("m", "k", "c")).alias("cs"))
    mine = F.filter(F.col("cs"), lambda s: s["m"] == F.col("m"))
    best = F.array_min(
        F.transform(
            mine,
            lambda s: F.struct(
                F.round(_pq_d2(F.col("sv"), s["c"]), 6).alias("d2"),
                s["k"].alias("k"),
            ),
        )
    )
    return (
        subv.crossJoin(F.broadcast(packed))
        .withColumn("best", best)
        .select("vec_id", "m", "sv", F.col("best.k").alias("k"))
    )


def _pq_codebook_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(m, k, c): the trained, densified PQ codebook — run at LAYOUT WRITE
    time (ann_index_tables persists it; probe-time LUT building reads the
    table, never retrains). Seeded by vec_id % K, two unrolled Lloyd
    rounds (the q_kmeans static DAG — no iteration-count data dependence).

    DENSIFY codeword ids after training: a corpus whose vec_id residues
    don't cover 0..K-1 (tiny fixtures; any K > corpus) trains a SPARSE
    codebook, and the ADC lookup is POSITIONAL (lut[m] is ordered by
    codeword id) — a sparse id k would index past the list end (an ANSI
    INVALID_ARRAY_INDEX job-killer, caught by the adversarial suite).
    row_number over k per subspace is order-preserving, so the argmin
    tie-break is unchanged; codes are then 0..len(codebook)-1 by
    construction. The window input is the M*K codebook — constant size."""
    subv = _pq_subvectors(_vectors(spark, sf_dir))
    seeded = subv.withColumn("k", F.col("vec_id") % _PQ_K)
    cb0 = _pq_centroids_of(seeded)
    cb1raw = _pq_centroids_of(_pq_assign(subv, cb0))
    wk = Window.partitionBy("m").orderBy("k")
    return cb1raw.select(
        "m", (F.row_number().over(wk) - 1).cast("long").alias("k"), "c"
    )


def _pq_codes_from(subv: DataFrame, cb1: DataFrame) -> DataFrame:
    """(vec_id, codes): every vector encoded to M dense codes against the
    final codebook — the write-time encode pass that lands in the index."""
    return (
        _pq_assign(subv, cb1)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "k"))),
                lambda s: s["k"],
            ).alias("codes")
        )
    )


def _query_lut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, lut): each bounded-set query's M x K asymmetric lookup
    table, built at PROBE time from the PERSISTED codebook — the query
    keeps its exact subvectors; lut[m][k] = <q_m, codeword(m,k)>, so a
    candidate's approximate cosine is M array lookups + adds instead of
    a DIM-wide dot. Shared verbatim by q_sim_pq (exhaustive ADC) and
    q_sim_ivf_pq (ADC within probed cells), so the two paths cannot
    drift on densification or LUT ordering."""
    cb1 = spark.table(ann_index_tables(spark, sf_dir)["codebook"])
    subq = _pq_subvectors(
        _ann_queries(spark, sf_dir).select("vec_id", "v", "nrm")
    )
    packed = cb1.agg(F.collect_list(F.struct("m", "k", "c")).alias("cs"))
    mine = F.filter(F.col("cs"), lambda s: s["m"] == F.col("m"))
    lut_m = F.transform(
        F.array_sort(
            F.transform(
                mine,
                lambda s: F.struct(
                    s["k"].alias("k"), _pq_dot(F.col("sv"), s["c"]).alias("d")
                ),
            )
        ),
        lambda s: s["d"],
    )
    return (
        subq.crossJoin(F.broadcast(packed))
        .select(F.col("vec_id").alias("query_id"), "m", lut_m.alias("lrow"))
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "lrow"))),
                lambda s: s["lrow"],
            ).alias("lut")
        )
    )


def _pq_adc() -> Column:
    """The shared ADC fold: score = sum over subspaces of
    lut[m][code[m] + 1] (codes are dense 0-based ids; lut rows are
    ordered by codeword id). A function, not a module constant: Column
    construction needs an active SparkContext."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_PQ_M)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("q.lut"), m),
            (F.element_at(F.col("codes"), m) + 1).cast("int"),
        ),
    )


def _pq_topk_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-side exhaustive ADC: codes stream off the persisted index;
    the query LUT pack is built from the persisted codebook."""
    codes = _ann_index(spark, sf_dir).select("vec_id", "codes")
    qpack = _query_lut(spark, sf_dir).agg(
        F.collect_list(F.struct("query_id", "lut")).alias("qs")
    )
    scored = (
        codes.crossJoin(F.broadcast(qpack))
        .select("vec_id", "codes", F.explode("qs").alias("q"))
        .filter(F.col("q.query_id") != F.col("vec_id"))
        .select(
            F.col("q.query_id").alias("query_id"),
            "vec_id",
            F.round(_pq_adc(), 6).alias("cos_sim"),
        )
    )
    return _rank_topk(scored).select(
        "query_id", "vec_id", F.col("cos_sim").alias("adc_sim"), "rank"
    )


def _pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ result set, materialized once per (session, embeddings vintage):
    q_sim_pq IS this table and q_sim_pq_recall scores it against the
    brute-force truth (the q_sim_ivf_recall scaffold)."""
    return session_substrate(
        spark, _VEC_SUBSTRATE, sf_dir, "sim-pq-topk", "embeddings",
        lambda: _pq_topk_build(spark, sf_dir),
    )


_PQ_CTES = f"""
subv AS (
  SELECT vec_id, t.m AS m,
         list_transform(range(1 + t.m * {_PQ_SUBD}, 1 + (t.m + 1) * {_PQ_SUBD}),
                        i -> v[i] / nrm) AS sv
  FROM n, LATERAL unnest(generate_series(0, {_PQ_M - 1})) AS t(m)
),
pq_seed AS (SELECT vec_id, m, sv, vec_id % {_PQ_K} AS k FROM subv),
pc0 AS (
  SELECT m, k, t.i AS i, avg(sv[t.i]) AS x
  FROM pq_seed, LATERAL unnest(generate_series(1, {_PQ_SUBD})) AS t(i)
  GROUP BY m, k, t.i
),
cb0 AS (SELECT m, k, list(x ORDER BY i) AS c FROM pc0 GROUP BY m, k),
pd1 AS (
  SELECT s.vec_id, s.m, s.sv, c.k,
         round(list_sum(list_transform(range(1, {_PQ_SUBD + 1}),
               i -> (s.sv[i] - c.c[i]) * (s.sv[i] - c.c[i]))), 6) AS d2
  FROM subv s JOIN cb0 c ON c.m = s.m
),
pa1 AS (
  SELECT vec_id, m, sv, k FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
    FROM pd1) WHERE rn = 1
),
pc1 AS (
  SELECT m, k, t.i AS i, avg(sv[t.i]) AS x
  FROM pa1, LATERAL unnest(generate_series(1, {_PQ_SUBD})) AS t(i)
  GROUP BY m, k, t.i
),
cb1raw AS (SELECT m, k, list(x ORDER BY i) AS c FROM pc1 GROUP BY m, k),
cb1 AS (
  SELECT m, CAST(row_number() OVER (PARTITION BY m ORDER BY k) - 1 AS BIGINT)
              AS k, c
  FROM cb1raw
),
pd2 AS (
  SELECT s.vec_id, s.m, c.k,
         round(list_sum(list_transform(range(1, {_PQ_SUBD + 1}),
               i -> (s.sv[i] - c.c[i]) * (s.sv[i] - c.c[i]))), 6) AS d2
  FROM subv s JOIN cb1 c ON c.m = s.m
),
pq_codes AS (
  SELECT vec_id, list(k ORDER BY m) AS codes FROM (
    SELECT vec_id, m, k FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, k) AS rn
      FROM pd2) WHERE rn = 1
  ) GROUP BY vec_id
),
pq_lut AS (
  SELECT q.vec_id AS query_id, q.m,
         list(list_sum(list_transform(range(1, {_PQ_SUBD + 1}),
              i -> q.sv[i] * c.c[i])) ORDER BY c.k) AS lrow
  FROM subv q JOIN cb1 c ON c.m = q.m
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id < {QUERY_CAP}
  GROUP BY q.vec_id, q.m
),
pq_lut2 AS (
  SELECT query_id, list(lrow ORDER BY m) AS lut FROM pq_lut GROUP BY query_id
),
pq_adc AS (
  SELECT l.query_id, cl.vec_id,
         round(list_sum(list_transform(range(1, {_PQ_M + 1}),
               m -> l.lut[m][cl.codes[m] + 1])), 6) AS adc_sim
  FROM pq_lut2 l, pq_codes cl WHERE l.query_id <> cl.vec_id
),
pq_topk AS (
  SELECT query_id, vec_id, adc_sim, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc_sim DESC, vec_id) AS BIGINT) AS rank
    FROM pq_adc) WHERE rank <= {TOP_K}
)
"""


@register(
    "q_sim_pq",
    oracle=f"""
WITH {_ORACLE_VECS},
{_PQ_CTES}
SELECT query_id, vec_id, adc_sim, rank FROM pq_topk
""",
    doc=(
        f"Product quantization ANN (r6 verdict item 4): the 64-dim "
        f"normalized vectors split into {_PQ_M} subspaces of {_PQ_SUBD} "
        f"dims; per subspace a {_PQ_K}-codeword codebook is trained with "
        "the q_kmeans static DAG (deterministic vec_id % K seeding, two "
        "unrolled Lloyd rounds, per-subvector d2 rounded to 6 dp before "
        "each argmin so engines tie-break identically), every vector "
        f"encodes to {_PQ_M} one-byte codes (16x compression of the "
        "index), and queries score candidates ASYMMETRICALLY: the query "
        "keeps its exact subvectors, builds an M x K lookup table of "
        "subspace dots against the codebook, and a candidate's "
        "approximate cosine is M table lookups + adds instead of a "
        "64-wide dot (Jegou et al., 'Product Quantization for Nearest "
        "Neighbor Search'). Plan: codebook training shuffles M*K*SUBD "
        "constant-size groups; encoding is map-only against the ONE "
        "broadcast codebook row; scoring is the brute-force scan shape "
        "with the per-pair cost collapsed — and composing it with "
        "q_sim_ivf's cell restriction (score only probed cells) is the "
        "full IVF-PQ production layout, both halves of which this "
        "registry now audits."
    ),
    plan=lambda spark, sf_dir: _pq_topk_build(spark, sf_dir),
)
def q_sim_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pq_topk(spark, sf_dir)


@register(
    "q_sim_pq_recall",
    oracle=f"""
WITH {_ORACLE_VECS},
{_BF_TOPK_CTES},
{_PQ_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_caught,
       floor(avg(CASE WHEN a.vec_id IS NULL THEN 0.0 ELSE 1.0 END) * 10000)
         / 10000 AS recall
FROM bf_topk t
LEFT JOIN pq_topk a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
""",
    doc=(
        "Recall@k audit of the PQ path against the brute-force exact "
        "top-k (the q_sim_ivf_recall scaffold verbatim: shared CTEs on "
        "the oracle side, the audited pipelines' own result substrates "
        "on the Spark side, ids-only scoring join, bounded query set). "
        "PQ approximates the SCORE rather than pruning candidates, so "
        "unlike IVF its recall on isotropic synthetic embeddings is "
        "informative about quantization error, not cell concentration — "
        "the two audits together say which half of an IVF-PQ stack "
        "loses the neighbors."
    ),
)
def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = (
        q_sim_pq(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return truth.join(approx, ["query_id", "vec_id"], "left").agg(
        F.count("*").alias("n_true"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_caught"),
        floor_ratio(
            F.avg(F.coalesce("hit", F.lit(0)).cast("double")), 4
        ).alias("recall"),
    )


# -- IVF-PQ: the two audited halves composed ----------------------------------

_IVFPQ_CTES = f"""
ivfpq_cand AS (
  SELECT qp.vec_id AS query_id, cc.vec_id
  FROM qprobe qp JOIN cell cc ON qp.cell = cc.cell AND qp.vec_id <> cc.vec_id
),
ivfpq_adc AS (
  SELECT c.query_id, c.vec_id,
         round(list_sum(list_transform(range(1, {_PQ_M + 1}),
               m -> l.lut[m][cl.codes[m] + 1])), 6) AS adc_sim
  FROM ivfpq_cand c
  JOIN pq_lut2 l ON l.query_id = c.query_id
  JOIN pq_codes cl ON cl.vec_id = c.vec_id
),
ivfpq_topk AS (
  SELECT query_id, vec_id, adc_sim, rank FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY adc_sim DESC, vec_id) AS BIGINT) AS rank
    FROM ivfpq_adc) WHERE rank <= {TOP_K}
)"""


def _ivf_pq_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-side IVFADC over the covering index: the cell-equi candidate
    join reads (vec_id, cell, codes) off ONE index row — the pre-layout
    plan's codes-by-vec_id shuffle join is gone (the covering index IS
    that join, paid once at write time)."""
    idx = _ann_index(spark, sf_dir)
    q = _query_probe_cells(spark, sf_dir).select("query_id", "cell")
    cand = (
        idx.select("cell", "vec_id", "codes")
        .join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    qstruct = _query_lut(spark, sf_dir).select(
        "query_id",
        F.struct(
            F.col("query_id").alias("query_id"), F.col("lut").alias("lut")
        ).alias("q"),
    )
    scored = cand.join(F.broadcast(qstruct), "query_id").select(
        "query_id", "vec_id", F.round(_pq_adc(), 6).alias("cos_sim")
    )
    return _rank_topk(scored).select(
        "query_id", "vec_id", F.col("cos_sim").alias("adc_sim"), "rank"
    )


def _ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_substrate(
        spark, _VEC_SUBSTRATE, sf_dir, "sim-ivfpq-topk", "embeddings",
        lambda: _ivf_pq_build(spark, sf_dir),
    )


@register(
    "q_sim_ivf_pq",
    oracle=f"""
WITH {_ORACLE_VECS},
{_IVF_TOPK_CTES},
{_PQ_CTES},
{_IVFPQ_CTES}
SELECT query_id, vec_id, adc_sim, rank FROM ivfpq_topk
""",
    doc=(
        "IVF-PQ — the production ANN layout, composed from the two halves "
        "this registry already audits separately: candidates come from "
        "q_sim_ivf's coarse quantizer (each query probes its N_PROBE "
        "nearest cells; the SAME _ivf_with_cell stage, so seeding and "
        "tie-breaks cannot drift) and are scored with q_sim_pq's "
        "asymmetric lookup tables over the SAME trained codebook "
        "(_pq_model) — M table lookups + adds per candidate instead of a "
        "64-wide dot, over only the probed fraction of the corpus "
        "instead of all of it. This is the Jegou et al. IVFADC "
        "configuration every billion-vector deployment runs. Plan: the "
        "constant seed/codebook packs broadcast; the candidate join is "
        "cell-equi; codes attach by vec_id; the bounded query LUT side "
        "broadcasts as a hash join (no nested loop)."
    ),
    plan=lambda spark, sf_dir: _ivf_pq_build(spark, sf_dir),
)
def q_sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_pq_topk(spark, sf_dir)


@register(
    "q_sim_ivf_pq_recall",
    oracle=f"""
WITH {_ORACLE_VECS},
{_BF_TOPK_CTES},
{_IVF_TOPK_CTES},
{_PQ_CTES},
{_IVFPQ_CTES}
SELECT CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN a.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_caught,
       floor(avg(CASE WHEN a.vec_id IS NULL THEN 0.0 ELSE 1.0 END) * 10000)
         / 10000 AS recall
FROM bf_topk t
LEFT JOIN ivfpq_topk a ON a.query_id = t.query_id AND a.vec_id = t.vec_id
""",
    doc=(
        "Recall@k audit of the composed IVF-PQ path against brute force — "
        "the third row of the ANN audit table (IVF-only isolates cell "
        "concentration, PQ-only isolates quantization error, this one "
        "measures the product of the two losses a deployment actually "
        "ships). Same scaffold, query set, and tie-break contracts as "
        "the other two audits."
    ),
)
def q_sim_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    truth = q_sim_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = (
        q_sim_ivf_pq(spark, sf_dir)
        .select("query_id", "vec_id")
        .withColumn("hit", F.lit(1))
    )
    return truth.join(approx, ["query_id", "vec_id"], "left").agg(
        F.count("*").alias("n_true"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_caught"),
        floor_ratio(
            F.avg(F.coalesce("hit", F.lit(0)).cast("double")), 4
        ).alias("recall"),
    )


# -- IVF operating-point calibration (r7 verdict item 1) ----------------------


def _ivf_sweep_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ann_index(spark, sf_dir)
    # cell sizes: ONE constant-state aggregate over the index scan (≤K
    # groups, map-side combine — the shuffle carries partial counts only)
    csize = idx.groupBy("cell").agg(F.count("*").alias("sz"))
    # (query_id, r, cell): every seed cell ranked per query — bounded at
    # |queries| × K rows
    qr = (
        _query_ranked_cells(spark, sf_dir)
        .select("query_id", F.posexplode("ranked").alias("i", "p"))
        .select(
            "query_id",
            (F.col("i") + 1).cast("long").alias("r"),
            F.col("p.seed_id").alias("cell"),
        )
    )
    # candidates scanned at depth p = cumulative probed-cell sizes − 1
    # (the query itself always sits in its rank-1 cell)
    wq = (
        Window.partitionBy("query_id")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    qcum = (
        qr.join(F.broadcast(csize), "cell", "left")
        .withColumn("cum", F.sum(F.coalesce("sz", F.lit(0))).over(wq))
        .withColumn("n_cand", (F.col("cum") - 1).cast("double"))
    )
    depth = qcum.groupBy("r").agg(F.avg("n_cand").alias("mean_cand"))
    # a true top-k neighbor is caught at EXACTLY the depth that first
    # probes its cell: IVF scores candidates with exact cosines under the
    # global ranking contract, so a global-top-k member present in the
    # candidate set can never be displaced — membership IS recall
    truth = _bf_topk(spark, sf_dir).select("query_id", "vec_id")
    hist = (
        idx.select("vec_id", "cell")
        .join(F.broadcast(truth), "vec_id")
        .join(F.broadcast(qr), ["query_id", "cell"])
        .groupBy("r")
        .agg(F.count("*").alias("c"))
    )
    pack = truth.agg(F.count("*").alias("n_true")).crossJoin(
        idx.agg(F.count("*").alias("n_corpus"))
    )
    wr = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    return (
        depth.join(F.broadcast(hist), "r", "left")
        .withColumn(
            "n_caught",
            F.sum(F.coalesce("c", F.lit(0))).over(wr).cast("long"),
        )
        .crossJoin(F.broadcast(pack))
        .select(
            F.col("r").alias("n_probe"),
            "n_true",
            "n_caught",
            floor_ratio(
                F.try_divide(
                    F.col("n_caught").cast("double"), F.col("n_true")
                ),
                4,
            ).alias("recall"),
            floor_ratio(F.col("mean_cand"), 4).alias("mean_candidates"),
            floor_ratio(
                F.try_divide(
                    F.col("mean_cand"), (F.col("n_corpus") - 1).cast("double")
                ),
                6,
            ).alias("corpus_frac"),
        )
    )


@register(
    "q_sim_ivf_sweep",
    oracle=f"""
WITH {_ORACLE_VECS},
{_BF_TOPK_CTES},
{_IVF_TOPK_CTES},
qrank AS (
  SELECT vec_id AS query_id, seed_id AS cell,
         CAST(row_number() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, seed_id) AS BIGINT) AS r
  FROM assign WHERE vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_CAP}
),
csize AS (SELECT cell, count(*) AS sz FROM cell GROUP BY cell),
qcum AS (
  SELECT q.query_id, q.r,
         CAST(sum(coalesce(s.sz, 0)) OVER (PARTITION BY q.query_id
              ORDER BY q.r ROWS UNBOUNDED PRECEDING) - 1 AS DOUBLE) AS n_cand
  FROM qrank q LEFT JOIN csize s ON s.cell = q.cell
),
depth AS (
  SELECT r, avg(n_cand) AS mean_cand FROM qcum GROUP BY r
),
hist AS (
  SELECT q.r, count(*) AS c
  FROM bf_topk t
  JOIN cell cc ON cc.vec_id = t.vec_id
  JOIN qrank q ON q.query_id = t.query_id AND q.cell = cc.cell
  GROUP BY q.r
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM bf_topk),
corp AS (SELECT count(*) AS n_corpus FROM n)
SELECT d.r AS n_probe,
       t.n_true,
       CAST(sum(coalesce(h.c, 0)) OVER (ORDER BY d.r ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_caught,
       floor(sum(coalesce(h.c, 0)) OVER (ORDER BY d.r ROWS UNBOUNDED PRECEDING)
             / CAST(t.n_true AS DOUBLE) * 10000) / 10000 AS recall,
       floor(d.mean_cand * 10000) / 10000 AS mean_candidates,
       floor(d.mean_cand / CAST(p.n_corpus - 1 AS DOUBLE) * 1000000) / 1000000
         AS corpus_frac
FROM depth d
LEFT JOIN hist h ON h.r = d.r
CROSS JOIN tot t CROSS JOIN corp p
""",
    doc=(
        "IVF operating-point calibration (r7 verdict item 1) — the "
        "similarity twin of q_dedup_minhash_sweep: ONE row per probe "
        "depth 1..K with recall@k against the brute-force truth, mean "
        "candidates scanned per query, and the corpus fraction touched — "
        "the recall-vs-cost curve a deployment picks N_PROBE from with "
        "evidence instead of a fixed constant. The whole grid falls out "
        "of ONE candidate-ranked aggregate, no per-depth re-probing: "
        "because IVF scores candidates with EXACT cosines under the "
        "global (rounded-cosine, vec_id) ranking contract, a true top-k "
        "neighbor in the candidate set can never be displaced by a "
        "non-member — so it is caught at exactly the depth that first "
        "probes its cell, and recall(p) is a running sum over the "
        "cell-rank histogram of the truth pairs. Substrates shared "
        "verbatim: the persisted index (cells), the persisted seeds "
        "(query cell ranking), and the brute-force top-k session "
        "substrate (truth); the only corpus-touching additions are the "
        "index scan for ≤K-group cell sizes (map-side combined) and the "
        "ids-only truth join — no new corpus exchange. All depth-keyed "
        "frames are ≤K rows (the global running-sum window and the "
        "1-row totals pack are constant-size)."
    ),
)
def q_sim_ivf_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_sweep_build(spark, sf_dir)


@register(
    "q_sim_index_stats",
    oracle=f"""
WITH {_ORACLE_VECS},
seeds AS (
  SELECT vec_id AS seed_id, v AS sv, nrm AS snrm
  FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {K_CENTROIDS}
),
assign AS (
  SELECT n.vec_id, s.seed_id,
         round(list_sum(list_transform(range(1, len(n.v) + 1),
               i -> n.v[i] * s.sv[i])) / (n.nrm * s.snrm), 6) AS sim
  FROM n, seeds s
),
cell AS (
  SELECT vec_id, seed_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY sim DESC, seed_id) AS rn
    FROM assign) WHERE rn = 1
),
csize AS (SELECT cell, count(*) AS sz FROM cell GROUP BY cell)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM seeds) AS n_seeds,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((SELECT count(*) FROM seeds) - count(*) AS BIGINT)
         AS n_empty_cells,
       CAST(min(sz) AS BIGINT) AS min_cell,
       CAST(max(sz) AS BIGINT) AS max_cell,
       floor(avg(CAST(sz AS DOUBLE)) * 10000) / 10000 AS mean_cell,
       floor(max(sz) / (SELECT CAST(count(*) AS DOUBLE) FROM n) * 1000000)
         / 1000000 AS max_cell_frac
FROM csize
""",
    doc=(
        "Index-layout balance audit over the PERSISTED ANN index: "
        "populated/empty cell counts and the cell-size distribution "
        "(min/mean/max, largest-cell corpus fraction) — the health check "
        "a deployment runs after every index build, because IVF probe "
        "cost is proportional to probed-cell size and a skewed layout "
        "(one mega-cell) silently turns nprobe=2 into a near-full scan. "
        "Reads only the index table: one ≤K-group aggregate (map-side "
        "combined) folded to a single summary row; the seeds count rides "
        "the K-row seeds table. Together with q_sim_ivf_sweep this "
        "closes the layout's measure-don't-guess loop: stats say whether "
        "the partitioning is balanced, the sweep says what probing it "
        "costs."
    ),
)
def q_sim_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = ann_index_tables(spark, sf_dir)
    idx = spark.table(names["index"])
    csize = idx.groupBy("cell").agg(F.count("*").alias("sz"))
    seeds_n = spark.table(names["seeds"]).agg(
        F.count("*").alias("n_seeds")
    )
    corp = idx.agg(F.count("*").alias("n_vectors"))
    return (
        csize.agg(
            F.count("*").alias("n_cells"),
            F.min("sz").alias("min_cell"),
            F.max("sz").alias("max_cell"),
            floor_ratio(F.avg(F.col("sz").cast("double")), 4).alias(
                "mean_cell"
            ),
        )
        .crossJoin(F.broadcast(seeds_n))
        .crossJoin(F.broadcast(corp))
        .select(
            "n_seeds",
            "n_cells",
            (F.col("n_seeds") - F.col("n_cells")).alias("n_empty_cells"),
            "min_cell",
            "max_cell",
            "mean_cell",
            floor_ratio(
                F.try_divide(
                    F.col("max_cell").cast("double"), F.col("n_vectors")
                ),
                6,
            ).alias("max_cell_frac"),
        )
    )


@register(
    "q_vector_stats",
    oracle="""
WITH flat AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
  FROM embeddings
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(v), 6) AS mean_v,
       round(stddev_samp(v), 6) AS sd_v,
       round(min(v), 6) AS min_v,
       round(max(v), 6) AS max_v
FROM flat GROUP BY dim
""",
    doc=(
        "Per-dimension embedding profile (mean/sd/min/max over each of the "
        "64 dims): posexplode + hash aggregate — the fan-out is corpus x "
        "dims but the aggregate state is 64 tiny co-moment sketches with "
        "map-side combine, so the shuffle carries only partials. The "
        "drift-detection / normalization-fitting primitive for embedding "
        "pipelines."
    ),
)
def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        F.posexplode(F.col("embedding")).alias("dim", "vf")
    ).select("dim", F.col("vf").cast("double").alias("v"))
    return (
        flat.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.round(F.stddev_samp("v"), 6).alias("sd_v"),
            F.round(F.min("v"), 6).alias("min_v"),
            F.round(F.max("v"), 6).alias("max_v"),
        )
        .select(F.col("dim").cast("long").alias("dim"), "n", "mean_v", "sd_v", "min_v", "max_v")
    )


@register(
    "q_vector_quantize",
    oracle="""
SELECT vec_id,
       round(mn, 6) AS v_min,
       round(mx, 6) AS v_max,
       CAST(list_aggregate(q, 'min') AS BIGINT) AS q_min,
       CAST(list_aggregate(q, 'max') AS BIGINT) AS q_max,
       round(list_aggregate(
         list_transform(range(1, len(v) + 1),
                        i -> abs(v[i] - (mn + q[i] * sc))), 'avg'), 9)
         AS mean_abs_err
FROM (
  SELECT vec_id, v, mn, mx, sc,
         list_transform(v, x -> CAST(floor((x - mn) / nullif(sc, 0) + 0.5)
                                     AS BIGINT)) AS q
  FROM (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                          'min') AS mn,
           list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                          'max') AS mx,
           (list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                           'max')
            - list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             'min')) / 255.0 AS sc
    FROM embeddings
  )
)
WHERE sc > 0
""",
    doc=(
        "Per-vector int8 scalar quantization — the storage form a "
        "100 TB-class embedding store actually ships (4x smaller than "
        "float32, dot products on integers): codes = floor((x-min)/scale "
        "+ 0.5) against the vector's own [min, max] range, plus the "
        "reconstruction-error audit (mean |x - dequant(x)|) every "
        "compression rollout needs. Entirely map-only array math inside "
        "codegen — zero shuffles, one corpus scan (the explicit "
        "floor(+0.5) sidesteps engine-specific round() tie rules). "
        "Constant vectors (scale 0) are excluded identically on both "
        "engines."
    ),
)
def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    mn, mx = F.array_min("v"), F.array_max("v")
    based = emb.select(
        "vec_id", "v", mn.alias("mn"), mx.alias("mx"), ((mx - mn) / 255.0).alias("sc")
    ).filter(F.col("sc") > 0)
    q = F.transform(
        "v",
        lambda x: F.floor((x - F.col("mn")) / F.col("sc") + F.lit(0.5)).cast("long"),
    )
    quant = based.withColumn("q", q)
    errs = F.zip_with(
        "v", "q", lambda x, c: F.abs(x - (F.col("mn") + c * F.col("sc")))
    )
    mean_err = F.aggregate(
        errs, F.lit(0.0), lambda a, e: a + e, lambda a: a / F.size("v")
    )
    return quant.select(
        "vec_id",
        F.round("mn", 6).alias("v_min"),
        F.round("mx", 6).alias("v_max"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.round(mean_err, 9).alias("mean_abs_err"),
    )


@register(
    "q_embedding_compactness",
    oracle="""
WITH vecs AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
flat AS (
  SELECT label, unnest(range(0, len(v))) AS dim,
         unnest(v) AS x
  FROM vecs
),
cent AS (
  SELECT label, dim, avg(x) AS c FROM flat GROUP BY label, dim
),
carr AS (
  SELECT label, array_agg(c ORDER BY dim) AS cv FROM cent GROUP BY label
),
dists AS (
  SELECT v.label,
         sqrt(list_aggregate(
           list_transform(range(1, len(v.v) + 1),
                          i -> (v.v[i] - c.cv[i]) * (v.v[i] - c.cv[i])),
           'sum')) AS d
  FROM vecs v JOIN carr c ON c.label = v.label
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       round(avg(d), 6) AS mean_dist,
       round(max(d), 6) AS max_dist
FROM dists GROUP BY label
""",
    doc=(
        "Embedding-cluster compactness audit: per-label centroid "
        "(dimension-wise mean via posexplode + hash agg — the centroid "
        "shuffle carries labels × dims partial sums, never vectors), "
        "re-packed per label and broadcast back for each vector's "
        "Euclidean distance to its own centroid. mean/max distance per "
        "label is the drift check an embedding-QA gate runs after every "
        "encoder change: a label whose compactness jumps is a labeling "
        "or encoder regression. Same shape as one k-means E-step "
        "(ml.py), reported as a metric instead of consumed by an update."
    ),
)
def q_embedding_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    flat = emb.select("label", F.posexplode("v").alias("dim", "x"))
    cent = flat.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    joined = emb.join(F.broadcast(carr), "label")
    d = F.sqrt(
        F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
    )
    return (
        joined.select("label", d.alias("d"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
            F.round(F.max("d"), 6).alias("max_dist"),
        )
    )


# Shared band/candidate CTEs for the embedding pair pipeline — used by
# this module's kNN-graph oracle AND dedup._embedding_oracle, mirroring
# the Spark-side single definition (dedup.embedding_candidate_cosines) so
# a banding change cannot desync the two oracles.
_EMBEDDING_BANDS_CTES = """
bands AS (
  SELECT vec_id, 0 AS band_id, substr(bucket, 1, 4) AS band_sig FROM sig
  UNION ALL
  SELECT vec_id, 1, substr(bucket, 5, 4) FROM sig
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
              AND a.vec_id < b.vec_id
)
"""


@register(
    "q_sim_knn_graph",
    oracle=f"""
WITH {_ORACLE_VECS},
{_ORACLE_SIG},
{_EMBEDDING_BANDS_CTES},
scored AS (
  SELECT c.vec_a, c.vec_b,
         round(list_sum(list_transform(range(1, len(a.v) + 1),
               i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS cos_sim
  FROM cand c
  JOIN n a ON a.vec_id = c.vec_a
  JOIN n b ON b.vec_id = c.vec_b AND b.label = a.label
),
sym AS (
  SELECT vec_a AS vec_id, vec_b AS nbr_id, cos_sim FROM scored
  UNION ALL
  SELECT vec_b, vec_a, cos_sim FROM scored
)
SELECT vec_id, nbr_id, cos_sim, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY cos_sim DESC, nbr_id) AS rn
  FROM sym
) WHERE rn <= 3
""",
    doc=(
        "Approximate kNN graph over the embedding corpus: top-3 cosine "
        "neighbors per vector among its (label x LSH-band) candidates — "
        "the input artifact for graph-based semantic dedup (SemDeDup "
        "clustering), label-propagation QA, and kNN-classifier eval. "
        "Reuses the SAME candidate pipeline as q_dedup_embedding "
        "(dedup.embedding_candidate_cosines: pair keys shuffle ~16 B/row, "
        "vectors attach after pair-dedup, einsum pandas-UDF cosine), so "
        "the graph is consistent with the dedup pass by construction. "
        "Symmetrization is a map-only explode of a 2-element struct "
        "array over the scored pair set (each pair cosine-scored once, "
        "emitted in both directions — a union of two projections would "
        "compile to two physical branches and score twice); the per-vector "
        "ranking window partitions on vec_id — bounded partitions "
        "(candidates per vector are capped by the LSH bucket size "
        "~N_label/2^4), no global sort. Ranking is by the 6 dp-rounded "
        "cosine with nbr_id tiebreak, the module-wide cross-engine "
        "ranking contract."
    ),
)
def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cloud_data_sync_spark.operators.dedup import embedding_candidate_cosines

    # NULL cosines (a zero-norm or NULL-embedding side) are not edges: a
    # knn graph ranks by similarity and a pair with no defined similarity
    # must not occupy a rank slot. The oracle's `n` CTE excludes
    # degenerate vectors outright, so the edge sets agree.
    pairs = embedding_candidate_cosines(spark, sf_dir).select(
        "vec_a", "vec_b", "cos_sim"
    ).filter(F.col("cos_sim").isNotNull())
    # map-only symmetrization: explode a 2-element struct array so every
    # pair is cosine-scored exactly once and emitted twice. (A union of
    # two projections of `pairs` would compile to two physical branches —
    # the candidate join and the pandas-UDF cosine would run twice.)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("vec_a").alias("vec_id"),
                    F.col("vec_b").alias("nbr_id"),
                    F.col("cos_sim"),
                ),
                F.struct(
                    F.col("vec_b").alias("vec_id"),
                    F.col("vec_a").alias("nbr_id"),
                    F.col("cos_sim"),
                ),
            )
        ).alias("e")
    ).select("e.vec_id", "e.nbr_id", "e.cos_sim")
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
    )


# -- embedding drift monitor ---------------------------------------------------

_DRIFT_TOP = 8  # per-dim rows emitted: the top-drifted dimensions


@register(
    "q_embedding_drift",
    oracle=f"""
WITH n AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
flat AS (
  SELECT label % 2 AS side, t.i AS dim, n.v[t.i] AS x
  FROM n, LATERAL unnest(range(1, len(n.v) + 1)) AS t(i)
),
per_dim AS (
  SELECT dim,
         count(CASE WHEN side = 0 THEN 1 END) AS n_ref,
         count(CASE WHEN side = 1 THEN 1 END) AS n_cand,
         avg(CASE WHEN side = 0 THEN x END) AS m_ref,
         avg(CASE WHEN side = 1 THEN x END) AS m_cand,
         var_samp(CASE WHEN side = 0 THEN x END) AS v_ref,
         var_samp(CASE WHEN side = 1 THEN x END) AS v_cand
  FROM flat GROUP BY dim
),
scored AS (
  SELECT dim, n_ref, n_cand, m_ref, m_cand,
         abs(m_cand - m_ref)
           / sqrt(((n_ref - 1) * v_ref + (n_cand - 1) * v_cand)
                  / (n_ref + n_cand - 2))
           AS z,
         row_number() OVER (ORDER BY abs(m_cand - m_ref) DESC, dim) AS rn
  FROM per_dim
)
SELECT CAST(dim - 1 AS BIGINT) AS dim,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cand AS BIGINT) AS n_cand,
       CASE WHEN abs(m_ref * 1000000) < 9007199254740992
            THEN floor(m_ref * 1000000) / 1000000 END AS mean_ref,
       CASE WHEN abs(m_cand * 1000000) < 9007199254740992
            THEN floor(m_cand * 1000000) / 1000000 END AS mean_cand,
       floor(z * 10000) / 10000 AS drift_z
FROM scored WHERE rn <= {_DRIFT_TOP}
""",
    doc=(
        "Embedding drift monitor — the vector twin of q_psi_drift: "
        "split the corpus into reference and candidate populations "
        "(label parity — a deployment passes two vintages), compute "
        "per-DIMENSION means and pooled-variance effect sizes in one "
        "conditional aggregate over the position-exploded vectors, and "
        "emit the top-drifted dimensions ranked by mean shift. This is "
        "how a feature store catches a silently retrained upstream "
        "encoder before ANN recall collapses: per-dim statistics are "
        "additive (mergeable across partitions and days), the exploded "
        "stream map-side combines into a DIM-bounded frame (64 rows "
        "here, never vector count), and the ranked window runs over "
        "that frame. Top-k by (|shift|, dim) keeps the output bounded "
        "and deterministic."
    ),
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    flat = emb.select(
        (F.col("label") % 2).alias("side"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("dim", "x"),
    )
    ref = F.when(F.col("side") == 0, F.col("x"))
    cand = F.when(F.col("side") == 1, F.col("x"))
    per_dim = flat.groupBy("dim").agg(
        F.count(ref).alias("n_ref"),
        F.count(cand).alias("n_cand"),
        F.avg(ref).alias("m_ref"),
        F.avg(cand).alias("m_cand"),
        F.var_samp(ref).alias("v_ref"),
        F.var_samp(cand).alias("v_cand"),
    )
    z = F.abs(F.col("m_cand") - F.col("m_ref")) / F.sqrt(
        (
            (F.col("n_ref") - 1) * F.col("v_ref")
            + (F.col("n_cand") - 1) * F.col("v_cand")
        )
        / (F.col("n_ref") + F.col("n_cand") - 2)
    )
    scored = per_dim.select(
        "dim",
        "n_ref",
        "n_cand",
        "m_ref",
        "m_cand",
        z.alias("z"),
    ).orderBy(
        F.desc(F.abs(F.col("m_cand") - F.col("m_ref"))), F.asc("dim")
    ).limit(_DRIFT_TOP)
    # floor() returns LONG in Spark and silently clamps past 2^63 while
    # DuckDB's floor stays double — corrupt 1e30-magnitude embeddings
    # diverge the engines. Gate the quantization behind the float-exact
    # integer range (2^53) and emit NULL beyond it on BOTH engines (the
    # q_random_projection clamp rule).
    def _safe_floor(col, p: int):
        scaled = col * p
        return F.when(
            F.abs(scaled) < F.lit(9007199254740992), F.floor(scaled) / p
        )

    return scored.select(
        F.col("dim").cast("long").alias("dim"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cand").cast("long").alias("n_cand"),
        _safe_floor(F.col("m_ref"), 1_000_000).alias("mean_ref"),
        _safe_floor(F.col("m_cand"), 1_000_000).alias("mean_cand"),
        (F.floor(F.col("z") * 10_000) / 10_000).alias("drift_z"),
    )


# -- radius (threshold) search -------------------------------------------------

_RANGE_TAU = 0.25


@register(
    "q_sim_range",
    oracle=f"""
WITH {_ORACLE_VECS},
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         round(list_sum(list_transform(range(1, len(q.v) + 1),
               i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6) AS cos_sim
  FROM n q JOIN n c ON q.vec_id % {QUERY_MOD} = 0 AND q.vec_id < {QUERY_CAP}
                    AND q.vec_id <> c.vec_id
),
best AS (
  SELECT query_id, vec_id AS best_id, cos_sim AS best_cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rn
  FROM pairs
),
counts AS (
  SELECT query_id,
         sum(CASE WHEN cos_sim >= {_RANGE_TAU} THEN 1 ELSE 0 END) AS n_matches
  FROM pairs GROUP BY query_id
)
SELECT c.query_id,
       CAST(c.n_matches AS BIGINT) AS n_matches,
       b.best_id, b.best_cos
FROM counts c JOIN best b ON b.query_id = c.query_id AND b.rn = 1
""",
    doc=(
        "Radius (threshold) search — the OTHER standard vector query "
        "next to top-k: per query, how many corpus vectors lie within "
        "cosine >= tau, plus the single best match (deterministic "
        "tie-break by id). Same plan spine as q_sim_topk: the bounded "
        "query set broadcasts against ONE corpus pass, the per-query "
        "reduction is a conditional count + a rank-1 window over "
        "query-partitioned pairs. Radius semantics matter for dedup-"
        "style deployments (SemDeDup thresholds, not fixed k): the "
        "match count is unbounded per query, so the COUNT is the "
        "emitted product and the row set stays |queries|-bounded."
    ),
    plan=lambda spark, sf_dir: _range_search_build(spark, sf_dir),
)
def q_sim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _range_search_build(spark, sf_dir)


def _range_search_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(
        (F.col("vec_id") % QUERY_MOD == 0) & (F.col("vec_id") < QUERY_CAP)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = vecs.join(
        F.broadcast(queries), F.col("query_id") != F.col("vec_id")
    ).select(
        "query_id",
        "vec_id",
        F.round(
            _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("vec_id").alias("best_id"),
            F.col("cos_sim").alias("best_cos"),
        )
    )
    counts = pairs.groupBy("query_id").agg(
        F.sum(F.when(F.col("cos_sim") >= _RANGE_TAU, 1).otherwise(0))
        .cast("long")
        .alias("n_matches")
    )
    return counts.join(best, "query_id").select(
        "query_id", "n_matches", "best_id", "best_cos"
    )
