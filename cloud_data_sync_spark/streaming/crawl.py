"""Streaming near-duplicate ingest: MinHash + LSH over a document stream.

The batch incremental shape (``q_dedup_minhash_incremental``) re-lists the
whole corpus every tick; a production crawl INGESTS — each arriving
micro-batch is MinHash-signed map-side, banded, and probed against the
band-bucket state accumulated from every earlier batch, emitting
novel/near-dup verdicts as documents arrive (r7 verdict item 2). This
module is that operator:

- ``read_documents_stream``: file-source stream over the documents
  parquet (fixed schema, ``documents*.parquet`` glob so multi-file crawl
  fixtures exercise real multi-batch arrival).
- The per-row pipeline REUSES the batch dedup substrate code verbatim
  (``augment_docs`` + ``minhash_signatures`` + the band/bucket-key
  construction of ``lsh_candidate_pairs``): signature and banding
  semantics cannot drift between the batch index build and the stream.
- ``applyInPandasWithState`` keyed by (band, bucket): state is the
  bucket's member list (doc_ids + 16-lane signatures); each batch's rows
  are compared against state-so-far (prior batches AND earlier rows of
  the same batch, in doc_id order) and appended — emitted rows are the
  LSH candidate pairs with their estimated Jaccard, exactly the batch
  pipeline's candidate algebra, produced incrementally.

State boundedness: state is per-bucket and proportional to INDEX size —
the honest cost of near-dup ingest (the batch index is the same rows at
rest). A production deployment bounds it with an event-time TTL per
member (drop index entries older than the dedup horizon — the
``GroupStateTimeout.EventTimeTimeout`` lever) or tiers old buckets to a
compacted store; this bounded drain uses NoTimeout, documented here.
Signatures shuffle as 16 longs (128 B/doc/band), never text.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from cloud_data_sync_spark.operators.dedup import (
    _AUG_SQL,
    _MINHASH_MATCHES,
    _ORACLE_SIG_CTES,
    AUG_OFFSET,
    N_BANDS,
    N_PERM,
    ROWS_PER_BAND,
    augment_docs,
    minhash_signatures,
)
from cloud_data_sync_spark.registry import register

DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the documents parquet. The glob accepts
    ``documents*.parquet`` so a multi-file crawl directory arrives as
    real multiple micro-batches under ``maxFilesPerTrigger``."""
    reader = spark.readStream.schema(DOCS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.option("pathGlobFilter", "documents*.parquet").parquet(
        sf_dir
    )


def signed_band_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, sig, band, bh) for a (doc_id, text) frame — the SAME
    signature and bucket-key construction as the batch pipeline
    (minhash_signatures + lsh_candidate_pairs' xxhash64 band key), as a
    pure per-row projection valid on streaming DataFrames."""
    sigd = minhash_signatures(docs, spread_input=False).select(
        "doc_id", "sig"
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b),
                    *[
                        F.col("sig")[b * ROWS_PER_BAND + r]
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("bh"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sigd.select("doc_id", "sig", F.explode(bands).alias("bd")).select(
        "doc_id",
        "sig",
        F.col("bd.band").alias("band"),
        F.col("bd.bh").alias("bh"),
    )


PAIR_OUT_SCHEMA = "doc_a long, doc_b long, est double"
BUCKET_STATE_SCHEMA = "ids array<long>, sigs array<array<long>>"


def _bucket_probe_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Probe each arriving bucket row against the bucket's accumulated
    members (older batches first, then earlier rows of this batch in
    doc_id order), emit (min_id, max_id, est_jaccard) candidate pairs,
    append the newcomers to state."""
    import numpy as np

    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        return
    if state.exists:
        ids, sigs = state.get
        id_list = [int(x) for x in ids]
        sig_rows = [list(s) for s in sigs]
    else:
        id_list, sig_rows = [], []
    batch = batch.sort_values("doc_id")
    out_a: list[int] = []
    out_b: list[int] = []
    out_e: list[float] = []
    for did, sig in zip(batch["doc_id"], batch["sig"]):
        did = int(did)
        s = np.asarray(list(sig), dtype=np.int64)
        if id_list:
            arr = np.asarray(sig_rows, dtype=np.int64)
            ests = (arr == s).sum(axis=1) / float(N_PERM)
            for oid, e in zip(id_list, ests):
                if oid == did:
                    continue
                a, b = (oid, did) if oid < did else (did, oid)
                out_a.append(a)
                out_b.append(b)
                out_e.append(float(e))
        id_list.append(did)
        sig_rows.append([int(v) for v in s])
    state.update((id_list, sig_rows))
    if out_a:
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est": out_e})


def streaming_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Streaming (doc_id, text) → LSH candidate pairs with estimated
    Jaccard, via band-bucket keyed state."""
    return (
        signed_band_rows(docs)
        .groupBy("band", "bh")
        .applyInPandasWithState(
            _bucket_probe_fn,
            outputStructType=PAIR_OUT_SCHEMA,
            stateStructType=BUCKET_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _crawl_family(spark: SparkSession, sf_dir: str) -> tuple[dict, dict]:
    """One concurrent drain pass for the crawl stream: the stateful
    bucket-probe pairs plus the signed-document roster (map-only append —
    the batch membership the verdict join needs, taken from the SAME
    signed stream so the <3-token drop matches the signature table).

    Group confs follow the stateful family: update-mode NoTimeout emits
    per input batch and the roster is pure map output, so the terminal
    no-data batch would be a pure state-store round (no_data_batch=False);
    16 partitions for Python-stateful Arrow parallelism. Cached per
    (session, DOCUMENTS vintage)."""
    from cloud_data_sync_spark.operators.dedup import guard_augment_id_space
    from cloud_data_sync_spark.streaming.runner import drained_family

    # same fail-loudly offset-collision gate as the batch dedup family:
    # the crawl verdict classifies batch membership by doc_id >= AUG_OFFSET, so
    # an original id in the offset space would silently mis-classify on
    # both engines (checked on the batch table BEFORE any stream builds —
    # streaming frames can't run the control-plane max)
    guard_augment_id_space(spark, sf_dir)

    def pairs() -> DataFrame:
        return streaming_candidate_pairs(
            augment_docs(
                read_documents_stream(spark, sf_dir).select("doc_id", "text")
            )
        )

    def docs() -> DataFrame:
        return (
            signed_band_rows(
                augment_docs(
                    read_documents_stream(spark, sf_dir).select(
                        "doc_id", "text"
                    )
                )
            )
            .filter(F.col("band") == 0)
            .select("doc_id")
        )

    return drained_family(
        spark,
        sf_dir,
        "crawlfam",
        {"pairs": (pairs, "update"), "docs": (docs, "append")},
        drain_partitions=16,
        no_data_batch=False,
        vintage_table="documents",
    )


@register(
    "q_stream_minhash_dedup",
    oracle=f"""
WITH {_AUG_SQL},
{_ORACLE_SIG_CTES},
cross_cand AS (
  SELECT c.doc_a, c.doc_b FROM cand c
  WHERE c.doc_a < {AUG_OFFSET} AND c.doc_b >= {AUG_OFFSET}
),
est AS (
  SELECT c.doc_b AS doc_id, c.doc_a AS cand_id,
         ({_MINHASH_MATCHES}) / 16.0 AS e
  FROM cross_cand c
  JOIN sig x ON x.doc_id = c.doc_a
  JOIN sig y ON y.doc_id = c.doc_b
),
best AS (
  SELECT doc_id, cand_id, e FROM (
    SELECT doc_id, cand_id, e,
           row_number() OVER (PARTITION BY doc_id ORDER BY e DESC, cand_id)
             AS rk
    FROM est)
  WHERE rk = 1
),
batch AS (SELECT doc_id FROM sig WHERE doc_id >= {AUG_OFFSET})
SELECT b.doc_id,
       CASE WHEN bst.e >= 0.5 THEN 'near_dup' ELSE 'novel' END AS status,
       CAST(coalesce(CASE WHEN bst.e >= 0.5 THEN bst.cand_id END, -1)
            AS BIGINT) AS matched,
       round(coalesce(bst.e, 0.0), 4) AS best_est
FROM batch b LEFT JOIN best bst ON bst.doc_id = b.doc_id
""",
    doc=(
        "STREAMING near-dup ingest — the streaming twin of "
        "q_dedup_minhash_incremental, and the shape a production crawl "
        "actually runs: arriving micro-batches are MinHash-signed "
        "map-side (the batch substrate's exact signature and band-key "
        "code), keyed by (band, bucket), and probed via "
        "applyInPandasWithState against the bucket state accumulated "
        "from every earlier batch — candidate pairs with estimated "
        "Jaccard emerge incrementally, per batch, instead of from a "
        "corpus re-list. Each crawl document (the augmented copy rows, "
        "doc_id >= AUG_OFFSET) then reports its best historical match and a "
        "near_dup/novel verdict at the 0.5 threshold, the incremental "
        "algebra verbatim — so the oracle IS the batch-equivalent "
        "q_dedup_minhash_incremental SQL (stream and batch provably "
        "agree; the cross-batch path is pinned by a multi-file fixture "
        "in tests/test_streaming.py). Bucket state holds ids + 16-long "
        "signatures, never text; boundedness and the production TTL "
        "lever are documented in streaming/crawl.py. Drained once per "
        "(session, documents vintage) via the concurrent family runner."
    ),
)
def q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    results, _ = _crawl_family(spark, sf_dir)
    pairs = results["pairs"]
    # cross pairs only: historical index (< AUG_OFFSET) vs crawl batch
    # (>= AUG_OFFSET) — the batch algebra; same-side pairs are the
    # full-dedup family's job
    cross = pairs.filter(
        (F.col("doc_a") < AUG_OFFSET) & (F.col("doc_b") >= AUG_OFFSET)
    )
    est = cross.select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("cand_id"),
        F.col("est").alias("e"),
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("e"), "cand_id")
    )
    best = est.withColumn("rk", rk).filter(F.col("rk") == 1).drop("rk")
    batch = results["docs"].filter(F.col("doc_id") >= AUG_OFFSET)
    hit = F.col("e") >= 0.5
    return batch.join(best, "doc_id", "left").select(
        "doc_id",
        F.when(hit, F.lit("near_dup")).otherwise(F.lit("novel")).alias(
            "status"
        ),
        F.coalesce(F.when(hit, F.col("cand_id")), F.lit(-1))
        .cast("long")
        .alias("matched"),
        F.round(F.coalesce("e", F.lit(0.0)), 4).alias("best_est"),
    )
