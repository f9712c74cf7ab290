"""Mint a self-generated larger-SF vintage by replicating /root/testdata/sf0.1
with consistent key-space remapping — the input for the empirical scaling
sweep (tools/scale_sweep.py, results in SCALE.md §"Measured scaling").

    python tools/gen_scale_vintage.py [--replicas 10] [--out .scale/sf1]

Design (documented because the MEASUREMENT is only as honest as the data):

- Every fact/dim table is replicated R times with per-replica key offsets
  of ``k * (max_key + 1)`` applied consistently across foreign keys
  (l_orderkey moves with orders' offset, o_custkey with customer's, ...),
  so join fan-outs, group cardinalities-per-key, and per-user activity
  stay CONSTANT while table row counts scale by R — the same shape real
  growth has (more customers/orders/users, not fatter ones).
- ``region``/``nation`` stay fixed (bounded dims, as in TPC-H).
- ``documents``: naive replication would make every doc a 10-way exact
  duplicate and hand the dedup family a pathological corpus (candidate
  pairs would grow quadratically in R *by construction*, not by design
  flaw). Instead each replica k>0 applies a per-replica WORD BIJECTION:
  ~50% of vocabulary words (chosen by md5(k, word)) get a replica suffix.
  A bijective word map preserves token-set AND shingle-set Jaccard
  exactly WITHIN a replica (the engineered near-dup pairs stay near-dups
  at their original similarity), while cross-replica shingle Jaccard
  collapses to ~0.06 (5 unchanged-in-both words in a row ≈ 0.25^5·...),
  far below every threshold in the registry — so the dup-rate per row is
  constant in R, which is the realistic scaling.
- ``embeddings``: exact copies would put 10 zero-distance twins atop
  every vector (ANN top-k degenerates). Each replica adds seeded N(0,
  0.02) noise — cluster/label structure preserved, vectors distinct.
- Timestamps keep their original range: event/order DENSITY grows with
  SF, the span doesn't — matching how the driver's own SFs behave
  (sf0.01 and sf0.1 share date ranges; verified).
"""

from __future__ import annotations

import argparse
import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# (table, key cols owned by this table) — offsets derive from the OWNER's
# max key and are applied to every referencing column
OWNED = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _span(df: pd.DataFrame, col: str) -> int:
    return int(df[col].max()) + 1


def _word_map(k: int, words: np.ndarray) -> dict[str, str]:
    """Per-replica word bijection: ~50% of vocab gets a replica suffix.
    Deterministic in (k, word); injective because the suffix encodes k."""
    out = {}
    for w in words:
        h = hashlib.md5(f"{k}|{w}".encode()).digest()[0]
        out[w] = f"{w}~r{k}" if h & 1 else w
    return out


def build(out_dir: str, replicas: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tables = {
        t: pd.read_parquet(f"{SRC}/{t}.parquet")
        for t in [
            "region",
            "nation",
            "customer",
            "supplier",
            "part",
            "orders",
            "lineitem",
            "events",
            "documents",
            "embeddings",
        ]
    }
    # fixed dims: copy through
    for t in ("region", "nation"):
        pq.write_table(
            pa.Table.from_pandas(tables[t], preserve_index=False),
            f"{out_dir}/{t}.parquet",
        )

    spans = {c: _span(tables[t], c) for t, c in OWNED.items()}
    spans["user_id"] = _span(tables["events"], "user_id")
    spans["event_id"] = _span(tables["events"], "event_id")

    def emit(name: str, frames: list[pd.DataFrame]) -> None:
        df = pd.concat(frames, ignore_index=True)
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            f"{out_dir}/{name}.parquet",
        )
        print(f"{name}: {len(df):,} rows")

    # simple key-shift tables
    for name, shifts in [
        ("customer", {"c_custkey": "c_custkey"}),
        ("supplier", {"s_suppkey": "s_suppkey"}),
        ("part", {"p_partkey": "p_partkey"}),
        ("orders", {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"}),
        (
            "lineitem",
            {
                "l_orderkey": "o_orderkey",
                "l_partkey": "p_partkey",
                "l_suppkey": "s_suppkey",
            },
        ),
        ("events", {"event_id": "event_id", "user_id": "user_id"}),
    ]:
        src = tables[name]
        frames = []
        for k in range(replicas):
            rep = src.copy()
            for col, owner in shifts.items():
                rep[col] = rep[col] + k * spans[owner]
            frames.append(rep)
        emit(name, frames)

    # documents: word-bijection per replica (see module docstring)
    docs = tables["documents"]
    vocab = np.unique(
        np.concatenate([t.split() for t in docs["text"].fillna("")])
        if len(docs)
        else np.array([], dtype=object)
    )
    frames = [docs.copy()]
    for k in range(1, replicas):
        wm = _word_map(k, vocab)
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + k * spans["doc_id"]
        rep["text"] = [
            " ".join(wm.get(w, w) for w in (t or "").split())
            for t in rep["text"]
        ]
        rep["n_chars"] = rep["text"].str.len().astype("int64")
        frames.append(rep)
    emit("documents", frames)

    # embeddings: seeded noise per replica
    emb = tables["embeddings"]
    frames = [emb.copy()]
    for k in range(1, replicas):
        rng = np.random.default_rng(42_000 + k)
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + k * spans["vec_id"]
        mat = np.stack(rep["embedding"].to_numpy())
        mat = (mat + rng.normal(0.0, 0.02, mat.shape)).astype("float32")
        rep["embedding"] = [row for row in mat]
        frames.append(rep)
    emit("embeddings", frames)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    a = ap.parse_args()
    build(a.out, a.replicas)
