"""Round-6-of-driver (14th build wave) operators: BPE merge training."""

from __future__ import annotations

from collections import Counter

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(word_counts: list[tuple[str, int]], rounds: int):
    """Reference BPE (Sennrich get_stats/merge semantics): overlapping
    pairs all count; merges apply greedily left-to-right, and a merged
    token never chains within the same round."""
    seqs = {w: [*w, "</w>"] for w, _ in word_counts}
    cnt = dict(word_counts)
    out = []
    for step in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += cnt[w]
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, c))
        for w, syms in seqs.items():
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            seqs[w] = ns
    return out


def _loop_on(spark, word_counts, rounds, local_max_words=None):
    from cloud_data_sync_spark.operators.text import bpe_train_loop

    wd = spark.createDataFrame(word_counts, "w string, cnt long")
    seqs = wd.selectExpr(
        "cnt",
        "concat(transform(sequence(1, length(w)), "
        "i -> substring(w, i, 1)), array('</w>')) AS syms",
    )
    kwargs = {}
    if local_max_words is not None:
        kwargs["local_max_words"] = local_max_words
    return [tuple(r) for r in bpe_train_loop(seqs, rounds, **kwargs).collect()]


def test_bpe_train_matches_reference_on_overlap_adversarial_dict(spark):
    # 'lull'/'hello'/'hell' exercise run-parity greedy merging ("l l l"
    # merges once); 'abab' exercises the shared-boundary case a naive
    # string replace gets wrong; ties exercise the (count, a, b) break
    wd = [("hello", 5), ("hell", 3), ("lull", 2), ("abab", 4), ("banana", 3)]
    rounds = 6
    ref = _ref_bpe(wd, rounds)
    # scale-adaptive: the driver-side path (default for small dicts) and
    # the distributed per-round-agg path must both equal the reference
    assert _loop_on(spark, wd, rounds) == ref
    assert _loop_on(spark, wd, rounds, local_max_words=0) == ref


def test_bpe_train_run_parity_on_long_runs(spark):
    # aaaaaa: (a,a) appears 5x per word occurrence; greedy merges
    # positions 1-2, 3-4, 5-6 only — then (aa,aa) next round, etc.
    wd = [("aaaaaa", 7), ("aaa", 2)]
    rounds = 4
    ref = _ref_bpe(wd, rounds)
    assert _loop_on(spark, wd, rounds) == ref
    assert _loop_on(spark, wd, rounds, local_max_words=0) == ref


def test_bpe_train_registered_output_shape(spark):
    from cloud_data_sync_spark.operators.text import _BPE_TRAIN_ROUNDS
    from cloud_data_sync_spark.registry import all_queries

    df = all_queries()["q_bpe_train"].fn(spark, SF_DIR)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "step",
        "left_sym",
        "right_sym",
        "pair_count",
    ]
    assert [r.step for r in rows] == list(range(1, _BPE_TRAIN_ROUNDS + 1))
    # merged symbols concatenate previously seen symbols: each round's
    # left/right must be buildable from single chars, '</w>', and prior
    # merges — the defining invariant of a valid merge table
    known = set("abcdefghijklmnopqrstuvwxyz") | {"</w>"}
    for r in rows:
        assert r.left_sym in known and r.right_sym in known, r
        known.add(r.left_sym + r.right_sym)
        assert r.pair_count > 0


def test_dedup_sentence_terminator_segmentation(spark, tmp_path):
    """The terminator path (dead on the punctuation-less synthetic corpus)
    segments at [.!?]-suffixed tokens: two docs sharing one boilerplate
    sentence are flagged exactly on that segment."""
    import os

    from pyspark.sql import functions as F

    boiler = "this license text is shared verbatim across both docs ok."
    a = boiler + " unique alpha words here padding out one sentence fine."
    b = boiler + " totally different beta tail sentence with other words."
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "sfx")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))

    from cloud_data_sync_spark.registry import all_queries

    out = {
        r["doc_id"]: r
        for r in all_queries()["q_dedup_sentence"].fn(spark, sf).collect()
    }
    # each doc = 2 sentences of 10 tokens (>= min 5): the boilerplate one
    # is shared, the tail one is not
    for d in (1, 2):
        assert out[d]["n_segments"] == 2
        assert out[d]["n_shared"] == 1
        assert abs(out[d]["shared_frac"] - 0.5) < 1e-9


def test_dedup_sentence_block_resegmentation(spark, tmp_path):
    """A terminator-less 25-token doc re-segments into 10/10/5 blocks."""
    import os

    from pyspark.sql import functions as F

    text = " ".join(f"w{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    ).withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "sfy")
    os.makedirs(sf)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))

    from cloud_data_sync_spark.registry import all_queries

    rows = all_queries()["q_dedup_sentence"].fn(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_segments"] == 3  # 10 + 10 + 5, all >= min 5
    assert rows[0]["n_shared"] == 0


def test_bpe_encode_counts_match_manual_application(spark):
    """Applying the learned merges by hand to the word dict must give the
    same per-word token counts q_bpe_encode aggregates."""
    from cloud_data_sync_spark.operators.text import (
        _BPE_TRAIN_ROUNDS,
        _BPE_WORD_RE,
        _bpe_merges,
    )
    import re

    from pyspark.sql import functions as F

    from cloud_data_sync_spark.registry import all_queries
    from cloud_data_sync_spark.tables import load_table

    merges = _bpe_merges(spark, SF_DIR)
    assert len(merges) == _BPE_TRAIN_ROUNDS

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    rows = docs.collect()
    pat = re.compile(_BPE_WORD_RE)
    agg: dict = {}
    for r in rows:
        for w in r["text"].strip().lower().split():
            if not pat.match(w):
                continue
            syms = [*w, "</w>"]
            for a, b in merges:
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                syms = ns
            d = agg.setdefault(r["source"], [0, 0, set()])
            d[0] += 1
            d[1] += len(syms)
            d[2].add(r["doc_id"])
    out = {
        r["source"]: r
        for r in all_queries()["q_bpe_encode"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == set(agg)
    for src, (n_words, n_tokens, doc_ids) in agg.items():
        assert out[src]["n_words"] == n_words, src
        assert out[src]["n_tokens"] == n_tokens, src
        assert out[src]["n_docs"] == len(doc_ids), src


def test_ols_regression_recovers_planted_coefficients(spark, tmp_path):
    """OLS on synthetic events with a known linear model recovers the
    planted coefficients (exactly: the data is noise-free)."""
    import os
    from datetime import datetime, timedelta

    rows = []
    base = datetime(2024, 1, 1)  # a Monday: isodow 1
    eid = 0
    for day in range(14):
        for h in range(0, 24, 3):
            ts = base + timedelta(days=day, hours=h)
            iso = ts.isoweekday()
            # value = 2.0 + 0.25*hour - 0.5*isodow
            rows.append((eid, ts, 1, "t", 2.0 + 0.25 * h - 0.5 * iso, None))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf = str(tmp_path / "sfo")
    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "events.parquet"))

    from cloud_data_sync_spark.registry import all_queries

    out = all_queries()["q_ols_regression"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["beta_hour"] - 0.25) < 1e-6
    assert abs(r["beta_isodow"] - (-0.5)) < 1e-6
    assert abs(r["intercept"] - 2.0) < 1e-5
    assert r["r2"] > 0.999999


def test_bpe_fold_sql_matches_python_greedy_on_random_cases(spark):
    """The aggregate() fold lambda (greedy left-to-right single-pair
    merge) against a Python reference on 300 seeded-random cases,
    including degenerate ones (pair absent, pair == whole word, runs of
    the pair back-to-back). Uses column-referenced a/b so all cases run
    in ONE Spark pass."""
    import random

    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.text import _BPE_FOLD_SQL

    rng = random.Random(20260815)
    alphabet = ["a", "b", "ab", "</w>", "c"]
    cases = []
    for i in range(300):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(1, 12))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, syms, a, b))

    def ref(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    df = spark.createDataFrame(
        cases, "i long, syms array<string>, a string, b string"
    )
    fold = _BPE_FOLD_SQL.format(a="a", b="b")  # column references
    got = {
        r["i"]: list(r["syms"])
        for r in df.selectExpr("i", fold).collect()
    }
    for i, syms, a, b in cases:
        assert got[i] == ref(syms, a, b), (i, syms, a, b, got[i])
