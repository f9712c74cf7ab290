"""Semantic tests for the incremental-dedup / mixture-temperature /
duplication-mass operators (round-4 additions)."""

from __future__ import annotations

import math

from cloud_data_sync_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_statuses(spark):
    from cloud_data_sync_spark.operators.dedup import AUG_OFFSET

    rows = all_queries()["q_dedup_incremental"].fn(spark, SF).collect()
    assert rows
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + 1
        assert r.doc_id >= AUG_OFFSET
    assert set(by_status) <= {"novel", "dup_index", "dup_batch"}
    # exact copies (+2*OFF, every 7th base doc) hash-match the index
    exact = [
        r for r in rows if 2 * AUG_OFFSET <= r.doc_id < 3 * AUG_OFFSET
    ]
    assert exact and all(r.status == "dup_index" for r in exact)
    # near copies (+OFF) append tokens, so they can never match the index
    near = [r for r in rows if AUG_OFFSET <= r.doc_id < 2 * AUG_OFFSET]
    assert near and all(r.status != "dup_index" for r in near)


def test_mixture_temperature_shares_and_boosts(spark):
    rows = all_queries()["q_mixture_temperature"].fn(spark, SF).collect()
    assert rows
    assert math.isclose(sum(r.temp_share for r in rows), 1.0, abs_tol=1e-3)
    assert math.isclose(sum(r.natural_share for r in rows), 1.0, abs_tol=1e-3)
    # T<1 flattens: smaller languages get larger boosts, and boost order
    # is inverse to size order
    srt = sorted(rows, key=lambda r: r.n_docs)
    boosts = [r.boost for r in srt]
    assert boosts == sorted(boosts, reverse=True)
    if len(srt) > 1 and srt[0].n_docs < srt[-1].n_docs:
        assert srt[0].boost > srt[-1].boost


def test_dup_mass_bounds_and_planted_duplication(spark):
    row = all_queries()["q_ngram_dup_mass"].fn(spark, SF).collect()[0]
    assert 0 < row.n_grams
    assert 0 <= row.n_dup_grams <= row.n_grams
    assert 0 <= row.dup_incidences <= row.total_incidences
    assert 0.0 <= row.dup_mass <= 1.0
    # the augmented corpus plants exact copies, so duplication exists
    assert row.dup_mass > 0.0


def test_zorder_shards_partition_rows_with_tight_envelopes(spark):
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.tables import load_table

    rows = all_queries()["q_zorder_layout"].fn(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    total, pmin, pmax, smin, smax = li.agg(
        F.count("*"), F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    assert sum(r.n_rows for r in rows) == total
    assert all(0 <= r.shard < 16 for r in rows)
    for r in rows:
        assert pmin <= r.min_part <= r.max_part <= pmax
        assert smin <= r.min_supp <= r.max_supp <= smax
    # z-contiguous shards keep BOTH envelopes tight: a 16-shard split of
    # the 4+4-bit curve confines each shard to a quadrant-sized window
    # (<= 1/4 of the range, + one bucket of rounding slack)
    p_span, s_span = pmax - pmin + 1, smax - smin + 1
    for r in rows:
        assert (r.max_part - r.min_part + 1) <= 0.40 * p_span + 2
        assert (r.max_supp - r.min_supp + 1) <= 0.60 * s_span + 2


def test_inverted_index_postings_sorted_capped(spark):
    rows = all_queries()["q_inverted_index"].fn(spark, SF).collect()
    assert rows
    assert len({r.term for r in rows}) == len(rows)
    dfs = [r.df for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    for r in rows:
        # scalar-only output contract: postings arrive comma-joined
        assert isinstance(r.postings, str)
        postings = [int(x) for x in r.postings.split(",")]
        assert 1 <= len(postings) <= 20
        assert len(postings) == min(r.df, 20)
        assert postings == sorted(postings)


def test_zorder_interleave_is_a_bijection_on_the_bucket_grid(spark):
    """All 256 (pb, sb) bucket pairs must map to 256 distinct z-values in
    [0, 256), and the shard split must give 16 z-values per shard —
    otherwise envelopes silently overlap and skipping degrades."""
    from pyspark.sql import functions as F

    from cloud_data_sync_spark.operators.text import _bits_interleave

    grid = (
        spark.range(16)
        .withColumnRenamed("id", "pb")
        .crossJoin(spark.range(16).withColumnRenamed("id", "sb"))
    )
    zs = grid.select(
        _bits_interleave(F.col("pb"), F.col("sb")).cast("long").alias("z")
    ).collect()
    vals = sorted(r.z for r in zs)
    assert vals == list(range(256))


def test_sketch_rollup_merge_stays_within_tolerance(spark):
    rows = all_queries()["q_sketch_rollup"].fn(spark, SF).collect()
    assert rows
    # merged daily sketches must estimate the weekly distinct within 5%
    assert all(r.within_tolerance for r in rows)
    # date_trunc('week') pins Mondays
    assert all(r.week.weekday() == 0 for r in rows)
    assert all(r.exact_users >= 1 for r in rows)


def test_event_paths_are_valid_3grams(spark):
    from cloud_data_sync_spark.tables import load_table

    rows = all_queries()["q_event_paths"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 10
    types = {
        r.event_type
        for r in load_table(spark, SF, "events").select("event_type").distinct().collect()
    }
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r.path.split(">")
        assert len(steps) == 3
        assert set(steps) <= types


def test_asof_tolerance_nulls_stale_matches(spark):
    from cloud_data_sync_spark.registry import all_queries as _aq

    base = {r.purchase_id: r for r in _aq()["q_join_asof"].fn(spark, SF).collect()}
    tol = {r.purchase_id: r for r in _aq()["q_join_asof_tolerance"].fn(spark, SF).collect()}
    assert set(base) == set(tol)
    hour = 3600
    for pid, t in tol.items():
        b = base[pid]
        if t.attributed:
            # attributed rows carry exactly the untolerated sweep's match
            assert t.click_id == b.click_id and t.click_ts == b.click_ts
            assert (t.purchase_ts - t.click_ts).total_seconds() <= hour
        else:
            assert t.click_id is None and t.click_ts is None
            # and the stale/missing base match really was out of window
            if b.click_ts is not None:
                assert (b.purchase_ts - b.click_ts).total_seconds() > hour


def test_logreg_probe_learns(spark):
    import math

    row = all_queries()["q_logreg_probe"].fn(spark, SF).collect()[0]
    assert math.isclose(row.loss0, round(math.log(2), 4), abs_tol=1e-9)
    # gradient descent on a convex loss from w=0 with a sane step: strictly
    # non-increasing, and the probe beats coin-flip accuracy
    assert row.loss1 <= row.loss0
    assert row.loss2 <= row.loss1
    assert 0.5 <= row.train_acc <= 1.0


def test_tokenizer_contract_cross_engine_fuzz(spark):
    """The corpus-wide tokenizer contract (operators/tokens.py): Spark's
    split(trim(lower(text)), '\\s+') and DuckDB's
    string_split_regex(trim(lower(text)), '\\s+') must agree token-for-token
    on adversarial inputs — unicode whitespace, empty strings, repeated
    separators, punctuation runs (the r3-advice divergence class)."""
    import duckdb

    from cloud_data_sync_spark.operators.tokens import low_toks

    cases = [
        "",
        " ",
        "   \t  \n ",
        "plain words here",
        "  leading and trailing  ",
        "tab\tseparated\ttokens",
        "newline\nseparated\nlines",
        "mixed \t\n whitespace   runs",
        "UPPER lower MiXeD",
        "punct, marks! and? symbols#",
        "unicode café naïve über",
        "cjk 中文 tokens",
        "emoji \U0001f600 token",
        "single",
        "a b c d e f g",
        "nbsp inside",  # U+00A0 is NOT \s in either engine's ASCII class
        "ideographic　space",  # U+3000 likewise
    ]
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, text string")
    got = {
        r.i: [t for t in r.toks if t != ""]
        for r in sdf.select("i", low_toks().alias("toks")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO cases VALUES (?, ?)", list(enumerate(cases)))
    want = {
        r[0]: [t for t in r[1] if t != ""]
        for r in con.execute(
            r"SELECT i, string_split_regex(trim(lower(text)), '\s+') FROM cases"
        ).fetchall()
    }
    assert got == want
