"""Semantic tests for the retrieval/quality-stratification additions:
BM25 ranking, perplexity bucketing, token-budget accounting, and the
approximate kNN graph."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from cloud_data_sync_spark.registry import all_queries

    return all_queries()[name].fn(spark, SF).collect()


def test_bm25_ranking_invariants(spark):
    rows = _run(spark, "q_bm25")
    assert 0 < len(rows) <= 20
    scores = [r.score for r in rows]
    # driver returns in plan order for TakeOrderedAndProject; sort-check
    # on the (score desc, doc_id) contract
    assert scores == sorted(scores, reverse=True) or [
        (-r.score, r.doc_id) for r in rows
    ] == sorted((-r.score, r.doc_id) for r in rows)
    for r in rows:
        assert r.n_hits >= 1
        assert r.score > 0.0


def test_bm25_score_matches_reference_formula(spark):
    """Recompute one returned doc's score from raw corpus counts."""
    from cloud_data_sync_spark.operators.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
    )
    from cloud_data_sync_spark.tables import load_table

    rows = _run(spark, "q_bm25")
    target = rows[0]
    docs = [
        (r.doc_id, r.text.strip().lower().split())
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    ]
    n_docs = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n_docs
    hit_docs = [
        (d, t) for d, t in docs if any(term in t for term in _BM25_TERMS)
    ]
    score = 0.0
    tdoc = dict(docs)[target.doc_id]
    for term in _BM25_TERMS:
        tf = tdoc.count(term)
        if not tf:
            continue
        df = sum(1 for _, t in hit_docs if term in t)
        idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
        score += (
            idf
            * tf
            * (_BM25_K1 + 1)
            / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(tdoc) / avgdl))
        )
    assert math.isclose(target.score, round(score, 6), abs_tol=2e-6)


def test_perplexity_buckets_partition_scored_docs(spark):
    rows = _run(spark, "q_perplexity_buckets")
    by = {r.bucket: r for r in rows}
    assert set(by) <= {"head", "middle", "tail"}
    scored = _run(spark, "q_ngram_lm")
    assert sum(r.n_docs for r in rows) == len(scored)
    # head = most fluent (highest mean log-prob); ordering must hold
    # whenever both buckets are present
    if "head" in by and "middle" in by:
        assert by["head"].mean_logp >= by["middle"].mean_logp
        assert by["head"].min_logp >= by["middle"].max_logp - 1e-9
    if "middle" in by and "tail" in by:
        assert by["middle"].mean_logp >= by["tail"].mean_logp
        assert by["middle"].min_logp >= by["tail"].max_logp - 1e-9
    for r in rows:
        assert r.min_logp <= r.mean_logp + 1e-4
        assert r.mean_logp <= r.max_logp + 1e-4


def test_token_budget_shares_and_prefix_flag(spark):
    rows = _run(spark, "q_token_budget")
    assert rows
    assert math.isclose(sum(r.share for r in rows), 1.0, abs_tol=1e-3)
    ordered = sorted(rows, key=lambda r: (-r.n_tokens, r.source, r.lang))
    cum = 0
    total = sum(r.n_tokens for r in rows)
    for r in ordered:
        # in_budget is exactly "cumulative BEFORE this group < 90%"
        assert r.in_budget == (1 if cum < 0.9 * total else 0)
        cum += r.n_tokens
        assert math.isclose(
            r.cum_share, math.floor(cum / total * 1e6) / 1e6, abs_tol=1e-9
        )
    # cumulative share is nondecreasing and ends at ~1
    assert math.isclose(ordered[-1].cum_share, 1.0, abs_tol=1e-5)
    # the largest group is always inside the budget
    assert ordered[0].in_budget == 1


def test_knn_graph_ranks_and_dedup_consistency(spark):
    rows = _run(spark, "q_sim_knn_graph")
    assert rows
    by_vec: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.rank <= 3
        assert r.nbr_id != r.vec_id
        by_vec.setdefault(r.vec_id, []).append(r)
    for vec_id, nbrs in by_vec.items():
        nbrs.sort(key=lambda r: r.rank)
        assert [r.rank for r in nbrs] == list(range(1, len(nbrs) + 1))
        keys = [(-r.cos_sim, r.nbr_id) for r in nbrs]
        assert keys == sorted(keys)
    # graph/dedup consistency: every near-dup pair (cos >= 0.4) is a
    # candidate edge of vec_a, so it is either among vec_a's kept
    # neighbors, or vec_a kept a FULL top-3 whose weakest member strictly
    # outranks the pair under the (cos desc, nbr_id asc) contract
    from cloud_data_sync_spark.registry import all_queries

    dups = all_queries()["q_dedup_embedding"].fn(spark, SF).collect()
    for d in dups:
        nbrs = by_vec.get(d.vec_a)
        assert nbrs, "near-dup member missing from kNN graph"
        kept = any(n.nbr_id == d.vec_b for n in nbrs)
        outranked = len(nbrs) == 3 and (
            (-nbrs[-1].cos_sim, nbrs[-1].nbr_id) < (-d.cos_sim, d.vec_b)
        )
        assert kept or outranked, (d.vec_a, d.vec_b, d.cos_sim, nbrs)


def test_knn_graph_edge_symmetry_of_scores(spark):
    """An edge present in both directions carries the same cosine (scored
    once, emitted twice)."""
    rows = _run(spark, "q_sim_knn_graph")
    cos = {(r.vec_id, r.nbr_id): r.cos_sim for r in rows}
    for (a, b), c in cos.items():
        if (b, a) in cos:
            assert cos[(b, a)] == c


def test_lang_confusion_matches_lang_id(spark):
    preds = _run(spark, "q_lang_id")
    cells = _run(spark, "q_lang_confusion")
    # cell counts must re-aggregate the per-doc predictions exactly
    want: dict[tuple, int] = {}
    for p in preds:
        want[(p.lang, p.pred_lang)] = want.get((p.lang, p.pred_lang), 0) + 1
    got = {(c.lang, c.pred_lang): c.n for c in cells}
    assert got == want
    # row shares sum to ~1 within each true lang (floor-truncated cells)
    by_lang: dict[str, float] = {}
    for c in cells:
        by_lang[c.lang] = by_lang.get(c.lang, 0.0) + c.row_share
    for lang, s in by_lang.items():
        assert 1.0 - 1e-4 <= s <= 1.0 + 1e-9, (lang, s)


def test_winsorize_bounds_and_means(spark):
    rows = _run(spark, "q_winsorize")
    assert rows
    for r in rows:
        assert r.p01 <= r.p99
        # clipping can only pull the mean toward the [p01, p99] interval
        assert r.p01 - 1e-9 <= r.mean_winsor <= r.p99 + 1e-9
        assert r.n_clip_lo + r.n_clip_hi <= r.n
        # ~1% tails: clip counts are a small fraction of the group
        assert r.n_clip_lo <= max(3, 0.05 * r.n)
        assert r.n_clip_hi <= max(3, 0.05 * r.n)
        if r.n_clip_lo == 0 and r.n_clip_hi == 0:
            assert math.isclose(r.mean_raw, r.mean_winsor, abs_tol=1e-9)


def test_ab_welch_readout(spark):
    rows = _run(spark, "q_ab_welch")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_a > 0 and r.n_b > 0
    assert math.isclose(r.mean_diff, round(r.mean_treat - r.mean_ctrl, 4), abs_tol=2e-4)
    assert r.df_welch > 0
    # Welch df is bounded by n_a + n_b - 2
    assert r.df_welch <= r.n_a + r.n_b - 2 + 0.5
    assert r.significant == (1 if abs(r.t_stat) > 1.96 else 0)


def test_ab_welch_against_scipy_free_recompute(spark):
    """Recompute t from raw per-arm stats pulled directly off the table."""
    import statistics

    from cloud_data_sync_spark.tables import load_table

    vals: dict[str, list] = {"click": [], "view": []}
    for row in (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .collect()
    ):
        if row.event_type in vals:
            vals[row.event_type].append(row.value)
    a, b = vals["click"], vals["view"]
    m_a, m_b = statistics.fmean(a), statistics.fmean(b)
    v_a, v_b = statistics.variance(a), statistics.variance(b)
    t = (m_a - m_b) / math.sqrt(v_a / len(a) + v_b / len(b))
    r = _run(spark, "q_ab_welch")[0]
    assert r.n_a == len(a) and r.n_b == len(b)
    assert math.isclose(r.t_stat, round(t, 3), abs_tol=2e-3)


def test_psi_drift_properties(spark):
    rows = _run(spark, "q_psi_drift")
    assert rows
    types = {r.event_type for r in rows}
    assert "view" not in types  # reference never scores itself
    for r in rows:
        # PSI is a sum of (p-q)ln(p/q) terms, each nonnegative
        assert r.psi >= 0.0
        assert r.n_events > 0


def test_psi_drift_matches_python_recompute(spark):
    """End-to-end recompute: bin the raw values in Python with the same
    width/clamp/smoothing and check the operator's PSI per segment."""
    from cloud_data_sync_spark.operators.analytics import (
        _PSI_BINS,
        _PSI_WIDTH,
    )
    from cloud_data_sync_spark.tables import load_table

    counts: dict[str, list[int]] = {}
    for row in (
        load_table(spark, SF, "events")
        .select("event_type", "value")
        .collect()
    ):
        b = min(max(int(math.floor(row.value / _PSI_WIDTH)), 0), _PSI_BINS - 1)
        counts.setdefault(row.event_type, [0] * _PSI_BINS)[b] += 1

    def probs(seg):
        n = sum(counts[seg])
        return [(c + 0.5) / (n + _PSI_BINS * 0.5) for c in counts[seg]]

    q = probs("view")
    for r in _run(spark, "q_psi_drift"):
        p = probs(r.event_type)
        want = sum(
            (pi - qi) * math.log(pi / qi) for pi, qi in zip(p, q)
        )
        assert math.isclose(r.psi, round(want, 6), abs_tol=2e-6), (
            r.event_type,
            r.psi,
            want,
        )
        assert r.n_events == sum(counts[r.event_type])
