"""Physical-plan audit: assert the scale properties we designed for.

The oracle gate proves values; this proves *plans*. For every registered
query we render the formatted physical plan and check structural rules:

- no accidental cartesian/nested-loop joins (whitelisted where the
  non-equi join is the algorithm, e.g. brute-force top-k);
- dimension joins broadcast instead of shuffling the fact side;
- global top-k compiles to TakeOrderedAndProject, never a one-partition
  sort or window;
- map-only operators stay exchange-free end-to-end;
- filters on base tables reach the parquet scan (PushedFilters).

Run: ``python tools/plan_audit.py [sf_dir]`` → per-query PASS/FAIL report,
exit 1 on any FAIL. ``tests/test_plans.py`` runs the same rules in CI.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

# rule table: query -> {"require": [substr...], "forbid": [substr...]}
# Global forbids apply to every query unless listed in ALLOW.
GLOBAL_FORBID = ("CartesianProduct",)

# Non-equi joins that ARE the algorithm (broadcast side is provably small):
# - q_sim_topk / q_sim_ivf: tiny broadcast row/pair sets against a corpus
#   scan.
# - q_tfidf / q_term_pmi: the corpus-size scalar (ONE row) cross-joins
#   into the scored set — N x 1 is linear; the alternative is a driver-side
#   count() collected into a literal, which trades a plan edge for a
#   driver action.
# - q_kmeans: the K×D centroid pack is ONE broadcast row (constant in
#   corpus size) cross-joined into the map-only assignment projection.
# - q_skew_report: the (total, n_keys) scalar is ONE row cross-joined into
#   the per-key share projection.
# - q_histogram_equidepth: the decile-boundary array is ONE broadcast row
#   (constant in corpus size) cross-joined into the map-only bucket
#   assignment.
# - q_bloom_prune: legacy entry — the single-pass flag-join form no longer
#   cross-joins counters; kept so a plan-shape wobble cannot flip the gate.
# - q_fuzzy_match: the probe set is 4 literal rows broadcast against the
#   corpus scan; the edit-distance predicate is inherently non-equi.
# - q_data_mixture: the (total_docs, n_groups) scalar is ONE row
#   cross-joined back into the per-group share/rate projection.
# - q_tpch_dormant: the global-average balance is ONE broadcast row
#   cross-joined into the filter (Q22's scalar subquery shape).
# - q_tpch_topsupplier: the max-revenue scalar is ONE broadcast row
#   cross-joined into the tie-keeping filter (Q15's scalar subquery shape).
# - q_tpch_importance: the nation-total scalar is ONE broadcast row
#   cross-joined into the HAVING filter (Q11's scalar subquery shape).
# - q_zorder_layout: the (pmax, smax) range pack is ONE broadcast row
#   cross-joined into the map-only bucket/interleave projection.
# - q_logreg_probe: the weight vector (64 doubles) and the loss scalars are
#   ONE-row broadcast packs cross-joined into map-only scoring — the
#   k-means centroid pattern.
# - q_mixture_temperature: same 1-row (total, normalizer) scalar pack as
#   q_data_mixture.
# - q_bm25: the (n_docs, avgdl) and (df1..df3) statistics are two ONE-row
#   broadcast packs cross-joined into the map-only scoring projection.
# - q_perplexity_buckets: the tertile-boundary array is ONE broadcast row
#   (the q_histogram_equidepth shape) cross-joined into bucket assignment.
# - q_token_budget: the corpus token total is ONE broadcast row
#   cross-joined into the per-group share projection.
# - q_gaussian_nb: the fitted model (K labels × D dims × {mu, var} + prior)
#   and the train-count scalar are ONE-row broadcast packs cross-joined
#   into map-only scoring — the k-means centroid pattern.
# - q_hll_pair_overlap: the pair lattice is a < theta-join over the
#   per-source sketch table, bounded by the CONFIG-constant source set
#   (4 rows broadcast) — never corpus-sized.
# - q_logreg_calibration: inherits q_logreg_probe's ONE-row weight-vector
#   broadcast packs (the shared _probe_pipeline).
# - q_bootstrap_ci: the (n_rows, mu) point estimate and the (n_resamples,
#   boot_sd) resample summary are ONE-row packs cross-joined for the
#   1-row CI readout.
# - q_semdedup_sweep: three ONE-row packs (per-threshold pair counters,
#   per-threshold drop counters, corpus total) cross-joined before the
#   constant-size threshold explode.
BNLJ_ALLOWED = {
    "q_logreg_calibration",
    # inherits the probe's 1-row weight packs; adds the 1-row (np, nn,
    # groups) totals pack over the 1-row contribution fold
    "q_logreg_auc",
    # 1-row orders-aggregate pack × 1-row orphan-count pack — both sides
    # are single-row aggregates, constant at any corpus size
    "q_expectations",
    # 1-row orders-totals aggregate × 1-row orphan-count aggregate —
    # both sides single-row packs, constant at any corpus size
    "q_sample_coherent",
    # 1-row Neyman normalizer pack (sum of N_h·sigma_h) — same scalar
    # cross-join shape as q_mixture_temperature
    "q_neyman_alloc",
    # 1-row state-count pack seeding the uniform pi0 (the pagerank
    # (1-d)/N shape); every iteration joins a states-bounded aggregate
    "q_markov_stationary",
    # 1-row global dropped-invalid-count pack (derived from the items-
    # bounded groups, not a second fact scan) crossed onto the top-k
    # board — constant at any corpus size (r10 validity accounting)
    "q_decay_leaderboard",
    # 1-row step-1 count pack crossed onto the 3-row stage-count frame
    "q_funnel_steps",
    # 1-row min-date pack crossed onto the (type x day)-bounded rollup
    # before day indexing — constant at any corpus size
    "q_theil_sen",
    # 1-row corpus-frontier pack (max last-event ts) over per-user rows
    # + 1-row user-count pack over the hour rollup — both single-row
    # scalar packs, constant at any corpus size
    "q_survival_km",
    # 1-row (n, sum) totals pack feeding the Gini closed form
    "q_spend_gini",
    # 1-row (target-total, raw-total) pack crossed onto the 256-row
    # bucket frame before the log-ratio — constant at any corpus size
    "q_corpus_dsir",
    # 10-row checkpoint pack (from the 1-row max-doc pack) crossed onto
    # the distinct-doc / first-seen frames — constant at any corpus size
    "q_heaps_law",
    # same substrate/pack as q_spend_gini (shared ranked-spend builder)
    "q_lorenz_curve",
    # q_bootstrap_ci left this list in r5: the hash-window rework computes
    # its CI entirely on the single aggregate row — no scalar pack remains
    "q_mixture_sample",
    # 1-row degree-summary pack × 1-row moment pack — constant size
    "q_graph_degree",
    # 1-row percentile-cutoff pack / 1-row digit-total pack
    "q_rfm_segments",
    "q_benford_audit",
    "q_semdedup_sweep",
    # 1-row pair-count pack x 1-row doc-count pack x 1-row corpus total —
    # three single-row conditional aggregates packed for the threshold
    # explode (the q_semdedup_sweep shape), constant at any corpus size
    "q_dedup_minhash_sweep",
    "q_gaussian_nb",
    "q_hll_pair_overlap",
    "q_bm25",
    "q_perplexity_buckets",
    "q_token_budget",
    "q_data_mixture",
    "q_mixture_temperature",
    "q_tpch_dormant",
    "q_tpch_topsupplier",
    "q_tpch_importance",
    "q_zorder_layout",
    "q_logreg_probe",
    "q_fuzzy_match",
    "q_sim_topk",
    # same capped-query broadcast x one-corpus-pass spine as q_sim_topk
    # (radius threshold instead of rank cutoff)
    "q_sim_range",
    "q_sim_ivf",
    # composes both whitelisted ANN pipelines (topk's capped-query
    # broadcast + ivf's seed pack) — same provably-small broadcast sides
    "q_sim_ivf_recall",
    # 1-row codebook pack (M*K structs, constant) + 1-row query-LUT pack
    # (bounded query set) — the PQ encode/score broadcasts
    "q_sim_pq",
    "q_sim_pq_recall",
    # composes the ivf seed pack + pq codebook pack (both 1-row constant);
    # the candidate and LUT joins themselves are equi hash joins
    "q_sim_ivf_pq",
    "q_sim_ivf_pq_recall",
    # 1-row (n_true, n_corpus) totals pack over the ≤K-row depth frame;
    # the seed pack / truth broadcasts are the audited ANN shapes
    "q_sim_ivf_sweep",
    # 1-row seeds-count + corpus-count packs over the ≤K-row cell-size
    # aggregate — constant at any corpus size
    "q_sim_index_stats",
    "q_tfidf",
    "q_term_pmi",
    "q_kmeans",
    "q_skew_report",
    "q_histogram_equidepth",
    "q_bloom_prune",
    # 1-row corpus-retention pack (sum retained / sum total) broadcast
    # over the per-doc result — constant size at any corpus scale
    "q_dedup_sentence_scrub",
    "q_dedup_span_scrub",
    "q_dedup_suffix_groups",
    # the geometry sweep's pair join is a nested loop over the BOUNDED
    # audit sample (base-id-capped, constant at any corpus size — the
    # q_sim_topk bounded-set rule); every layout is decided in that one
    # pass, no per-layout banding
    "q_dedup_band_sweep",
    # 1-row max-mtime pack cross-joined into the horizon explode over
    # listing rows — the q_mixture_temperature scalar shape
    "q_retention_plan",
    # 1-row corpus-total pack x 1-row leak-count pack over the 2-row
    # per-split aggregate — constant size at any corpus scale
    "q_split_assign",
    # 1-row language-profile pack (≤ langs × K bigram entries, a config
    # cardinality) cross-joined into the map-side scoring projection —
    # the k-means centroid-pack shape (r11)
    "q_langid_chargram",
}

# Global (unpartitioned) windows are forbidden — a single-partition sort of
# the input — EXCEPT where the window's input is provably bounded
# regardless of corpus size:
# - q_vocab: TakeOrderedAndProject(1000) feeds the id-assignment window.
# - q_token_budget: the running-share window runs over the per-(source,
#   lang) aggregate — a config cardinality (sources × languages), not a
#   data cardinality; the corpus-sized input was already reduced by the
#   preceding hash agg.
# q_zipf_fit: rank ids over the TakeOrderedAndProject(1000) vocab head,
# same bounded-input justification as q_vocab.
# q_spend_gini: the running-sum window ranges over the per-shuffle-
# partition offset table — one row per partition (cluster CONFIG
# cardinality, same justification as q_token_budget); the data-sized
# ranking itself is per-partition windows after repartitionByRange.
# q_lorenz_curve: the cumulative window runs over the <=10-row decile
# rollup (constant cardinality) plus the same offset table as
# q_spend_gini.
GLOBAL_WINDOW_ALLOWED = {
    "q_vocab", "q_token_budget", "q_zipf_fit", "q_spend_gini",
    "q_lorenz_curve",
    # the offset-table window runs over one row per shuffle partition
    # (config cardinality) — the q_spend_gini two-phase order pattern
    "q_logreg_auc",
    # the cumulative-recall window runs over the per-probe-depth rollup —
    # ≤K_CENTROIDS rows (a config constant), never a data cardinality
    "q_sim_ivf_sweep",
    # the KM recursion windows run over the per-hour duration rollup —
    # bounded by the observation window in hours (~720), never user or
    # event cardinality (same class as q_lorenz_curve's decile window)
    "q_survival_km",
}

RULES: dict[str, dict[str, tuple[str, ...]]] = {
    # filter + projection must be pushed into the parquet scan
    "q_scan_filter_project": {"require": ("PushedFilters: [",)},
    # dim joins broadcast — the orders/lineitem side must not shuffle
    "q_join_inner": {"require": ("BroadcastHashJoin",)},
    "q_join_left": {"require": ("BroadcastHashJoin",)},
    "q_join_semi": {"require": ("BroadcastHashJoin",)},
    "q_join_anti": {"require": ("BroadcastHashJoin",)},
    # the two-stage dedup pipeline is join-free: shingles and signatures
    # ride ONE bucket shuffle; verification never re-joins the corpus
    "q_dedup_ngram_jaccard": {"forbid": ("SortMergeJoin", "BroadcastHashJoin")},
    "q_dedup_containment": {"forbid": ("SortMergeJoin", "BroadcastHashJoin")},
    "q_dedup_minhash": {"forbid": ("SortMergeJoin", "BroadcastHashJoin")},
    # global top-k must be per-partition top-k + k-row merge
    "q_topk": {"require": ("TakeOrderedAndProject",)},
    "q_text_term_freq": {"require": ("TakeOrderedAndProject",)},
    "q_term_pmi": {"require": ("TakeOrderedAndProject",)},
    # map-only operators: zero exchanges end-to-end
    "q_lang_id": {"forbid": ("Exchange",)},
    "q_text_quality": {"forbid": ("Exchange",)},
    "q_udf_surface": {"forbid": ("Exchange",)},
    "q_doc_fingerprint": {"forbid": ("Exchange",)},
    "q_multimodal_meta": {"forbid": ("Exchange",)},
    "q_scalar_string_date_math": {"forbid": ("Exchange",)},
    "q_array_map_funcs": {"forbid": ("Exchange",)},
    "q_map_funcs": {"forbid": ("Exchange",)},
    "q_string_funcs": {"forbid": ("Exchange",)},
    "q_sample_hash": {"forbid": ("Exchange",)},
    "q_feature_hash": {"forbid": ("Exchange",)},
    "q_random_projection": {"forbid": ("Exchange",)},
    "q_stratified_sample": {"forbid": ("Exchange",)},
    "q_token_bpe": {"forbid": ("Exchange",)},
    "q_vector_quantize": {"forbid": ("Exchange",)},
    # histogram must keep its map-side combine
    "q_histogram": {"require": ("partial_count",)},
    # the salting demo must actually shuffle on (key, salt)
    "q_join_skew_salted": {"require": ("SortMergeJoin",)},
    # bucketed co-located fact join: the WHOLE plan (dim attach, fact SMJ,
    # group agg, top-k) must be SHUFFLE-free — the layout's entire point.
    # The dim attach is a BroadcastExchange (wanted), so the forbid is the
    # anchored shuffle-exchange node header, not the bare substring.
    "q_join_bucketed": {
        "require": ("SortMergeJoin", "TakeOrderedAndProject", "Bucketed: true"),
        "forbid": (r"re:^\(\d+\) Exchange$",),
    },
    # same layout, aggregation consumer: group keys = bucket key ⇒ the
    # hash aggregate inherits the scan partitioning, zero shuffles
    "q_agg_bucketed": {
        "require": ("TakeOrderedAndProject", "Bucketed: true"),
        "forbid": (r"re:^\(\d+\) Exchange$",),
    },
    # one aggregation exchange is the floor for a groupBy — but it must be
    # preceded by a map-side partial aggregate
    "q_json_props": {"require": ("partial_count",)},
    # repetition signals + PII scrub are pure per-row pipelines
    "q_text_repetition": {"forbid": ("Exchange",)},
    "q_pii_scrub": {"forbid": ("Exchange",)},
    # the melt itself must be an Expand over the aggregate, not a join/union
    # re-reading the fact table per measure
    "q_unpivot": {"require": ("Expand",)},
    "q_funnel": {"require": ("partial_min",)},
    # LM scoring joins the count dims as broadcasts against the bigram scan
    "q_ngram_lm": {"require": ("BroadcastHashJoin",)},
    # BM25: corpus side is one map-only scan (tf via array expressions, no
    # explode → no per-term shuffle join) and the top-20 is a heap merge
    "q_bm25": {
        "require": ("TakeOrderedAndProject",),
        "forbid": ("SortMergeJoin", "Generate"),
    },
    # TPC-H shapes: map-side combine on Q1; broadcast dims + heap top-k on
    # Q3; all four dims broadcast on Q5 (the only shuffle join is the
    # orders⋈lineitem fact join)
    "q_tpch_pricing": {"require": ("partial_sum",)},
    "q_tpch_shipping": {"require": ("BroadcastHashJoin", "TakeOrderedAndProject")},
    "q_tpch_volume": {"require": ("BroadcastHashJoin",)},
    # corpus prep: chunking is a pure per-row expand; entropy keeps its
    # map-side partial; vocab top-k is a heap merge, never a full sort;
    # decontamination probes a broadcast of the (tiny) eval shingle set
    "q_doc_chunk": {"forbid": ("Exchange",)},
    "q_text_entropy": {"require": ("partial_count",)},
    "q_vocab": {"require": ("TakeOrderedAndProject",)},
    "q_decontaminate": {"require": ("BroadcastHashJoin",)},
    # k-means: centroid updates must keep their map-side partial average —
    # the shuffle carries K×D groups, never vectors
    "q_kmeans": {"require": ("partial_avg",)},
    # SCD2 segment collapse keeps its map-side partial min
    "q_scd2": {"require": ("partial_min",)},
    # profiler: per-column branches hash-aggregate the scan with map-side
    # partials; the multi-distinct-in-one-agg formulation (Expand ×6 into a
    # 30-buffer SortAggregate) measured 3× slower and is forbidden. A small
    # SortAggregate remains over each distinct set (string min/max buffers)
    # — that input is |distinct values|, not the scan.
    "q_profile_columns": {"require": ("partial_count",), "forbid": ("Expand",)},
    # heavy hitters: ONE mergeable sketch row, then heap top-k over its
    # exploded items — never an exact groupBy of every distinct term
    "q_approx_topk": {"require": ("TakeOrderedAndProject", "partial_approx_top_k")},
    # pagerank: edge derivation broadcasts the customer/supplier dims and
    # map-side combines the nations² edge aggregate
    "q_pagerank": {"require": ("BroadcastHashJoin", "partial_count")},
    # MAD screen: both percentile passes broadcast back; top-10 skew report
    # heap-merges
    "q_anomaly_mad": {"require": ("BroadcastHashJoin",)},
    "q_skew_report": {"require": ("TakeOrderedAndProject", "partial_count")},
    # temporal join: the segment build keeps its map-side partial min
    "q_temporal_join": {"require": ("partial_min",)},
}


def _matches(pat: str, plan: str) -> bool:
    """Rule patterns are plain substrings, or anchored regexes with an
    ``re:`` prefix (multiline) for cases where a substring is too coarse —
    e.g. forbidding the shuffle ``Exchange`` node without also matching
    the broadcast ``BroadcastExchange`` node header."""
    if pat.startswith("re:"):
        return re.search(pat[3:], plan, re.MULTILINE) is not None
    return pat in plan


def plan_of(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), "formatted"
    )


def audit_one(name: str, df: DataFrame) -> list[str]:
    """Return a list of violations (empty = pass)."""
    plan = plan_of(df)
    bad: list[str] = []
    for pat in GLOBAL_FORBID:
        if pat in plan:
            bad.append(f"forbidden {pat!r} in plan")
    if name not in BNLJ_ALLOWED and "BroadcastNestedLoopJoin" in plan:
        bad.append("forbidden 'BroadcastNestedLoopJoin' in plan")
    rules = RULES.get(name, {})
    for pat in rules.get("require", ()):
        if not _matches(pat, plan):
            bad.append(f"missing required {pat!r}")
    for pat in rules.get("forbid", ()):
        if _matches(pat, plan):
            bad.append(f"forbidden {pat!r} in plan")
    # a window with an empty partition spec funnels everything into one
    # partition — never acceptable unless the input is provably bounded
    # (a global limit or a config-cardinality aggregate, allowlisted)
    if name not in GLOBAL_WINDOW_ALLOWED and _has_global_window(plan):
        bad.append("global (unpartitioned) Window in plan")
    return bad


def _has_global_window(plan: str) -> bool:
    """Detect an unpartitioned Window in a FORMATTED plan.

    The partition spec is NOT on the tree line ('+- Window (4)') — it
    lives on the detail block's 'Arguments:' line, which carries
    ``[funcs], [partitionSpec], [ordering]`` for a partitioned window but
    only ``[funcs], [ordering]`` for an unpartitioned one (verified on
    Spark 4.1.2; the earlier ', []' substring check matched neither form
    and silently passed every global window).
    """
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if not re.fullmatch(r"\(\d+\) Window", line.strip()):
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            if not lines[j].startswith("Arguments:"):
                continue
            # top-level bracket groups are separated by '], [' — window
            # funcs/partition exprs/sort specs never nest square brackets.
            # 3 groups = [funcs], [partition], [order]  → partitioned.
            # 2 groups is ambiguous: [funcs], [order] (UNpartitioned,
            # ordered) vs [funcs], [partition] (partitioned, orderless
            # frame agg) — the order group always carries a sort
            # direction, the partition group never does.
            groups = lines[j].count("], [") + 1
            if groups == 1:
                return True  # funcs only: no partition, no order
            if groups == 2:
                tail = lines[j].rsplit("], [", 1)[1]
                if " ASC" in tail or " DESC" in tail:
                    return True
            break
    return False


def main() -> int:
    from cloud_data_sync_spark.registry import all_queries
    from cloud_data_sync_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(all_queries())
    if unknown:
        # a typo'd filter must not produce a false-green empty audit
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2
    spark: SparkSession = get_spark()
    failures = 0
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            # substrate-backed queries expose their builder pipeline via
            # plan_fn — the registered fn explains as `Scan ExistingRDD`
            # once the shared checkpoint exists, which is structurally
            # uncheckable (see registry.QuerySpec.plan_fn)
            bad = audit_one(name, (spec.plan_fn or spec.fn)(spark, sf_dir))
        except Exception as exc:  # pragma: no cover - plan build error
            bad = [f"plan build error: {exc}"]
        if bad:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(bad))
        else:
            print(f"ok    {name}")
    print(f"\n{'ALL PLANS PASS' if not failures else f'{failures} plan failures'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
