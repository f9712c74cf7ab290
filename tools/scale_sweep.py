"""Empirical scaling sweep: run the heaviest registry keys at three data
scales (sf0.01 / sf0.1 / self-generated sf1, 10x apart by construction)
and record per-key scaling exponents — wall ∝ rows^alpha, so
alpha = log10(wall_hi / wall_lo) per decade step.

    python tools/gen_scale_vintage.py          # once, mints .scale/sf1
    python tools/scale_sweep.py [key ...]      # default: the heavy set

Methodology notes (the exponents are only as honest as these):
- Each (key, sf) is timed like bench.py times it: build + collect, on a
  warmed session; N_SWEEPS passes, min taken (noise filter). The
  prepared-plan cache is BYPASSED by calling the spec fn directly would
  still hit the registry wrapper — so we clear the cache between passes?
  No: we let pass 1 pay plan build and take the min over passes 2..N,
  i.e. the EXECUTION wall, which is what scales with data. Pass-1 walls
  ride along in the artifact as build+exec for reference.
- The sf0.01 -> sf0.1 step is floor-dominated (scheduling/launch ~0.1 s
  dwarfs tiny data), so the HEADLINE exponent is the sf0.1 -> sf1 step;
  both ride in the artifact.
- Exponent ~1.0 = linear, <1 = sublinear (floor or logarithmic terms),
  >1.2 = superlinear — investigate (SCALE.md records the adjudication).
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from cloud_data_sync_spark import registry  # noqa: E402
from cloud_data_sync_spark.registry import all_queries  # noqa: E402
from cloud_data_sync_spark.session import get_spark  # noqa: E402

HEAVY = [
    # top-15 by BENCH_FULL.json wall at sf0.1
    "q_bootstrap_ci",
    "q_langid_chargram",
    "q_corpus_dsir",
    "q_dedup_winnow",
    "q_split_assign",
    "q_heaps_law",
    "q_join_card_est",
    "q_kmeans",
    "q_logreg_auc",
    "q_term_pmi",
    "q_tfidf",
    "q_tpch_waiting",
    "q_dedup_substring",
    "q_dedup_span_scrub",
    "q_histogram_equidepth",
    # family-critical 100 TB claims (banded LSH, suffix exchange, ANN)
    "q_dedup_minhash_sweep",
    "q_dedup_suffix_groups",
    "q_dedup_simhash",
    "q_sim_ivf_sweep",
    "q_sim_range",
]

SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/.scale/sf1"),
]
N_SWEEPS = 3


def main() -> None:
    keys = sys.argv[1:] or HEAVY
    spark = get_spark("scale-sweep")
    qs = all_queries()
    out: dict[str, dict] = {}
    for key in keys:
        spec = qs[key]
        row: dict[str, object] = {}
        for sf_name, sf_dir in SFS:
            walls = []
            for i in range(N_SWEEPS):
                t0 = time.monotonic()
                spec.fn(spark, sf_dir).collect()
                walls.append(time.monotonic() - t0)
            # pass 1 pays plan build (cache miss); min over the rest is
            # the execution wall that scales with data
            row[sf_name] = round(min(walls[1:]), 4)
            row[f"{sf_name}_first"] = round(walls[0], 4)
        e01 = math.log10(row["sf0.1"] / row["sf0.01"]) if row["sf0.01"] > 0 else None
        e1 = math.log10(row["sf1"] / row["sf0.1"]) if row["sf0.1"] > 0 else None
        row["exp_001_01"] = round(e01, 3)
        row["exp_01_1"] = round(e1, 3)
        out[key] = row
        flag = " <== SUPERLINEAR" if e1 and e1 > 1.2 else ""
        print(
            f"{key:28s} {row['sf0.01']:7.3f} {row['sf0.1']:7.3f} "
            f"{row['sf1']:8.3f}  exp(0.1->1)={e1:5.2f}{flag}",
            flush=True,
        )
        # keep the prepared-plan cache bounded across the sweep
        registry._PREPARED.clear()
    with open("/root/repo/.scale/sweep.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote /root/repo/.scale/sweep.json")


if __name__ == "__main__":
    main()
