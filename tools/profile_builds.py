"""Split every registered query's wall into plan-BUILD time (the
``fn(spark, sf_dir)`` call — driver-side py4j/analysis work) and
EXECUTION time (the noop-sink save), min-of-N each, after the same
warm-up bench.py uses. Build cost is real floor: each Column operator
is a py4j round trip and the r5 SQL-text rewrites took the worst
builders 1.9 -> 0.35 s.

    python tools/profile_builds.py [--sf DIR] [--n N] [--out FILE]

Writes a JSON map {key: {"build": s, "exec": s}} sorted by build desc
to --out (default /tmp/profile_builds.json) and prints the top 25.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloud_data_sync_spark.registry import all_queries  # noqa: E402
from cloud_data_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dir, n, out = "/root/testdata/sf0.1", 2, "/tmp/profile_builds.json"
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf_dir, i = argv[i + 1], i + 2
        elif argv[i] == "--n":
            n, i = int(argv[i + 1]), i + 2
        elif argv[i] == "--out":
            out, i = argv[i + 1], i + 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")

    spark = get_spark("profile_builds")
    spark.sparkContext.setLogLevel("ERROR")
    from cloud_data_sync_spark.tables import load_tables

    for df in load_tables(spark, sf_dir, register_views=False).values():
        df.count()
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    qs = all_queries()
    for name in sorted(qs):
        try:
            if os.path.isdir(warm):
                qs[name].fn(spark, warm).write.format("noop").mode(
                    "overwrite"
                ).save()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 - warm-up is best-effort
            pass

    prof: dict[str, dict[str, float]] = {}
    for name in sorted(qs):
        builds, execs = [], []
        try:
            for _ in range(n):
                t0 = time.perf_counter()
                df = qs[name].fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                builds.append(t1 - t0)
                execs.append(t2 - t1)
        except Exception as exc:  # noqa: BLE001
            print(f"{name} failed: {exc}", file=sys.stderr)
            continue
        prof[name] = {
            "build": round(min(builds), 3),
            "exec": round(min(execs), 3),
        }

    with open(out, "w", encoding="utf-8") as f:
        json.dump(prof, f, indent=1, sort_keys=True)
    tb = sum(v["build"] for v in prof.values())
    te = sum(v["exec"] for v in prof.values())
    print(f"total build {tb:.1f}s  total exec {te:.1f}s  n_keys {len(prof)}")
    print("top 25 by build:")
    for k in sorted(prof, key=lambda k: -prof[k]["build"])[:25]:
        print(f"  {k:40s} build {prof[k]['build']:6.3f}  exec {prof[k]['exec']:6.3f}")
    print("top 25 by exec:")
    for k in sorted(prof, key=lambda k: -prof[k]["exec"])[:25]:
        print(f"  {k:40s} build {prof[k]['build']:6.3f}  exec {prof[k]['exec']:6.3f}")


if __name__ == "__main__":
    main()
