"""Idle-gated A/B of registered queries: HEAD vs an arbitrary git ref.

Mechanizes the adjudication r4/r5/r7/r8/r9 each ran by hand (is this
key's wall a code regression or a box window?): check out <ref> into a
scratch worktree, wait for the box to idle, then time the SAME keys
min-of-N in BOTH trees — each in its own subprocess/SparkSession with
the identical session pattern (table warm + per-key warm + noop sink),
idle re-checked between sides so neither inherits the other's load.

    python tools/ab_worktree.py <ref> q_key [q_key ...]
        [--sf DIR] [--n N] [--gate LOAD] [--wait SEC]

Output: one line per (side, key) with min/walls/load, then a verdict
table of HEAD/ref ratios. A ratio <= 1 pins the committed map's lower
wall on a faster box window, not on a code regression — recorded
evidence instead of narrative (BASELINE.md r9 A/B is the template).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import wait_for_idle  # noqa: E402

_RUNNER = r"""
import sys, time, os, json
root = sys.argv[1]
sf = sys.argv[2]
n = int(sys.argv[3])
names = sys.argv[4:]
sys.path.insert(0, root)
from cloud_data_sync_spark.registry import all_queries
from cloud_data_sync_spark.session import get_spark
spark = get_spark("ab-worktree")
spark.sparkContext.setLogLevel("ERROR")
from cloud_data_sync_spark.tables import load_tables
for df in load_tables(spark, sf, register_views=False).values():
    df.count()
qs = all_queries()
for name in names:  # warm: substrates + codegen
    qs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
out = {}
for name in names:
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        qs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out[name] = {"min": min(walls), "walls": walls,
                 "load": round(os.getloadavg()[0], 2)}
print("ABJSON " + json.dumps(out))
"""


def _time_tree(root: str, sf: str, n: int, names: list[str]) -> dict:
    # cwd AND PYTHONPATH pinned to the tree under test: the driver-side
    # sys.path.insert in _RUNNER is not enough — Spark's Python workers
    # resolve cloudpickled-by-reference modules (pandas UDFs,
    # mapInPandas bodies) from the worker's own path, which inherits
    # PYTHONPATH/cwd. Without the pin, the ref side's workers would
    # silently import HEAD's UDF code and the A/B would compare HEAD
    # against itself for any UDF-bearing key.
    env = dict(os.environ)
    env["PYTHONPATH"] = root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, root, sf, str(n), *names],
        capture_output=True,
        text=True,
        check=False,
        cwd=root,
        env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABJSON "):
            return json.loads(line[len("ABJSON "):])
    raise RuntimeError(
        f"runner in {root} produced no ABJSON line; stderr tail:\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="git ref to A/B against (e.g. the r7-close sha)")
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--gate", type=float, default=0.8)
    ap.add_argument("--wait", type=float, default=1800)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Scratch worktree OUTSIDE the repo via mkdtemp: a fixed repo-local
    # path derived from ref[:12] with --force add/remove could silently
    # clobber a pre-existing directory (or a second ref sharing the
    # 12-char prefix); mkdtemp is collision-free by construction and
    # `worktree add` without --force errors instead of overwriting.
    wt = os.path.join(
        tempfile.mkdtemp(prefix="ab_worktree_"),
        args.ref[:12].replace("/", "_"),
    )
    subprocess.run(
        ["git", "-C", repo, "worktree", "add", wt, args.ref],
        check=True,
        capture_output=True,
    )
    # The HEAD side measures the WORKING TREE, not the HEAD commit — say
    # so when they differ, or a dirty-tree A/B gets recorded as if it
    # pinned the committed code.
    dirty = subprocess.run(
        ["git", "-C", repo, "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=False,
    ).stdout.strip()
    if dirty:
        print(
            "WARNING: HEAD side has uncommitted changes — this A/B "
            f"measures the dirty working tree, not HEAD:\n{dirty}",
            file=sys.stderr,
        )
    try:
        results = {}
        for side, root in (("ref", wt), ("HEAD", repo)):
            load, waited, ok = wait_for_idle(args.gate, args.wait)
            print(
                f"side={side} start_load={load:.2f} waited={waited:.0f}s "
                f"gate_ok={ok}",
                flush=True,
            )
            results[side] = _time_tree(root, args.sf, args.n, args.keys)
            for k, v in results[side].items():
                print(f"  {side:4s} {k}: min={v['min']} walls={v['walls']} "
                      f"end_load={v['load']}", flush=True)
        print("\nkey, head_s, ref_s, head/ref")
        for k in args.keys:
            h, r = results["HEAD"][k]["min"], results["ref"][k]["min"]
            print(f"{k}, {h}, {r}, {h / r:.3f}")
        return 0
    finally:
        # --force is safe HERE: wt is a fresh mkdtemp child this process
        # created; it only skips the clean-tree check for files Spark
        # may have dropped into the scratch tree (spark-warehouse/)
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            check=False,
            capture_output=True,
        )
        try:
            os.rmdir(os.path.dirname(wt))
        except OSError:
            pass  # worktree remove failed; leave the tempdir for forensics
        subprocess.run(
            ["git", "-C", repo, "worktree", "prune"],
            check=False,
            capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
