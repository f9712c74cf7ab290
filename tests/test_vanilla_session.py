"""The driver's harness builds its own VANILLA SparkSession — no engine
conf from session.get_spark(). Round-1 lesson: 7 queries died only under
that session (events nanos-vintage timestamps + session-timezone hashing), while
builder-local gates stayed green because conftest uses get_spark().

This test replays the gate through a bare session in a subprocess (the
in-process conftest session already carries engine conf, so it cannot
regress into vanilla). Covers the events-reading queries that broke.
"""

from __future__ import annotations

import subprocess
import sys


def test_events_queries_pass_under_vanilla_session():
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/tools/check_oracle.py",
            "--vanilla",
            "/root/testdata/sf0.001",
            "q_json_props",
            "q_map_funcs",
            "q_stream_tumbling",
            "q_join_asof",
            # percentile-over-events canary: exercises quantile
            # interpolation + value hashing under the bare session
            "q_winsorize",
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "5/5 queries match" in proc.stdout
