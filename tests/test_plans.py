"""Physical-plan structure gate — the scale design, enforced in CI.

Runs tools/plan_audit.py's rule table over every registered query at
sf0.001 (plans don't depend on data volume; sf only affects stats-based
broadcast choices, which we pin with explicit hints anyway).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from plan_audit import audit_one  # noqa: E402

from cloud_data_sync_spark.registry import all_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_plan_rules(spark, name):
    spec = all_queries()[name]
    # plan_fn: substrate-backed queries audit their builder pipeline — the
    # registered fn explains as `Scan ExistingRDD` once the shared
    # checkpoint exists (see registry.QuerySpec.plan_fn)
    violations = audit_one(name, (spec.plan_fn or spec.fn)(spark, SF_DIR))
    assert not violations, f"{name}: {violations}"
