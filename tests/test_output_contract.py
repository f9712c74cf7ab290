"""Registered-output contract: scalar columns only.

The driver's correctness gate canonicalizes each query's collected rows
with ``pandas.DataFrame.sort_values`` over every column before hashing.
List/dict cells crash that path (``TypeError: unhashable type: 'list'``)
— q_feature_hash went red in CORRECTNESS_r04 exactly this way while the
friendlier local canonicalizer stayed green. These tests enforce the
contract structurally: no registered query may emit array/map/struct
columns, and the local checker's driver-exact canonicalization replica
must actually reject such outputs.
"""

from __future__ import annotations

import sys

import pandas as pd

from cloud_data_sync_spark.registry import all_queries

from .conftest import SF_DIR

sys.path.insert(0, "/root/repo/tools")

_SCALAR_BANNED = ("array", "map", "struct")


def test_no_registered_query_emits_complex_columns(spark):
    """Build every registered plan and reject array/map/struct outputs.

    Schema-only (no collect): analysis is enough to know the output types,
    so this covers the full registry — including the 120 keys outside the
    driver's alphabetically-first-50 verification window, where the r4
    latent defects (q_inverted_index, q_random_projection) were hiding.
    """
    offenders: dict[str, list[str]] = {}
    for name, spec in sorted(all_queries().items()):
        df = spec.fn(spark, SF_DIR)
        bad = [
            f"{f.name}:{f.dataType.typeName()}"
            for f in df.schema.fields
            if f.dataType.typeName() in _SCALAR_BANNED
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver's pandas canonicalizer cannot hash these outputs: "
        f"{offenders}"
    )


def test_driver_canon_replica_rejects_list_cells():
    """The checker's driver-exact path must be as strict as the driver."""
    from check_oracle import driver_canon_error

    ok = driver_canon_error(["a", "b"], [(1, "x"), (2, "y")])
    assert ok is None
    err = driver_canon_error(["a", "feats"], [(1, [1, 2]), (2, [3, 4])])
    assert err is not None and "unhashable" in err


def test_driver_canon_replica_matches_pandas_sort_behavior():
    """Guard the replica against drifting from the actual pandas call."""
    cols = ["a", "m"]
    rows = [(1, {"k": 1}), (2, {"k": 2})]
    # dict cells crash pandas sort_values the same way list cells do
    try:
        pd.DataFrame(rows, columns=cols).sort_values(by=sorted(cols))
        pandas_ok = True
    except TypeError:
        pandas_ok = False
    from check_oracle import driver_canon_error

    assert pandas_ok == (driver_canon_error(cols, rows) is None)
