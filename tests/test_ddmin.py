"""Failure-minimization harness (reference: ddmin_schema.py:56-158)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import types as T

from wikidata_pq_spark.plans import ddmin


def test_ddmin_single_culprit():
    bad = {37}
    calls = []

    def fails(idx):
        calls.append(list(idx))
        return bad <= set(idx)

    out = ddmin.ddmin(range(100), fails)
    assert out == [37]
    # far fewer probes than the 2^100 subsets (sanity: sub-quadratic)
    assert len(calls) < 200


def test_ddmin_pair_culprit():
    """Failure needs BOTH rows (the interaction case ddmin handles and
    a range shrinker cannot)."""
    def fails(idx):
        s = set(idx)
        return {5, 90} <= s

    out = ddmin.ddmin(range(100), fails)
    assert sorted(out) == [5, 90]


def test_ddmin_requires_failing_input():
    with pytest.raises(ValueError):
        ddmin.ddmin(range(10), lambda idx: False)


def test_ddmin_range_contiguous():
    def fails(a, b):
        # bug lives in rows [40, 43): any range covering it fails
        return a <= 40 and b >= 43

    assert ddmin.ddmin_range(0, 100, fails) == (40, 43)


DECLARED = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("n", T.DoubleType()),
    ]
)


def test_shrink_schema_drift(spark):
    """20 conforming rows + one row with an undeclared field: the
    shrinker isolates exactly the drifting row and names the violation."""
    rows = [f'{{"a": "x{i}", "n": {i}.5}}' for i in range(20)]
    rows.insert(13, '{"a": "bad", "n": 1.0, "zz_new_field": true}')
    pdf = pd.DataFrame({"payload": rows})
    minimal, problems = ddmin.shrink_schema_drift(spark, pdf, "payload", DECLARED)
    assert len(minimal) == 1
    assert "zz_new_field" in minimal["payload"].iloc[0]
    assert any("zz_new_field" in p for p in problems)
