"""Subset-tolerant schema validation (reference process.py:79-88 parity)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from wikidata_pq_spark.plans import schema_check

DECLARED = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("b", T.DoubleType()),
        T.StructField(
            "nested",
            T.StructType(
                [T.StructField("x", T.LongType()), T.StructField("y", T.StringType())]
            ),
        ),
    ]
)


def test_exact_match_ok():
    assert schema_check.validate_subset(DECLARED, DECLARED) == []


def test_missing_field_ok():
    inferred = T.StructType([T.StructField("a", T.StringType())])
    assert schema_check.validate_subset(inferred, DECLARED) == []


def test_undeclared_field_fatal():
    inferred = T.StructType(
        [T.StructField("a", T.StringType()), T.StructField("zz", T.StringType())]
    )
    problems = schema_check.validate_subset(inferred, DECLARED)
    assert any("zz" in p and "undeclared" in p for p in problems)


def test_type_conflict_fatal():
    inferred = T.StructType([T.StructField("a", T.LongType())])
    problems = schema_check.validate_subset(inferred, DECLARED)
    assert any("$.a" in p for p in problems)


def test_integral_widens_to_double():
    inferred = T.StructType([T.StructField("b", T.LongType())])
    assert schema_check.validate_subset(inferred, DECLARED) == []


def test_nulltype_always_ok():
    inferred = T.StructType([T.StructField("a", T.NullType())])
    assert schema_check.validate_subset(inferred, DECLARED) == []


def test_nested_violation_reported_with_path():
    inferred = T.StructType(
        [
            T.StructField(
                "nested", T.StructType([T.StructField("x", T.StringType())])
            )
        ]
    )
    problems = schema_check.validate_subset(inferred, DECLARED)
    assert any("$.nested.x" in p for p in problems)


def test_end_to_end_json_column(spark):
    pdf = pd.DataFrame(
        {"payload": ['{"a": "hi", "b": 1}', '{"a": "yo", "nested": {"x": 5}}']}
    )
    df = spark.createDataFrame(pdf)
    # acceptable: inferred subset (b integral vs double, missing y)
    schema_check.check_json_column(spark, df, "payload", DECLARED)
    # fatal: undeclared field
    bad = spark.createDataFrame(pd.DataFrame({"payload": ['{"rogue": 1}']}))
    with pytest.raises(schema_check.SchemaMismatch):
        schema_check.check_json_column(spark, bad, "payload", DECLARED)
