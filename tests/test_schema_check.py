"""Subset-tolerant schema validation (reference process.py:79-88 parity)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from wikidata_pq_spark.plans import schema_check

import pytest

pytestmark = pytest.mark.classic_session_only


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


def test_validate_entity_schemas_accepts_fixture(spark):
    """The declared entity schemas accept the reference-shaped fixture
    (incl. dynamic-key maps inferring as structs of observed keys)."""
    from wikidata_pq_spark import datagen
    from wikidata_pq_spark.operators import flatten

    df = spark.createDataFrame(datagen.gen_entity_rows(25, seed=7))
    flatten.validate_entity_schemas(df)  # must not raise


def test_validate_entity_schemas_rejects_drift(spark):
    """A claim carrying an UNDECLARED mainsnak field is fatal, like the
    reference's SystemExit gate on dictionary_item_added
    (process.py:345-347). (Scalar TYPE conflicts are invisible to
    Spark's permissive JSON inference -- it widens to string -- so the
    detectable drift class is added fields, same as the reference.)"""
    import json

    from wikidata_pq_spark import datagen
    from wikidata_pq_spark.operators import flatten

    pdf = datagen.gen_entity_rows(10, seed=7)
    claims = json.loads(pdf.loc[0, "claims"])
    first = next(iter(claims.values()))[0]
    first["mainsnak"]["zz_new_field"] = True
    pdf.loc[0, "claims"] = json.dumps(claims)
    with pytest.raises(schema_check.SchemaMismatch, match="zz_new_field"):
        flatten.validate_entity_schemas(spark.createDataFrame(pdf))


def test_map_declared_vs_struct_inferred_subset(spark):
    """Dynamic-key rule directly: struct-of-keys inferred against a
    declared map validates each key's value shape."""
    from pyspark.sql import types as T

    declared = T.MapType(
        T.StringType(),
        T.StructType([T.StructField("a", T.StringType()),
                      T.StructField("n", T.DoubleType())]),
    )
    inferred_ok = T.StructType(
        [T.StructField("k1", T.StructType([T.StructField("a", T.StringType())])),
         T.StructField("k2", T.StructType([T.StructField("n", T.LongType())]))]
    )
    assert schema_check.validate_subset(inferred_ok, declared) == []
    inferred_bad = T.StructType(
        [T.StructField("k1", T.StructType([T.StructField("zz", T.BooleanType())]))]
    )
    assert schema_check.validate_subset(inferred_bad, declared)
