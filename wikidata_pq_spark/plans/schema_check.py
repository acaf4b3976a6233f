"""Declared-vs-inferred schema validation, subset-tolerant.

Mirrors the reference's distinctive schema discipline (reference:
process.py:60-88, 210-246, 336-347): schemas are DECLARED up front,
RE-INFERRED from the data at runtime, and compared -- a mismatch is
fatal unless the inferred schema is a SUBSET of the declared one
(fields may be missing from the data; they may never disagree in type
or appear undeclared). The reference allows only
``dictionary_item_removed`` diffs via DeepDiff; here the same rule is
an explicit structural walk over Spark StructTypes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SchemaMismatch(SystemExit):
    """Fatal, like the reference's SystemExit (process.py:86-88)."""


def _is_subset(inferred: T.DataType, declared: T.DataType, path: str, problems: list[str]) -> None:
    if isinstance(declared, T.StructType) and isinstance(inferred, T.StructType):
        declared_fields = {f.name: f.dataType for f in declared.fields}
        for f in inferred.fields:
            if f.name not in declared_fields:
                problems.append(f"{path}.{f.name}: undeclared field (dictionary_item_added)")
            else:
                _is_subset(f.dataType, declared_fields[f.name], f"{path}.{f.name}", problems)
        return
    if isinstance(declared, T.ArrayType) and isinstance(inferred, T.ArrayType):
        _is_subset(inferred.elementType, declared.elementType, path + "[]", problems)
        return
    if isinstance(declared, T.MapType) and isinstance(inferred, T.MapType):
        _is_subset(inferred.keyType, declared.keyType, path + ".key", problems)
        _is_subset(inferred.valueType, declared.valueType, path + ".value", problems)
        return
    # Dynamic-key JSON objects infer as a STRUCT of the observed keys;
    # a declared MapType means "any key, this value shape" (the
    # reference's map-vs-record unification, its genson map_threshold=0
    # flag, process.py:62-68) -- validate every observed key's value
    # against the declared map value type.
    if isinstance(declared, T.MapType) and isinstance(inferred, T.StructType):
        for f in inferred.fields:
            _is_subset(f.dataType, declared.valueType, f"{path}.{f.name}", problems)
        return
    # NullType infers when a column is all-null in the sample -- that is
    # the "field missing from data" case, always acceptable.
    if isinstance(inferred, T.NullType):
        return
    # int-or-float union widening (reference: process.py:118-145
    # precision__integer/__number): an integral inference against a
    # declared double is acceptable (from_json widens).
    integral = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    if isinstance(declared, T.DoubleType) and isinstance(inferred, integral):
        return
    if type(inferred) is not type(declared):
        problems.append(f"{path}: type {inferred.simpleString()} != declared {declared.simpleString()}")


def validate_subset(inferred: T.StructType, declared: T.StructType) -> list[str]:
    """Return [] if inferred is an acceptable subset of declared, else
    the list of violations (the is_acceptable_diff analogue,
    reference: process.py:79-88)."""
    problems: list[str] = []
    _is_subset(inferred, declared, "$", problems)
    return problems


def infer_json_schema(
    spark: SparkSession, df: DataFrame, column: str, sample: int = 1000
) -> T.StructType:
    """Runtime schema inference over a JSON-string column (the
    polars-genson analogue, reference: process.py:60-75): sample rows,
    let the JSON reader infer."""
    sampled = df.select(column).na.drop().limit(sample)
    return spark.read.json(sampled.rdd.map(lambda r: r[0])).schema


def check_json_column(
    spark: SparkSession,
    df: DataFrame,
    column: str,
    declared: T.StructType,
    sample: int = 1000,
) -> None:
    """Infer + validate; raise SchemaMismatch on violation, exactly the
    reference's fail-fast behavior (process.py:345-347)."""
    inferred = infer_json_schema(spark, df, column, sample)
    problems = validate_subset(inferred, declared)
    if problems:
        raise SchemaMismatch(
            f"schema drift in column '{column}': " + "; ".join(problems)
        )
