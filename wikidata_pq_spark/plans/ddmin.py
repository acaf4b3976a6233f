"""Delta-debugging failure minimization for schema-drift repros.

The Spark re-expression of the reference's ddmin harness
(reference: ddmin_schema.py:56-158 ``ddmin_subset``/``ddmin_range``,
extract_bad_rows.py): given a batch of rows whose inferred schema
breaks the declared contract, shrink it to a minimal failing row set
so the offending record(s) can be eyeballed. Debug tooling -- the
predicate runs driver-side over pandas subsets; the only Spark work is
the per-probe JSON schema inference, which is sample-bounded.

The core is Zeller's ddmin over row indices (the same chunked
complement-removal loop as the reference's ddmin_subset), plus the
binary-search range shrinker (ddmin_range) for contiguous-bug cases.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from . import schema_check


def ddmin(
    indices: Sequence[int],
    fails: Callable[[list[int]], bool],
    on_progress: Callable[[int], None] | None = None,
) -> list[int]:
    """Minimal failing subset of ``indices`` under predicate ``fails``.

    ``fails(subset)`` must return True for the full input (asserted) and
    for the returned minimal subset; 1-minimality holds in the usual
    ddmin sense (removing any single tried chunk makes it pass).
    Mirrors the reference's chunked complement loop
    (reference: ddmin_schema.py:133-158).
    """
    indices = list(indices)
    if not fails(indices):
        raise ValueError("initial set must fail")
    n = 2
    while len(indices) >= 2:
        chunk_size = max(1, len(indices) // n)
        progress = False
        for i in range(0, len(indices), chunk_size):
            complement = indices[:i] + indices[i + chunk_size:]
            if complement and fails(complement):
                indices = complement
                n = max(n - 1, 2)
                progress = True
                if on_progress:
                    on_progress(len(indices))
                break
        if not progress:
            if n >= len(indices):
                break
            n = min(n * 2, len(indices))
    return indices


def ddmin_range(
    start: int,
    end: int,
    fails: Callable[[int, int], bool],
) -> tuple[int, int]:
    """Minimal [start, end) half-open range still failing -- the binary
    search variant for contiguous bugs (reference: ddmin_schema.py:55-92)."""
    if not fails(start, end):
        raise ValueError("initial range must fail")
    best_start, best_end = start, end
    lo, hi = start, end - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if fails(mid, best_end):
            lo = mid
            best_start = mid
        else:
            hi = mid - 1
    lo, hi = best_start + 1, end
    while lo < hi:
        mid = (lo + hi) // 2
        if fails(best_start, mid):
            hi = mid
            best_end = mid
        else:
            lo = mid + 1
    return best_start, best_end


def shrink_schema_drift(
    spark: SparkSession,
    pdf,
    column: str,
    declared: T.StructType,
    sample: int = 1000,
):
    """Shrink a pandas frame of JSON-string rows to a minimal subset
    whose INFERRED schema still violates the declared contract
    (schema_check's subset rule). Returns (minimal_pdf, problems).

    The wiring the reference's harness has around genson-cli
    (ddmin_schema.py:98-131), re-targeted at plans.schema_check: the
    probe infers over the candidate subset and tests validate_subset.
    """
    pdf = pdf.reset_index(drop=True)

    def _problems(idx: list[int]) -> list[str]:
        sub = spark.createDataFrame(pdf.iloc[idx])
        inferred = schema_check.infer_json_schema(spark, sub, column, sample)
        return schema_check.validate_subset(inferred, declared)

    def fails(idx: list[int]) -> bool:
        return bool(_problems(idx))

    minimal = ddmin(range(len(pdf)), fails)
    return pdf.iloc[minimal].reset_index(drop=True), _problems(minimal)
