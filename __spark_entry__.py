"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``wikidata_pq_spark.contracts`` (relational
operators from SURVEY.md §2, dedup/similarity/text-analysis operators,
and the KG pipeline itself).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from wikidata_pq_spark import contracts  # noqa: E402
from wikidata_pq_spark import datagen  # noqa: E402
from wikidata_pq_spark.operators import canonicalize, extract, linking  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full transcript->triples KG pipeline.

    Runs extraction (applyInPandas), broadcast entity linking, and
    connected-component canonicalization on the deterministic synthetic
    corpus scaled for sf0.001; driver checks rows>0 and stable schema.
    """
    tdf, adf, sdf = contracts._kg_inputs(spark, "/root/testdata/sf0.001")
    mentions = extract.extract_mentions(tdf)
    linked = linking.link_mentions(mentions, adf, strategy="broadcast")
    comps = canonicalize.connected_components(sdf)
    return (
        canonicalize.apply_canonical(linked, comps)
        .select("subj", "pred", "obj", "conv_id", "turn_idx")
        .distinct()
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline operators and the KG pipeline stages)."""
    return dict(contracts.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query (no rows-only checks
    left). Three oracle classes:
    - plain ANSI recomputation over the testdata views (most queries);
    - golden parquets computed by INDEPENDENT driver-side
      implementations (pandas oracle pipeline / python golden
      flattener) that the SQL re-reads (kg_*, flatten_claims);
    - export-the-non-SQL-step: probabilistic/driver-side artifacts
      (LSH candidate sets, minhash/simhash signatures, hyperplane
      buckets, IVF cells+probes) are exported at the gate sf and the
      SQL re-derives everything downstream -- joins, banding, Hamming,
      cosine ranking, verify filters -- from scratch."""
    return dict(contracts.ORACLE_SQL)
