"""Spark extraction vs the pandas oracle + ordering invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikidata_pq_spark import oracle
from wikidata_pq_spark.operators import extract

KEYS = ["conv_id", "turn_idx", "pred", "subj_mention", "obj_mention"]


def test_extract_matches_oracle(spark_corpus, corpus):
    got = extract.extract_mentions(spark_corpus["transcripts"]).toPandas()
    golden = oracle.oracle_extract(corpus["transcripts"])
    assert sorted(map(tuple, got[KEYS].values)) == sorted(map(tuple, golden[KEYS].values))


def test_extract_partition_invariant(spark_corpus, corpus):
    """Result must not depend on input partitioning."""
    tdf = spark_corpus["transcripts"]
    a = extract.extract_mentions(tdf.repartition(13)).toPandas()
    b = extract.extract_mentions(tdf.coalesce(1)).toPandas()
    assert sorted(map(tuple, a[KEYS].values)) == sorted(map(tuple, b[KEYS].values))


def test_turn_stream_invariant_holds(spark_corpus):
    inv = extract.turn_stream_invariant(spark_corpus["transcripts"])
    assert inv.filter(~F.col("equal")).count() == 0


def test_ordered_turns_sorted_within_conversation(spark_corpus):
    ordered = extract.ordered_turns(spark_corpus["transcripts"])

    def check(it):
        import pandas as pd

        for pdf in it:
            bad = 0
            for _, grp in pdf.groupby("conv_id"):
                if not grp["turn_idx"].is_monotonic_increasing:
                    bad += 1
            yield pd.DataFrame({"bad": [bad]})

    res = ordered.mapInPandas(check, "bad int").toPandas()
    assert res["bad"].sum() == 0
