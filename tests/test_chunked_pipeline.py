"""Chunk-granular resumability (reference file-granular state parity)."""

from __future__ import annotations

import pytest

from wikidata_pq_spark import oracle
from wikidata_pq_spark.pipeline import ChunkedKGPipeline

KEYS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _tset(df):
    return set(map(tuple, df.select(*KEYS).toPandas().values))


def test_chunked_equals_oracle(spark, spark_corpus, corpus, tmp_path):
    pipe = ChunkedKGPipeline(spark, str(tmp_path / "kg"), n_chunks=4)
    lineage = pipe.run(
        spark_corpus["transcripts"], spark_corpus["alias_dict"], spark_corpus["same_as"]
    )
    golden = oracle.oracle_triples(
        corpus["transcripts"], corpus["alias_dict"], corpus["same_as"]
    )
    got = pipe.triples().select("subj", "pred", "obj").toPandas()
    p, r = oracle.precision_recall(got, golden)
    assert (p, r) == (1.0, 1.0)
    assert sum(lineage.values()) == pipe.triples().count()
    assert len(lineage) == 4
    lin = spark.read.parquet(str(tmp_path / "kg" / "lineage")).toPandas()
    assert dict(zip(lin["chunk"], lin["rows"])) == lineage


def test_kill_and_resume_identical(spark, spark_corpus, tmp_path):
    out = str(tmp_path / "kg")
    clean = ChunkedKGPipeline(spark, str(tmp_path / "clean"), n_chunks=4)
    clean.run(
        spark_corpus["transcripts"], spark_corpus["alias_dict"], spark_corpus["same_as"]
    )
    expected = _tset(clean.triples())

    pipe = ChunkedKGPipeline(spark, out, n_chunks=4)
    with pytest.raises(RuntimeError, match="injected failure"):
        pipe.run(
            spark_corpus["transcripts"],
            spark_corpus["alias_dict"],
            spark_corpus["same_as"],
            fail_after_chunk=1,
        )
    assert pipe.incomplete() == ["chunk_00002", "chunk_00003"]

    # resume: only the incomplete chunks run; output identical to clean
    pipe2 = ChunkedKGPipeline(spark, out, n_chunks=4)
    lineage = pipe2.run(
        spark_corpus["transcripts"], spark_corpus["alias_dict"], spark_corpus["same_as"]
    )
    assert pipe2.incomplete() == []
    assert _tset(pipe2.triples()) == expected
    assert len(lineage) == 4


def test_chunks_partition_conversations(spark, spark_corpus):
    chunked = spark_corpus["transcripts"].withColumn(
        "c", ChunkedKGPipeline.chunk_col(4)
    )
    # every conversation maps to exactly one chunk
    multi = (
        chunked.groupBy("conv_id")
        .agg({"c": "approx_count_distinct"})
        .filter("`approx_count_distinct(c)` > 1")
    )
    assert multi.count() == 0
