"""Deterministic sampling operators: hash membership, stratification,
and the two reservoir strategies' exact equivalence (incl. a margin
forced so low the prefilter MUST take its fallback path)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wikidata_pq_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], f"doc text {i} " + "x" * (i % 7))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _py_hash(key, seed=""):
    return hashlib.md5((str(key) + seed).encode()).hexdigest()


def test_hash_sample_matches_python_replay(docs):
    got = {r.doc_id for r in sampling.hash_sample(docs, 0.25, "doc_id").collect()}
    cutoff = sampling.fraction_to_hex_threshold(0.25)
    want = {i for i in range(400) if _py_hash(i)[: sampling.HEX_CHARS] < cutoff}
    assert got == want
    assert 0 < len(got) < 400


def test_hash_sample_stable_under_append_and_seed(docs):
    before = {r.doc_id for r in sampling.hash_sample(docs, 0.3, "doc_id").collect()}
    extra = docs.sparkSession.createDataFrame(
        [(1000 + i, "en", f"new {i}") for i in range(50)],
        "doc_id long, lang string, text string",
    )
    after = {
        r.doc_id
        for r in sampling.hash_sample(docs.unionByName(extra), 0.3, "doc_id").collect()
    }
    # appending rows never flips membership of existing rows
    assert before == {d for d in after if d < 1000}
    # a different seed draws an independent sample (not identical)
    seeded = {
        r.doc_id for r in sampling.hash_sample(docs, 0.3, "doc_id", seed="v2").collect()
    }
    assert seeded != before


def test_fraction_edge_cases(docs):
    assert sampling.hash_sample(docs, 0.0, "doc_id").count() == 0
    assert sampling.hash_sample(docs, 1.0, "doc_id").count() == 400


def test_stratified_fractions_and_default(docs):
    out = sampling.stratified_sample(
        docs,
        "lang",
        {"en": 0.5, "de": 0.1},
        key_col="doc_id",
        default_fraction=0.0,
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    # fr has no entry and default 0 -> absent entirely
    assert "fr" not in by_lang
    # python replay per stratum
    for lang, frac in (("en", 0.5), ("de", 0.1)):
        cutoff = sampling.fraction_to_hex_threshold(frac)
        want = {
            i
            for i in range(400)
            if ["en", "de", "fr"][i % 3] == lang
            and _py_hash(i)[: sampling.HEX_CHARS] < cutoff
        }
        assert by_lang.get(lang, set()) == want
    # schema passthrough: no helper columns leak
    cols = sampling.stratified_sample(
        docs, "lang", {"en": 0.5}, key_col="doc_id"
    ).columns
    assert cols == ["lang", "doc_id", "text"]


def _reservoir_ids(df, strategy, k=7, margin=4.0):
    out = sampling.reservoir_per_group(
        df, "lang", k=k, key_col="doc_id", strategy=strategy, margin=margin
    )
    rows = out.collect()
    got = {}
    for r in rows:
        got.setdefault(r.lang, set()).add(r.doc_id)
    return got, [c for c in out.columns]


def test_reservoir_window_matches_python(docs):
    got, cols = _reservoir_ids(docs, "window")
    assert cols == ["doc_id", "lang", "text"]
    for lang in ("en", "de", "fr"):
        ids = [i for i in range(400) if ["en", "de", "fr"][i % 3] == lang]
        want = set(sorted(ids, key=lambda i: (_py_hash(i), i))[:7])
        assert got[lang] == want


def test_reservoir_strategies_identical(docs):
    w, _ = _reservoir_ids(docs, "window")
    p, _ = _reservoir_ids(docs, "prefilter")
    assert w == p


def test_reservoir_prefilter_fallback_path_exact(docs):
    """margin so small the per-group cutoff keeps ~0-1 rows: every
    group must take the unfiltered fallback and the result is STILL
    identical to the window strategy."""
    w, _ = _reservoir_ids(docs, "window", k=7)
    p, _ = _reservoir_ids(docs, "prefilter", k=7, margin=0.01)
    assert w == p


def test_reservoir_small_groups_returned_whole(spark):
    tiny = spark.createDataFrame(
        [(1, "g1"), (2, "g1"), (3, "g2")], "doc_id long, lang string"
    )
    got, _ = _reservoir_ids(tiny, "prefilter", k=10)
    assert got == {"g1": {1, 2}, "g2": {3}}


def test_reservoir_null_group_kept_by_both_strategies(spark):
    """A NULL group value is one stratum like any other in BOTH
    strategies (r6 review: the prefilter path's bare-column equi-joins
    silently dropped the NULL stratum; now joined on a struct-wrapped
    null-safe key)."""
    rows = [(i, None if i % 4 == 0 else ["en", "de"][i % 2], f"t{i}")
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w, _ = _reservoir_ids(df, "window", k=5)
    p, _ = _reservoir_ids(df, "prefilter", k=5)
    assert w == p
    assert None in p and len(p[None]) == 5
    # and the NULL stratum is exactly the 5 hash-smallest NULL-group ids
    null_ids = [i for i in range(80) if i % 4 == 0]
    want = set(sorted(null_ids, key=lambda i: (_py_hash(i), i))[:5])
    assert p[None] == want


def _py_weighted_keep(key, weight, f, seed=""):
    """Pure-python replay of weighted_hash_sample membership."""
    if weight is None or weight <= 0:
        return False
    num = int(_py_hash(key, seed)[: sampling._NUM_HEX], 16)
    import math

    cutoff = math.floor(
        min(float(sampling._NUM_SPACE), (f * weight) * float(sampling._NUM_SPACE))
    )
    return num < cutoff


def test_weighted_sample_matches_python_replay(spark):
    rows = [
        (i, float(w), f"t{i}")
        for i, w in enumerate([0.5, 1.0, 2.0, 5.0, 0.0, 1500.0] * 50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double, text string")
    got = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            df, 0.001, weight_col="w", key_col="doc_id", seed="s"
        ).collect()
    }
    want = {
        i for i, w, _ in rows if _py_weighted_keep(i, w, 0.001, seed="s")
    }
    assert got == want
    # the min() cap: weight 1500 at f=0.001 -> f*w = 1.5 >= 1, always kept
    assert {i for i in got if i % 6 == 5} == {i for i, w, _ in rows if w == 1500.0}
    # weight 0 and negative/NULL weights never kept
    assert not any(i % 6 == 4 for i in got)


def test_weighted_sample_rate_proportional_to_weight(spark):
    """Doubling the weight doubles the keep rate (statistically, on a
    2k-row class): the Bernoulli semantics, not just membership."""
    rows = [(i, 1.0 if i < 2000 else 2.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = sampling.weighted_hash_sample(
        df, 0.1, weight_col="w", key_col="doc_id"
    ).groupBy("w").count().collect()
    by_w = {r.w: r["count"] for r in kept}
    r1 = by_w[1.0] / 2000  # E = 0.1
    r2 = by_w[2.0] / 2000  # E = 0.2
    assert 0.07 < r1 < 0.13
    assert 1.6 < r2 / r1 < 2.4


def test_weighted_sample_null_weight_and_reshard_stability(spark):
    rows = [(i, None if i % 5 == 0 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            df, 0.5, weight_col="w", key_col="doc_id"
        ).collect()
    }
    assert not any(i % 5 == 0 for i in a)  # NULL weights dropped
    b = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            df.repartition(13), 0.5, weight_col="w", key_col="doc_id"
        ).collect()
    }
    assert a == b  # membership independent of partitioning


def test_weighted_sample_nan_weight_dropped(spark):
    """r7 second review: Spark orders NaN greater than every number, so
    an unguarded NaN weight would pass `w > 0` AND saturate the min()
    cap -- kept unconditionally. The contract drops it like NULL."""
    rows = [(0, float("nan")), (1, 1000.0), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            df, 0.01, weight_col="w", key_col="doc_id"
        ).collect()
    }
    assert got == {1}  # w=1000*0.01=10 >= 1 -> always kept; NaN/NULL dropped


def test_hash_samplers_work_on_streaming_frames(spark, tmp_path):
    """Both hash samplers are STATELESS row-local filters, so they
    apply to streaming frames unchanged (r7) -- and because membership
    is a pure function of the key, the streamed sample is IDENTICAL to
    the batch sample of the same rows (no watermark, no state store,
    no micro-batch dependence)."""
    import pandas as pd

    in_dir = str(tmp_path / "in")
    rows = pd.DataFrame(
        {
            "doc_id": range(300),
            "w": [float(1 + i % 4) for i in range(300)],
        }
    )
    # two files -> two potential micro-batches
    spark.createDataFrame(rows[:150]).coalesce(1).write.parquet(in_dir)
    spark.createDataFrame(rows[150:]).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("doc_id long, w double").parquet(in_dir)
    sampled = sampling.weighted_hash_sample(
        stream, 0.15, weight_col="w", key_col="doc_id"
    )
    assert sampled.isStreaming
    plain = sampling.hash_sample(stream, 0.25, key_col="doc_id")
    out_w, out_p = str(tmp_path / "ow"), str(tmp_path / "op")
    for df, out, ck in [
        (sampled, out_w, str(tmp_path / "cw")),
        (plain, out_p, str(tmp_path / "cp")),
    ]:
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "streaming drain timed out"

    batch = spark.createDataFrame(rows)
    want_w = {
        r.doc_id
        for r in sampling.weighted_hash_sample(
            batch, 0.15, weight_col="w", key_col="doc_id"
        ).collect()
    }
    want_p = {
        r.doc_id for r in sampling.hash_sample(batch, 0.25, "doc_id").collect()
    }
    got_w = {r.doc_id for r in spark.read.parquet(out_w).collect()}
    got_p = {r.doc_id for r in spark.read.parquet(out_p).collect()}
    assert got_w == want_w and len(want_w) > 0
    assert got_p == want_p and len(want_p) > 0
