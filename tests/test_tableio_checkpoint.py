"""Table IO (partitioned writes + audit sidecars) and checkpoint store."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from wikidata_pq_spark.plans.checkpoint import StateStore, Step
from wikidata_pq_spark.sources import tableio


def _df(spark, n=100):
    pdf = pd.DataFrame({"id": range(n), "part": [i % 4 for i in range(n)]})
    return spark.createDataFrame(pdf)


def test_write_with_audit_and_post_check(spark, tmp_path):
    path = str(tmp_path / "t")
    tableio.write_with_audit(_df(spark), path, ["part"], id_col="id")
    assert tableio.post_check(spark, path, ["part"], "id")
    audit = spark.read.parquet(path + "_audit").toPandas()
    assert len(audit) == 4
    assert audit["rows"].sum() == 100
    assert audit["min_id"].min() == 0 and audit["max_id"].max() == 99


def test_post_check_detects_tamper(spark, tmp_path):
    path = str(tmp_path / "t")
    tableio.write_with_audit(_df(spark), path, ["part"], id_col="id")
    # tamper: rewrite sidecar with a wrong row count
    audit = spark.read.parquet(path + "_audit").withColumn(
        "rows", F.col("rows") + 1
    )
    audit.write.mode("overwrite").parquet(path + "_audit2")
    import shutil

    shutil.rmtree(path + "_audit")
    shutil.move(path + "_audit2", path + "_audit")
    assert not tableio.post_check(spark, path, ["part"], "id")


def test_post_check_missing_audit(spark, tmp_path):
    assert not tableio.post_check(spark, str(tmp_path / "nope"), ["part"], "id")


def test_bucket_column_stable(spark):
    df = _df(spark).withColumn("b", tableio.bucket_column("id", 16))
    a = df.toPandas().sort_values("id")
    b = df.toPandas().sort_values("id")
    assert (a["b"].values == b["b"].values).all()
    assert set(a["b"]) <= set(range(16))


def test_state_store_roundtrip(tmp_path):
    st = StateStore(str(tmp_path / "state"))
    assert st.get("u1") == Step.INIT
    st.set("u1", Step.LINKED, rows=5)
    assert st.get("u1") == Step.LINKED
    assert st.metrics("u1") == {"rows": 5}
    # no backwards transitions
    st.set("u1", Step.EXTRACTED)
    assert st.get("u1") == Step.LINKED
    # gates
    assert st.gate("u1", Step.CANONICALIZED)
    assert not st.gate("u1", Step.LINKED)


def test_state_store_incomplete_ordering(tmp_path):
    st = StateStore(str(tmp_path / "state"))
    st.set("b", Step.COMPLETE)
    st.set("a", Step.LINKED)
    st.set("c", Step.INIT)
    assert st.incomplete(["a", "b", "c"]) == ["a", "c"]


def test_iceberg_seam_detection(spark):
    """No Iceberg catalog configured in this sandbox -> parquet path."""
    assert tableio.iceberg_available(spark) is False


def test_iceberg_seam_routing(spark, tmp_path, monkeypatch):
    """The storage seam routes on catalog presence: parquet fallback
    with no catalog; with a (mock) spark.sql.catalog.* conf set, the
    Iceberg writeTo branch is taken. The real Iceberg write needs the
    iceberg-spark runtime jar (absent in-sandbox), so that call is
    monkeypatched -- the routing decision and call shape are what this
    pins down."""
    df = _df(spark, 20)
    # fallback branch writes real partitioned parquet
    dest = str(tmp_path / "t")
    assert tableio.write_table(df, dest, ["part"]) == "parquet"
    assert spark.read.parquet(dest).count() == 20

    calls = {}
    monkeypatch.setattr(
        tableio,
        "_write_iceberg",
        lambda d, ident, parts, mode="overwrite": calls.update(
            ident=ident, parts=parts, mode=mode
        ),
    )
    spark.conf.set("spark.sql.catalog.sandbox", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert tableio.iceberg_available(spark) is True
        assert tableio.write_table(df, "sandbox.db.t", ["part"]) == "iceberg"
        assert calls == {"ident": "sandbox.db.t", "parts": ["part"], "mode": "overwrite"}
    finally:
        spark.conf.unset("spark.sql.catalog.sandbox")
    assert tableio.iceberg_available(spark) is False


def test_write_with_audit_empty_frame(spark, tmp_path):
    """An all-empty partitioned write (no part files, bare _SUCCESS)
    must produce an empty sidecar and a passing post-check, not an
    UNABLE_TO_INFER_SCHEMA crash -- the empty-chunk shape a skewed
    corpus hash produces in ChunkedKGPipeline."""
    df = _df(spark, 10).filter(F.lit(False))
    path = str(tmp_path / "empty")
    tableio.write_with_audit(df, path, ["part"], id_col="id")
    assert spark.read.parquet(path + "_audit").count() == 0
    assert tableio.post_check(spark, path, ["part"], "id") is True
