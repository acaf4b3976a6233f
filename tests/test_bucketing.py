"""Bucketed tables: co-located join without a shuffle.

The scale claim behind `bucket(N, subj)` materialization: joining two
tables bucketed on the same key/count produces a plan with NO Exchange
on either join side. Asserted on the actual physical plan.
"""

from __future__ import annotations

import pandas as pd

from wikidata_pq_spark.sources import tableio


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.createDataFrame(
            pd.DataFrame({"subj": [f"Q{i % 50}" for i in range(500)], "w": range(500)})
        )
        nodes = spark.createDataFrame(
            pd.DataFrame({"subj": [f"Q{i}" for i in range(50)], "label": [f"L{i}" for i in range(50)]})
        )
        tableio.write_bucketed_table(edges, "b_edges", "subj", 8, sort_col="subj")
        tableio.write_bucketed_table(nodes, "b_nodes", "subj", 8, sort_col="subj")

        joined = spark.table("b_edges").join(spark.table("b_nodes"), "subj")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 500

        # control: the same join on unbucketed parquet DOES shuffle
        edges.write.mode("overwrite").parquet(str(tmp_path / "pe"))
        nodes.write.mode("overwrite").parquet(str(tmp_path / "pn"))
        flat = spark.read.parquet(str(tmp_path / "pe")).join(
            spark.read.parquet(str(tmp_path / "pn")), "subj"
        )
        control = flat._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in control
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_edges")
        spark.sql("DROP TABLE IF EXISTS b_nodes")
