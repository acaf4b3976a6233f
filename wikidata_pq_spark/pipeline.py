"""End-to-end transcript -> knowledge-graph pipeline (resumable).

Stage graph (each stage gated by the checkpoint store, outputs written
as partitioned parquet with audit sidecars -- the Spark re-expression of
the reference's PULL->PROCESS->PARTITION->PUSH->POST_CHECK->COMPLETE
state machine, reference: state.py:11-18, main.py:61-136):

  INIT          -> read transcripts (Iceberg/parquet)
  EXTRACTED     -> stable order + applyInPandas mention extraction
  LINKED        -> broadcast/salted alias join
  CANONICALIZED -> connected components + canonical rewrite
  MATERIALIZED  -> nodes/edges bucketed by subject hash + lineage
  VERIFIED      -> post-check: re-read sinks vs audit sidecars
  COMPLETE

Every stage is idempotent: re-running a completed stage is a no-op
(skip gate), and a killed run resumes from its last persisted stage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import canonicalize, extract, linking
from .plans.checkpoint import StateStore, Step
from .sources import tableio

UNIT = "corpus"  # single-unit pipeline; per-chunk units at scale


class KGPipeline:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        n_buckets: int = 16,
        link_strategy: str = "broadcast",
    ):
        self.spark = spark
        self.out_dir = out_dir
        self.n_buckets = n_buckets
        self.link_strategy = link_strategy
        self.state = StateStore(os.path.join(out_dir, "_state"))

    # -- paths ---------------------------------------------------------
    def path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    # -- stages --------------------------------------------------------
    def run(
        self,
        transcripts: DataFrame,
        alias_dict: DataFrame,
        same_as: DataFrame,
    ) -> dict:
        """Run (or resume) the full pipeline; returns stage metrics."""
        st, unit = self.state, UNIT
        metrics: dict = {}

        if st.gate(unit, Step.EXTRACTED):
            mentions = extract.extract_mentions(transcripts)
            mentions.write.mode("overwrite").parquet(self.path("mentions"))
            n = self.spark.read.parquet(self.path("mentions")).count()
            st.set(unit, Step.EXTRACTED, mentions=n)
        metrics["mentions"] = st.metrics(unit).get("mentions")

        if st.gate(unit, Step.LINKED):
            mentions = self.spark.read.parquet(self.path("mentions"))
            linked = linking.link_mentions(
                mentions, alias_dict, strategy=self.link_strategy
            )
            linked.write.mode("overwrite").parquet(self.path("linked"))
            n = self.spark.read.parquet(self.path("linked")).count()
            st.set(unit, Step.LINKED, mentions=metrics["mentions"], linked=n)
        metrics["linked"] = st.metrics(unit).get("linked")

        if st.gate(unit, Step.CANONICALIZED):
            linked = self.spark.read.parquet(self.path("linked"))
            comps = canonicalize.connected_components(same_as)
            canon = canonicalize.apply_canonical(linked, comps)
            canon.write.mode("overwrite").parquet(self.path("triples"))
            comps.write.mode("overwrite").parquet(self.path("components"))
            st.set(unit, Step.CANONICALIZED, **st.metrics(unit))

        if st.gate(unit, Step.MATERIALIZED):
            triples = self.spark.read.parquet(self.path("triples"))
            edges = triples.withColumn(
                "bucket", tableio.bucket_column("subj", self.n_buckets)
            )
            tableio.write_with_audit(
                edges, self.path("edges"), ["bucket"], id_col="subj"
            )
            nodes = (
                triples.select(F.col("subj").alias("entity_id"))
                .union(
                    triples.filter(F.col("obj_kind") == "entity").select(
                        F.col("obj").alias("entity_id")
                    )
                )
                .distinct()
                .withColumn("bucket", tableio.bucket_column("entity_id", self.n_buckets))
            )
            tableio.write_with_audit(
                nodes, self.path("nodes"), ["bucket"], id_col="entity_id"
            )
            st.set(unit, Step.MATERIALIZED, **st.metrics(unit))

        if st.gate(unit, Step.VERIFIED):
            ok_e = tableio.post_check(self.spark, self.path("edges"), ["bucket"], "subj")
            ok_n = tableio.post_check(
                self.spark, self.path("nodes"), ["bucket"], "entity_id"
            )
            if not (ok_e and ok_n):
                raise RuntimeError("post-check failed: sink != audit sidecar")
            st.set(unit, Step.VERIFIED, **st.metrics(unit))

        st.set(unit, Step.COMPLETE, **st.metrics(unit))
        metrics.update(st.metrics(unit))
        return metrics

    # -- results -------------------------------------------------------
    def triples(self) -> DataFrame:
        return self.spark.read.parquet(self.path("triples"))

    def edges(self) -> DataFrame:
        return self.spark.read.parquet(self.path("edges"))

    def nodes(self) -> DataFrame:
        return self.spark.read.parquet(self.path("nodes"))
