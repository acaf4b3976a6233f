"""Canonicalization: connected components over same-as edges.

Iterative min-label propagation with pointer jumping -- the DataFrame
re-expression of distributed connected components (alternating-star
family, cf. Kiveris et al. "Connected Components in MapReduce and
Beyond"). This is the loop-with-state analogue of the reference's chunk
loop (reference: main.py:65), with ``localCheckpoint()`` truncating plan
lineage each round exactly where the reference persists its JSONL step
files (reference: state.py:30-35).

Convergence: label propagation alone needs O(diameter) rounds; the
pointer-jumping step (label := label(label)) halves chain depth each
round, giving O(log d) rounds -- essential when a same-as chain is long.
Each round is two shuffles on the label key; counts per round are the
only driver actions.

Canonical label = component-minimum id under numeric-aware ordering
("Q7" < "Q10"), matching the oracle's union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_key(col):
    """Orderable struct: numeric Q-ids sort numerically, others after."""
    num = F.regexp_extract(col, r"^[A-Za-z]*(\d+)$", 1)
    return F.struct(
        F.when(num != "", F.lit(0)).otherwise(F.lit(1)).alias("k0"),
        F.when(num != "", num.cast("long")).otherwise(F.lit(0)).alias("k1"),
        col.alias("k2"),
    )


def connected_components(
    same_as: DataFrame,
    max_iter: int = 25,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """same_as(src_id, dst_id) -> (entity_id, canonical_id).

    Returns one row per vertex appearing in any edge. Vertices with no
    edges are their own canonical id (callers simply coalesce missing
    lookups to identity).

    Hybrid strategy: a same-as table below ``driver_threshold`` edges is
    broadcast-sized, so the driver runs exact union-find in one pass
    (the analogue of the reference's driver-side metadata ops,
    reference: prefetch.py:101) -- iterating Spark jobs over a tiny graph
    is pure scheduling overhead. Above the threshold, distributed
    min-label propagation with pointer jumping takes over. Both paths
    produce identical labels (tested); pass ``driver_threshold=0`` to
    force the distributed path.
    """
    spark = same_as.sparkSession
    if driver_threshold and same_as.limit(driver_threshold + 1).count() <= driver_threshold:
        import pandas as pd

        from ..oracle import union_find_components

        edges_pd = same_as.select("src_id", "dst_id").toPandas()
        comp = union_find_components(edges_pd)
        out = pd.DataFrame(
            {"entity_id": list(comp.keys()), "canonical_id": list(comp.values())}
        )
        return spark.createDataFrame(out, schema="entity_id string, canonical_id string")
    edges = (
        same_as.select(F.col("src_id").alias("a"), F.col("dst_id").alias("b"))
        .union(same_as.select(F.col("dst_id").alias("a"), F.col("src_id").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    # labels: vertex -> current best (min) label key
    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("lbl", _order_key(F.col("v")))
    ).localCheckpoint()

    for _ in range(max_iter):
        # 1) neighbor-min: each vertex receives the label of each neighbor
        msgs = (
            edges.join(labels.withColumnRenamed("v", "b"), "b")
            .select(F.col("a").alias("v"), "lbl")
        )
        new_labels = (
            labels.select("v", "lbl")
            .union(msgs)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
        )
        # 2) pointer jumping: lbl(v) := lbl(lbl(v))
        jump_src = new_labels.select(
            F.col("v"), F.col("lbl.k2").alias("_parent")
        )
        parent_lbl = new_labels.select(
            F.col("v").alias("_parent"), F.col("lbl").alias("_plbl")
        )
        jumped = (
            jump_src.join(parent_lbl, "_parent", "left")
            .select("v", F.col("_plbl").alias("lbl"))
        )
        # a parent that is not itself a vertex (component minimum that
        # never appears as a key) keeps the direct label
        jumped = jumped.join(new_labels.withColumnRenamed("lbl", "_direct"), "v")
        jumped = jumped.select(
            "v", F.coalesce("lbl", "_direct").alias("lbl")
        ).localCheckpoint()

        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break

    return labels.select(
        F.col("v").alias("entity_id"), F.col("lbl.k2").alias("canonical_id")
    )


def apply_canonical(
    triples: DataFrame,
    components: DataFrame,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Rewrite subj (and entity-valued obj) to canonical component ids.

    Left joins + coalesce-to-identity. The broadcast hint is
    size-gated (one bounded ``limit(k+1).count()`` probe, the same auto
    strategy as ``linking.link_mentions``): a dictionary-sized map gets
    the hard ``F.broadcast`` hint (map-side join, zero shuffle of the
    triple stream); a larger map is left unhinted so it shuffles on its
    key and AQE picks the strategy -- an unconditional hint would OOM
    executors on a 100 TB same-as graph (AQE never demotes a hard
    broadcast hint). Pass ``broadcast_threshold=0`` to force the
    shuffle-join plan.
    """
    small = bool(broadcast_threshold) and (
        components.limit(broadcast_threshold + 1).count() <= broadcast_threshold
    )
    hint = F.broadcast if small else (lambda df: df)
    comp_s = components.select(
        F.col("entity_id").alias("subj"), F.col("canonical_id").alias("_subj_canon")
    )
    comp_o = components.select(
        F.col("entity_id").alias("obj"), F.col("canonical_id").alias("_obj_canon")
    )
    out = (
        triples.join(hint(comp_s), "subj", "left")
        .join(hint(comp_o), "obj", "left")
        .withColumn("subj", F.coalesce("_subj_canon", "subj"))
        .withColumn(
            "obj",
            F.when(
                F.col("obj_kind") == "entity", F.coalesce("_obj_canon", "obj")
            ).otherwise(F.col("obj")),
        )
        .drop("_subj_canon", "_obj_canon")
    )
    return out
