"""Graph queries over the materialized KG (nodes/edges).

Beyond canonicalization (connected components, canonicalize.py), a KG
consumer needs neighborhood and degree queries. Both are plain
DataFrame ops:

- degrees: one groupBy per direction (map-side combined).
- k_hop: k bounded equi-joins from a seed frontier -- the standard
  distributed BFS expansion. The frontier is deduplicated per hop
  (distinct), so fan-out is bounded by |reachable set| per hop, and k
  is a small constant (2-4 in practice) -- never an unbounded loop at
  query time. At 100 TB, edges bucketed by src (tableio's bucket
  column / Iceberg bucket(N, subj)) make every hop a co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src_id", dst: str = "dst_id") -> DataFrame:
    """(node_id, out_deg, in_deg, deg) -- full outer of the two
    direction counts, nulls coalesced to 0."""
    out_d = edges.groupBy(F.col(src).alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_d.join(in_d, "node_id", "full_outer")
        .select(
            "node_id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias(
                "deg"
            ),
        )
    )


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    src: str = "src_id",
    dst: str = "dst_id",
    directed: bool = True,
    truncate_lineage: bool = True,
    _frontier_sizes: list | None = None,
) -> DataFrame:
    """All nodes reachable from ``seeds(node_id)`` in 1..k hops, with
    the minimum hop count: (node_id, hop).

    Frontier expansion: hop h's frontier joins the edge table once; the
    reached set accumulates with a min-hop union-aggregate. Seeds are
    hop 0 and excluded from the output (reachability, not closure).
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
    e = e.distinct()

    frontier = seeds.select(F.col("node_id").alias("_s")).distinct()
    reached = frontier.select(F.col("_s").alias("node_id"), F.lit(0).alias("hop"))
    for h in range(1, k + 1):
        nxt = (
            frontier.join(e, "_s")
            .select(F.col("_d").alias("node_id"))
            .distinct()
        )
        # prune: a node whose min-hop is already final must not re-seed
        # the next frontier -- on cyclic graphs the unpruned frontier
        # re-joins the same nodes every hop, and the wasted edge-join
        # volume grows with cycle density at scale. The anti-join keeps
        # each node in exactly one frontier (its min-hop frontier),
        # which is the textbook distributed-BFS invariant.
        #
        # Lineage control: `fresh` references `reached`, and the next
        # `reached` references both -- without truncation the plan TREE
        # doubles per hop (Catalyst plans are trees, not DAGs; the
        # iterative-join failure mode CC also guards against). Lazy
        # localCheckpoint per hop keeps the per-hop plan flat and
        # evaluates `fresh` once for both its consumers.
        # (truncate_lineage=False exists for plan inspection -- the
        # audit asserts the per-hop join shape, which a checkpoint
        # scan would hide.)
        fresh = nxt.join(reached.select("node_id"), "node_id", "left_anti")
        if truncate_lineage:
            fresh = fresh.localCheckpoint(eager=False)
        if _frontier_sizes is not None:  # test-only instrumentation
            _frontier_sizes.append(fresh.count())
        reached = reached.union(fresh.select("node_id", F.lit(h).alias("hop")))
        if truncate_lineage:
            reached = reached.localCheckpoint(eager=False)
        frontier = fresh.select(F.col("node_id").alias("_s"))
    return reached.filter(F.col("hop") > 0)


def triple_support(triples: DataFrame) -> DataFrame:
    """Evidence aggregation over the materialized triple stream:
    one row per distinct (subj, pred, obj) with its support count,
    number of distinct source conversations, and the first sighting
    (lexicographic min (conv_id, turn_idx) -- deterministic).

    The provenance rollup a KG consumer ranks assertions by (the
    reference's per-table audit counts, reference: core.py:25-35,
    lifted from storage partitions to semantic triples). One hash
    aggregate on the triple key; min(struct) keeps first-sighting
    selection inside the same pass."""
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("n_support"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.min(F.struct("conv_id", "turn_idx")).alias("_first"),
        )
        .select(
            "subj", "pred", "obj", "n_support", "n_convs",
            F.col("_first.conv_id").alias("first_conv"),
            F.col("_first.turn_idx").alias("first_turn"),
        )
    )


def comention_edges(
    mentions: DataFrame, min_count: int = 1, truncate_lineage: bool = True
) -> DataFrame:
    """Entity co-mention edge list: (a, b, n_convs) for entities that
    appear in the same conversation, a < b lexicographically.

    Input: mention rows with (conv_id, subj_mention, obj_mention).
    Shape: distinct (conv_id, entity) -> self equi-join ON conv_id ->
    pair counts. Quadratic only WITHIN a conversation's distinct-entity
    set (bounded and small); the join key is conv_id so skewed
    conversations are AQE-splittable. This is the standard
    co-occurrence-graph builder for entity-embedding training data.
    """
    ents = (
        mentions.select(F.col("conv_id"), F.col("subj_mention").alias("e"))
        .unionByName(mentions.select("conv_id", F.col("obj_mention").alias("e")))
        .distinct()
    )
    # the distinct entity frame feeds BOTH self-join legs; without
    # truncation the (possibly expensive) upstream mention plan is
    # evaluated once per leg per union branch -- 4x. Lazy checkpoint
    # pays it once (the k_hop/CC discipline; truncate_lineage=False
    # exists for plan inspection, same as k_hop).
    if truncate_lineage:
        ents = ents.localCheckpoint(eager=False)
    a = ents.select("conv_id", F.col("e").alias("a"))
    b = ents.select("conv_id", F.col("e").alias("b"))
    return (
        a.join(b, "conv_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
        .filter(F.col("n_convs") >= min_count)
    )


def negative_samples(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training: each
    (subj, pred, obj) gets a corrupted object drawn by content hash
    from the entity vocabulary.

    The draw index is md5-derived (dual-engine recomputable, unlike
    xxhash64) over the triple key, mod vocabulary size; the vocabulary
    is rank-indexed with a window over a BOUNDED dimension table and
    broadcast for the index equi-join. Degenerate draws (neg == true
    object) are marked, not silently dropped -- the training pipeline
    decides whether to resample or skip.
    """
    from pyspark.sql import Window

    vocab = entities.select(F.col("entity_id").alias("neg_obj")).distinct()
    n = vocab.count()  # dimension-table size: driver scalar by design
    if n == 0:
        # Spark `% 0` yields NULL (silently dropping every triple at
        # the index join) where the SQL oracle errors -- fail loudly
        # instead of disagreeing with the contract
        raise ValueError("negative_samples: empty entity vocabulary")
    idx = Window.orderBy("neg_obj")
    vocab_idx = vocab.withColumn("vidx", F.row_number().over(idx) - 1)
    key = F.concat_ws("|", "subj", "pred", "obj")
    draw = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n
    ).alias("vidx")
    return (
        triples.select("subj", "pred", "obj", draw)
        .join(F.broadcast(vocab_idx), "vidx")
        .select(
            "subj", "pred", "obj", "neg_obj",
            (F.col("neg_obj") == F.col("obj")).alias("degenerate"),
        )
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src_id",
    dst: str = "dst_id",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Iterative PageRank over the entity graph: (node_id, rank).

    Power iteration as repeated DataFrame joins -- contribution =
    rank / out_degree shipped along each edge, summed per target, then
    the damping update against a RESTART VECTOR ``_r``:

    - ``seeds is None`` (global PageRank): uniform restart, 1/n per
      node.
    - ``seeds`` given (personalized PageRank): uniform over the seeds
      PRESENT IN THE GRAPH (absent seeds are excluded from the
      normalizer -- otherwise their share of restart mass would leak
      and ranks stop summing to 1), zero elsewhere. Raises when no
      seed overlaps the graph (an all-zero "ranking" is a bug, not a
      result).

    Dangling nodes (no out-edges) return their mass through the same
    restart vector: that mass is ONE scalar aggregate per iteration (a
    driver scalar by necessity and by textbook formulation, not a
    collect of data). Lineage is truncated per iteration with a lazy
    localCheckpoint, the same discipline as connected_components and
    k_hop -- without it the plan tree doubles per round.

    Scale shape per iteration: one equi-join on the edge src (ranks are
    hash-partitioned by node either side), one groupBy(dst) sum. The
    rank frame is O(nodes) and carries ``_r`` alongside, so the update
    needs NO extra join for the restart term; edges dominate and are
    never materialized to the driver. Convergence-by-tolerance is
    deliberately NOT implemented (a per-iteration global delta would
    add an aggregate per round); fixed ``iters`` matches how
    production jobs bound cost.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).distinct()
    nodes = (
        e.select(F.col("_s").alias("node_id"))
        .union(e.select(F.col("_d").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: empty edge frame (no nodes)")
    if seeds is None:
        noder = nodes.withColumn("_r", F.lit(1.0 / n))
    else:
        s = seeds.select("node_id").distinct().join(nodes, "node_id", "semi")
        n_seeds = s.count()
        if n_seeds == 0:
            raise ValueError(
                "pagerank: empty seed set (no seed node appears in the graph)"
            )
        noder = nodes.join(
            s.withColumn("_r", F.lit(1.0 / n_seeds)), "node_id", "left"
        ).select("node_id", F.coalesce("_r", F.lit(0.0)).alias("_r"))
    noder = noder.localCheckpoint(eager=False)
    out_deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    ranks = noder.select("node_id", F.col("_r").alias("rank"))
    for _ in range(iters):
        # lazy checkpoint: with_deg is consumed TWICE per round (the
        # dangling-mass scalar action, then contribs) -- without it the
        # ranks-out_deg join re-executes for the second consumer
        with_deg = ranks.join(
            out_deg, ranks.node_id == out_deg._s, "left"
        ).localCheckpoint(eager=False)
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select(F.col("node_id").alias("_s"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .join(e, "_s")
            .groupBy(F.col("_d").alias("node_id"))
            .agg(F.sum("_c").alias("_in"))
        )
        # restart + dangling mass both land on the restart vector
        ranks = (
            noder.join(contribs, "node_id", "left")
            .select(
                "node_id",
                (
                    F.lit(1.0 - damping) * F.col("_r")
                    + F.lit(damping * dangling) * F.col("_r")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node_id", F.round("rank", 8).alias("rank"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """Personalized PageRank: random walks restart at ``seeds(node_id)``
    instead of uniformly -- the standard KG relevance score for "which
    entities matter relative to THIS query set". Thin wrapper over
    :func:`pagerank` with a seed restart vector (one power-iteration
    implementation to maintain, not two)."""
    return pagerank(
        edges, damping=damping, iters=iters, src=src, dst=dst, seeds=seeds
    )


def current_beliefs(
    triples: DataFrame, order_cols: tuple = ("conv_id", "turn_idx")
) -> DataFrame:
    """Latest-assertion-wins view of the KG: one row per (subj, pred)
    keeping the assertion that ranks highest under ``order_cols``
    descending (object string as the final deterministic tiebreak).

    The default ordering is LEXICOGRAPHIC (conv_id, turn_idx) -- truly
    temporal only when conversation ids sort chronologically (the
    synthetic corpora's zero-padded ids do; UUIDs do not). Pass a
    timestamp-bearing column tuple, e.g. ``("ts",)``, for wall-clock
    recency.

    The belief-revision / upsert semantics of a living KG -- at scale
    this is the MERGE-INTO read shape: one window per (subj, pred),
    partition-pruned by subject bucket in the materialized tables.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("subj", "pred").orderBy(
        *[F.desc(c) for c in order_cols], F.desc("obj")
    )
    return (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "subj", "pred", "obj",
            F.col("conv_id").alias("last_conv"),
            F.col("turn_idx").alias("last_turn"),
        )
    )


def conflicting_assertions(triples: DataFrame) -> DataFrame:
    """KG quality gate: (subj, pred) keys asserted with MORE than one
    distinct object, with the conflicting objects joined into one
    deterministic string (sorted, '|'-separated -- a scalar so exact
    oracles can hash it; at scale the list stays distributed).

    One hash aggregate on (subj, pred); map-side combine keeps the
    shuffle proportional to distinct keys, not assertions.
    """
    return (
        triples.groupBy("subj", "pred")
        .agg(
            F.countDistinct("obj").cast("long").alias("n_objs"),
            F.array_join(F.sort_array(F.collect_set("obj")), "|").alias("objs"),
        )
        .filter(F.col("n_objs") >= 2)
    )
