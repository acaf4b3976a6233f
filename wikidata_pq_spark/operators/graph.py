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
    mentions: DataFrame,
    min_count: int = 1,
    truncate_lineage: bool = True,
    max_entities_per_conv: int = 10_000,
    return_audit: bool = False,
):
    """Entity co-mention edge list: (a, b, n_convs) for entities that
    appear in the same conversation, a < b lexicographically.

    Input: mention rows with (conv_id, subj_mention, obj_mention).
    Shape: distinct (conv_id, entity) -> self equi-join ON conv_id ->
    pair counts. Quadratic only WITHIN a conversation's distinct-entity
    set; the join key is conv_id so skewed conversations are
    AQE-splittable. This is the standard co-occurrence-graph builder
    for entity-embedding training data.

    ``max_entities_per_conv`` bounds the per-conversation fan-out: a
    pathological conversation with 1e5 distinct entities would emit
    1e10 pairs, so conversations above the cap are DROPPED WHOLE (not
    truncated -- a truncated entity set would bias pair counts).
    Auditing the drop is OPT-IN: this builder is lazy (no action runs
    here, so it cannot count-and-warn without forcing a job), and the
    default return is the edge frame alone. Callers that must not lose
    conversations silently pass ``return_audit=True`` and materialize
    the audit frame (conv_id, n_entities) alongside the edges -- the
    driver-checked ``kg_comention_audit`` contract cell does exactly
    this, and any production sink should write both frames. The gate
    is one windowed count over the same conv_id shuffle the self-join
    needs anyway.
    """
    ents = (
        mentions.select(F.col("conv_id"), F.col("subj_mention").alias("e"))
        .unionByName(mentions.select("conv_id", F.col("obj_mention").alias("e")))
        .distinct()
    )
    from pyspark.sql import Window

    ents = ents.withColumn(
        "_n_ents", F.count(F.lit(1)).over(Window.partitionBy("conv_id"))
    )
    # the gated entity frame feeds BOTH self-join legs (and the audit);
    # without truncation the (possibly expensive) upstream mention plan
    # PLUS the windowed count is evaluated once per consumer -- 4x+.
    # Lazy checkpoint AFTER the window pays both exactly once (the
    # k_hop/CC discipline; truncate_lineage=False exists for plan
    # inspection, same as k_hop).
    if truncate_lineage:
        ents = ents.localCheckpoint(eager=False)
    audit = (
        ents.filter(F.col("_n_ents") > max_entities_per_conv)
        .groupBy("conv_id")
        .agg(F.first("_n_ents").cast("long").alias("n_entities"))
    )
    kept = ents.filter(F.col("_n_ents") <= max_entities_per_conv)
    a = kept.select("conv_id", F.col("e").alias("a"))
    b = kept.select("conv_id", F.col("e").alias("b"))
    edges = (
        a.join(b, "conv_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_convs"))
        .filter(F.col("n_convs") >= min_count)
    )
    return (edges, audit) if return_audit else edges


def rank_index(
    df: DataFrame, col: str, out_col: str = "vidx", n_parts: int | None = None
) -> DataFrame:
    """Distributed dense 0-based rank of the (distinct) values of
    ``col`` -- the scalable replacement for a global
    ``row_number().over(Window.orderBy(col))``, whose single-partition
    sort serializes the frame through one task.

    Two-pass shape (the textbook distributed ranking):

    1. range-repartition on ``col`` (partition p holds a contiguous,
       ascending value range), lazily checkpointed so both passes see
       the SAME partitioning;
    2. per-partition counts -> cumulative offsets (one tiny driver
       collect, n_parts rows -- metadata, not data);
    3. partition-local rank (window keyed by the partition id, so every
       window partition is ~|df|/n_parts rows) + the broadcast offset.

    global_rank = offset[pid] + local_rank holds for ANY range
    boundaries, so the sampling inside repartitionByRange cannot affect
    correctness -- only balance.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    local = Window.partitionBy("_pid").orderBy(col)
    return ranged.withColumn(
        out_col,
        (F.row_number().over(local) - 1 + F.element_at(off_map, F.col("_pid"))).cast(
            "long"
        ),
    ).drop("_pid")


def negative_samples(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training: each
    (subj, pred, obj) gets a corrupted object drawn by content hash
    from the entity vocabulary.

    The draw index is md5-derived (dual-engine recomputable, unlike
    xxhash64) over the triple key, mod vocabulary size; the vocabulary
    is rank-indexed DISTRIBUTED (``rank_index``: range partitions +
    per-partition offsets -- no single-partition global window, because
    a 100-TB KG's entity vocabulary grows with the data) and broadcast
    for the index equi-join. Degenerate draws (neg == true object) are
    marked, not silently dropped -- the training pipeline decides
    whether to resample or skip.
    """
    vocab = entities.select(F.col("entity_id").alias("neg_obj")).distinct()
    n = vocab.count()  # dimension-table size: driver scalar by design
    if n == 0:
        # Spark `% 0` yields NULL (silently dropping every triple at
        # the index join) where the SQL oracle errors -- fail loudly
        # instead of disagreeing with the contract
        raise ValueError("negative_samples: empty entity vocabulary")
    vocab_idx = rank_index(vocab, "neg_obj")
    # size-gated broadcast (n is already a driver scalar): a hard hint
    # on a growing KG vocabulary would OOM executors at the scale the
    # rank_index rewrite exists for -- AQE never demotes a hard hint,
    # so past the gate the join shuffles on vidx like apply_canonical
    hint = F.broadcast if n <= 5_000_000 else (lambda df: df)
    key = F.concat_ws("|", "subj", "pred", "obj")
    draw = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n
    ).alias("vidx")
    return (
        triples.select("subj", "pred", "obj", draw)
        .join(hint(vocab_idx), "vidx")
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
    # e is consumed by EVERY iteration (the contrib join) plus the node
    # derivation -- checkpoint it once after the distinct, or each
    # iteration's two actions (dangling scalar, ranks materialization)
    # re-execute the upstream edge plan + distinct shuffle ~2x per round
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
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
    # also a once-per-run frame consumed every iteration: checkpoint so
    # the degree aggregate runs once, not once per round
    out_deg = (
        e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint(eager=False)
    )
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


def multi_seed_ppr(
    edges: DataFrame,
    seed_sets: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src_id",
    dst: str = "dst_id",
    set_col: str = "seed_set_id",
) -> DataFrame:
    """Personalized PageRank for MANY seed sets in one pass:
    (seed_set_id, node_id, rank) -- a production relevance pipeline
    scores hundreds of query sets, and running :func:`pagerank` once
    per set repeats the edge scan, the degree aggregate, and the
    per-iteration edge join S times (r6, VERDICT item 5).

    ``seed_sets`` is (seed_set_id, node_id). The rank frame carries the
    ``seed_set_id`` dimension -- O(S x nodes) rows -- so each power
    iteration is still ONE edge equi-join on the source node (every
    edge matches its S rank rows inside the join; the edge table itself
    is scanned once per iteration, not once per set) plus one
    (set, node) aggregate. Per-set restart vectors follow the
    single-set contract exactly: uniform over the seeds PRESENT in the
    graph, zero elsewhere, and a set with no graph overlap raises
    (an all-zero "ranking" is a bug, not a result).

    The per-set dangling mass is a groupBy(seed_set_id) aggregate --
    S rows of metadata, broadcast back into the rank update -- instead
    of the single-set driver scalar, so no per-iteration collect grows
    with S. Update arithmetic multiplies (damping x dangling) before
    the restart weight, the same association order as the single-set
    formula, so per-set results match ``personalized_pagerank`` to
    float-summation noise (equivalence-tested at 8 dp).

    Scale shape per iteration: rank frame hash-partitioned by node for
    the edge join (set id rides along), then one shuffle to
    (set, node). Dangling frame is O(S); the seed-size frame is O(S);
    both broadcast. Lineage truncated per iteration, the
    connected-components discipline.
    """
    e = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("_s").alias("node_id"))
        .union(e.select(F.col("_d").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("multi_seed_ppr: empty edge frame (no nodes)")
    ss = seed_sets.select(F.col(set_col).alias("_set"), "node_id").distinct()
    present = ss.join(nodes, "node_id", "semi").localCheckpoint(eager=False)
    sizes = present.groupBy("_set").agg(F.count(F.lit(1)).alias("_ns"))
    # bounded collects: S rows of set metadata, not data
    in_sets = {r[0] for r in ss.select("_set").distinct().collect()}
    if not in_sets:
        raise ValueError("multi_seed_ppr: empty seed_sets frame")
    ok_sets = {r[0] for r in sizes.select("_set").collect()}
    missing = sorted(in_sets - ok_sets)
    if missing:
        raise ValueError(
            "multi_seed_ppr: seed set(s) with no node in the graph: "
            f"{missing[:5]}"
        )
    # restart matrix: (set, node) with 1/|seeds_in_graph(set)| on seeds,
    # 0 elsewhere. nodes x sets is the rank frame's own cardinality, so
    # building it via a broadcast cross join adds no new scale class.
    noder = (
        nodes.crossJoin(F.broadcast(sizes))
        .join(
            present.withColumn("_seed", F.lit(True)), ["_set", "node_id"], "left"
        )
        .select(
            "_set",
            "node_id",
            F.when(F.col("_seed"), F.lit(1.0) / F.col("_ns"))
            .otherwise(F.lit(0.0))
            .alias("_r"),
        )
        .localCheckpoint(eager=False)
    )
    out_deg = (
        e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint(eager=False)
    )
    ranks = noder.select("_set", "node_id", F.col("_r").alias("rank"))
    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks.node_id == out_deg._s, "left"
        ).localCheckpoint(eager=False)
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .groupBy("_set")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select(
                "_set",
                F.col("node_id").alias("_s"),
                (F.col("rank") / F.col("_deg")).alias("_c"),
            )
            .join(e, "_s")
            .groupBy("_set", F.col("_d").alias("node_id"))
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            noder.join(contribs, ["_set", "node_id"], "left")
            .join(F.broadcast(dangling), "_set", "left")
            .select(
                "_set",
                "node_id",
                (
                    F.lit(1.0 - damping) * F.col("_r")
                    + (F.lit(damping) * F.coalesce(F.col("_dm"), F.lit(0.0)))
                    * F.col("_r")
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("_set").alias(set_col), "node_id", F.round("rank", 8).alias("rank")
    )


def current_beliefs(
    triples: DataFrame,
    order_cols: tuple = ("ts", "conv_id", "turn_idx"),
    as_of=None,
) -> DataFrame:
    """Latest-assertion-wins view of the KG: one row per (subj, pred)
    keeping the assertion that ranks highest under ``order_cols``
    descending (object string as the final deterministic tiebreak).

    The default ordering is WALL-CLOCK recency: triples carry the
    assertion timestamp ``ts`` through the pipeline (extract threads the
    turn's ts), with (conv_id, turn_idx) breaking same-instant ties
    deterministically. Pass ``order_cols=("conv_id", "turn_idx")``
    to opt in to the old lexicographic ordering for ts-less frames
    (truly temporal only when conversation ids sort chronologically).

    Provenance columns are DERIVED from ``order_cols``: the winning
    row's value of each order column is returned as ``last_<col>`` --
    so the output shape always matches the ordering actually used, and
    a ts-ordered frame without conv_id/turn_idx still works.

    The belief-revision / upsert semantics of a living KG -- at scale
    this is the MERGE-INTO read shape: one window per (subj, pred),
    partition-pruned by subject bucket in the materialized tables.

    ``as_of`` (r6) is TIME TRAVEL: restrict to assertions with
    ``ts <= as_of`` before the argmax, answering "what did the KG
    believe at time T" -- the audit query behind belief provenance and
    training-cutoff reproducibility. Accepts anything Spark casts to
    timestamp (datetime or ISO string). Requires a ts column
    regardless of ``order_cols`` (a wall-clock cutoff over a ts-less
    frame is meaningless). The filter lands BEFORE the window, so at
    scale it prunes ts-partitioned storage instead of post-filtering
    winners -- and a (subj, pred) whose every assertion is later than
    ``as_of`` correctly has NO belief yet, which a post-filter would
    get wrong.
    """
    from pyspark.sql import Window

    if as_of is not None:
        if "ts" not in triples.columns:
            raise ValueError(
                "current_beliefs: as_of requires a ts column; got "
                f"{triples.columns}"
            )
        triples = triples.filter(
            F.col("ts") <= F.lit(as_of).cast("timestamp")
        )
    missing = [c for c in order_cols if c not in triples.columns]
    if missing:
        raise ValueError(
            f"current_beliefs: order_cols {missing} not in triples columns "
            f"{triples.columns}; pass order_cols matching your frame "
            "(e.g. ('conv_id', 'turn_idx') for ts-less triples)"
        )
    w = Window.partitionBy("subj", "pred").orderBy(
        *[F.desc(c) for c in order_cols], F.desc("obj")
    )
    return (
        triples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "subj", "pred", "obj",
            *[F.col(c).alias(f"last_{c}") for c in order_cols],
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


def triangles(
    edges: DataFrame,
    src: str = "src_id",
    dst: str = "dst_id",
    truncate_lineage: bool = True,
) -> DataFrame:
    """Exact triangle enumeration over the undirected graph, via
    DEGREE-ORDERED ORIENTATION (the compact-forward algorithm): each
    undirected edge is oriented from its lower-(degree, id) endpoint
    to its higher one, wedges are built only between a node's
    out-neighbors, and a wedge closes iff its endpoints' oriented edge
    exists. Every triangle is emitted exactly once.

    Why this shape at 100 TB: the naive wedge join fans out
    quadratically in the HOTTEST node's degree (a celebrity entity in
    the co-mention graph = one task materializing deg^2 wedges). Under
    degree orientation no node's OUT-degree exceeds O(sqrt(m)), so the
    wedge count is bounded by sum(out_deg^2) = O(m^1.5) regardless of
    skew -- the hot node's edges all point INTO it and form no wedges
    there. Three hash joins, no window, no driver state; direction of
    the input edges is ignored (self-loops dropped, duplicates
    collapsed).

    Returns (a, b, c) node-id triples, lexicographically sorted within
    each row.

    ``und`` feeds the degree aggregate AND the orientation join, and
    the oriented frame ``o`` feeds BOTH wedge legs plus the closing
    join -- without lineage truncation each consumer would recompute
    the whole upstream derivation (the branch-union recompute trap;
    the plan golden showed the edge scan 6x). ``truncate_lineage=
    False`` exists for plan inspection, the k_hop/CC discipline.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if truncate_lineage:
        und = und.localCheckpoint(eager=False)
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by (deg, id): rank(u) < rank(v) <=> deg(u) < deg(v), ties
    # broken by id -- a strict total order, so orientation is acyclic
    ranked = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"),
            "v",
        )
    )
    fwd = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < F.struct(
        F.col("dv").alias("d"), F.col("v").alias("n")
    )
    o = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(fwd, F.col("dv")).otherwise(F.col("du")).alias("hi_deg"),
    )
    if truncate_lineage:
        o = o.localCheckpoint(eager=False)
    # wedges lo -> {x, y} with rank(x) < rank(y); the closing edge, if
    # present, is oriented x -> y by rank transitivity
    e1 = o.select(
        F.col("lo"), F.col("hi").alias("x"), F.col("hi_deg").alias("xd")
    )
    e2 = o.select(
        F.col("lo"), F.col("hi").alias("y"), F.col("hi_deg").alias("yd")
    )
    wedges = e1.join(e2, "lo").filter(
        F.struct(F.col("xd").alias("d"), F.col("x").alias("n"))
        < F.struct(F.col("yd").alias("d"), F.col("y").alias("n"))
    )
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    tri = wedges.join(closing, ["x", "y"])
    srt = F.array_sort(F.array("lo", "x", "y"))
    return tri.select(
        srt[0].alias("a"), srt[1].alias("b"), srt[2].alias("c")
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 10,
    src: str = "src_id",
    dst: str = "dst_id",
    truncate_lineage: bool = True,
    early_exit: bool = True,
) -> DataFrame:
    """Deterministic synchronous label propagation: (node_id, label)
    community assignments over the undirected graph.

    Classic LPA is run-order dependent; this variant is a pure
    function of the graph so it is oracle-checkable and stable across
    partitionings: every node starts labeled with its own id, and each
    SYNCHRONOUS round relabels every node with its neighbors' majority
    label, ties broken by MINIMUM label (so the winner is unique and
    engine-independent). Fixed ``iters`` bounds cost exactly like
    pagerank's.

    ``early_exit`` (r8, the CC-convergence discipline of
    canonicalize.connected_components) stops iterating as soon as the
    remaining rounds are provably replayable without running them,
    RETURNING EXACTLY the round-``iters`` labels in both cases:

    - fixed point: labels(t) == labels(t-1) => every later round
      repeats labels(t);
    - 2-cycle: labels(t) == labels(t-2) => the synchronous update
      (a pure function of the previous frame) alternates
      labels(t-1)/labels(t) forever, so labels(iters) is labels(t)
      when iters-t is even, labels(t-1) when odd. Synchronous LPA
      oscillates with period 2 on bipartite-ish structures -- without
      this case a non-converging graph would pay all ``iters`` rounds
      even though its tail is a replay (the bench graph 2-cycles by
      round 5; rounds 6-10 were pure re-execution).

    Both checks ride ONE small aggregate per round over the label
    frames (O(nodes), never O(edges)); per-round cost is otherwise
    unchanged. ``early_exit=False`` restores the fixed-round replay
    (plan-audit mode).

    Scale shape per round: one equi-join of the label frame (O(nodes))
    against the undirected edge frame on the neighbor key, one
    (node, label) count aggregate, one per-node argmax via
    min(struct(-count, label)) -- map-side combinable, never a window
    over whole partitions. The edge frame is checkpointed once;
    per-round lineage is truncated (the pagerank/k_hop discipline).
    """
    fwd = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    rev = edges.select(F.col(dst).alias("_u"), F.col(src).alias("_v"))
    und = fwd.union(rev).where(F.col("_u") != F.col("_v")).distinct()
    if truncate_lineage:
        und = und.localCheckpoint(eager=False)
    labels = (
        und.select(F.col("_u").alias("node_id"))
        .distinct()
        .select("node_id", F.col("node_id").alias("label"))
    )
    if truncate_lineage:
        labels = labels.localCheckpoint(eager=False)
    prev = None  # labels(t-2), for the 2-cycle check
    for i in range(iters):
        votes = und.join(
            labels.select(F.col("node_id").alias("_v"), "label"), "_v"
        ).select(F.col("_u").alias("node_id"), "label")
        counts = votes.groupBy("node_id", "label").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        new = (
            counts.groupBy("node_id")
            .agg(F.min(F.struct((-F.col("_cnt")).alias("_neg"), F.col("label"))).alias("_w"))
            .select("node_id", F.col("_w.label").alias("label"))
        )
        if truncate_lineage:
            new = new.localCheckpoint(eager=False)
        if early_exit:
            # every node keeps a row every round (each has >= 1 und
            # neighbor by construction), so inner joins are total.
            # One action: also materializes `new`'s checkpoint.
            cmp = new.select("node_id", F.col("label").alias("_ln")).join(
                labels.select("node_id", F.col("label").alias("_l1")),
                "node_id",
            )
            aggs = [
                F.max((F.col("_ln") != F.col("_l1")).cast("int")).alias("d1")
            ]
            if prev is not None:
                cmp = cmp.join(
                    prev.select("node_id", F.col("label").alias("_l2")),
                    "node_id",
                )
                aggs.append(
                    F.max((F.col("_ln") != F.col("_l2")).cast("int")).alias("d2")
                )
            row = cmp.agg(*aggs).collect()[0]
            if row["d1"] == 0 or row["d1"] is None:
                return new  # fixed point (or empty graph)
            if prev is not None and row["d2"] == 0:
                remaining = iters - (i + 1)
                return new if remaining % 2 == 0 else labels
        prev, labels = labels, new
    return labels
