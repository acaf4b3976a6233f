"""Physical-plan audit: assert the plans we claim are the plans we get.

For each audited query, prints the formatted plan and checks
scale-relevant properties:

- parquet scans carry PushedFilters / pruned ReadSchema where expected
- dimension joins are BroadcastHashJoin, not SortMerge
- hot paths sit inside WholeStageCodegen spans
- no CartesianProduct / BroadcastNestedLoopJoin anywhere except the
  intentional ANN query-corpus cross join

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from wikidata_pq_spark import contracts  # noqa: E402
from wikidata_pq_spark.session import get_spark  # noqa: E402

CHECKS = {
    # name: (must_contain regexes, must_not_contain regexes)
    "a1_pricing_summary": (
        # formatted mode under AQE shows the pre-final plan (no codegen
        # spans); pushdown + pruned ReadSchema are the assertions
        [r"PushedFilters: \[IsNotNull\(l_shipdate\)", r"ReadSchema:[^\n]*l_returnflag", r"HashAggregate"],
        [r"SortMergeJoin"],
    ),
    "q3_shipping_priority": (
        [r"BroadcastHashJoin"],
        [r"CartesianProduct"],
    ),
    "q5_region_revenue": (
        [r"BroadcastHashJoin"],
        [r"CartesianProduct"],
    ),
    "j1_rowid_token_join": ([r"\) Generate"], [r"CartesianProduct"]),
    "dedup_token_jaccard": ([r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"], []),
    "ann_topk_bruteforce": ([r"BroadcastNestedLoopJoin|BroadcastHashJoin"], []),
    "w1_topk_per_group": ([r"Window"], []),
    # default KG path: pure Catalyst -- NO Python in the plan at all
    "kg_triples": (
        [r"Generate", r"BroadcastHashJoin"],
        [r"CartesianProduct", r"MapInPandas", r"BatchEvalPython"],
    ),
    # Arrow path kept contract-covered: mapInPandas + broadcast joins
    "kg_triples_arrow": ([r"MapInPandas", r"BroadcastHashJoin"], [r"CartesianProduct"]),
    # composed near-dup: banding aggregates + candidate equi-joins only
    "dedup_near_dup": (
        [r"HashAggregate", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    "flatten_claims_fourbranch": (
        [r"Generate", r"Union"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # bounded BFS: frontier equi-joins only, never a cartesian
    "graph_khop": (
        [r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", r"HashAggregate"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # IVF: centroid assignment is a projection; candidate join is a
    # broadcast of the (tiny) probe side onto the bucketed corpus
    "ann_ivf": (
        [r"BroadcastHashJoin", r"Window"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # multimodal plans: Arrow mapInPandas, no joins at all
    "mm_frame_sample": ([r"MapInPandas"], [r"Join"]),
    # correlated scalar subquery must DECORRELATE to aggregate + joins
    "q17_small_quantity": (
        [r"HashAggregate", r"Join"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # decontamination: eval n-gram set broadcast onto one corpus pass
    "x_decontaminate_ngrams": (
        [r"BroadcastHashJoin", r"HashAggregate"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin", r"MapInPandas"],
    ),
    # passage dedup: explode + digest groupBy only, no joins at all
    # (min(struct) survivor pick lowers to SortAggregate -- still a
    # partial-merge aggregate, just not hash-buffered)
    "dedup_chunk_spans": ([r"Generate", r"HashAggregate|SortAggregate"], [r"Join"]),
    # fuzzy ER: inverted-index equi-join + argmax window, no cartesian
    "kg_fuzzy_link": (
        [r"HashAggregate", r"Window"],
        [r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    ),
    # provenance rollup on the Python-free default chain
    "kg_triple_support": (
        [r"HashAggregate", r"BroadcastHashJoin"],
        [r"CartesianProduct", r"MapInPandas", r"BatchEvalPython"],
    ),
}


def _graph_khop_raw(spark, sf):
    """k_hop truncates lineage per hop (localCheckpoint), which hides
    the per-hop join shape behind checkpoint scans; audit the
    untruncated plan."""
    import pyspark.sql.functions as F

    from wikidata_pq_spark.operators import graph

    c = contracts.load(spark, sf, "customer")
    edges = c.filter(F.col("c_custkey") % 10 != 9).select(
        F.concat(F.lit("Q"), F.col("c_custkey")).alias("src_id"),
        F.concat(F.lit("Q"), F.col("c_custkey") + 1).alias("dst_id"),
    )
    seeds = c.filter(F.col("c_custkey") % 100 == 0).select(
        F.concat(F.lit("Q"), F.col("c_custkey")).alias("node_id")
    )
    return graph.k_hop(edges, seeds, k=2, truncate_lineage=False)


def _flatten_claims_raw(spark, sf):
    """The contract query memoizes the flattened frame behind a
    localCheckpoint (its audited plan would be a bare RDD scan); audit
    the underlying four-branch flatten plan instead -- that is the
    plan shape the check is about."""
    from wikidata_pq_spark.operators import flatten

    er = contracts._entity_rows(sf)
    return flatten.flatten_claims(spark.createDataFrame(er))


BUILDERS = {
    "flatten_claims_fourbranch": _flatten_claims_raw,
    "graph_khop": _graph_khop_raw,
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(extra_conf={"spark.ui.showConsoleProgress": "false"})
    failures = 0
    for name, (must, must_not) in CHECKS.items():
        df = BUILDERS.get(name, contracts.QUERIES[name])(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        problems = []
        for pat in must:
            if not re.search(pat, plan):
                problems.append(f"missing /{pat}/")
        for pat in must_not:
            if re.search(pat, plan):
                problems.append(f"forbidden /{pat}/ present")
        status = "ok " if not problems else "FAIL"
        failures += bool(problems)
        print(f"{status} {name}" + ("" if not problems else ": " + "; ".join(problems)))
        if problems:
            print(plan[:4000])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
