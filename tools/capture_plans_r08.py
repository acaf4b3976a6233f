"""Capture .explain("formatted") for every bench cell into plans/r08/.

Usage: python tools/capture_plans_r08.py <suffix> [query ...]
Writes plans/r08/<query>_<suffix>.txt for each bench query (default: all
16 bench cells). Read-only: runs no actions beyond what query
construction itself requires (some cells collect bounded metadata at
build time, e.g. ANN query vectors).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from wikidata_pq_spark import contracts  # noqa: E402
from wikidata_pq_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "a1_pricing_summary",
    "a7_running_revenue",
    "w1_topk_per_group",
    "j1_rowid_token_join",
    "q3_shipping_priority",
    "q5_region_revenue",
    "dedup_exact",
    "dedup_near_dup",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality_score",
    "kg_triples",
    "sk_heavy_hitters",
    "samp_reservoir",
    "graph_lpa",
    "graph_triangles",
]


def formatted_plan(df) -> str:
    sess = df.sparkSession
    return df._jdf.queryExecution().explainString(
        sess._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r08"
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(
        app_name="capture_plans_r08",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name in names:
        # cold-shape discipline (mirrors plans.audit.build): a query
        # built earlier in this session may have persisted a shared
        # frame, and the CacheManager would splice InMemoryTableScan
        # into any later plan containing that subtree
        spark.catalog.clearCache()
        df = contracts.QUERIES[name](spark, sf_dir)
        txt = formatted_plan(df)
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
