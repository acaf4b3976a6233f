"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set covers the operator families the engine claims: scan+agg,
star joins, windows, the exploded-lookup join rewrite, dedup (exact /
MinHash-LSH candidates / the composed LSH->exact-Jaccard-verify
headline near-dup), ANN, text stats, and the full KG pipeline on the
default Catalyst extractor (whose throughput is also reported as
kg_triples_per_sec -- the BASELINE.json headline metric).

Run at two parallelism levels for the scaling-efficiency evidence:
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

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
    # r7 additions (VERDICT r6 item 4): the r6 operator families join
    # the trend line. The first 12 cells above are FROZEN as the
    # cross-round comparison set and also reported as
    # legacy12_total_sec so r07+ totals stay comparable with r01-r06.
    "sk_heavy_hitters",
    "samp_reservoir",
    "graph_lpa",
    "graph_triangles",
]

# cells present in every bench since r01-r06, FROZEN BY NAME (not a
# positional slice -- r7 second review: an insertion or reorder of
# BENCH_QUERIES must never silently change what legacy12_total_sec
# measures); their sum is the cross-round comparable total
LEGACY_12 = (
    "a1_pricing_summary", "a7_running_revenue", "w1_topk_per_group",
    "j1_rowid_token_join", "q3_shipping_priority", "q5_region_revenue",
    "dedup_exact", "dedup_near_dup", "dedup_minhash_lsh",
    "ann_topk_bruteforce", "text_quality_score", "kg_triples",
)
if not set(LEGACY_12) <= set(BENCH_QUERIES):  # survives python -O
    raise ValueError("legacy cell missing from bench")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = None

    spark = get_spark(
        app_name=f"bench_{sf_name}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # warm the JVM + scan path so the first measured query doesn't pay
    # session startup (we measure operators, not JVM boot)
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # min-of-N reps per query: this host is an overcommitted shared box
    # (r03 showed +0.3-0.6s swings on unchanged plans), so a single
    # sample conflates operator cost with hypervisor jitter. The min is
    # the standard noise-floor estimator; spark.catalog.clearCache()
    # between reps drops any frame a query persisted, so every rep
    # measures the COLD plan (JVM and OS page cache stay warm -- that
    # part is stable and is not what we are benchmarking).
    #
    # Cross-round convention (pinned in round 5, judge-requested):
    # headline = min, median ALSO published per cell; any cell whose
    # first-pass rep spread (max/min) exceeds 2x gets topped up to
    # ``reps_hi`` reps so one noisy window can't set its estimate.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    reps_hi = int(os.environ.get("SPARK_GRAFT_BENCH_REPS_HI", "5"))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    kg_rows = 0
    for name in BENCH_QUERIES:
        fn = contracts.QUERIES[name]
        samples = []

        def one_rep():
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            return n

        for _ in range(reps):
            n = one_rep()
        while max(samples) / min(samples) > 2.0 and len(samples) < reps_hi:
            n = one_rep()
        timings[name] = min(samples)
        srt = sorted(samples)
        mid = len(srt) // 2
        medians[name] = round(
            srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2, 3
        )
        rep_times[name] = samples
        if name == "kg_triples":
            kg_rows = n

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "median_total_sec": round(sum(medians.values()), 3),
        "legacy12_total_sec": round(sum(timings[n] for n in LEGACY_12), 3),
        "legacy12_median_total_sec": round(sum(medians[n] for n in LEGACY_12), 3),
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "reps_hi_spread_gate": 2.0,
        "estimator": "min (median published; >2x-spread cells topped up to reps_hi)",
        "rep_times": rep_times,
        "kg_triples": kg_rows,
        "kg_triples_per_sec": round(kg_rows / timings["kg_triples"], 1)
        if timings.get("kg_triples")
        else None,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
