"""ANN recall/cost curve (r6, VERDICT item 4).

The IVF and LSH contract cells pin full-probe == brute-force
EQUIVALENCE, which proves the machinery but says nothing about quality
at realistic probe counts. This tool measures what a user of the index
actually gets: recall@10 against the BLAS brute-force ground truth,
sweeping ``ivf_topk`` over n_probe in {1, 2, 4, 8} and ``lsh_topk``
over (n_planes, n_probe_bits) points incl. multi-probe on each corpus (n_cells and corpus size
per corpus, recorded in the artifact), with recall and wall seconds
per point -- the curve a capacity planner trades off. Recall@10 =
mean over queries of |approx_top10 ∩ exact_top10| / 10.

Recall is STRUCTURE-dependent, so the sweep runs on THREE corpora and
records all three curves in one artifact:

- ``replicated10x``: the sf0.1 embeddings x10 (each vector's true
  top-10 is dominated by its 9 near-identical replicas, which share
  cells/buckets -- the near-dup-retrieval regime);
- ``random``: the raw sf0.01 isotropic-gaussian table (cosine
  neighbors spread across ALL cells; no coarse quantizer can do well
  here -- the honest lower bound);
- ``clustered``: 16 well-separated directions + small noise (IVF's
  operating assumption; the regime the pytest floor pins).

Prints one JSON line; pass an output path to also write it. The pytest
floor (tests/test_similarity_textstats.py::test_ivf_recall_floor) pins
IVF n_probe=4 recall >= 0.9 on the deterministic clustered corpus so a
quantizer regression fails loudly, not silently.

Usage: python tools/ann_recall.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from wikidata_pq_spark.session import get_spark  # noqa: E402

N_QUERIES, K = 100, 10


def recall_at_k(approx_pd, gt: dict) -> float:
    hits, total = 0, 0
    by_q = approx_pd.groupby("query_id")["neighbor_id"].apply(set)
    for q, exact in gt.items():
        total += len(exact)
        hits += len(by_q.get(q, set()) & exact)
    return round(hits / total, 4)


def sweep(spark, emb, n_cells: int, tag: str) -> dict:
    from wikidata_pq_spark.operators import similarity

    emb = emb.localCheckpoint()  # one materialization feeds every point
    n_vecs = emb.count()
    t0 = time.time()
    gt_pd = similarity.brute_force_topk(emb, n_queries=N_QUERIES, k=K).toPandas()
    gt_sec = round(time.time() - t0, 1)
    gt = {q: set(g["neighbor_id"]) for q, g in gt_pd.groupby("query_id")}

    curve = {"ivf": [], "lsh": []}
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        approx = similarity.ivf_topk(
            emb, n_queries=N_QUERIES, k=K, n_cells=n_cells, n_probe=n_probe,
            sample_rows=2048,
        ).toPandas()
        curve["ivf"].append(
            {
                "n_probe": n_probe,
                "recall@10": recall_at_k(approx, gt),
                "wall_sec": round(time.time() - t0, 1),
            }
        )
        print(f"-- {tag}", curve["ivf"][-1], file=sys.stderr)
    for n_planes, probe_bits in (
        (4, 0), (8, 0), (16, 0), (8, 1), (8, 2), (16, 2),
    ):
        t0 = time.time()
        approx = similarity.lsh_topk(
            emb, n_queries=N_QUERIES, k=K, n_planes=n_planes,
            n_probe_bits=probe_bits,
        ).toPandas()
        curve["lsh"].append(
            {
                "n_planes": n_planes,
                "n_probe_bits": probe_bits,
                "recall@10": recall_at_k(approx, gt),
                "wall_sec": round(time.time() - t0, 1),
            }
        )
        print(f"-- {tag}", curve["lsh"][-1], file=sys.stderr)
    return {
        "n_vecs": n_vecs,
        "n_cells": n_cells,
        "bruteforce_groundtruth_sec": gt_sec,
        "curve": curve,
    }


def main() -> None:

    spark = get_spark(
        app_name="ann_recall",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = spark.range(10).select(F.col("id").cast("int").alias("rep"))
    embs10 = embs.crossJoin(reps).select(
        (F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.col("rep") * F.lit(0.001)).otherwise(x),
        ).alias("embedding"),
    )
    random_small = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding")
    from wikidata_pq_spark import datagen

    clustered = spark.createDataFrame(
        datagen.gen_clustered_embeddings(n=2048),
        schema="vec_id long, embedding array<double>",
    )

    corpora = {
        "replicated10x": sweep(spark, embs10, n_cells=64, tag="replicated10x"),
        "random": sweep(spark, random_small, n_cells=16, tag="random"),
        "clustered": sweep(spark, clustered, n_cells=16, tag="clustered"),
    }
    out = {
        "metric": "ann_recall_curve",
        "n_queries": N_QUERIES,
        "k": K,
        "corpora": corpora,
    }
    spark.stop()
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(line)


if __name__ == "__main__":
    main()
