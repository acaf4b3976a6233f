"""Graph queries over the materialized KG (degrees, k-hop BFS)."""

from __future__ import annotations

import pandas as pd
import pytest

from wikidata_pq_spark.operators import graph

#      A -> B -> C -> D
#      A -> C          (shortcut)
#      E  isolated-ish: E -> A
EDGES = [("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"), ("E", "A")]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(pd.DataFrame(EDGES, columns=["src_id", "dst_id"]))


def test_degrees(edges):
    d = graph.degrees(edges).toPandas().set_index("node_id")
    assert d.loc["A", "out_deg"] == 2 and d.loc["A", "in_deg"] == 1
    assert d.loc["D", "out_deg"] == 0 and d.loc["D", "in_deg"] == 1
    assert d.loc["E", "in_deg"] == 0 and d.loc["E", "out_deg"] == 1
    assert (d["deg"] == d["out_deg"] + d["in_deg"]).all()


def test_k_hop_min_hop_and_exclusion(edges, spark):
    seeds = spark.createDataFrame(pd.DataFrame({"node_id": ["A"]}))
    got = dict(
        graph.k_hop(edges, seeds, k=2).toPandas()[["node_id", "hop"]].values
    )
    # C is reachable at hop 1 via the shortcut (min-hop, not hop 2 via B)
    assert got == {"B": 1, "C": 1, "D": 2}
    # seed itself excluded; k=1 truncates
    got1 = dict(
        graph.k_hop(edges, seeds, k=1).toPandas()[["node_id", "hop"]].values
    )
    assert got1 == {"B": 1, "C": 1}


def test_k_hop_undirected(edges, spark):
    seeds = spark.createDataFrame(pd.DataFrame({"node_id": ["D"]}))
    got = dict(
        graph.k_hop(edges, seeds, k=2, directed=False).toPandas()[
            ["node_id", "hop"]
        ].values
    )
    assert got == {"C": 1, "B": 2, "A": 2}


def test_k_hop_cycle_terminates(spark):
    cyc = spark.createDataFrame(
        pd.DataFrame([("X", "Y"), ("Y", "X")], columns=["src_id", "dst_id"])
    )
    seeds = spark.createDataFrame(pd.DataFrame({"node_id": ["X"]}))
    got = dict(graph.k_hop(cyc, seeds, k=3).toPandas()[["node_id", "hop"]].values)
    # X re-reached at hop 2 but seeds are hop 0 -> min-hop keeps 0, excluded
    assert got == {"Y": 1}
