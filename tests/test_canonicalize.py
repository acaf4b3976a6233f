"""Connected components + canonical rewrite."""

from __future__ import annotations

import pandas as pd
import pytest

from wikidata_pq_spark import datagen, oracle
from wikidata_pq_spark.operators import canonicalize


DT = [0, 200_000]  # 0 = force distributed label propagation; big = driver union-find


def _cc(spark, edges: list[tuple[str, str]], dt: int = 0) -> dict[str, str]:
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src_id", "dst_id"]))
    out = canonicalize.connected_components(df, driver_threshold=dt).toPandas()
    return dict(zip(out["entity_id"], out["canonical_id"]))


@pytest.mark.parametrize("dt", DT)
def test_chain(spark, dt):
    comp = _cc(spark, [("Q1", "Q2"), ("Q2", "Q3"), ("Q3", "Q4")], dt)
    assert comp == {"Q1": "Q1", "Q2": "Q1", "Q3": "Q1", "Q4": "Q1"}


def test_long_chain_pointer_jumping(spark):
    """A 40-deep chain converges well under the 25-iteration cap."""
    edges = [(f"Q{i}", f"Q{i+1}") for i in range(1, 41)]
    comp = _cc(spark, edges, 0)
    assert set(comp.values()) == {"Q1"}
    assert len(comp) == 41


@pytest.mark.parametrize("dt", DT)
def test_star_and_singleton_components(spark, dt):
    comp = _cc(
        spark, [("Q10", "Q5"), ("Q10", "Q7"), ("Q10", "Q20"), ("Q100", "Q101")], dt
    )
    assert comp["Q10"] == "Q5" and comp["Q7"] == "Q5" and comp["Q20"] == "Q5"
    assert comp["Q100"] == "Q100" and comp["Q101"] == "Q100"


@pytest.mark.parametrize("dt", DT)
def test_numeric_aware_min(spark, dt):
    # string-min would pick "Q10" over "Q2"; numeric-aware must pick Q2
    comp = _cc(spark, [("Q10", "Q2")], dt)
    assert comp == {"Q10": "Q2", "Q2": "Q2"}


@pytest.mark.parametrize("dt", DT)
def test_matches_union_find_on_generated_edges(spark, dt):
    sa = datagen.gen_same_as(200)
    golden = oracle.union_find_components(sa)
    got = _cc(spark, list(zip(sa["src_id"], sa["dst_id"])), dt)
    assert got == golden


def test_apply_canonical(spark):
    triples = spark.createDataFrame(
        pd.DataFrame(
            {
                "subj": ["Q5", "Q9"],
                "pred": ["P1", "P2"],
                "obj": ["Q6", "1999"],
                "obj_kind": ["entity", "literal"],
                "conv_id": ["c", "c"],
                "turn_idx": [0, 1],
            }
        )
    )
    comps = spark.createDataFrame(
        pd.DataFrame(
            {"entity_id": ["Q5", "Q6", "Q9"], "canonical_id": ["Q1", "Q1", "Q2"]}
        )
    )
    out = canonicalize.apply_canonical(triples, comps).toPandas().sort_values("turn_idx")
    assert list(out["subj"]) == ["Q1", "Q2"]
    # literal obj untouched, entity obj rewritten
    assert list(out["obj"]) == ["Q1", "1999"]


def test_apply_canonical_broadcast_gating(spark):
    """Small component map -> broadcast hint; over-threshold map -> the
    hint is withheld so the join shuffles on its key (AQE may still
    pick broadcast at these toy sizes, so assert on the OPTIMIZED
    LOGICAL plan where only the explicit hint appears)."""
    triples = spark.createDataFrame(
        pd.DataFrame(
            {
                "subj": ["Q5"], "pred": ["P1"], "obj": ["Q6"],
                "obj_kind": ["entity"], "conv_id": ["c"], "turn_idx": [0],
            }
        )
    )
    comps = spark.createDataFrame(
        pd.DataFrame({"entity_id": [f"Q{i}" for i in range(100)],
                      "canonical_id": ["Q1"] * 100})
    )

    def logical_plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    hinted = canonicalize.apply_canonical(triples, comps)
    assert "broadcast" in logical_plan(hinted).lower()
    gated = canonicalize.apply_canonical(triples, comps, broadcast_threshold=10)
    assert "broadcast" not in logical_plan(gated).lower()
    # both plans produce identical rows
    assert (
        hinted.toPandas().sort_index(axis=1).values.tolist()
        == gated.toPandas().sort_index(axis=1).values.tolist()
    )


@pytest.mark.parametrize("n", [2, 3])
def test_cc_deterministic(spark, n):
    edges = [(f"Q{i}", f"Q{i + n}") for i in range(1, 30)]
    a = _cc(spark, edges)
    b = _cc(spark, edges)
    assert a == b
