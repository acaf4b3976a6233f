"""Entity-linking join strategies."""

from __future__ import annotations

from wikidata_pq_spark import oracle
from wikidata_pq_spark.operators import extract, linking

KEYS = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _mentions(spark_corpus):
    return extract.extract_mentions(spark_corpus["transcripts"])


def test_broadcast_matches_oracle(spark_corpus, corpus):
    got = linking.link_mentions(
        _mentions(spark_corpus), spark_corpus["alias_dict"], strategy="broadcast"
    ).toPandas()
    golden = oracle.oracle_link(
        oracle.oracle_extract(corpus["transcripts"]), corpus["alias_dict"]
    )
    assert sorted(map(tuple, got[KEYS].values)) == sorted(map(tuple, golden[KEYS].values))


def test_salted_equals_broadcast(spark_corpus):
    m = _mentions(spark_corpus)
    b = linking.link_mentions(m, spark_corpus["alias_dict"], strategy="broadcast").toPandas()
    s = linking.link_mentions(
        m, spark_corpus["alias_dict"], strategy="salted", n_salt=5
    ).toPandas()
    assert sorted(map(tuple, b[KEYS].values)) == sorted(map(tuple, s[KEYS].values))


def test_unlinkable_mentions_dropped(spark, spark_corpus):
    import pandas as pd

    m = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1"],
                "turn_idx": [0, 1],
                "pred": ["P108", "P108"],
                "subj_mention": ["nosuchalias", "nosuchalias2"],
                "obj_mention": ["nosuchalias", "nosuchalias"],
                "obj_kind": ["entity", "entity"],
                "rule_idx": [1, 1],
                "match_idx": [0, 0],
            }
        )
    )
    out = linking.link_mentions(m, spark_corpus["alias_dict"])
    assert out.count() == 0


def test_literal_objects_pass_through(spark, spark_corpus, corpus):
    ad = corpus["alias_dict"]
    alias = ad["alias"].iloc[0]
    import pandas as pd

    m = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1"],
                "turn_idx": [0],
                "pred": ["P571"],
                "subj_mention": [alias],
                "obj_mention": ["1999"],
                "obj_kind": ["literal"],
                "rule_idx": [5],
                "match_idx": [0],
            }
        )
    )
    out = linking.link_mentions(m, spark_corpus["alias_dict"]).toPandas()
    assert len(out) == 1
    assert out["obj"].iloc[0] == "1999"
    assert out["subj"].iloc[0] == ad["entity_id"].iloc[0]


def test_hot_keys_histogram(spark_corpus):
    hk = linking.hot_keys(_mentions(spark_corpus), "subj_mention", top_n=10).toPandas()
    assert len(hk) <= 10
    assert hk["count"].is_monotonic_decreasing
