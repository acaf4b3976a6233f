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


def test_fuzzy_link_typos_and_determinism(spark):
    """Char-trigram ER: truncated/typo'd mentions re-link to the right
    entity; exact strings score 1.0; ties break deterministically."""
    import pandas as pd
    import pyspark.sql.functions as F

    from wikidata_pq_spark.operators import linking

    adf = spark.createDataFrame(pd.DataFrame({
        "alias": ["wikidata", "wikipedia", "sparkle", "sparkles"],
        "entity_id": ["Q1", "Q2", "Q3", "Q3"],
    }))
    mdf = spark.createDataFrame(pd.DataFrame({
        "mention": ["wikidata", "ikidata", "sparkle", "qqqqq"],
    }))
    out = linking.fuzzy_link_mentions(mdf, adf, threshold=0.4).toPandas()
    got = {r["mention"]: (r["entity_id"], r["sim"]) for _, r in out.iterrows()}
    assert got["wikidata"] == ("Q1", 1.0)
    assert got["ikidata"][0] == "Q1"          # truncation still links
    assert got["sparkle"][0] == "Q3"
    assert "qqqqq" not in got                  # nothing shared -> no link
    # exactly one row per linked mention (argmax, not all candidates)
    assert out["mention"].is_unique


def test_fuzzy_link_df_cap_prunes_hot_grams(spark):
    """df_cap drops dictionary postings for grams above the document-
    frequency cap (common-gram pruning): with cap=1 the gram shared by
    ALL aliases stops generating candidates on its own."""
    import pandas as pd

    from wikidata_pq_spark.operators import linking

    adf = spark.createDataFrame(pd.DataFrame({
        # every alias contains 'xyz'; only the first also shares 'abc'
        "alias": ["abcxyz", "defxyz", "ghixyz"],
        "entity_id": ["Q1", "Q2", "Q3"],
    }))
    mdf = spark.createDataFrame(pd.DataFrame({"mention": ["abcqqq"]}))
    free = linking.fuzzy_link_mentions(mdf, adf, threshold=0.0).toPandas()
    assert set(free["entity_id"]) == {"Q1"}  # best match via 'abc'
    capped = linking.fuzzy_link_mentions(mdf, adf, threshold=0.0, df_cap=1).toPandas()
    # 'abc' grams have df 1 (survive); 'xyz' grams df 3 (pruned) --
    # Q1 still reachable through its rare grams
    assert set(capped["entity_id"]) == {"Q1"}
