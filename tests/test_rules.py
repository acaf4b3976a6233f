"""Pure-pandas tests of the shared extraction rule module."""

from __future__ import annotations

import pandas as pd

from wikidata_pq_spark import rules


def _turns(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def test_basic_relation_patterns():
    pdf = _turns(
        [
            ("c1", 0, "acme was founded by bob"),
            ("c1", 1, "bob works at acme"),
            ("c1", 2, "acme is located in berlin"),
            ("c1", 3, "eve is the ceo of acme"),
            ("c1", 4, "acme acquired globex"),
            ("c1", 5, "acme was founded in 1999"),
            ("c1", 6, "acme employs 500 people"),
        ]
    )
    out = rules.extract_conversation_triples(pdf)
    assert list(zip(out["pred"], out["subj_mention"], out["obj_mention"])) == [
        ("P112", "acme", "bob"),
        ("P108", "bob", "acme"),
        ("P131", "acme", "berlin"),
        ("P169", "eve", "acme"),
        ("P127", "acme", "globex"),
        ("P571", "acme", "1999"),
        ("P1128", "acme", "500"),
    ]
    assert set(out.loc[out["pred"] == "P571", "obj_kind"]) == {"literal"}
    assert set(out.loc[out["pred"] == "P112", "obj_kind"]) == {"entity"}


def test_no_match_returns_empty():
    out = rules.extract_conversation_triples(_turns([("c1", 0, "hello world")]))
    assert len(out) == 0
    assert list(out.columns) == rules.MENTION_COLUMNS


def test_coreference_resolves_to_last_subject_in_turn_order():
    # turns supplied shuffled: rule module must re-sort by turn_idx
    pdf = _turns(
        [
            ("c1", 2, "it acquired globex"),
            ("c1", 0, "acme was founded by bob"),
            ("c1", 1, "zeta is located in oslo"),
        ]
    )
    out = rules.extract_conversation_triples(pdf)
    coref = out[out["pred"] == "P127"].iloc[0]
    assert coref["subj_mention"] == "zeta"  # most recent subject, not acme


def test_coreference_without_antecedent_dropped():
    out = rules.extract_conversation_triples(_turns([("c1", 0, "it acquired globex")]))
    assert len(out) == 0


def test_coreference_is_conversation_scoped():
    pdf = _turns(
        [
            ("a", 0, "acme was founded by bob"),
            ("b", 0, "it acquired globex"),  # no antecedent in conv b
        ]
    )
    out = rules.extract_conversation_triples(pdf)
    assert set(out["conv_id"]) == {"a"}


def test_multiple_matches_in_one_turn():
    pdf = _turns([("c1", 0, "acme acquired globex and acme acquired initech")])
    out = rules.extract_conversation_triples(pdf)
    assert sorted(out["obj_mention"]) == ["globex", "initech"]


def test_extraction_is_deterministic():
    import numpy as np

    from wikidata_pq_spark import datagen

    tr = datagen.gen_transcripts(n_convs=30, mean_turns=6, n_entities=80)
    a = rules.extract_conversation_triples(tr)
    b = rules.extract_conversation_triples(tr.sample(frac=1.0, random_state=7))
    ka = sorted(map(tuple, a[["conv_id", "turn_idx", "pred", "subj_mention", "obj_mention"]].values))
    kb = sorted(map(tuple, b[["conv_id", "turn_idx", "pred", "subj_mention", "obj_mention"]].values))
    assert ka == kb
    assert np.array_equal(a.sort_index().values, a.values)
