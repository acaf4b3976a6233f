"""Property-based tests (hypothesis) for the pure-python cores:
extraction rules and union-find. No Spark involvement -- fast, and the
Spark implementations are separately proven equal to these cores."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from wikidata_pq_spark import oracle, rules

alias = st.from_regex(r"[a-z][a-z0-9]{2,8}", fullmatch=True)
filler_word = st.sampled_from(["the", "a", "ok", "so", "x1"])


@st.composite
def turn_text(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return f"{draw(alias)} was founded by {draw(alias)}"
    if kind == 1:
        return f"it acquired {draw(alias)}"
    if kind == 2:
        return " ".join(draw(st.lists(filler_word, min_size=0, max_size=6)))
    return draw(st.text(max_size=40))


@st.composite
def conversations(draw):
    n_convs = draw(st.integers(1, 4))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 8))
        for t in range(n_turns):
            rows.append((f"c{c}", t, draw(turn_text())))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


@settings(max_examples=60, deadline=None)
@given(conversations())
def test_extraction_never_crashes_and_is_deterministic(pdf):
    a = rules.extract_conversation_triples(pdf)
    b = rules.extract_conversation_triples(pdf.sample(frac=1.0, random_state=3))
    key = ["conv_id", "turn_idx", "pred", "subj_mention", "obj_mention"]
    assert sorted(map(tuple, a[key].values)) == sorted(map(tuple, b[key].values))
    # no pronoun ever survives to the output
    if len(a):
        assert (a["subj_mention"] != rules.PRONOUN).all()


@settings(max_examples=60, deadline=None)
@given(conversations())
def test_extraction_subset_of_trigger_rows(pdf):
    out = rules.extract_turn_mentions(pdf)
    if len(out) == 0:
        return
    texts = pdf.set_index(["conv_id", "turn_idx"])["text"].str.lower()
    for _, r in out.iterrows():
        assert (
            texts.loc[(r["conv_id"], r["turn_idx"])]
            .__contains__(r["obj_mention"])
        )


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.integers(1, 30)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=40,
    )
)
def test_union_find_properties(pairs):
    edges = pd.DataFrame(
        [(f"Q{a}", f"Q{b}") for a, b in pairs], columns=["src_id", "dst_id"]
    )
    comp = oracle.union_find_components(edges)
    # every endpoint labeled; labels are fixed points; label is the min
    # id of its component under numeric-aware ordering
    for a, b in pairs:
        assert comp[f"Q{a}"] == comp[f"Q{b}"]
    for v, lbl in comp.items():
        assert comp[lbl] == lbl
        assert oracle._id_key(lbl) <= oracle._id_key(v)

# --------------------------------------------------------------------------
# r5 pure-python cores: the PageRank oracle reference and the
# progressive PII-redaction invariant.
# --------------------------------------------------------------------------

node = st.integers(0, 12).map(lambda i: f"Q{i}")
edge_lists = st.lists(st.tuples(node, node), min_size=1, max_size=40)


@settings(max_examples=60, deadline=None)
@given(edge_lists)
def test_pagerank_reference_is_a_distribution(edges):
    """Mass conservation + determinism for the power-iteration oracle:
    ranks sum to 1 (dangling mass returned via the restart vector),
    every rank is positive, and the result is independent of edge-list
    order/duplication."""
    pdf = pd.DataFrame(edges, columns=["subj", "obj"])
    r1 = oracle.pagerank_reference(pdf, iters=15).set_index("node_id")["ref_rank"]
    assert abs(r1.sum() - 1.0) < 1e-6
    assert (r1 > 0).all()
    shuffled = pd.concat([pdf.sample(frac=1.0, random_state=5), pdf.head(3)])
    r2 = oracle.pagerank_reference(shuffled, iters=15).set_index("node_id")["ref_rank"]
    assert r1.sort_index().equals(r2.sort_index())


@settings(max_examples=60, deadline=None)
@given(edge_lists, st.lists(node, min_size=1, max_size=5))
def test_pagerank_reference_seeded_mass_on_graph(edges, seeds):
    """PPR: mass still sums to 1 with any seed set that overlaps the
    graph; fully-disjoint seeds raise."""
    pdf = pd.DataFrame(edges, columns=["subj", "obj"])
    nodes = set(pdf["subj"]) | set(pdf["obj"])
    if not set(seeds) & nodes:
        import pytest

        with pytest.raises(ValueError, match="no seed"):
            oracle.pagerank_reference(pdf, iters=10, seeds=seeds)
        return
    r = oracle.pagerank_reference(pdf, iters=10, seeds=seeds).set_index("node_id")[
        "ref_rank"
    ]
    assert abs(r.sum() - 1.0) < 1e-6


pii_fragment = st.sampled_from([
    "hello world", "a.b+c@test.org", "555-123-4567", "10.0.0.1",
    "user@10.0.0.12.example.com", "call 555 987 6543", "x@y.io",
    "192.168.0.1 and 8.8.8.8", "",
])


@settings(max_examples=40, deadline=None)
@given(st.lists(pii_fragment, min_size=1, max_size=5))
def test_progressive_redaction_counts_reconcile(parts):
    """The python replay of the redaction chain: progressive per-class
    counts equal the placeholders each step inserts, for ANY
    composition of overlapping PII fragments."""
    import re

    text = " ".join(parts)
    from wikidata_pq_spark.operators.curation import PII_PATTERNS

    red, counts = text, {}
    for name, pat, token in PII_PATTERNS:
        counts[name] = len(re.findall(pat, red))
        red = re.sub(pat, token, red)
    for name, _, token in PII_PATTERNS:
        assert counts[name] == red.count(token)
