"""Single-process pure-pandas golden pipeline (the oracle).

Defines the golden (subj, pred, obj) set the Spark pipeline is graded
against (P/R >= 0.95, BASELINE.md). It imports the SAME rule module as
the distributed extractor, so any divergence is an ordering/partitioning
bug, not a rule drift (SURVEY.md §7.3a).

Stages mirror the Spark pipeline 1:1:
  extract  -> rules.extract_conversation_triples per conversation
  link     -> alias -> entity_id dict lookup (drop unlinkable mentions)
  canon    -> union-find over same_as edges, min-id canonical label
  triples  -> (subj, pred, obj, conv_id, turn_idx)
"""

from __future__ import annotations

import pandas as pd

from . import rules

TRIPLE_COLUMNS = ["subj", "pred", "obj", "conv_id", "turn_idx", "ts"]


def oracle_extract(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Mention-level triples for the whole corpus, single process."""
    ordered = transcripts.sort_values(["conv_id", "turn_idx"], kind="stable")
    return rules.extract_conversation_triples(ordered)


def oracle_link(mentions: pd.DataFrame, alias_dict: pd.DataFrame) -> pd.DataFrame:
    """Resolve mentions to entity ids; literals pass through as obj."""
    amap = dict(zip(alias_dict["alias"], alias_dict["entity_id"]))
    out = mentions.copy()
    out["subj"] = out["subj_mention"].map(amap)
    is_ent = out["obj_kind"].eq("entity")
    out["obj"] = out["obj_mention"].where(~is_ent, out["obj_mention"].map(amap))
    out = out[out["subj"].notna() & out["obj"].notna()]
    return out[
        ["subj", "pred", "obj", "obj_kind", "conv_id", "turn_idx", "ts"]
    ].reset_index(drop=True)


def union_find_components(same_as: pd.DataFrame) -> dict[str, str]:
    """Min-id-canonical connected components via union-find."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        # canonical = min by (numeric-aware) id ordering
        lo, hi = sorted([ra, rb], key=_id_key)
        parent[hi] = lo

    for s, d in zip(same_as["src_id"], same_as["dst_id"]):
        union(s, d)
    return {x: find(x) for x in set(same_as["src_id"]) | set(same_as["dst_id"])}


def _id_key(eid: str):
    return (0, int(eid[1:])) if eid[1:].isdigit() else (1, eid)


def oracle_canonicalize(linked: pd.DataFrame, same_as: pd.DataFrame) -> pd.DataFrame:
    """Rewrite subj/obj entity ids to their canonical component label."""
    comp = union_find_components(same_as)
    out = linked.copy()
    out["subj"] = out["subj"].map(lambda x: comp.get(x, x))
    is_ent = out["obj_kind"].eq("entity")
    out.loc[is_ent, "obj"] = out.loc[is_ent, "obj"].map(lambda x: comp.get(x, x))
    return out


def oracle_triples(
    transcripts: pd.DataFrame,
    alias_dict: pd.DataFrame,
    same_as: pd.DataFrame,
) -> pd.DataFrame:
    """End-to-end golden triples with provenance, distinct rows."""
    mentions = oracle_extract(transcripts)
    linked = oracle_link(mentions, alias_dict)
    canon = oracle_canonicalize(linked, same_as)
    out = canon[TRIPLE_COLUMNS].drop_duplicates().reset_index(drop=True)
    return out


def oracle_entity_edges(
    transcripts: pd.DataFrame,
    alias_dict: pd.DataFrame,
    same_as: pd.DataFrame,
) -> pd.DataFrame:
    """Directed entity-entity KG edge set (canonical subj -> canonical
    entity-valued obj, distinct) -- the graph the PageRank contract
    cells score. Derived from the SAME independent pandas pipeline as
    oracle_triples, so the Spark chain's edge set is cross-checked for
    free by the rank comparison."""
    mentions = oracle_extract(transcripts)
    linked = oracle_link(mentions, alias_dict)
    canon = oracle_canonicalize(linked, same_as)
    ent = canon[canon["obj_kind"].eq("entity")]
    return ent[["subj", "obj"]].drop_duplicates().reset_index(drop=True)


def pagerank_reference(
    edges: pd.DataFrame,
    damping: float = 0.85,
    iters: int = 20,
    seeds: list | None = None,
) -> pd.DataFrame:
    """Pure-python power iteration (node dicts, deterministic sorted
    order) mirroring operators.graph.pagerank's exact formulation:
    restart-vector damping, dangling mass returned through the restart
    vector, seeds restricted to nodes present in the graph. Shares NO
    code with the Spark implementation -- this is the independent
    reference the kg_pagerank / kg_ppr contract cells export as a
    golden (the same role numpy power iteration plays in
    tests/test_graph.py).

    Returns (node_id, rank) with rank rounded to 8 dp, matching the
    Spark operator's output contract.
    """
    nodes = sorted(set(edges["subj"]) | set(edges["obj"]))
    out_adj: dict[str, set] = {u: set() for u in nodes}
    for s, d in zip(edges["subj"], edges["obj"]):
        out_adj[s].add(d)
    n = len(nodes)
    if n == 0:
        raise ValueError("pagerank_reference: empty edge frame")
    if seeds is None:
        r0 = {u: 1.0 / n for u in nodes}
    else:
        present = sorted(set(seeds) & set(nodes))
        if not present:
            raise ValueError("pagerank_reference: no seed appears in the graph")
        w = 1.0 / len(present)
        r0 = {u: (w if u in set(present) else 0.0) for u in nodes}
    r = dict(r0)
    for _ in range(iters):
        dangling = sum(r[u] for u in nodes if not out_adj[u])
        nxt = {u: 0.0 for u in nodes}
        for u in nodes:
            deg = len(out_adj[u])
            if deg:
                c = r[u] / deg
                for v in sorted(out_adj[u]):
                    nxt[v] += c
        r = {
            u: (1.0 - damping) * r0[u]
            + damping * dangling * r0[u]
            + damping * nxt[u]
            for u in nodes
        }
    return pd.DataFrame(
        {"node_id": nodes, "ref_rank": [round(r[u], 8) for u in nodes]}
    )


# --------------------------------------------------------------------------
# Independent golden flattener for the reference-shaped entity rows
# (pure python over parsed JSON -- no Spark, no shared code with
# operators.flatten; agreement means the Catalyst explode/unnest/join
# pipeline reproduces the reference's entity->rows mapping,
# reference: claims.py:37-213, process.py:111-183).
# --------------------------------------------------------------------------

# deliberately re-declared (not imported from operators.flatten) so list
# drift between the two implementations is caught by the golden test
GOLDEN_SCALAR_TYPES = [
    "external-id", "string", "time", "globe-coordinate", "commonsMedia",
    "math", "musical-notation", "geo-shape", "tabular-data", "url",
    "wikibase-lexeme", "wikibase-form", "wikibase-sense", "entity-schema",
]

FLAT_CLAIM_COLUMNS = [
    "id", "property", "datatype", "rank", "language", "property_label",
    "value_id", "value_str", "amount", "unit", "upper_bound", "lower_bound",
    "datavalue_label", "latitude", "longitude", "precision", "globe",
    "timezone", "before", "after", "calendarmodel",
    "n_qual_snaks", "n_ref_snaks",
]


def _widen_coord(dv: dict, field: str):
    d = dv.get(field) or {}
    v = d.get(f"{field}__number")
    if v is None:
        iv = d.get(f"{field}__integer")
        v = float(iv) if iv is not None else None
    return v


def golden_flatten_claims(pdf: pd.DataFrame) -> pd.DataFrame:
    """Four-branch claims flattening golden (scalar projection):
    one row per (claim x matching language), qualifier/reference snak
    counts carried per row."""
    import json

    rows = []
    for _, r in pdf.iterrows():
        if r["claims"] is None:
            continue
        for claim_list in json.loads(r["claims"]).values():
            for cl in claim_list:
                ms = cl["mainsnak"]
                dv = ms["datavalue"]
                plabels = ms["property_labels"]
                quals = cl.get("qualifiers") or {}
                refs = cl.get("references") or []
                base = {
                    "id": r["id"],
                    "property": ms["property"],
                    "datatype": ms["datatype"],
                    "rank": cl["rank"],
                    "n_qual_snaks": sum(len(v) for v in quals.values()),
                    "n_ref_snaks": sum(
                        len(v) for ref in refs for v in ref.values()
                    ),
                }

                def emit(language, property_label, **kw):
                    row = dict.fromkeys(FLAT_CLAIM_COLUMNS)
                    row.update(base)
                    row["language"] = language
                    row["property_label"] = property_label
                    row.update(kw)
                    rows.append(row)

                dt = ms["datatype"]
                if dt in ("wikibase-item", "wikibase-property"):
                    labels = dv.get("labels") or {}
                    for lang, plab in plabels.items():
                        if lang in labels:
                            emit(lang, plab, value_id=dv.get("value_id"),
                                 datavalue_label=labels[lang])
                elif dt == "quantity":
                    ul = dv.get("unit_labels") or {}
                    bounds = dict(
                        upper_bound=dv.get("upper_bound"),
                        lower_bound=dv.get("lower_bound"),
                    )
                    if ul:
                        for lang, plab in plabels.items():
                            if lang in ul:
                                emit(lang, plab, amount=dv.get("amount"),
                                     unit=dv.get("unit"), datavalue_label=ul[lang],
                                     **bounds)
                    else:
                        for lang, plab in plabels.items():
                            emit(lang, plab, amount=dv.get("amount"), **bounds)
                elif dt == "monolingualtext":
                    lang = dv.get("language")
                    if lang in plabels:
                        emit(lang, plabels[lang], value_str=dv.get("text"))
                elif dt in GOLDEN_SCALAR_TYPES:
                    for lang, plab in plabels.items():
                        emit(lang, plab, value_str=dv.get("value_str"),
                             latitude=_widen_coord(dv, "latitude"),
                             longitude=_widen_coord(dv, "longitude"),
                             precision=_widen_coord(dv, "precision"),
                             globe=dv.get("globe"),
                             timezone=dv.get("timezone"),
                             before=dv.get("before"),
                             after=dv.get("after"),
                             calendarmodel=dv.get("calendarmodel"))
    out = pd.DataFrame(rows, columns=FLAT_CLAIM_COLUMNS)
    for c in ("amount", "latitude", "longitude", "precision",
              "upper_bound", "lower_bound"):
        out[c] = out[c].astype("float64")
    # nullable int64 so the parquet type matches Spark's long columns
    for c in ("timezone", "before", "after"):
        out[c] = out[c].astype("Int64")
    for c in ("n_qual_snaks", "n_ref_snaks"):
        out[c] = out[c].astype("int64")
    return out


def precision_recall(
    got: pd.DataFrame, golden: pd.DataFrame, keys: tuple[str, ...] = ("subj", "pred", "obj")
) -> tuple[float, float]:
    """P/R on distinct key tuples (order-insensitive sets)."""
    g = set(map(tuple, got[list(keys)].drop_duplicates().itertuples(index=False)))
    t = set(map(tuple, golden[list(keys)].drop_duplicates().itertuples(index=False)))
    if not g or not t:
        return (0.0, 0.0)
    inter = len(g & t)
    return (inter / len(g), inter / len(t))


def lpa_reference(edges: pd.DataFrame, iters: int = 10) -> pd.DataFrame:
    """Pure-python synchronous label propagation mirroring
    operators.graph.label_propagation's exact formulation (undirected,
    self-loops dropped, majority label with minimum-label tie-break,
    fixed synchronous rounds). Shares no code with the Spark
    implementation -- the independent golden for the graph_lpa
    contract cell.

    Returns (node_id, label), one row per node appearing in any edge.
    """
    from collections import Counter

    adj: dict = {}
    for s, d in zip(edges["subj"], edges["obj"]):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    labels = {u: u for u in adj}
    for _ in range(iters):
        nxt = {}
        for u in adj:
            votes = Counter(labels[v] for v in adj[u])
            nxt[u] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    nodes = sorted(adj)
    return pd.DataFrame({"node_id": nodes, "label": [labels[u] for u in nodes]})
