"""Shared deterministic triple-extraction rules.

This module is imported by BOTH the single-process pandas oracle
(``wikidata_pq_spark.oracle``) and the distributed Spark extractor
(``wikidata_pq_spark.operators.extract``), so extraction divergence can
only come from ordering/partitioning -- mirroring the reference's policy
of one rule source for the entity->rows flattening (reference:
process.py:285-348 drives all five tables through the same schema
constants).

Rule model (the analogue of the reference's per-datatype claim branches,
reference: claims.py:198-213):

- Each :class:`RelationRule` is a regex over lowercased turn text with
  two capture groups (subject mention, object mention-or-literal).
- ``obj_kind`` distinguishes entity-valued relations ("wikibase-item"
  branch) from literal-valued ones ("quantity"/"time" branch); the two
  streams are later unioned by name, mirroring the reference's diagonal
  concat (reference: claims.py:206-213).
- A conversation-scoped coreference rule resolves the pronoun subject
  "it" to the most recent subject mention earlier in the SAME
  conversation (turn order, then match order).  This makes extraction
  genuinely order-dependent, so the stable (conv_id, turn_idx) sort is
  load-bearing -- the per-turn analogue of the reference's
  ID-preservation audit (reference: process.py:106-108).

Everything here is pure pandas/stdlib: no Spark imports, vectorized
``str.extractall`` per pattern (no per-row Python in the hot path).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

# A mention is a single lowercase alphanumeric token of length >= 3
# starting with a letter (the synthetic alias space is single-token).
_M = r"([a-z][a-z0-9]{2,})"
_YEAR = r"((?:1[89]|20)\d{2})"
_NUM = r"(\d+)"

# Pronoun that triggers conversation-scoped coreference.
PRONOUN = "it"
_SUBJ = rf"({_M[1:-1]}|{PRONOUN})"


@dataclass(frozen=True)
class RelationRule:
    pred: str  # Wikidata-flavored property id
    pattern: str  # regex with exactly 2 capture groups: (subj, obj)
    obj_kind: str  # "entity" | "literal"


# Ordered rule table: order defines within-turn match precedence for
# coreference state updates. Predicate ids follow Wikidata conventions
# (P112 founded-by, P108 employer, P131 located-in, P169 CEO,
# P127 owned-by/acquired, P571 inception, P1128 employees).
RELATION_RULES: tuple[RelationRule, ...] = (
    RelationRule("P112", rf"\b{_SUBJ} was founded by {_M}\b", "entity"),
    RelationRule("P108", rf"\b{_M} works at {_M}\b", "entity"),
    RelationRule("P131", rf"\b{_SUBJ} is located in {_M}\b", "entity"),
    RelationRule("P169", rf"\b{_M} is the ceo of {_M}\b", "entity"),
    RelationRule("P127", rf"\b{_SUBJ} acquired {_M}\b", "entity"),
    RelationRule("P571", rf"\b{_SUBJ} was founded in {_YEAR}\b", "literal"),
    RelationRule("P1128", rf"\b{_SUBJ} employs {_NUM} people\b", "literal"),
)

# Coarse JVM-side prefilter: a turn that matches no trigger phrase can
# produce no mention AND no coreference antecedent (antecedents are
# subjects of matched rules), so dropping it before the shuffle is
# semantics-preserving -- the reference's filter-before-explode rewrite
# (reference: compare_perf.py:54-55, claims.py:54,98,152).
TRIGGER_REGEX = (
    "was founded by|works at|is located in|is the ceo of|acquired"
    "|was founded in|employs"
)

# Output columns of mention-level extraction (pre-linking). ``ts`` is
# the asserting TURN's timestamp, threaded through so downstream views
# (current_beliefs) can order assertions by wall-clock recency instead
# of lexicographic (conv_id, turn_idx).
MENTION_COLUMNS = [
    "conv_id",
    "turn_idx",
    "pred",
    "subj_mention",
    "obj_mention",
    "obj_kind",
    "rule_idx",
    "match_idx",
    "ts",
]


def extract_turn_mentions(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-turn mention extraction (no cross-turn state).

    ``pdf`` needs columns (conv_id, turn_idx, text, ts). Returns
    MENTION_COLUMNS rows, one per regex match; ``subj_mention`` may be
    the unresolved pronoun. Vectorized: one ``str.extractall`` pass per
    rule over the whole batch (the branch-per-datatype shape of
    reference claims.py:48-195, unioned like its diagonal concat).
    """
    if len(pdf) == 0:
        return pd.DataFrame(columns=MENTION_COLUMNS)
    pdf = pdf.reset_index(drop=True)  # extractall row ids must be positional
    text = pdf["text"].fillna("").str.lower()
    parts: list[pd.DataFrame] = []
    for rule_idx, rule in enumerate(RELATION_RULES):
        hits = text.str.extractall(rule.pattern)
        if len(hits) == 0:
            continue
        hits = hits.rename(columns={0: "subj_mention", 1: "obj_mention"})
        hits.index.names = ["_row", "match_idx"]
        hits = hits.reset_index()
        hits["conv_id"] = pdf["conv_id"].to_numpy()[hits["_row"].to_numpy()]
        hits["turn_idx"] = pdf["turn_idx"].to_numpy()[hits["_row"].to_numpy()]
        # thread the asserting turn's timestamp; ts-less frames (ad-hoc
        # fixtures) get NaT so the column is always present downstream
        hits["ts"] = (
            pdf["ts"].to_numpy()[hits["_row"].to_numpy()]
            if "ts" in pdf.columns
            else pd.NaT
        )
        hits["pred"] = rule.pred
        hits["obj_kind"] = rule.obj_kind
        hits["rule_idx"] = rule_idx
        parts.append(hits[MENTION_COLUMNS])
    if not parts:
        return pd.DataFrame(columns=MENTION_COLUMNS)
    out = pd.concat(parts, ignore_index=True)
    # Deterministic within-turn ordering: text position is not kept by
    # extractall across rules, so order by (turn, rule, match).
    out = out.sort_values(["conv_id", "turn_idx", "rule_idx", "match_idx"], kind="stable")
    return out.reset_index(drop=True)


def resolve_coreference(mentions: pd.DataFrame) -> pd.DataFrame:
    """Resolve pronoun subjects within one or more conversations.

    ``mentions`` must already be in stable (conv_id, turn_idx, rule_idx,
    match_idx) order (as produced by :func:`extract_turn_mentions` on
    turn-sorted input). For each conversation, the running "last
    subject" is the most recent non-pronoun subj_mention; pronoun rows
    take that value, or are dropped if no antecedent exists yet.

    This is a per-conversation sequential scan by construction (state
    threads through turn order), but conversations are independent --
    exactly why the Spark side groups by conv_id.
    """
    if len(mentions) == 0:
        return mentions.copy()
    out = mentions.copy()
    is_pron = out["subj_mention"].eq(PRONOUN)
    # Forward-fill the last concrete subject within each conversation.
    last_subj = (
        out["subj_mention"]
        .where(~is_pron)
        .groupby(out["conv_id"], sort=False)
        .ffill()
    )
    out["subj_mention"] = last_subj
    out = out[out["subj_mention"].notna()]
    return out.reset_index(drop=True)


def extract_conversation_triples(pdf: pd.DataFrame) -> pd.DataFrame:
    """Full per-conversation-batch extraction: sort -> extract -> coref.

    ``pdf`` holds complete conversations (all turns of each conv_id
    present). Sorting by (conv_id, turn_idx) inside the batch is the
    stable-ordering reconstruction required by the per-turn invariant.
    Returns distinct mention-level triples with provenance.
    """
    if len(pdf) == 0:
        return pd.DataFrame(columns=MENTION_COLUMNS)
    ordered = pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    mentions = extract_turn_mentions(ordered)
    resolved = resolve_coreference(mentions)
    return resolved[MENTION_COLUMNS].reset_index(drop=True)
