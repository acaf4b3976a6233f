"""Deterministic synthetic transcript corpus generator.

Modeled on the reference's synthetic demo generator (reference:
testing_area/demo_dataset.py:16-56 -- fixed np.random.seed(42), exact
skewed key proportions, chunked files, skip-if-exists resume):

- ``gen_entities``   -> alias dictionary (FIXTURES.md #2): Zipf-skewed
  popularity so a top slice of entities receives ~half of all mentions
  (the high-degree-QID skew analogue; drives the salted-join path).
- ``gen_same_as``    -> canonicalization edges (FIXTURES.md #3):
  chains, stars (hub skew), and singletons.
- ``gen_transcripts``-> the input table (FIXTURES.md #1), schema exactly
  the BASELINE input_hint: (conv_id string, turn_idx int32, role string,
  text string, tool string, ts timestamp); rows emitted SHUFFLED so the
  stable-ordering reconstruction is actually exercised.

Pure numpy/pandas: the generator runs on the driver and the result is
parallelized via ``spark.createDataFrame`` (Arrow) or written to
parquet. Deterministic for any (seed, size) pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_SYLLABLES = [
    "ac", "bel", "cor", "dan", "el", "fen", "gor", "hal", "ix", "jun",
    "kel", "lor", "mek", "nor", "os", "pel", "quin", "rav", "sol", "tor",
    "ul", "vex", "wob", "xan", "yel", "zor",
]

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "browser", "calculator", "kbase"]

# Sentence templates; {s}/{o} are alias slots, {y} a year, {n} a count.
# One template per rule in rules.RELATION_RULES plus filler/noise.
_REL_TEMPLATES = [
    ("{s} was founded by {o}", "entity"),
    ("{s} works at {o}", "entity"),
    ("{s} is located in {o}", "entity"),
    ("{s} is the ceo of {o}", "entity"),
    ("{s} acquired {o}", "entity"),
    ("{s} was founded in {y}", "year"),
    ("{s} employs {n} people", "num"),
]
_COREF_TEMPLATES = [
    ("it was founded by {o}", "entity"),
    ("it is located in {o}", "entity"),
    ("it acquired {o}", "entity"),
    ("it was founded in {y}", "year"),
]
_FILLER = [
    "thanks for the update",
    "let me check that for you",
    "the weather is nice today",
    "running the requested analysis now",
    "no relevant records were found",
]


def _alias_pool(n: int, rng: np.random.Generator) -> list[str]:
    """n unique single-token aliases, deterministic in rng state."""
    seen: set[str] = set()
    out: list[str] = []
    while len(out) < n:
        k = rng.integers(2, 4)
        word = "".join(rng.choice(_SYLLABLES) for _ in range(k))
        if word not in seen:
            seen.add(word)
            out.append(word)
    return out


def gen_entities(n_entities: int = 500, seed: int = 42) -> pd.DataFrame:
    """Alias dictionary: (alias, entity_id, entity_label, freq_rank).

    1-3 aliases per entity; freq_rank 0 = hottest. Mention sampling in
    gen_transcripts uses a Zipf(1.1) law over freq_rank.
    """
    rng = np.random.default_rng(seed)
    n_aliases = rng.integers(1, 4, size=n_entities)
    pool = _alias_pool(int(n_aliases.sum()), rng)
    rows = []
    pos = 0
    for i in range(n_entities):
        eid = f"Q{i + 1}"
        k = int(n_aliases[i])
        label = pool[pos]
        for j in range(k):
            rows.append((pool[pos + j], eid, label, i))
        pos += k
    return pd.DataFrame(rows, columns=["alias", "entity_id", "entity_label", "freq_rank"])


def gen_same_as(n_entities: int = 500, seed: int = 42) -> pd.DataFrame:
    """Same-as edges over Q-ids: chains, a hub star, singletons.

    Deterministic closed form so tests/oracles can derive the golden
    component: ids are grouped in blocks of 5 (chain within block) for
    the first 40%% of ids; one hub (Q1) additionally links to the start
    of every 10th block (the skew star); the rest are singletons.
    """
    del seed  # structure is closed-form deterministic
    edges = []
    n_chain = (n_entities * 2) // 5
    for i in range(1, n_chain + 1):
        if i % 5 != 0 and i + 1 <= n_chain:
            edges.append((f"Q{i}", f"Q{i + 1}"))
    for b in range(0, n_chain, 50):  # hub star over every 10th block head
        head = b + 1
        if head != 1 and head <= n_chain:
            edges.append(("Q1", f"Q{head}"))
    return pd.DataFrame(edges, columns=["src_id", "dst_id"])


def golden_components(n_entities: int = 500) -> pd.DataFrame:
    """Closed-form golden (entity_id, canonical_id) for gen_same_as."""
    n_chain = (n_entities * 2) // 5
    star_heads = {b + 1 for b in range(0, n_chain, 50)}
    rows = []
    for i in range(1, n_entities + 1):
        if i <= n_chain:
            block_head = ((i - 1) // 5) * 5 + 1
            canon = "Q1" if block_head in star_heads else f"Q{block_head}"
        else:
            canon = f"Q{i}"
        rows.append((f"Q{i}", canon))
    return pd.DataFrame(rows, columns=["entity_id", "canonical_id"])


def gen_transcripts(
    n_convs: int = 200,
    mean_turns: int = 10,
    n_entities: int = 500,
    seed: int = 42,
    shuffle: bool = True,
) -> pd.DataFrame:
    """Transcript table per BASELINE input_hint, shuffled row order.

    Zipf-skewed conversation lengths and Zipf-skewed entity choice
    (hot entities dominate mentions). ~55%% of turns carry a relation
    sentence, ~15%% a pronoun-coreference sentence, rest filler.
    """
    rng = np.random.default_rng(seed)
    ents = gen_entities(n_entities, seed)
    aliases = ents["alias"].to_numpy()
    # alias popularity follows its entity's Zipf rank
    ranks = ents["freq_rank"].to_numpy().astype(float)
    weights = 1.0 / (ranks + 1.0) ** 1.1
    weights /= weights.sum()

    lengths = np.minimum(rng.zipf(1.6, size=n_convs) + mean_turns // 2, mean_turns * 8)
    base_ts = np.datetime64("2026-01-01T00:00:00")
    rows = []
    for c in range(n_convs):
        conv_id = f"c{c:06d}"
        n_turns = int(lengths[c])
        for t in range(n_turns):
            role = ROLES[t % 3]
            tool = TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None
            u = rng.random()
            if u < 0.55:
                tmpl, kind = _REL_TEMPLATES[int(rng.integers(0, len(_REL_TEMPLATES)))]
                s = str(rng.choice(aliases, p=weights))
                o = str(rng.choice(aliases, p=weights))
                text = tmpl.format(
                    s=s, o=o, y=int(rng.integers(1900, 2026)), n=int(rng.integers(1, 99999))
                )
            elif u < 0.70 and t > 0:
                tmpl, kind = _COREF_TEMPLATES[int(rng.integers(0, len(_COREF_TEMPLATES)))]
                o = str(rng.choice(aliases, p=weights))
                text = tmpl.format(
                    o=o, y=int(rng.integers(1900, 2026))
                )
            else:
                text = _FILLER[int(rng.integers(0, len(_FILLER)))]
            ts = base_ts + np.timedelta64(c * 3600 + t * 30, "s")
            rows.append((conv_id, t, role, text, tool, ts))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    if shuffle:
        pdf = pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return pdf
