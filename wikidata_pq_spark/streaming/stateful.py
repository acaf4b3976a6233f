"""Custom stateful streaming operator: per-conversation running stats.

``applyInPandasWithState`` keeps per-conv_id state across micro-batches
-- the arbitrary-stateful-processing tool the build brief names for
operators Spark's built-ins can't express. Here: a running
(turns_seen, trigger_mentions, max_turn_idx) accumulator per
conversation, updated as turns arrive in any batch order. This is the
streaming generalization of the batch extractor's conversation-carry:
state lives in the state store instead of an iterator variable, so a
conversation may span micro-batches arbitrarily.
"""

from __future__ import annotations

import pandas as pd

from .. import rules

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, trigger_turns long, max_turn_idx long"
)
STATE_SCHEMA = "turns_seen long, trigger_turns long, max_turn_idx long"


def _update(key, pdfs, state):
    conv_id = key[0]
    turns = trig = 0
    max_idx = -1
    for pdf in pdfs:
        turns += len(pdf)
        text = pdf["text"].fillna("").str.lower()
        trig += int(text.str.contains(rules.TRIGGER_REGEX, regex=True).sum())
        if len(pdf):
            max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    if state.exists:
        t0, g0, m0 = state.get
        turns += t0
        trig += g0
        max_idx = max(max_idx, m0)
    state.update((turns, trig, max_idx))
    yield pd.DataFrame(
        [
            {
                "conv_id": conv_id,
                "turns_seen": turns,
                "trigger_turns": trig,
                "max_turn_idx": max_idx,
            }
        ]
    )


def running_conversation_stats(stream):
    """streaming transcripts -> per-conversation running stats (update
    mode; one output row per conversation per micro-batch it appears in).
    """
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
