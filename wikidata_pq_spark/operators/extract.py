"""Distributed triple extraction: stable ordering + grouped pandas UDF.

The Spark analogue of the reference's entity->rows flattening
(reference: claims.py:37-45 explode/unnest pipeline): one conversation
group in, many (subj_mention, pred, obj_mention) rows out, executed as
an Arrow-batched ``applyInPandas`` per conv_id group -- the vectorized
path the reference chose over per-row lambdas (reference:
claims.py:11-13, compare_perf.py:73-87 rejected map_elements).

Scale notes (100 TB): the only shuffle is the groupBy(conv_id) -- and
conversations are small and numerous, so AQE coalescing keeps partition
sizes even; a single conversation can never exceed one Arrow batch
group. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import rules

MENTION_SCHEMA = (
    "conv_id string, turn_idx int, pred string, subj_mention string, "
    "obj_mention string, obj_kind string, rule_idx int, match_idx long"
)

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Reconstruct stable per-conversation turn ordering.

    Co-partitions by conv_id then sorts within partitions by
    (conv_id, turn_idx) -- a total order per conversation without a
    global sort (no single-reducer bottleneck at scale).
    """
    return transcripts.repartition("conv_id").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def _extract_group(pdf):
    """Grouped-map body: runs the SHARED rule module on one conv batch."""
    out = rules.extract_conversation_triples(pdf)
    # Arrow needs exact dtypes for empty frames too.
    return out.astype(
        {
            "conv_id": "string",
            "turn_idx": "int32",
            "pred": "string",
            "subj_mention": "string",
            "obj_mention": "string",
            "obj_kind": "string",
            "rule_idx": "int32",
            "match_idx": "int64",
        }
    )


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts -> mention-level triples (pre-linking).

    groupBy(conv_id).applyInPandas guarantees each group sees ALL turns
    of its conversation, which the coreference rule requires; the rule
    module re-sorts by turn_idx inside the batch, so upstream order is
    irrelevant to correctness (only to spill behavior).
    """
    turns = transcripts.select("conv_id", "turn_idx", "text")
    return turns.groupBy("conv_id").applyInPandas(_extract_group, MENTION_SCHEMA)


def turn_stream_invariant(transcripts: DataFrame) -> DataFrame:
    """Per-turn text-equality audit frame (BASELINE per-row invariant).

    Returns (conv_id, turn_idx, text, text_roundtrip, equal) where
    text_roundtrip is the text observed after the ordering
    reconstruction; ``equal`` must be all-true. The analogue of the
    reference's ID-preservation audit (reference: process.py:106-108).
    """
    ordered = ordered_turns(transcripts).select(
        "conv_id", "turn_idx", F.col("text").alias("text_roundtrip")
    )
    base = transcripts.select("conv_id", "turn_idx", "text")
    joined = base.join(ordered, ["conv_id", "turn_idx"], "full_outer")
    return joined.withColumn(
        "equal",
        (F.col("text") == F.col("text_roundtrip"))
        | (F.col("text").isNull() & F.col("text_roundtrip").isNull()),
    )
