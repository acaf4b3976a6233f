"""applyInPandasWithState: conversation state must survive micro-batch
boundaries (a conversation deliberately split across two files)."""

from __future__ import annotations

import pandas as pd

from wikidata_pq_spark.streaming import incremental, stateful

import pytest

pytestmark = pytest.mark.classic_session_only



def test_state_spans_micro_batches(spark, tmp_path):
    a = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pd.array([0, 1, 0], dtype="int32"),
            "role": ["user"] * 3,
            "text": ["acme acquired globex", "thanks", "zeta works at acme"],
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2026-01-01"] * 3),
        }
    )
    b = pd.DataFrame(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pd.array([2, 3], dtype="int32"),
            "role": ["user"] * 2,
            "text": ["it was founded in 1999", "ok"],
            "tool": [None] * 2,
            "ts": pd.to_datetime(["2026-01-01"] * 2),
        }
    )
    in_dir = str(tmp_path / "in")
    ddl = incremental.TRANSCRIPT_DDL
    spark.createDataFrame(a, ddl).coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(b, ddl).coalesce(1).write.mode("append").parquet(in_dir)

    stream = incremental.stream_transcripts(spark, in_dir, max_files_per_trigger=1)
    q = (
        stateful.running_conversation_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("convstats")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM convstats").toPandas()

    # final state for c1 must accumulate across both batches:
    # 4 turns total, 2 trigger turns ('acquired', 'was founded in'),
    # max_turn_idx 3 -- provable only if state survived the batch break
    c1 = out[out["conv_id"] == "c1"].sort_values("turns_seen")
    assert c1["turns_seen"].iloc[-1] == 4
    assert c1["trigger_turns"].iloc[-1] == 2
    assert c1["max_turn_idx"].iloc[-1] == 3
    # c1 appeared in at least two micro-batches (update rows accumulate)
    assert len(c1) >= 2
    c2 = out[out["conv_id"] == "c2"]
    assert c2["turns_seen"].max() == 1 and c2["trigger_turns"].max() == 1
