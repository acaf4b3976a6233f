"""Temporal operators: as-of, bucketized range join, sessionization."""

from __future__ import annotations

import pandas as pd

from wikidata_pq_spark.operators import temporal


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(
        pdf, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_asof_backward(spark):
    ev = _events(
        spark,
        [
            (1, "2026-01-01 00:00:00", 1, "click"),
            (2, "2026-01-01 00:05:00", 1, "purchase"),   # matches click 1
            (3, "2026-01-01 00:06:00", 1, "click"),
            (4, "2026-01-01 00:07:00", 1, "purchase"),   # matches click 3
            (5, "2026-01-01 00:01:00", 2, "purchase"),   # no prior click
        ],
    )
    out = (
        temporal.asof_last_event(ev, "click", "purchase")
        .toPandas()
        .set_index("target_id")
    )
    assert out.loc[2, "matched_id"] == 1 and out.loc[2, "gap_sec"] == 300
    assert out.loc[4, "matched_id"] == 3 and out.loc[4, "gap_sec"] == 60
    assert pd.isna(out.loc[5, "matched_id"])


def test_range_join_bucket_boundary(spark):
    # pair straddling a bucket boundary must still be found
    ev = _events(
        spark,
        [
            (1, "2026-01-01 00:00:59", 1, "click"),
            (2, "2026-01-01 00:01:30", 1, "click"),   # 31s apart, buckets differ
            (3, "2026-01-01 00:10:00", 1, "click"),   # far away
            (4, "2026-01-01 00:01:00", 2, "click"),   # other user
        ],
    )
    out = temporal.range_join_pairs(ev, within_sec=60).toPandas()
    pairs = set(zip(out["a_id"], out["b_id"]))
    assert pairs == {(1, 2)}


def test_sessionize_gaps(spark):
    ev = _events(
        spark,
        [
            (1, "2026-01-01 00:00:00", 1, "click"),
            (2, "2026-01-01 00:10:00", 1, "click"),   # same session
            (3, "2026-01-01 01:00:00", 1, "click"),   # > 30 min gap: new
            (4, "2026-01-01 01:05:00", 1, "click"),   # same as 3
            (5, "2026-01-01 00:00:00", 2, "click"),   # other user: own 0
        ],
    )
    out = temporal.sessionize(ev, gap_sec=1800).toPandas().set_index("event_id")
    assert list(out.loc[[1, 2, 3, 4], "session_idx"]) == [0, 0, 1, 1]
    assert out.loc[5, "session_idx"] == 0
