"""Temporal operators Spark lacks natively: as-of join, range join,
sessionization.

The build brief names these as the custom-operator family: implemented
as compositions of built-in DataFrame ops (preference order (a) of the
brief -- no pandas fallback needed), each with deterministic tie-breaks
so results are engine-exact against SQL oracles.

Scale notes:
- as-of: one shuffle on the partition key; the window scan is linear
  per partition (no self-join blowup). Skewed users ride AQE.
- range join: the naive form is an inequality join (quadratic per key);
  the bucket trick turns it into an equi-join on (key, time_bucket)
  with bounded fan-out 2 buckets per row -- the standard distributed
  range-join rewrite.
- sessionization: two window passes (lag + running sum), both over the
  same (user, time) ordering -- one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_sec(col: Column) -> Column:
    """Truncated epoch seconds of a (possibly NTZ) timestamp.

    TIMESTAMP_NTZ cannot cast directly to long under ANSI; routing via
    TIMESTAMP uses the session zone, which this engine pins to UTC --
    identical to DuckDB's epoch() over naive timestamps."""
    return col.cast("timestamp").cast("long")


def asof_last_event(
    events: DataFrame,
    match_type: str,
    target_type: str,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """For each ``target_type`` event: the most recent prior-or-equal
    ``match_type`` event by the same key (as-of backward join).

    Window formulation: tag match rows, carry the last non-null match id
    forward over (key, ts, id) order, keep target rows. Strictly ordered
    by (ts, id) so ties are deterministic. A match and target at the
    same (ts, id)... cannot collide (ids unique); a match at the same ts
    as a target sorts by id and is visible to later-id targets only.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_match = F.col("event_type") == match_type
    tagged = events.withColumn(
        "_match_id", F.when(is_match, F.col(id_col))
    ).withColumn("_match_ts", F.when(is_match, F.col(ts_col)))
    carried = tagged.withColumn(
        "matched_id", F.last("_match_id", ignorenulls=True).over(w)
    ).withColumn("matched_ts", F.last("_match_ts", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("event_type") == target_type)
        .select(
            F.col(key),
            F.col(id_col).alias("target_id"),
            F.col("matched_id"),
            (
                epoch_sec(F.col(ts_col)) - epoch_sec(F.col("matched_ts"))
            ).alias("gap_sec"),
        )
    )


def _bucket(ts_col: Column, width_sec: int) -> Column:
    return F.floor(epoch_sec(ts_col) / width_sec)


def range_join_pairs(
    events: DataFrame,
    within_sec: int = 60,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Pairs of same-key events within ``within_sec`` of each other
    (a_id < b_id) -- the bucketized range join.

    Each row lands in its time bucket; the probe side additionally
    checks BOTH adjacent buckets: |ts_a - ts_b| <= w and bucket width w
    imply |bucket_b - bucket_a| <= 1, and the pair filter is on id
    order (a_id < b_id), not time order, so the lower-id event may sit
    in either neighbor bucket. Probing {b-1, b, b+1} guarantees every
    qualifying pair meets at least once; the trailing distinct dedups
    double meetings. Fan-out is a bounded 3x on the probe side only --
    still an equi-join on (key, bucket), never an inequality join.
    """
    base = events.select(
        F.col(key).alias("k"),
        F.col(id_col).alias("id"),
        epoch_sec(F.col(ts_col)).alias("t"),
        _bucket(F.col(ts_col), within_sec).alias("b"),
    )
    probe = base.select(
        "k", F.col("id").alias("a_id"), F.col("t").alias("a_t"),
        F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)).alias("b"),
    )
    build = base.select(
        "k", F.col("id").alias("b_id"), F.col("t").alias("b_t"), "b"
    )
    pairs = (
        probe.join(build, ["k", "b"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_t") - F.col("b_t")) <= within_sec)
        )
        .select(F.col("k").alias("user_id"), "a_id", "b_id")
        .distinct()
    )
    return pairs


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Session assignment: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_sec``. session_idx is
    0-based per key (lag + running-sum-of-breaks)."""
    w = Window.partitionBy(key).orderBy(ts_col, id_col)
    gap = epoch_sec(F.col(ts_col)) - F.lag(epoch_sec(F.col(ts_col))).over(w)
    # two projection steps: a window function (lag) cannot nest inside
    # another window aggregate in one expression
    with_brk = events.select(
        F.col(key),
        F.col(id_col),
        F.col(ts_col),
        F.when(gap.isNull() | (gap <= gap_sec), F.lit(0)).otherwise(F.lit(1)).alias("_brk"),
    )
    run = Window.partitionBy(key).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return with_brk.select(
        F.col(key),
        F.col(id_col),
        F.sum("_brk").over(run).alias("session_idx"),
    )
