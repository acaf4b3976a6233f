"""Deterministic sampling for training-data curation.

Every sampler here is CONTENT-HASH based, never RNG based: membership
is a pure function of the row's key, so a sample is reproducible
across runs, engines (the DuckDB oracles replay it bit-for-bit),
re-sharding, and incremental appends -- the property a training
pipeline actually needs from its holdout/eval subsets. ``rand()``
sampling has none of these (seed + partition layout dependent).

The hash is md5 of the key (optionally salted with a caller seed
string), compared as a lowercase-hex PREFIX against a literal
threshold: ``fraction f`` keeps rows whose first ``hex_chars`` hex
characters are < ``floor(f * 16**hex_chars)`` rendered in hex. Both
Spark and DuckDB produce identical md5 hex, so the oracle is an exact
replay. The predicate is row-local and evaluated in the stage that
reads the scan -- it is NOT a Parquet row-group PushedFilter (a
computed hash has no column statistics to prune against); what the
plan guarantees instead is that the Filter sits directly above the
scan with no exchange anywhere (pinned by the ``samp_hash`` plan
golden), so sampling is one single-pass, shuffle-free map stage at
any scale. Granularity at the default 6 hex chars is 1/16.7M --
fraction error < 6e-8, stated in the docstrings rather than hidden.

Extends the reference's pipeline (it has no sampling stage; its
closest analogue is the driver-side chunk slicing in
reference: src/wikidata/download.py:34-60) with the curation
operators a 100 TB corpus needs: stratified fractions per language /
source, and a fixed-size per-group "reservoir" whose scale path
avoids sorting whole groups.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 6 hex chars = 24 bits of threshold granularity. Plenty for sampling
# fractions (error < 6e-8) while keeping the literal a short string.
HEX_CHARS = 6

# Numeric-prefix width for the reservoir prefilter: 15 hex chars =
# 60 bits, safely inside a signed long for F.conv.
_NUM_HEX = 15
_NUM_SPACE = 16 ** _NUM_HEX


def fraction_to_hex_threshold(fraction: float, hex_chars: int = HEX_CHARS) -> str:
    """Literal hex cutoff for ``keep iff md5-prefix < cutoff``.

    fraction >= 1 maps to 'g' (above every hex char, keeps all);
    fraction <= 0 maps to '' (below every non-empty prefix, keeps none).
    """
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return ""
    bucket = int(fraction * (16 ** hex_chars))
    return format(bucket, "0{}x".format(hex_chars))


def sample_hash(key: Column, seed: str = "") -> Column:
    """The shared sampling hash: md5 over the stringified key + seed.

    A non-empty seed yields an INDEPENDENT sample (e.g. a second eval
    subset uncorrelated with the first) -- same rows, different hash.
    """
    base = key.cast("string")
    if seed:
        base = F.concat(base, F.lit(seed))
    return F.md5(base)


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash.

    One md5 + one string comparison per row, no shuffle, no state: the
    Filter runs in the scan's own stage (directly above it, zero
    exchanges -- the ``samp_hash`` plan golden pins scan->filter
    adjacency), so at 100 TB this is a single map-only pass. It is a
    post-scan filter, not a row-group PushedFilter: Parquet cannot
    prune pages on a hash computed at read time, so every row is read
    once and tested once. Appending new rows to the corpus never
    changes membership of existing rows (contrast ``df.sample``:
    seed-and-partition dependent).
    """
    cutoff = fraction_to_hex_threshold(fraction)
    return df.where(
        F.substring(sample_hash(F.col(key_col), seed), 1, HEX_CHARS) < F.lit(cutoff)
    )


def weighted_hash_sample(
    df: DataFrame,
    base_fraction: float,
    weight_col: str,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic WEIGHTED Bernoulli sampling: each row is kept
    with probability ``min(1, base_fraction * weight)``, membership a
    pure function of the key hash -- the quality-weighted corpus
    downsample (keep high-quality documents at a higher rate) that
    training pipelines otherwise do with ``rand() < f*w`` and lose
    reproducibility across runs and re-shards.

    Arithmetic is chosen so the DuckDB oracle replays membership
    BIT-FOR-BIT: the row's 60-bit numeric hash prefix is compared to
    ``floor(min(space, (f * w) * space))`` in the INTEGER domain.
    Doubles appear only in literal-parse, multiply, and min -- all
    IEEE-correctly-rounded and therefore engine-identical PROVIDED the
    replaying engine actually evaluates in doubles: DuckDB types bare
    numeric literals as DECIMAL and evaluates the product EXACTLY, so
    the oracle CASTs every operand to DOUBLE (r7 review: 72 of the
    first 2000 lengths diverge without the casts; 0 of 100k with
    them) -- and ``floor`` is exact, so no transcendental (the
    ``pow``/``ln`` of a weighted-reservoir priority) ever enters the
    comparison. A
    double-vs-long comparison is deliberately avoided: Spark truncates
    double->long casts while DuckDB rounds them, so the cutoff is
    floored explicitly on both sides instead.

    Same scale shape as :func:`hash_sample`: one row-local predicate,
    no shuffle, no state (the ``samp_weighted`` plan golden pins the
    exchange-free scan->filter stage). Rows with NULL, NaN, or
    non-positive weight are dropped (a weight of 0 means "never keep";
    weights >= 1/base_fraction are always kept -- the min() cap).
    """
    num = F.conv(
        F.substring(sample_hash(F.col(key_col), seed), 1, _NUM_HEX), 16, 10
    ).cast("long")
    cutoff = F.floor(
        F.least(
            F.lit(float(_NUM_SPACE)),
            F.lit(float(base_fraction))
            * F.col(weight_col)
            * F.lit(float(_NUM_SPACE)),
        )
    )
    w = F.col(weight_col).cast("double")
    # NaN guard (r7 second review): Spark orders NaN GREATER than
    # every number, so NaN > 0 is true and least(space, NaN) = space
    # -- a NaN weight would be kept unconditionally instead of dropped
    return df.where(
        w.isNotNull() & ~F.isnan(w) & (w > 0) & (num < cutoff)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic fractions (e.g. per-language caps).

    The fractions mapping is caller-provided metadata (a config dict,
    not data), so it is rendered as a broadcast frame of
    (stratum, hex cutoff) literals and LEFT-joined: one broadcast
    hash join + one string comparison, no per-stratum jobs, strata
    missing from the mapping fall back to ``default_fraction``.
    Scale shape: the corpus side is never shuffled; a thousand strata
    cost the same plan as three.
    """
    spark = df.sparkSession
    cut_rows = [
        (str(s), fraction_to_hex_threshold(f)) for s, f in sorted(fractions.items())
    ]
    cuts = spark.createDataFrame(
        cut_rows, schema=f"{strata_col} string, _samp_cutoff string"
    )
    default_cut = fraction_to_hex_threshold(default_fraction)
    joined = df.join(F.broadcast(cuts), on=strata_col, how="left")
    keep = F.substring(sample_hash(F.col(key_col), seed), 1, HEX_CHARS) < F.coalesce(
        F.col("_samp_cutoff"), F.lit(default_cut)
    )
    return joined.where(keep).drop("_samp_cutoff")


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_col: str,
    seed: str = "",
    strategy: str = "auto",
    margin: float = 4.0,
    truncate_lineage: bool = True,
) -> DataFrame:
    """Deterministic fixed-size sample: the ``k`` rows per group with
    the SMALLEST sampling hash (total order: (md5 hex, key)).

    Strategies -- both return the IDENTICAL row set (pytest-pinned,
    including a NULL group value, which is one stratum like any other
    in both paths -- the prefilter path joins on a struct-wrapped key
    so NULL groups survive its equi/semi/anti joins):

    - ``window``: row_number over (group, order by hash, key) <= k.
      The baseline semantics; fine when groups are many and small,
      but each group's full row set flows through a sort.
    - ``prefilter`` (the scale path): one count aggregate per group
      sets a per-group NUMERIC hash cutoff at ``margin * k / n`` of
      the hash space, the corpus is filtered BEFORE the window, and
      only ~margin*k survivors per group are sorted. Groups where the
      margin undershot (survivors < min(k, n) -- possible, bounded-
      probability) are re-run through the unfiltered window and
      unioned, so the result is exact by construction, not with high
      probability. At 100 TB with few giant strata this turns a
      full-group sort into a ~4k-row sort per group.
    - ``auto``: prefilter. (The window variant exists to state the
      semantics and to pin equivalence.)
    """
    if strategy not in ("window", "prefilter", "auto"):
        raise ValueError(f"unknown strategy: {strategy}")
    hcol = sample_hash(F.col(key_col), seed)
    base = df.withColumn("_samp_hash", hcol)
    win_cols = [F.col("_samp_hash").asc(), F.col(key_col).asc()]

    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(*win_cols)

    def windowed(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("_samp_rn", F.row_number().over(w))
            .where(F.col("_samp_rn") <= k)
            .drop("_samp_rn")
        )

    if strategy == "window":
        return windowed(base).drop("_samp_hash")

    # --- prefilter scale path ---------------------------------------
    # numeric prefix of the hash (60 bits): monotone w.r.t. the full
    # hex-string order, so `prefix_num < cutoff` selects a SUPERSET of
    # any hex-prefix range -- safe to prefilter with, never to rank by.
    num = F.conv(F.substring(F.col("_samp_hash"), 1, _NUM_HEX), 16, 10).cast("long")
    base = base.withColumn("_samp_num", num)
    # struct-wrapped group key: struct equality is null-safe, so a
    # NULL group survives every equi/semi/anti join below exactly as
    # it survives the window path's partitionBy (which also keeps
    # NULLs as one group) -- a bare-column join would silently drop
    # the NULL stratum from the prefilter path only.
    base = base.withColumn("_samp_grp", F.struct(F.col(group_col)))

    counts = base.groupBy("_samp_grp").agg(F.count(F.lit(1)).alias("_samp_n"))
    cutoff = F.least(
        F.lit(float(_NUM_SPACE)),
        F.lit(margin * k) / F.col("_samp_n") * F.lit(float(_NUM_SPACE)),
    ).alias("_samp_cut")
    counts = counts.select("_samp_grp", "_samp_n", cutoff)
    # counts feeds the survivors join AND the emptied-groups anti-join
    # below; materialize the one-row-per-group aggregate once so the
    # second consumer does not re-run the corpus scan + count (the
    # branch-and-union recompute trap).
    if truncate_lineage:
        counts = counts.localCheckpoint(eager=False)

    # counts carries no broadcast hint: it is one row per group, but
    # group cardinality is the caller's data, not bounded config, and
    # a hard hint never demotes (the r5 size-gate rule). The join key
    # is the group key the window shuffles on anyway, and AQE picks
    # broadcast when the aggregate output IS small.
    survivors = base.join(counts, on="_samp_grp", how="inner").where(
        F.col("_samp_num") < F.col("_samp_cut")
    )
    # survivors is consumed by BOTH the guard aggregate and the window
    # below; it is also small by construction (~margin*k rows per
    # group). Materialize it once -- without this, each consumer
    # re-runs the corpus scan + count aggregate (the branch-and-union
    # recompute trap pinned in the flatten plan goldens).
    # truncate_lineage=False exists for the plan audit only (the
    # checkpoint hides the join/filter shape behind an RDD scan).
    if truncate_lineage:
        survivors = survivors.localCheckpoint(eager=False)

    # exactness guard: a group is "good" iff the prefilter kept at
    # least min(k, n) rows -- then the k hash-smallest are inside.
    surv_counts = survivors.groupBy("_samp_grp").agg(
        F.count(F.lit(1)).alias("_samp_sn"), F.first("_samp_n").alias("_samp_n2")
    )
    good = surv_counts.where(
        F.col("_samp_sn") >= F.least(F.lit(k), F.col("_samp_n2"))
    ).select("_samp_grp")
    bad = surv_counts.where(
        F.col("_samp_sn") < F.least(F.lit(k), F.col("_samp_n2"))
    ).select("_samp_grp")
    # groups the prefilter emptied out entirely never appear in
    # surv_counts at all -- they are bad too.
    emptied = counts.join(surv_counts, on="_samp_grp", how="left_anti").select(
        "_samp_grp"
    )
    bad = bad.unionByName(emptied)

    # no broadcast hints on good/bad: they are data-derived (one row
    # per group) and group cardinality is the caller's data, not
    # bounded config -- a hard hint never demotes (r5 size-gate rule).
    # AQE converts these semi joins to broadcast when they ARE small.
    picked_good = windowed(survivors.join(good, on="_samp_grp", how="left_semi"))
    picked_bad = windowed(base.join(bad, on="_samp_grp", how="left_semi"))

    out_cols = [c for c in df.columns]
    return (
        picked_good.select(*out_cols)
        .unionByName(picked_bad.select(*out_cols))
    )
