"""End-to-end corpus curation: the composed filter chain a training
pipeline runs over raw documents before tokenization.

One declarative plan composing the repo's individual operators --
exact-dedup survivor selection, quality gate, repetition gate, and
deterministic split assignment -- so Catalyst sees the whole chain at
once (shared scans, pushed filters), instead of materializing between
stages. This is the "a reference user could run their curation flow
here" query: every stage is individually oracle-checked elsewhere; the
composition is oracle-checked as `x_curate_corpus`.

Split assignment is content-hashed (first md5 hex char: 0-b train,
c-d val, e-f test = 12/2/2 sixteenths), so membership is reproducible
across runs and engines and survives re-sharding -- the standard
deterministic-holdout trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, textstats

TRAIN_HEX = list("0123456789ab")
VAL_HEX = ["c", "d"]


def split_col(text_col) -> "F.Column":
    """Deterministic content-hash split label (train/val/test)."""
    first_hex = F.substring(F.md5(text_col), 1, 1)
    return (
        F.when(first_hex.isin(*TRAIN_HEX), F.lit("train"))
        .when(first_hex.isin(*VAL_HEX), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def curate_corpus(
    df: DataFrame,
    quality_min: float = 0.3,
    rep_max: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents -> curated (doc_id, lang, split, quality, rep_ratio).

    Stages, all in one plan:
    1. exact-dedup survivors only (keep_id = min id per text digest --
       the digest groupBy is the only corpus-sized shuffle);
    2. quality gate: composite score >= quality_min;
    3. repetition gate: duplicate-3-gram fraction <= rep_max;
    4. deterministic split label from the content hash.

    At 100 TB: one scan feeds the digest aggregate and the per-row
    features; the survivor semi-join keys on the id. The gates are
    plain filters Catalyst can reorder.
    """
    survivors = dedup.exact_dup_groups(df, text_col=text_col, id_col=id_col).select(
        F.col("keep_id").alias(id_col)
    )
    quality = textstats.quality_score(df, text_col=text_col, id_col=id_col).select(
        id_col, "quality"
    )
    rep = textstats.repetition_stats(df, n=3, text_col=text_col, id_col=id_col).select(
        id_col, "rep_ratio"
    )
    base = df.select(id_col, "lang", split_col(F.col(text_col)).alias("split"))
    return (
        base.join(survivors, id_col, "semi")
        .join(quality, id_col)
        .join(rep, id_col)
        .filter((F.col("quality") >= quality_min) & (F.col("rep_ratio") <= rep_max))
        .select(id_col, "lang", "split", "quality", "rep_ratio")
    )


def pack_chunks(
    df: DataFrame,
    max_len: int = 512,
    shard_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): documents are concatenated in deterministic (shard, id)
    order and cut into fixed ``max_len``-token context windows;
    documents may straddle a cut.

    Output per document: its token count, its starting offset in the
    shard's token stream, the first/last chunk ids it lands in, and how
    many chunks it spans -- the shuffle-free metadata a packer needs to
    emit training examples.

    Scale shape: ONE window (running sum of token counts) partitioned by
    the shard key -- there is deliberately no global ordering, which
    would serialize the corpus through a single reducer at 100 TB.
    Shards (language here; any bounded-size key works) pack
    independently, exactly how multi-file training shards are laid out
    in practice. All integer arithmetic, so the DuckDB oracle
    reproduces it bit-for-bit.
    """
    from pyspark.sql import Window

    from ..functions import text as TX

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = df.select(
        shard_col, id_col, F.size(TX.tokens(F.col(text_col))).alias("n_tokens")
    )
    cum = toks.withColumn("end_off", F.sum("n_tokens").over(w)).withColumn(
        "start_off", (F.col("end_off") - F.col("n_tokens")).cast("long")
    )
    first_chunk = F.floor(F.col("start_off") / max_len)
    # last token of the doc sits at end_off - 1; empty docs occupy no
    # tokens and are pinned to their start chunk (span 1)
    last_chunk = F.when(
        F.col("n_tokens") > 0, F.floor((F.col("end_off") - 1) / max_len)
    ).otherwise(first_chunk)
    return cum.select(
        shard_col,
        id_col,
        "n_tokens",
        "start_off",
        first_chunk.cast("long").alias("first_chunk"),
        last_chunk.cast("long").alias("last_chunk"),
        (last_chunk - first_chunk + 1).cast("long").alias("n_chunks"),
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround, \b supported by both.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Rule-based PII scrubbing (the pre-training redaction stage):
    chained regexp_replace for emails, phone numbers and IPv4s, plus a
    per-class hit count.

    Counts are PROGRESSIVE -- each class is counted on the text as the
    replacement chain actually sees it (emails on the raw text, phones
    after email redaction, IPv4s after phone redaction) -- so every
    count equals the number of placeholders that class inserted and the
    counts reconcile exactly with ``red_text``. (Raw pre-redaction
    counting would double-count overlaps, e.g. an IPv4 inside an email
    domain incrementing both n_email and n_ipv4 while only <EMAIL>
    appears in the output.)

    Pure Catalyst -- at 100 TB this is a map-only pass fused into the
    scan (no shuffle at all); ``keep_cols`` carries passthrough columns
    (lang, ts, ...) through the same single scan, so callers never need
    a self-join to reattach them. The patterns are the dual-engine-safe
    subset (Java regex + RE2), so the DuckDB oracle replays them
    verbatim.
    """
    keep = [F.col(c) for c in keep_cols]
    out = df.select(F.col(id_col), *keep, F.col(text_col).alias("red_text"))
    for name, pat, token in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col("red_text"), F.lit(pat)).cast("long")
        ).withColumn("red_text", F.regexp_replace("red_text", pat, token))
    return out.select(
        id_col, *keep_cols, "red_text", "n_email", "n_phone", "n_ipv4",
        ((F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0).alias("had_pii"),
    )
