"""Text-analysis operators: language-ID, quality scoring, token stats,
document fingerprinting.

All JVM-side Catalyst expressions (functions.text) -- whole-stage
codegen end to end, and every operator has an exact DuckDB oracle
(shared fold orders, explicit rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

LANGS = ["en", "de", "fr", "es", "zh"]


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, avg_token_len)."""
    toks = TX.tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        TX.bpe_ish_token_count(F.col(text_col)).alias("n_subtokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            )
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language heuristic with fixed precedence tie-break.

    Returns per-language hit counts plus the argmax prediction; the
    CASE precedence (en > de > fr > es > zh on ties) is replicated
    verbatim in the oracle SQL.
    """
    toks = TX.tokens(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        *[TX.stopword_hits(toks, lang).alias(f"hits_{lang}") for lang in LANGS],
    )
    pred = F.lit("und")
    best = F.lit(0)
    # build CASE chain: first lang (in LANGS order) holding the strict max wins
    for lang in LANGS:
        c = F.col(f"hits_{lang}")
        pred = F.when(c > best, F.lit(lang)).otherwise(pred)
        best = F.when(c > best, c).otherwise(best)
    return scored.withColumn("pred_lang", pred)


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score (rounded).

    length score, stopword ratio, alpha ratio, repetition penalty
    (distinct/total tokens) -- the standard cheap pretraining filters.
    """
    toks = TX.tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    stop = TX.stopword_hits(toks, "en")
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    stop_ratio = stop / n_tok
    alpha_ratio = alpha / n_chars
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = F.round(
        0.25 * len_score + 0.25 * distinct_ratio + 0.25 * stop_ratio + 0.25 * alpha_ratio,
        6,
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): rolling polynomial hash over token lengths."""
    return df.select(
        F.col(id_col),
        TX.rolling_fingerprint(TX.tokens(F.col(text_col))).alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signal (the Gopher-style duplicate
    n-gram fraction used to filter low-quality training text):
    (id, n_ngrams, n_distinct, rep_ratio) with
    rep_ratio = 1 - distinct/total n-grams (0.0 for docs shorter than
    n tokens). Pure Catalyst -- shingle array, array_distinct, sizes.
    Tokens are projected to a column before the shingle transform so
    the split runs once per row (not once per shingle)."""
    sh = TX.shingles(F.col("toks"), n)
    total = F.size(sh)
    distinct = F.size(F.array_distinct(sh))
    ratio = F.when(total > 0, F.round(1.0 - distinct / total, 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        F.col(id_col), TX.tokens(F.col(text_col)).alias("toks")
    ).select(
        F.col(id_col),
        # long, not int: DuckDB len() yields BIGINT and the driver's
        # value hash does not normalize across integer widths' pandas
        # dtypes -- keep both sides int64
        total.cast("long").alias("n_ngrams"),
        distinct.cast("long").alias("n_distinct"),
        ratio.alias("rep_ratio"),
    )
