"""Independent pure-python references for the exported dedup artifacts.

The driver's value-hash gate re-derives banding / Hamming chunks /
verify joins in DuckDB, but it consumes the EXPORTED signature
parquets (minhash sigs, simhash sigs) computed by the Spark code under
test -- a bug inside signature computation would be structurally
invisible there (ADVICE r2). These tests close that hole: a from-first-
principles python implementation (own xxh64, own MinHash fold, own
SimHash votes) recomputes the signatures on a small corpus and must
match the Spark output bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pytest

from wikidata_pq_spark.operators import dedup

MERSENNE = 2147483647

# ---------------------------------------------------------------------------
# Pure-python XXH64 (the public xxHash spec), seed 42 = Spark's xxhash64 seed.
# ---------------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 over bytes, returned as SIGNED int64 (Spark semantics)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox leaps over the lazy dog", "en"),
        (3, "completely different text about spark engines", "en"),
        (4, "der schnelle braune fuchs springt ueber den faulen hund", "de"),
        (5, "short doc", "en"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_pure_python_xxh64_matches_spark(spark):
    """Self-validation: the reference hash must agree with Spark's
    xxhash64 on strings of every length class (<4, <8, <32, >=32)."""
    import pyspark.sql.functions as F

    samples = ["", "a", "abc", "abcd", "abcdefg", "the quick brown fox",
               "x" * 31, "y" * 32, "the quick brown fox jumps over the lazy dog dog"]
    df = spark.createDataFrame(pd.DataFrame({"s": samples}))
    got = dict(zip(samples, df.select("s", F.xxhash64("s").alias("h")).toPandas()["h"]))
    for s in samples:
        assert xxh64(s.encode()) == got[s], s


def _ref_minhash(text: str, n_hashes: int) -> list[int] | None:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < 3:
        return None
    shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hs = [xxh64(s.encode()) % MERSENNE for s in shingles]
    return [
        min(((2 * i + 1) * h + 1000003 * (i + 1)) % MERSENNE for h in hs)
        for i in range(n_hashes)
    ]


def test_minhash_signatures_match_pure_python(docs):
    """Spark MinHash signatures == the independent python fold,
    element-for-element (universal-hash constants, shingling, and the
    xxhash64 -> mod 2^31-1 pipeline all recomputed from scratch)."""
    sig = dedup.minhash_signatures(docs, n_hashes=16).toPandas()
    got = {i: list(v) for i, v in zip(sig["id"], sig["sig"])}
    pdf = docs.toPandas()
    exp = {}
    for _, r in pdf.iterrows():
        s = _ref_minhash(r["text"], 16)
        if s is not None:
            exp[r["doc_id"]] = s
    assert got == exp
    assert 5 not in got  # <3 tokens -> no shingles -> no signature


def _ref_simhash(text: str) -> int:
    toks = str(text or "").lower().split()
    votes = [0] * 64
    for t in toks:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    val = sum(1 << b for b in range(64) if votes[b] > 0)
    return val - (1 << 64) if val >= (1 << 63) else val


def test_simhash_matches_pure_python(docs):
    got = dict(zip(*(lambda p: (p["doc_id"], p["simhash"]))(
        dedup.simhash64(docs).toPandas()
    )))
    pdf = docs.toPandas()
    exp = {r["doc_id"]: _ref_simhash(r["text"]) for _, r in pdf.iterrows()}
    assert got == exp


def test_pure_python_xxh64_matches_spark_random_strings(spark):
    """Broader hash validation: 300 deterministic pseudo-random strings
    (varied lengths 0..120, full printable alphabet incl. multi-byte
    UTF-8) hashed identically by the python reference and Spark."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-.,!?éü中"
    samples = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pd.DataFrame({"s": samples}))
    got = df.select("s", F.xxhash64("s").alias("h")).toPandas()
    for s, h in zip(got["s"], got["h"]):
        assert xxh64(s.encode()) == h, repr(s)
