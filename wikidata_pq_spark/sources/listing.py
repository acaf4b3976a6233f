"""File-listing source: the remote-listing scan (SURVEY §2.1 S5).

The reference lists its remote repo tree into a DataFrame of
(path, size) and memoizes the listing (reference:
size_verification.py:20-45 ``expected_sizes`` with functools.cache,
prefetch.py:58); chunk/part numbers are regex-extracted from filenames
(reference: state.py:24-26, config.py:21-22). The Spark-native
re-expression lists through the Hadoop FileSystem API (works for
file://, hdfs://, s3a:// ... -- whatever filesystems the cluster has
configured), returns a DataFrame, and memoizes per (session, dir,
pattern) on the driver exactly like the reference's cache.

The listing is metadata-sized (one row per FILE, not per data row), so
a driver-side walk is the right tool -- the same judgment the reference
made; the result feeds joins/filters as a normal DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CACHE: dict[tuple[int, str, str], list[tuple[str, int, int]]] = {}

CHUNK_RE = r"chunk_(\d+)"
PART_RE = r"(\d+)-of-\d+"


def list_files(
    spark: SparkSession, path: str, glob: str = "*", use_cache: bool = True
) -> DataFrame:
    """Recursive file listing -> DataFrame(path, size, mtime).

    Memoized per (session, path, glob) -- re-listing a large object
    store prefix is the reference's motivating cost
    (size_verification.py:20-24).
    """
    key = (id(spark), path, glob)
    if not (use_cache and key in _CACHE):
        jvm = spark.sparkContext._jvm
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(conf)
        out: list[tuple[str, int, int]] = []
        matcher = jvm.org.apache.hadoop.fs.GlobFilter(glob)
        it = fs.listFiles(jpath, True)  # recursive
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            if matcher.accept(p):
                out.append((p.toString(), int(st.getLen()), int(st.getModificationTime())))
        _CACHE[key] = out
    return spark.createDataFrame(
        _CACHE[key] or [], schema="path string, size bigint, mtime bigint"
    )


def clear_cache() -> None:
    _CACHE.clear()


def with_chunk_part(listing: DataFrame) -> DataFrame:
    """Filename -> (file, chunk, part) columns (reference: state.py:24-26
    regex-extract + cast; F1/F2 scalar functions)."""
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    return listing.select(
        "*",
        fname.alias("file"),
        F.regexp_extract(fname, CHUNK_RE, 1).cast("long").alias("chunk"),
        F.regexp_extract(fname, PART_RE, 1).cast("long").alias("part"),
    )


def size_verification(
    listing: DataFrame, expected: DataFrame, key: str = "path"
) -> DataFrame:
    """Left-join local listing onto expected sizes and flag mismatches
    (the reference's download size audit, pull/core.py:79-86 +
    size_verification.py:62-102): rows with null expected_size are
    unknown files; size_ok=False rows need re-download."""
    exp = expected.select(
        F.col(key).alias("_k"), F.col("size").alias("expected_size")
    )
    return (
        listing.join(exp, listing[key] == exp["_k"], "left")
        .drop("_k")
        .withColumn(
            "size_ok",
            F.coalesce(F.col("size") == F.col("expected_size"), F.lit(False)),
        )
    )
