"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas``. The actual media decode is STUBBED (no image/audio libs
in this container): ``decode_features`` computes deterministic fake
features from the raw bytes so the Spark-side plumbing -- schema,
partitioning, UDF signature, batch shape -- is real and tested, while
``decode_real`` raises NotImplementedError behind an import-try.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_SUFFIX = (
    "payload binary, media_type string, n_bytes long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, checksum string, "
    "fake_width int, fake_height int"
)


def attach_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata struct.

    Stand-in for reading real media blobs; the binary column is honest
    (UTF-8 bytes of the text), so sizes/checksums are meaningful.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.when(F.col(id_col) % 2 == 0, F.lit("image/fake"))
        .otherwise(F.lit("audio/fake"))
        .alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': deterministic fake features per payload.

    Batch shape is the real one (iterator of pandas DataFrames, one
    output row per input row); swap the body for PIL/librosa on a
    cluster with media libs installed.
    """

    def batch(it):
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                h = int(digest[:8], 16)
                rows.append(
                    {
                        "doc_id": did,
                        "media_type": mt,
                        "n_bytes": len(raw),
                        "checksum": digest,
                        "fake_width": 16 + (h % 1024),
                        "fake_height": 16 + ((h >> 10) % 1024),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batch, FEATURE_SCHEMA)


def decode_real(media: DataFrame) -> DataFrame:
    """Real media decode -- requires PIL/librosa, absent in this image."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real media decode needs image/audio libs not present in this "
            "container; use decode_features (deterministic fake) instead"
        ) from e
    raise NotImplementedError("real decode not wired yet")  # pragma: no cover
