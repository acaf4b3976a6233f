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


RESIZE_SCHEMA = (
    "doc_id long, orig_w int, orig_h int, new_w int, new_h int"
)

RESIZE_TARGET = 224


def resize_plan(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Aspect-preserving resize plan (Arrow-batched 'image op').

    The decode is stubbed (dims derive deterministically from the
    payload checksum, same as decode_features), but the Spark-side
    shape is the real one: mapInPandas over binary, one output row per
    image, integer box-fit math a real PIL body would replace. All
    integer floor arithmetic so the SQL oracle reproduces it exactly.
    """

    def batch(it):
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                h32 = int(hashlib.md5(raw).hexdigest()[:8], 16)
                w = 16 + (h32 % 1024)
                h = 16 + ((h32 >> 10) % 1024)
                if w >= h:
                    nw, nh = target, max(1, (h * target) // w)
                else:
                    nw, nh = max(1, (w * target) // h), target
                rows.append(
                    {"doc_id": did, "orig_w": w, "orig_h": h, "new_w": nw, "new_h": nh}
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batch, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, byte_offset long"


def frame_sample(
    media: DataFrame, k: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """Evenly-spaced frame sampling plan (the video/audio windowing op).

    One input payload fans out to <= k distinct sampled frames
    (one-to-many mapInPandas -- the real batch shape of a frame
    extractor); frame geometry derives from the payload length, so the
    plumbing is deterministic and SQL-verifiable. A real decoder body
    would replace the offset math with container parsing.
    """

    def batch(it):
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                n_frames = len(raw) // frame_bytes + 1
                seen = set()
                for j in range(k):
                    fi = (j * n_frames) // k
                    if fi in seen:
                        continue
                    seen.add(fi)
                    rows.append(
                        {
                            "doc_id": did,
                            "frame_idx": fi,
                            "byte_offset": fi * frame_bytes,
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batch, FRAME_SCHEMA)


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
