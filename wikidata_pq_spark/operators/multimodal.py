"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas``. Two decode tiers:

- ``decode_real``: a REAL decoder for BMP payloads (pure-struct format,
  parsed with stdlib ``struct`` -- width/height/bpp off the header,
  pixel reads at the declared data offset). Codec-dependent formats
  (JPEG/PNG/audio) stay gated behind an import-try for PIL/librosa,
  absent in this container.
- ``decode_features``: deterministic fake features from the raw bytes,
  for payloads with no stdlib-parseable container -- the Spark-side
  plumbing (schema, partitioning, UDF signature, batch shape) is the
  real one either way.
"""

from __future__ import annotations

import hashlib
import struct

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


# --------------------------------------------------------------------------
# REAL decode path. BMP is a pure-struct container (14-byte file header +
# 40-byte BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes), so it
# parses with stdlib struct alone -- a genuine decode with zero external
# libs. Formats that need a codec (JPEG/PNG/audio) stay behind the PIL
# import gate below.
# --------------------------------------------------------------------------

BMP_HEADER_BYTES = 54  # 14 file header + 40 BITMAPINFOHEADER


def bmp_bytes(doc_id: int, width: int, height: int) -> bytes:
    """Serialize a deterministic 24-bit BMP: pixel (x, y)'s blue channel
    is (x + y + doc_id) % 256 with y counted from the BOTTOM row, so the
    first payload byte after the header is doc_id % 256 (bottom-left
    blue) -- SQL-recomputable without rebuilding the bytes."""
    stride = ((3 * width + 3) // 4) * 4
    img_size = stride * height
    head = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_BYTES + img_size, 0, 0, BMP_HEADER_BYTES
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    import numpy as np

    # bottom-up scan rows: y=0 is the bottom row; BGR channel order
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    px = np.empty((height, stride), dtype=np.uint8)
    px[:, : 3 * width : 3] = (x + y + doc_id) % 256      # blue
    px[:, 1 : 3 * width : 3] = (2 * x + doc_id) % 256    # green
    px[:, 2 : 3 * width : 3] = (3 * y + doc_id) % 256    # red
    px[:, 3 * width :] = 0                               # stride padding
    return bytes(head) + px.tobytes()


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mixed-modality media source: even ids carry a REAL 24-bit BMP
    payload (dims are pure functions of the id: w = 8 + id % 113,
    h = 8 + (31 * id) % 97), odd ids keep the opaque utf-8 'audio'
    payload from :func:`attach_fake_media`. Arrow-batched generation --
    this is the synthesis stand-in for reading blob columns, so the
    Python loop sits at the SOURCE, not in an operator hot path."""

    def batch(it):
        for pdf in it:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                if did % 2 == 0:
                    w = 8 + did % 113
                    h = 8 + (31 * did) % 97
                    payload = bmp_bytes(did, w, h)
                    mt = "image/bmp"
                else:
                    payload = ("" if text is None else str(text)).encode("utf-8")
                    mt = "audio/fake"
                rows.append(
                    {
                        "doc_id": did,
                        "payload": payload,
                        "media_type": mt,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        batch, f"doc_id long, {MEDIA_SCHEMA_SUFFIX}"
    )


REAL_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width int, height int, "
    "bpp int, first_px int"
)


def decode_real(media: DataFrame) -> DataFrame:
    """Real decode over binary payloads (Arrow-batched mapInPandas).

    BMP payloads are ACTUALLY parsed: width/height/bpp come off the
    BITMAPINFOHEADER via struct.unpack and first_px reads the pixel
    array at the header's declared data offset -- so the output is
    evidence of a working decode, not byte-math. Any non-BMP payload
    falls through to the codec-library gate (PIL/librosa are absent in
    this container): filter to media_type == 'image/bmp' upstream, or
    route other types to decode_features (deterministic fake)."""

    def batch(it):
        for pdf in it:
            rows = []
            for did, mt, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                if raw[:2] != b"BM":
                    try:
                        import PIL  # noqa: F401
                    except ImportError as e:
                        raise NotImplementedError(
                            "real decode of non-BMP media needs codec libs "
                            "not present in this container; use "
                            "decode_features (deterministic fake) instead"
                        ) from e
                    raise NotImplementedError(
                        "non-BMP real decode not wired yet"
                    )  # pragma: no cover
                data_offset = struct.unpack_from("<I", raw, 10)[0]
                width, height = struct.unpack_from("<ii", raw, 18)
                bpp = struct.unpack_from("<H", raw, 28)[0]
                rows.append(
                    {
                        "doc_id": did,
                        "media_type": mt,
                        "n_bytes": len(raw),
                        "width": width,
                        "height": abs(height),  # negative = top-down BMP
                        "bpp": bpp,
                        "first_px": raw[data_offset],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(batch, REAL_FEATURE_SCHEMA)
