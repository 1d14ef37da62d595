"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step (JPEG → pixels) is probed at RUNTIME: when Pillow is
importable, `try_decode_meta` really decodes the payload; when the
library is absent (this container) or the bytes aren't a decodable
image, the pipeline falls back to a clearly-marked deterministic
fake.  Everything AROUND the decode is real and tested either way:
the binary schema, the Arrow batch path through mapInPandas,
batch-shaped feature extraction, and the partitioning story (binary
payloads don't shuffle unless the plan requires it; feature
extraction is map-only).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of extract_features (mapInPandas contract).
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, header string, "
    "fake_width int, fake_height int, decode_mode string"
)


def _pil_image():
    """Runtime probe for Pillow. Returns the PIL.Image module or None —
    import cost is paid once per executor worker (module cache)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes):
    """REAL decode via Pillow when available (the integration point a
    codec plugs into); raises NotImplementedError when the library is
    absent so callers can't silently get fake pixels."""
    Image = _pil_image()
    if Image is None:
        raise NotImplementedError(
            "Pillow is not available in this container; "
            "use fake_decode_meta for deterministic tests"
        )
    return Image.open(io.BytesIO(payload))


def try_decode_meta(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from a REAL Pillow decode, or None when Pillow
    is absent or the payload isn't a decodable image — the caller then
    falls back to the deterministic fake."""
    if payload is None or _pil_image() is None:
        return None
    try:
        with decode_image(payload) as im:
            return (im.width, im.height)
    except NotImplementedError:  # pragma: no cover - race on probe
        return None
    except Exception:
        return None


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic FAKE decode standing in for real metadata
    extraction: derives a (width, height) from payload bytes. Marked
    fake on purpose — replaces decode_image in tests only."""
    if not payload:
        return (0, 0)
    return (64 + payload[0] % 64, 64 + payload[-1] % 64)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal corpus: utf-8 payload bytes + typed metadata
    struct (mime, n_bytes). In production the payload column comes
    from `spark.read.format('binaryFile')` or parquet BYTE_ARRAY."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("media_meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas — each batch arrives as a pandas DataFrame with a
    bytes column; per-batch (NOT per-row) Python cost, map-only plan
    (no shuffle). The decode is probed per payload: REAL Pillow
    dimensions when the library is present and the bytes decode
    (`decode_mode = 'pil'`), the deterministic fake otherwise
    (`decode_mode = 'fake'`) — so the same job handles a mixed corpus
    and records which path each row took."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            real = pdf["payload"].map(try_decode_meta)
            metas = [
                r if r is not None else fake_decode_meta(b)
                for r, b in zip(real, pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "header": pdf["payload"].map(
                        lambda b: b[:8].hex() if b is not None else None
                    ),
                    "fake_width": pd.Series(
                        [m[0] for m in metas], index=pdf.index
                    ).astype("int32"),
                    "fake_height": pd.Series(
                        [m[1] for m in metas], index=pdf.index
                    ).astype("int32"),
                    "decode_mode": [
                        "pil" if r is not None else "fake" for r in real
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (binary → binary) and frame sampling (one → many): the other
# two multimodal pipeline stages.  Both stubs are deterministic and
# clearly marked; the Spark-side contracts (schemas, batch shapes,
# map-only plans) are the real thing a codec drops into.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = "doc_id bigint, payload binary, media_meta struct<mime:string, n_bytes:int>"

FRAME_BYTES = 1024  # fake "video": fixed-size frames of payload bytes

FRAME_SCHEMA = (
    "doc_id bigint, frame_no int, frame_offset int, frame_bytes int"
)


def fake_resize(payload: bytes, target_bytes: int) -> bytes:
    """FAKE resize: truncate/zero-pad to target size. A real impl
    decodes, scales, re-encodes; the engine contract — binary in,
    binary out, size change — is what this preserves."""
    if payload is None:
        return None
    return payload[:target_bytes].ljust(target_bytes, b"\0")


def resize_payloads(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Arrow-batched binary→binary transform (the resize stage).
    Map-only: payload bytes never shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(lambda b: fake_resize(b, target_bytes))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "media_meta": [
                        {"mime": "application/octet-stream", "n_bytes": len(b)}
                        for b in resized
                    ],
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """One-to-many frame sampling: treat the payload as fixed-size
    frames, emit one OUTPUT ROW per sampled frame — the row-exploding
    batch shape real video sampling has (mapInPandas output is not
    1:1 with input, which is exactly why it's mapInPandas and not a
    scalar UDF). Deterministic: frames at indices 0, n, 2n, … of
    floor(n_bytes / FRAME_BYTES) full frames."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 0 if payload is None else len(payload) // frame_bytes
                for frame_no in range(0, n_frames, every_n):
                    out.append(
                        (doc_id, frame_no, frame_no * frame_bytes, frame_bytes)
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_no", "frame_offset", "frame_bytes"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
