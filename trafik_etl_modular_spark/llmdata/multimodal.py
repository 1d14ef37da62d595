"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself (JPEG → pixels, PCM → samples) needs codec
libraries this container doesn't ship, so decoding is STUBBED —
`decode_image` raises NotImplementedError and the pipeline uses a
clearly-marked deterministic fake.  Everything AROUND the stub is
real and tested: the binary schema, the Arrow batch path through
mapInPandas, batch-shaped feature extraction, and the partitioning
story (binary payloads don't shuffle unless the plan requires it;
feature extraction is map-only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Output schema of extract_features (mapInPandas contract).
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, header string, fake_width int, fake_height int"
)


def decode_image(payload: bytes) -> "object":
    """REAL decode would go through PIL/libjpeg — not available in
    this environment. Kept as the integration point."""
    raise NotImplementedError(
        "image codecs are not available in this container; "
        "use fake_decode_meta for deterministic tests"
    )


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
    (no shuffle). This is the exact shape a real image/audio feature
    extractor plugs into: swap fake_decode_meta for the codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf["payload"].map(fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "header": pdf["payload"].map(
                        lambda b: b[:8].hex() if b is not None else None
                    ),
                    "fake_width": metas.map(lambda m: m[0]).astype("int32"),
                    "fake_height": metas.map(lambda m: m[1]).astype("int32"),
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
