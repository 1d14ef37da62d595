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
