"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with typed metadata
structs. The decode/feature-extract step is STUBBED (no image/audio libs
in this container — clearly marked below); everything around it — schema,
Arrow batch shape, mapInPandas signature, partitioning — is real and
tested. A deterministic fake "decode" derives metadata from the payload
bytes (md5-based), so the plumbing has an exact SQL oracle.

Scale notes: binary payloads ride the scan; metadata extraction is a
map-only mapInPandas stage (Arrow transfers the bytes zero-copy-ish);
payload size governs `spark.sql.files.maxPartitionBytes` tuning, and
frame-sampling/resize would fan out rows — the operator returns an
iterator so one input batch may yield many output batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, width long, height long"


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB — a real deployment decodes the image header here (PIL /
    libjpeg / ffprobe). Deterministic fake: dimensions derived from the
    payload's md5 so tests and SQL oracles can verify the plumbing.
    Raise NotImplementedError for formats a real decoder would reject."""
    h = hashlib.md5(payload).hexdigest()
    return 160 + int(h[0:6], 16) % 1920, 120 + int(h[6:12], 16) % 1080


def extract_media_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """binary payloads → (doc_id, n_bytes, width, height), Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            dims = payloads.apply(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "width": dims.str[0].astype("int64"),
                    "height": dims.str[1].astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=META_SCHEMA)
