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

META_SCHEMA = "doc_id long, n_bytes long, width long, height long, decoder string"


def _probe_decoder() -> str:
    """Capability probe: 'pil' when a real image decoder is importable on
    this node, else 'stub'. Runs on the EXECUTOR (inside the UDF) so a
    heterogeneous cluster self-describes per task."""
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except Exception:
        return "stub"


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode — deterministic fake: dimensions derived from the
    payload's md5 so tests and SQL oracles can verify the plumbing."""
    h = hashlib.md5(payload).hexdigest()
    return 160 + int(h[0:6], 16) % 1920, 120 + int(h[6:12], 16) % 1080


def _decode_pil(payload: bytes) -> tuple[int, int]:
    """Real header decode (only reachable where PIL imports)."""
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        return im.width, im.height


def extract_media_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "auto",
) -> DataFrame:
    """binary payloads → (doc_id, n_bytes, width, height, decoder).

    decoder: 'auto' probes for PIL on the executor and uses it when
    present; 'stub' forces the deterministic fake (what the exact SQL
    oracle checks); 'pil' demands the real decoder (ImportError where
    absent). The emitted `decoder` column makes the stub status visible
    to every downstream consumer — no silent fake dimensions."""
    if decoder not in ("auto", "stub", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolved = _probe_decoder() if decoder == "auto" else decoder

        def decode_row(payload):
            # per-ROW resolution: in auto mode an undecodable payload
            # (corrupt image, non-image bytes) falls back to the stub and
            # says so in its decoder value instead of killing the job;
            # an explicitly demanded 'pil' still fails loudly
            if resolved == "pil":
                if decoder == "pil":
                    return (*_decode_pil(payload), "pil")
                try:
                    return (*_decode_pil(payload), "pil")
                except Exception:
                    return (*_decode_stub(payload), "stub")
            return (*_decode_stub(payload), "stub")

        for pdf in it:
            payloads = pdf[payload_col]
            dims = payloads.apply(decode_row)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "width": dims.str[0].astype("int64"),
                    "height": dims.str[1].astype("int64"),
                    "decoder": dims.str[2],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=META_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width long, height long, resized_md5 string"


def resize_media(
    df: DataFrame, target_w: int, target_h: int, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload → resized payload at (target_w, target_h).

    STUB decode/resample (a real deployment calls PIL.Image.resize /
    ffmpeg scale here); the deterministic fake derives the resized bytes
    from md5(payload ‖ "WxH") so the Arrow plumbing — bytes in, bytes
    out, batch shape preserved — is exactly testable. Output carries the
    md5 hex of the resized payload (stable to hash cross-engine)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dims = f":{target_w}x{target_h}".encode()
        for pdf in it:
            resized = pdf[payload_col].apply(lambda p: hashlib.md5(bytes(p) + dims).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": target_w,
                    "height": target_h,
                    "resized_md5": resized,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame_md5 string"


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """video payload → N frame rows (fan-out: 1 input row → many output
    rows, the mapInPandas-as-UDTF shape — the analog of the reference's
    AWK extractors emitting N rows per XML blob, awk/extract_comments.awk).

    STUB frame decode; deterministically n_frames = 1 + n_bytes % 5 and
    frame bytes = md5(payload ‖ idx). Real decode (ffmpeg frame grab)
    would replace the md5 line only — the fan-out plumbing is real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i in range(1 + len(b) % 5):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(b + f":{i}".encode()).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return df.select(id_col, payload_col).mapInPandas(batches, schema=FRAMES_SCHEMA)
