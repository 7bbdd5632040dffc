"""Multimodal column plumbing: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a ``binary``
column next to typed metadata, keep ALL scheduling/pruning on the metadata
(so the binary bytes are only ever read by the stages that decode), and run
decode / feature-extraction as Arrow-batched ``mapInPandas`` with a bounded
``maxRecordsPerBatch`` so a batch of blobs fits executor memory.

The decode itself is STUBBED here — image/audio libraries are not available
in this environment — behind ``try: import PIL`` with a deterministic fake
(md5-derived dimensions) as fallback, clearly marked. The Spark-side plumbing
(schema, binary transport through Arrow, batch shape, partitioning) is real
and tested; swapping the fake for PIL/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, n_bytes bigint, sha string, width int, height int, kind string"
)


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for a real image decode. Derives plausible
    dimensions from the content hash — stable across engines and runs."""
    digest = hashlib.md5(blob).hexdigest()
    return {
        "n_bytes": len(blob),
        "sha": digest,
        "width": (ord(digest[0]) % 8 + 1) * 64,
        "height": (ord(digest[1]) % 8 + 1) * 64,
    }


def _real_decode(blob: bytes) -> dict:
    """Real image decode via PIL (not installed in this environment — the
    import raises NotImplementedError until it is; a skip-gated pytest
    exercises this path the day the env gains pillow). Same output contract
    as ``_fake_decode``: n_bytes / content sha / width / height."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "image decode requires PIL/pillow, which is not installed in "
            "this environment; _fake_decode carries the pipeline plumbing"
        ) from exc
    import io

    with Image.open(io.BytesIO(blob)) as im:
        width, height = im.size
    return {
        "n_bytes": len(blob),
        "sha": hashlib.md5(blob).hexdigest(),
        "width": int(width),
        "height": int(height),
    }


def decode_media(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas transformer: (media_id, blob binary, kind) → metadata.

    Uses ``_fake_decode`` UNCONDITIONALLY: the synthetic pipeline's blobs are
    utf-8 text standing in for media bytes, and the DuckDB contract oracles
    replicate the fake's md5-derived dimensions — auto-switching on PIL
    availability would break both. Real image bytes go through
    ``decode_media_real`` instead."""
    for pdf in it:
        rows = []
        for media_id, blob, kind in zip(pdf["media_id"], pdf["blob"], pdf["kind"]):
            blob = bytes(blob) if blob is not None else b""
            meta = _fake_decode(blob)
            rows.append({"media_id": int(media_id), "kind": kind, **meta})
        yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "sha", "width", "height", "kind"])


def decode_media_real(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas transformer over REAL image bytes → metadata via PIL.
    Identical batch shape/schema to ``decode_media``; raises
    NotImplementedError per batch until pillow is installed."""
    for pdf in it:
        rows = []
        for media_id, blob, kind in zip(pdf["media_id"], pdf["blob"], pdf["kind"]):
            blob = bytes(blob) if blob is not None else b""
            meta = _real_decode(blob)
            rows.append({"media_id": int(media_id), "kind": kind, **meta})
        yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "sha", "width", "height", "kind"])


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the utf-8
    bytes of ``text`` play the opaque blob role; ``kind`` cycles by id."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
    )


def media_metadata(docs: DataFrame) -> DataFrame:
    """documents → media metadata via the Arrow decode pass."""
    return media_table_from_documents(docs).mapInPandas(decode_media, MEDIA_META_SCHEMA)


RESIZED_SCHEMA = MEDIA_META_SCHEMA + ", new_width int, new_height int"


def resize_meta(max_dim: int = 256):
    """mapInPandas transformer: decode metadata → resize plan (aspect-ratio
    preserving, only downscale). The pixel work is the stubbed part; the
    dimension arithmetic, batch shape and schema are the real plumbing."""

    def _resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            out["new_width"] = (pdf["width"] * scale).astype(int)
            out["new_height"] = (pdf["height"] * scale).astype(int)
            yield out

    return _resize


def resized_media(docs: DataFrame, max_dim: int = 256) -> DataFrame:
    return media_metadata(docs).mapInPandas(resize_meta(max_dim), RESIZED_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_sha string"


def sample_frames(every_n: int = 4, max_frames: int = 64):
    """mapInPandas transformer: video metadata → one row per sampled frame.
    Frame count is derived deterministically from the blob size (the real
    decoder would read the container); frame ids are content-addressed."""

    def _frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, sha, n_bytes, kind in zip(
                pdf["media_id"], pdf["sha"], pdf["n_bytes"], pdf["kind"]
            ):
                if kind != "video":
                    continue
                n_frames = min(int(n_bytes) // 100 + 1, max_frames)
                for idx in range(0, n_frames, every_n):
                    rows.append({
                        "media_id": int(media_id),
                        "frame_idx": idx,
                        "frame_sha": hashlib.md5(f"{sha}:{idx}".encode()).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return _frames


def video_frames(docs: DataFrame, every_n: int = 4) -> DataFrame:
    return media_metadata(docs).mapInPandas(sample_frames(every_n), FRAME_SCHEMA)


def media_embeddings(docs: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: media → fixed-dim float vector, derived
    deterministically from the content hash (hex nibble i → [0,1]) — NATIVE
    column math (no UDF), so the embedding stage stays in codegen; a real
    model swap would move this into an Arrow batch pass."""
    meta = media_metadata(docs)

    def nib(i: int):
        # the double cast matters: a bare `int / 15.0` is DECIMAL division in
        # Spark SQL, which would ship Decimal objects instead of doubles
        return F.expr(
            f"cast(locate(substring(sha, {i + 1}, 1), '0123456789abcdef') - 1 as double) / 15.0"
        )

    return meta.select(
        "media_id",
        F.array(*[nib(i) for i in range(dim)]).alias("embedding"),
    )
