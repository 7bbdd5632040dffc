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


def _real_decode(blob: bytes) -> dict:  # pragma: no cover - env has no PIL
    """STUB: real decode path. Raises until an image library is installed."""
    raise NotImplementedError(
        "image decode requires PIL/pillow, which is not installed in this "
        "environment; _fake_decode carries the pipeline plumbing"
    )


try:  # decode backend selection, import-gated
    import PIL  # noqa: F401

    _DECODE = _real_decode
except ImportError:
    _DECODE = _fake_decode


def decode_media(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas transformer: (media_id, blob binary, kind) → metadata."""
    for pdf in it:
        rows = []
        for media_id, blob, kind in zip(pdf["media_id"], pdf["blob"], pdf["kind"]):
            blob = bytes(blob) if blob is not None else b""
            meta = _DECODE(blob)
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
