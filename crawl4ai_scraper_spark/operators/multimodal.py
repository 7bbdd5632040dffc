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


# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (zlib + struct): REAL decode without pillow.
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (palette decodes to 1 index sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_encode(width: int, height: int, pixel, color_type: int = 0,
               filter_for_row=None) -> bytes:
    """Minimal PNG writer (test/fixture encoder — the decoder below is the
    production path). ``pixel(x, y, c) -> 0..255`` supplies samples;
    ``filter_for_row(y) -> 0..4`` picks the per-scanline filter (default 0),
    letting fixtures exercise every filter type the decoder must invert.
    8-bit, non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA)."""
    import struct
    import zlib

    ch = _PNG_CHANNELS[color_type]
    stride = width * ch

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        line = bytearray(
            pixel(x, y, c) & 255 for x in range(width) for c in range(ch)
        )
        f = (filter_for_row(y) if filter_for_row else 0) % 5
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            cc = prev[i - ch] if i >= ch else 0
            if f == 0:
                filt[i] = line[i]
            elif f == 1:
                filt[i] = (line[i] - a) & 255
            elif f == 2:
                filt[i] = (line[i] - b) & 255
            elif f == 3:
                filt[i] = (line[i] - ((a + b) >> 1)) & 255
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                filt[i] = (line[i] - pr) & 255
        raw.append(f)
        raw += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def png_decode(blob: bytes) -> dict:
    """REAL PNG decode on the stdlib alone: header fields from IHDR, the
    pixel data zlib-inflated from IDAT and de-filtered (all five scanline
    filters: None/Sub/Up/Average/Paeth), pixel stats over the decoded
    samples. 8-bit non-interlaced PNGs of any color type (palette images
    report stats over the palette INDICES). Raises ValueError on non-PNG or
    unsupported variants (16-bit, Adam7) — callers fall back accordingly.

    Returns width / height / channels / bit_depth / px_sum / px_min /
    px_max over the decoded sample bytes."""
    import struct
    import zlib

    if not blob.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(_PNG_MAGIC), None, []
    try:
        while pos + 8 <= len(blob):
            (length,) = struct.unpack(">I", blob[pos:pos + 4])
            ctype = blob[pos + 4:pos + 8]
            data = blob[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + length  # length + type + data + CRC
    except struct.error as exc:  # chunk header/IHDR shorter than declared
        raise ValueError(f"truncated PNG chunk: {exc}") from exc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError("unsupported PNG variant")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel stream: {exc}") from exc
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    px_sum, px_min, px_max = 0, 255, 0
    prev = bytearray(stride)
    p = 0
    for _y in range(height):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 255
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                cc = prev[i - ch] if i >= ch else 0
                pp = a + b - cc
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[i] = (line[i] + pr) & 255
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        px_sum += sum(line)
        if line:
            mn, mx = min(line), max(line)
            px_min = mn if mn < px_min else px_min
            px_max = mx if mx > px_max else px_max
        prev = line
    return {
        "width": int(width), "height": int(height), "channels": ch,
        "bit_depth": int(bit_depth), "px_sum": int(px_sum),
        "px_min": int(px_min), "px_max": int(px_max),
    }


def _real_decode(blob: bytes) -> dict:
    """Real image decode. PNG bytes decode on the stdlib alone (``png_decode``
    — dimensions straight from IHDR, pixels actually inflated and
    de-filtered); other formats still need PIL, which this environment lacks
    (the import raises NotImplementedError until it is installed; a
    skip-gated pytest exercises that path the day the env gains pillow).
    Same output contract as ``_fake_decode``: n_bytes / content sha /
    width / height."""
    if blob.startswith(_PNG_MAGIC):
        try:
            meta = png_decode(blob)
        except ValueError as decode_err:
            # variant outside the stdlib codec (16-bit, Adam7, malformed):
            # fall through to PIL when available; re-raise the DECODE error
            # otherwise so the caller sees a decode failure, not a
            # missing-library error
            try:
                from PIL import Image  # noqa: F401
            except ImportError:
                raise decode_err
        else:
            return {
                "n_bytes": len(blob),
                "sha": hashlib.md5(blob).hexdigest(),
                "width": meta["width"],
                "height": meta["height"],
            }
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "non-PNG image decode requires PIL/pillow, which is not installed "
            "in this environment; PNG decodes via the stdlib codec above"
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


PNG_STATS_SCHEMA = ("media_id bigint, width int, height int, channels int, "
                    "bit_depth int, px_sum bigint, px_min int, px_max int")


def png_roundtrip_stats(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL-decode evidence without pillow: per id, synthesize a deterministic
    PNG (``png_encode`` — dimensions, color type, per-row filter type and
    pixel values all functions of the id, cycling through ALL five scanline
    filters) and decode it with the stdlib ``png_decode``, emitting the
    decoded header fields + pixel stats. The encode and decode are
    independent inverses, and the contract oracle recomputes the expected
    stats in closed form — so a filter-inversion bug anywhere fails the row.

    Arrow-batched mapInPandas over ids only (the blob never leaves the
    executor); scales like any narrow map."""
    def _stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                d = int(mid)
                w, h = 2 + d % 7, 1 + d % 5
                ctype = 0 if d % 2 == 0 else 2
                blob = png_encode(
                    w, h,
                    pixel=lambda x, y, c, d=d: (3 * d + 11 * y + 7 * c) % 256,
                    color_type=ctype,
                    filter_for_row=lambda y, d=d: (d + y) % 5,
                )
                meta = png_decode(blob)
                rows.append({"media_id": d, **meta})
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels",
                               "bit_depth", "px_sum", "px_min", "px_max"])

    return ids.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _stats, PNG_STATS_SCHEMA
    )


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
