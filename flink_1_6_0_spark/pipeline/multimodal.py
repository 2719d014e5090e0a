"""Multimodal (image/audio/video) column plumbing (engine extension).

Design: media is an opaque `binary` column plus a typed metadata struct —
the row stays narrow; decode/feature-extraction runs as Arrow-batched
`mapInPandas` over the binary column only (column pruning keeps the scan
narrow when the media bytes aren't needed).

The container ships no image/audio libraries, so the actual decoders are
STUBBED: `decode_image_meta` computes a deterministic fake (md5-derived
dimensions) and `decode_image_real` raises NotImplementedError behind an
import-try — the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id long, media binary, meta struct<format: string, n_bytes: long>"


def attach_binary(df: DataFrame, id_col: str, text_col: str, fmt: str = "fakeimg") -> DataFrame:
    """Wrap a source column as an opaque media binary + metadata struct.
    (Stand-in for reading real image bytes; the testdata has no media files.)"""
    media = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.struct(F.lit(fmt).alias("format"), F.length(media).alias("n_bytes")).alias("meta"),
    )


def _fake_dims(data: bytes) -> tuple[int, int]:
    """Deterministic fake decode: md5-derived width/height (oracle-replicable:
    width = 64 + hex2int(md5[:15]) % 193, height = 64 + hex2int(md5[16:31]) % 257)."""
    h = hashlib.md5(data).hexdigest()
    return 64 + int(h[:15], 16) % 193, 64 + int(h[16:31], 16) % 257


def decode_image_meta(df: DataFrame) -> DataFrame:
    """'Decode' media → (doc_id, width, height, n_bytes) via mapInPandas.

    The batch shape is the real thing: Arrow record batches in, one pandas
    frame per batch out, no driver involvement; swap `_fake_dims` for a real
    decoder when the libs exist (see decode_image_real).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["media"].map(_fake_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_bytes": pdf["media"].map(len),
                }
            )

    return df.mapInPandas(decode, schema="doc_id long, width int, height int, n_bytes long")


def _ppm_tokens(data: bytes):
    """Netpbm header tokenizer: whitespace-separated tokens, '#' comments."""
    i = 0
    while True:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        yield data[i:j], j + 1  # token, offset just past its delimiter
        i = j


def _netpbm_header(data: bytes) -> tuple[bytes, int, int, int, int, int]:
    """Shared binary-netpbm header parse → (magic, w, h, maxval, channels,
    body_start). Raises ValueError for non-netpbm magic and for maxval > 255
    (16-bit netpbm stores TWO big-endian bytes per sample — silently
    decoding it as 1 byte/sample would interleave high/low bytes)."""
    toks = _ppm_tokens(data)
    magic, _ = next(toks)
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary netpbm image: {magic!r}")
    (w, _), (h, _), (maxval, body_start) = next(toks), next(toks), next(toks)
    w, h, maxval = int(w), int(h), int(maxval)
    if maxval > 255:
        raise ValueError(f"16-bit netpbm (maxval={maxval}) not supported: 2 bytes/sample")
    channels = 3 if magic == b"P6" else 1
    return magic, w, h, maxval, channels, body_start


def decode_ppm(data: bytes) -> dict:
    """REAL decode of binary Netpbm images (P6 RGB / P5 grayscale) — header
    parse + per-channel pixel means, pure stdlib (the point: media decode
    does not require third-party libs for every format; PIL-gated formats
    stay honestly stubbed)."""
    _, w, h, _, channels, body_start = _netpbm_header(data)
    px = data[body_start : body_start + w * h * channels]
    if len(px) != w * h * channels:
        raise ValueError("truncated pixel data")
    sums = [0] * channels
    for i, b in enumerate(px):
        sums[i % channels] += b
    n = w * h
    # exact int sum / exact int count: bit-identical IEEE division in any
    # engine — no rounding here (Python round() half-to-even vs SQL
    # half-away diverges on ties; leave rounding to the consumer).
    # Zero-pixel images (w*h == 0) are structurally valid netpbm: means are
    # NULL, not a ZeroDivisionError that would sink the whole batch.
    means = ([s / n for s in sums] if n else [None] * channels) + [None] * (3 - channels)
    return {
        "kind": "image", "width": w, "height": h, "channels": channels,
        "mean_c0": means[0], "mean_c1": means[1], "mean_c2": means[2],
        "sample_rate": None, "n_samples": None,
    }


def decode_wav(data: bytes) -> dict:
    """REAL decode of RIFF/WAVE audio: fmt-chunk walk + PCM16 mean |amp|,
    pure stdlib ``struct``/``array``."""
    import struct

    if data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, pcm = 12, None, b""
    while i + 8 <= len(data):
        cid, size = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("missing fmt chunk")
    _, channels, sample_rate, _, block_align, bits = fmt
    n_samples = len(pcm) // block_align if block_align else 0
    mean_abs = None
    if bits == 16 and pcm:
        import array

        a = array.array("h")
        a.frombytes(pcm[: (len(pcm) // 2) * 2])
        mean_abs = sum(abs(v) for v in a) / len(a)  # exact ints → exact division
    return {
        "kind": "audio", "width": None, "height": None, "channels": channels,
        "mean_c0": mean_abs, "mean_c1": None, "mean_c2": None,
        "sample_rate": sample_rate, "n_samples": n_samples,
    }


_REAL_DECODERS = {"ppm": decode_ppm, "pgm": decode_ppm, "wav": decode_wav}

MEDIA_DECODE_SCHEMA = (
    "doc_id long, kind string, width int, height int, channels int, "
    "mean_c0 double, mean_c1 double, mean_c2 double, sample_rate int, n_samples long"
)


def decode_media(df: DataFrame) -> DataFrame:
    """Dispatch real decoders by ``meta.format`` over Arrow batches — the
    production shape: one mapInPandas over the pruned (doc_id, media, format)
    columns, one output row per media object. Unknown formats raise (the
    PIL-gated path below)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media, fmt in zip(pdf["doc_id"], pdf["media"], pdf["fmt"]):
                dec = _REAL_DECODERS.get(fmt)
                if dec is None:
                    raise NotImplementedError(
                        f"format {fmt!r} needs an external decoder (PIL/ffmpeg) "
                        "not shipped in this environment"
                    )
                rows.append({"doc_id": doc_id, **dec(bytes(media))})
            yield pd.DataFrame(rows)

    pruned = df.select("doc_id", "media", F.col("meta.format").alias("fmt"))
    return pruned.mapInPandas(decode, schema=MEDIA_DECODE_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode for formats that need PIL (JPEG/PNG/...) — the
    container ships no media libraries, so this stays honestly gated; PPM/
    PGM/WAV decode for real via ``decode_media`` above."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "JPEG/PNG decoding needs pillow; this environment ships no media "
            "libraries — PPM/PGM/WAV have native decoders (decode_media), "
            "other formats use decode_image_meta (deterministic stub)"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the dependency exists")


def resize_box(data: bytes, fx: int = 2, fy: int = 2) -> bytes:
    """REAL image resize: integer box-average downscale of a binary netpbm
    image by (fx, fy) — the resize step of a multimodal training pipeline
    (thumbnail/patch normalization before feature extraction). Pure stdlib
    on the decoded pixel grid; each output sample is
    ``floor(sum(box) / (fx*fy))`` (exact integer arithmetic → deterministic
    on any engine), re-encoded as the same netpbm flavor. Trailing rows/
    columns that do not fill a whole box are dropped (floor dims), matching
    the convolutional downsample convention."""
    magic, w, h, maxval, channels, body = _netpbm_header(data)
    nw, nh = w // fx, h // fy
    if nw == 0 or nh == 0:
        # an image smaller than one box would silently encode a 0-dim netpbm
        # that a later decode divides by zero on — fail at the cause instead
        raise ValueError(
            f"image {w}x{h} smaller than one {fx}x{fy} box — resize would be empty"
        )
    px = data[body : body + w * h * channels]
    if len(px) != w * h * channels:
        raise ValueError("truncated pixel data")
    area = fx * fy
    out = bytearray()
    for r in range(nh):
        for c in range(nw):
            for ch in range(channels):
                s = 0
                for dy in range(fy):
                    base = ((r * fy + dy) * w + c * fx) * channels + ch
                    s += sum(px[base + dx * channels] for dx in range(fx))
                out.append(s // area)
    header = magic + b"\n" + f"{nw} {nh}\n{maxval}\n".encode("ascii")
    return bytes(header) + bytes(out)


def resize_media(df: DataFrame, fx: int = 2, fy: int = 2) -> DataFrame:
    """Distributed resize over Arrow batches: decode → box-average → re-encode
    inside one mapInPandas pass, refreshing the typed metadata (width/height/
    n_bytes) alongside the new binary. Same plumbing contract as
    decode_media: media stays an opaque binary column, metadata is the typed
    struct, no driver involvement, one output row per input image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media, fmt in zip(pdf["doc_id"], pdf["media"], pdf["fmt"]):
                if fmt not in ("pgm", "ppm"):
                    raise NotImplementedError(
                        f"resize for format {fmt!r} needs an external codec "
                        "(PIL/ffmpeg) not shipped in this environment"
                    )
                resized = resize_box(bytes(media), fx, fy)
                _, nw, nh, _, _, nbody = _netpbm_header(resized)
                rows.append(
                    {"doc_id": doc_id, "media": resized, "fmt": fmt,
                     "width": nw, "height": nh, "n_bytes": len(resized)}
                )
            yield pd.DataFrame(rows)

    pruned = df.select("doc_id", "media", F.col("meta.format").alias("fmt"))
    out = pruned.mapInPandas(
        run,
        schema="doc_id long, media binary, fmt string, width int, height int, n_bytes long",
    )
    return out.select(
        "doc_id", "media",
        F.struct(
            F.col("fmt").alias("format"), F.col("n_bytes").alias("n_bytes"),
        ).alias("meta"),
        "width", "height",
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub over binary media: emit one row per sampled
    offset (models video frame extraction's fan-out shape — explode over a
    computed offset sequence, no Python in the plan). Zero-byte media emits
    NO frames — the greatest(n-1, 0) clamp exists only to keep F.sequence
    total, and without the filter it fabricated a phantom frame_offset=0
    row for empty blobs (review finding)."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0).cast("long"), F.greatest(n - 1, F.lit(0)).cast("long"), F.lit(every_n_bytes).cast("long")
    )
    return df.filter(n > 0).select("doc_id", F.explode(offsets).alias("frame_offset"))


def ahash_pgm(data: bytes, n_bits: int = 64) -> int | None:
    """Perceptual average-hash of a binary netpbm image: 1 bit per pixel
    (scan order, strictly-above-mean), packed MSB-first into an integer over
    the first ``n_bits`` pixels. Exact integer arithmetic throughout
    (pixel*n > sum avoids float mean comparisons), so any engine computes
    the identical hash. None for zero-pixel images.

    The packed value is reinterpreted as SIGNED int64 (two's complement)
    when bit 63 is set — Arrow/Spark `long` cannot hold 2^63..2^64-1, and a
    bijective reinterpretation preserves both equality and Hamming-distance
    semantics (the only operations an average-hash supports)."""
    _, w, h, _, channels, body_start = _netpbm_header(data)
    n = w * h
    if n == 0:
        return None
    # grayscale reduction for P6: per-pixel channel sum (exact ints)
    raw = data[body_start : body_start + n * channels]
    if len(raw) != n * channels:
        raise ValueError("truncated pixel data")
    px = (
        [raw[i] for i in range(n)]
        if channels == 1
        else [raw[3 * i] + raw[3 * i + 1] + raw[3 * i + 2] for i in range(n)]
    )
    total = sum(px)
    bits = 0
    take = min(n, n_bits)
    for i in range(take):
        bits = (bits << 1) | (1 if px[i] * n > total else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def media_ahash(df: DataFrame, n_bits: int = 64) -> DataFrame:
    """Average-hash over the real decode path (near-dup detection for image
    corpora: equal hashes — or small Hamming distance — bucket together the
    way MinHash bands bucket text). Same Arrow mapInPandas shape as
    decode_media; output (doc_id, ahash) with ahash NULL for empty images.

    Scale: per-doc constant work, no shuffle; the downstream near-dup pass
    is a groupBy(ahash) — the image analog of dedup_exact's one hash
    shuffle."""

    def hash_one(m) -> int | None:
        # per-row error isolation: one corrupt/non-netpbm blob in a 100 TB
        # corpus must yield NULL for that row, not kill the whole near-dup
        # pass (review finding)
        try:
            return ahash_pgm(bytes(m), n_bits)
        except (ValueError, IndexError):
            return None

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": [hash_one(m) for m in pdf["media"]],
                }
            )

    pruned = df.select("doc_id", "media")
    return pruned.mapInPandas(hash_batches, schema="doc_id long, ahash long")
