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


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode — requires PIL, which this container does not ship."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "real image decoding needs pillow; this environment ships no media "
            "libraries — use decode_image_meta (deterministic stub) instead"
        ) from exc
    raise NotImplementedError("wire PIL decode here when the dependency exists")


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub over binary media: emit one row per sampled
    offset (models video frame extraction's fan-out shape — explode over a
    computed offset sequence, no Python in the plan)."""
    n = F.col("meta.n_bytes")
    offsets = F.sequence(
        F.lit(0).cast("long"), F.greatest(n - 1, F.lit(0)).cast("long"), F.lit(every_n_bytes).cast("long")
    )
    return df.select("doc_id", F.explode(offsets).alias("frame_offset"))
