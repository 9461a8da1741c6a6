"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

Codec libraries are probed at import (the same optional-dependency
pattern as ``sources/iceberg.py``): when Pillow is installed,
``decode_media(codec="image")`` decodes real image payloads; otherwise
— and always for the oracle-checked queries, which pass the default —
the decode is a deterministic fake (or ``NotImplementedError`` when
``strict=True``).  Either way the Spark-side plumbing is real and
tested: the binary column schema, the mapInPandas batch shape, the
metadata struct, and the partitioning all match what a production
decode stage needs.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional codec probe — absent in the sandbox, real elsewhere
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - depends on environment
    _PILImage = None
    HAS_PIL = False


def probe_codecs() -> dict[str, bool]:
    """Which real decoders are available in this environment."""
    return {"image": HAS_PIL}

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<n_bytes:long, declared_kind:string>"
)

DECODED_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "width int, height int, n_frames int, feature array<float>"
)


def pack_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build an opaque binary media table from a text column (stand-in
    payload): payload = utf-8 bytes, typed metadata struct alongside."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col(id_col).cast("long"), F.lit(3)) + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit("synthetic").alias("declared_kind"),
        ).alias("meta"),
    )


def _fake_decode(payload: pd.Series, media_type: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: geometry derived from byte length so the
    DuckDB oracle can reproduce it from n_chars arithmetic."""
    n_bytes = payload.str.len().astype("int64")
    width = (n_bytes % 640 + 16).astype("int32")
    height = (n_bytes % 480 + 16).astype("int32")
    n_frames = np.where(media_type.to_numpy() == "video", (n_bytes % 30 + 1), 1).astype(
        "int32"
    )
    return pd.DataFrame(
        {"n_bytes": n_bytes, "width": width, "height": height, "n_frames": n_frames}
    )


def _pil_decode(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real image decode via Pillow: geometry from the actual header,
    feature = 8-bin grayscale histogram (density).  Only called when the
    probe found the library."""
    widths, heights, feats = [], [], []
    for payload in pdf["payload"]:
        img = _PILImage.open(io.BytesIO(payload))
        widths.append(img.width)
        heights.append(img.height)
        gray = np.asarray(img.convert("L"), dtype=np.float64)
        hist, _ = np.histogram(gray, bins=8, range=(0, 256), density=False)
        feats.append((hist / max(gray.size, 1)).astype(np.float32))
    n_bytes = pdf["payload"].str.len().astype("int64")
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": n_bytes,
            "width": pd.Series(widths, dtype="int32", index=pdf.index),
            "height": pd.Series(heights, dtype="int32", index=pdf.index),
            "n_frames": pd.Series(np.ones(len(pdf)), dtype="int32", index=pdf.index),
            "feature": feats,
        }
    )


def decode_media(df: DataFrame, strict: bool = False, codec: str = "fake") -> DataFrame:
    """Decode + feature-extract stage over ``mapInPandas``.

    ``codec="fake"`` (default — what every oracle-checked query uses)
    runs the deterministic fake so the plumbing (schema, batching,
    vectorization) is exercised end-to-end with byte-reproducible
    output.  ``codec="image"`` decodes real image payloads via Pillow
    when the import probe found it, and raises ImportError otherwise.
    ``strict=True`` with the fake codec raises NotImplementedError at
    the exact point a real decoder would run — the marked integration
    point for codecs this container lacks (ffmpeg/torchaudio)."""
    if codec not in ("fake", "image"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "image" and not HAS_PIL:
        raise ImportError(
            "decode_media(codec='image') requires Pillow, which probe_codecs() "
            "did not find in this environment"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "image":
                yield _pil_decode(pdf)
                continue
            if strict:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment (Pillow/ffmpeg); plug in here"
                )
            geo = _fake_decode(pdf["payload"], pdf["media_type"])
            # 8-dim fake feature vector: scaled byte-length harmonics
            base = geo["n_bytes"].to_numpy(dtype=np.float64)
            feats = np.stack(
                [np.cos(base / (i + 1.0)) for i in range(8)], axis=1
            ).astype(np.float32)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": geo["n_bytes"],
                    "width": geo["width"],
                    "height": geo["height"],
                    "n_frames": geo["n_frames"],
                    "feature": list(feats),
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode sampled frame indexes
    (0, n, 2n, ...) — pure Spark, no Python."""
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
                )
            ),
        )
        .select("media_id", "frame_idx", "width", "height")
    )
