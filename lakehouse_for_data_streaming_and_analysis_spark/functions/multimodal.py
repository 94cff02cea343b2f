"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

A training-data pipeline at 100 TB treats image/audio/video as
``binary`` columns with typed metadata and runs decode / resize /
frame-sample as vectorized Python stages. The Spark-side contract here
is real — schema, batch shape, partition behavior are all exercised —
while the actual media codecs are STUBBED: the container has no
image/audio libraries, so ``decode_media`` computes deterministic
metadata (byte length, sha-256, fake dimensions derived from length)
and the real-codec hooks raise ``NotImplementedError`` unless
PIL/soundfile are importable.

No counterpart exists in the reference (its only binary column is the
transient Kafka ``value``, Sourcecode/spark/etl.py:20); this extends
the engine per the rebuild mandate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real image decode path (absent in this container)
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, channels int, sha_hex string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of the
    text stand in for media bytes; at scale this is the raw object
    read from blob storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_dims(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec's (width, height, channels)."""
    return n_bytes % 64 + 1, (n_bytes // 64) % 64 + 1, 3


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: binary payload -> typed metadata.

    Arrow ships each partition to Python in column batches; the UDF is
    pure per-row so partitioning/ordering are irrelevant — the stage
    scales by adding executors. Swap ``_fake_dims`` for a real codec
    (PIL etc.) without touching the Spark plan.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.str.len().astype("int32")
            dims = [_fake_dims(n) for n in n_bytes]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "sha_hex": [hashlib.sha256(b).hexdigest() for b in payloads],
                }
            )

    return df.select(id_col, "payload").mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """Real-codec hook: decode an image payload to (width, height,
    channels, pixel array). STUB — raises unless PIL is installed."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        )
    import io

    import PIL.Image as Image

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, len(img.getbands()), img


def frame_sample_indices(n_frames_col: str, every_n: int):
    """Column expr: indices of sampled frames [0, every_n, 2*every_n...)
    — the video frame-sampling plan, runnable without a video codec."""
    return F.sequence(
        F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)
    )
