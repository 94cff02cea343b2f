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


# ---------------------------------------------------------------- real codecs
#
# The container has no media libraries, but two container formats are
# fully decodable with the standard library alone: RIFF/WAVE PCM (the
# ``wave`` module) and uncompressed 24-bit BMP (``struct``). These
# paths are REAL end to end — actual bytes through an actual parser —
# and their payloads are synthesized deterministically from doc_id, so
# a DuckDB oracle can recompute every decoded feature in closed form:
# the driver's hash match certifies the encode->parse->extract
# roundtrip bit-for-bit (queries: audio_wav_features,
# image_bmp_features).

WAV_SAMPLE_RATE = 8000


def wav_n_frames(doc_id: int) -> int:
    return 64 + doc_id % 64


def wav_sample(doc_id: int, i: int) -> int:
    """Deterministic int16 PCM sample (the closed form the oracle
    recomputes)."""
    return (doc_id * 17 + i * 11) % 32768 - 16384


def wav_bytes(doc_id: int) -> bytes:
    """A real RIFF/WAVE file: mono 16-bit PCM at 8 kHz."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_SAMPLE_RATE)
        n = wav_n_frames(doc_id)
        w.writeframes(
            struct.pack(f"<{n}h", *(wav_sample(doc_id, i) for i in range(n)))
        )
    return buf.getvalue()


WAV_SCHEMA = (
    "doc_id long, channels int, sample_rate int, n_frames int, "
    "duration_ms double, rms double"
)


def decode_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas WAV decode: parse the RIFF container with the
    ``wave`` module, unpack PCM frames, and extract audio features
    (duration, RMS amplitude). Pure per-row -> scales by executors."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import math
        import struct
        import wave

        for pdf in batches:
            out = {
                "doc_id": [], "channels": [], "sample_rate": [],
                "n_frames": [], "duration_ms": [], "rms": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    nch, sw, rate, n = (
                        w.getnchannels(), w.getsampwidth(),
                        w.getframerate(), w.getnframes(),
                    )
                    samples = struct.unpack(
                        f"<{n * nch}h", w.readframes(n)
                    )
                sumsq = sum(s * s for s in samples)  # exact int
                out["doc_id"].append(doc_id)
                out["channels"].append(nch)
                out["sample_rate"].append(rate)
                out["n_frames"].append(n)
                out["duration_ms"].append(n * 1000.0 / rate)
                out["rms"].append(
                    round(math.sqrt(sumsq / len(samples)), 6)
                )
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(decode, schema=WAV_SCHEMA)


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize the WAV payload column (at scale: the object read
    from blob storage)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [wav_bytes(int(d)) for d in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, payload binary"
    )


def bmp_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 16 + 4, doc_id % 8 + 2


def bmp_pixel(doc_id: int, x: int, y: int, c: int) -> int:
    """Deterministic channel value, c in (0=R, 1=G, 2=B)."""
    return (doc_id * 31 + x * 7 + y * 13 + c * 5) % 256


def bmp_bytes(doc_id: int) -> bytes:
    """A real uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up
    rows, 4-byte row padding, BGR byte order)."""
    import struct

    w, h = bmp_dims(doc_id)
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        for x in range(w):
            rows += bytes(
                (
                    bmp_pixel(doc_id, x, y, 2),  # B
                    bmp_pixel(doc_id, x, y, 1),  # G
                    bmp_pixel(doc_id, x, y, 0),  # R
                )
            )
        rows += b"\x00" * (row_size - w * 3)
    return header + bytes(rows)


BMP_SCHEMA = (
    "doc_id long, width int, height int, bpp int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_bmp(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas BMP decode: parse the header with ``struct``, walk
    the padded bottom-up pixel rows, and extract per-channel means —
    a real image feature-extraction stage with no external codec."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "bpp": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                b = bytes(payload)
                magic, _sz, _r1, _r2, off = struct.unpack_from("<2sIHHI", b, 0)
                assert magic == b"BM", "not a BMP payload"
                _hsz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", b, 14)
                row_size = (w * 3 + 3) & ~3
                sums = [0, 0, 0]  # R, G, B
                for row in range(h):
                    y = h - 1 - row  # bottom-up storage
                    base = off + row * row_size
                    for x in range(w):
                        p = base + x * 3
                        sums[2] += b[p]      # B
                        sums[1] += b[p + 1]  # G
                        sums[0] += b[p + 2]  # R
                n_px = w * h
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["mean_r"].append(round(sums[0] / n_px, 6))
                out["mean_g"].append(round(sums[1] / n_px, 6))
                out["mean_b"].append(round(sums[2] / n_px, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, "payload").mapInPandas(decode, schema=BMP_SCHEMA)


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [bmp_bytes(int(d)) for d in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} long, payload binary"
    )
