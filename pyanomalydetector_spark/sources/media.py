"""Deterministic synthesis of a REAL multimodal media table (PNG + WAV).

The round-1 multimodal path was plumbing-only (opaque payload bytes, stubbed
decode). This module makes the capability real with stdlib-only codecs:

- images: valid 8-bit grayscale PNGs (zlib + struct; CRC-correct chunks),
  pixel values from a closed-form formula of ``media_id``;
- audio: valid 16-bit mono PCM WAV (stdlib ``wave``), samples from a
  closed-form formula of ``media_id``.

Because the pixel/sample formulas are closed-form, the DuckDB oracle can
compute the EXPECTED decoded features arithmetically (generate_series over
the formula) — so a hash-match proves the Spark-side decoder genuinely
decodes the bytes, not that two stubs agree. The payload digest is stored at
synthesis time and recomputed by the engine from the raw bytes (DuckDB can't
hash BLOBs), which pins byte-identity of the payload column.

Reference analog: the frozen fixture discipline of
/root/reference/testdata/csv (pinned snapshots both sides read), applied to
binary media.
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

AUDIO_RATE = 8000

_CACHE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "data", "media")


# ------------------------------------------------------------ PNG codec ----

def encode_png(arr: np.ndarray) -> bytes:
    """Minimal but spec-correct PNG encoder: 8-bit grayscale, filter 0
    scanlines, one zlib IDAT, CRC on every chunk."""
    if arr.dtype != np.uint8 or arr.ndim != 2:
        raise ValueError("encode_png expects a uint8 [h, w] array")
    h, w = arr.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode for 8-bit grayscale: chunk walk, zlib inflate, and
    full scanline unfiltering (filter types 0-4 incl. Paeth) — not a stub."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat = 8, bytearray()
    w = h = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    stride = w + 1
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(raw, np.uint8, w, y * stride + 1).astype(np.int32)
        if ft == 0:                       # None
            cur = line
        elif ft == 2:                     # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):             # Sub / Average / Paeth: sequential
            cur = np.zeros(w, dtype=np.int32)
            for x in range(w):
                a = cur[x - 1] if x > 0 else 0
                b = prev[x]
                c = prev[x - 1] if x > 0 else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa_ <= pb_ and pa_ <= pc_ else \
                        (b if pb_ <= pc_ else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


# ------------------------------------------------------------ WAV codec ----

# ------------------------------------------------------- video container ----

VID_MAGIC = b"PNGV"


def encode_vid(frames: list) -> bytes:
    """Minimal REAL video container: magic + u32 frame count + per-frame
    u32-length-prefixed PNG (each frame through the spec-correct PNG
    encoder above). Deliberately codec-honest: every frame is a genuinely
    compressed, CRC-checked image — decoding requires real inflate +
    unfilter work per frame, so a passing round-trip proves actual
    decoding, not byte-copying."""
    out = [VID_MAGIC, struct.pack(">I", len(frames))]
    for f in frames:
        p = encode_png(f)
        out.append(struct.pack(">I", len(p)))
        out.append(p)
    return b"".join(out)


def vid_frame_spans(data: bytes) -> list:
    """Walk the PNGV header: list of (offset, length) of each frame's PNG
    bytes — O(n_frames) u32 reads, no decoding. Shared by full decode and
    selective frame sampling (which decodes only the picked frames)."""
    if data[:4] != VID_MAGIC:
        raise ValueError("not a PNGV payload")
    (n,) = struct.unpack(">I", data[4:8])
    off, spans = 8, []
    for _ in range(n):
        (ln,) = struct.unpack(">I", data[off:off + 4])
        off += 4
        spans.append((off, ln))
        off += ln
    return spans


def decode_vid(data: bytes) -> list:
    """Decode the PNGV container back to its frames (list of uint8 [h, w]
    arrays)."""
    return [decode_png(data[o:o + ln]) for o, ln in vid_frame_spans(data)]


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """16-bit mono PCM WAV via the stdlib ``wave`` writer."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode via the stdlib ``wave`` reader."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getnchannels() != 1 or f.getsampwidth() != 2:
            raise ValueError("only 16-bit mono supported")
        samples = np.frombuffer(f.readframes(f.getnframes()), dtype="<i2")
        return samples.astype(np.int32), f.getframerate()


# ----------------------------------------------------- deterministic gen ----

def image_dims(mid: int) -> tuple[int, int]:
    return 16 + mid % 16, 16 + mid % 8                 # (w, h)


def image_pixels(mid: int) -> np.ndarray:
    """pixel[k] = (mid*7 + k*3) % 256, row-major — closed form so the DuckDB
    oracle can recompute the decoded stats arithmetically."""
    w, h = image_dims(mid)
    k = np.arange(w * h, dtype=np.int64)
    return ((mid * 7 + k * 3) % 256).astype(np.uint8).reshape(h, w)


def audio_samples(mid: int) -> np.ndarray:
    """sample[k] = ((mid*13 + k*7) % 2048) - 1024 (int16-safe closed form)."""
    n = 256 + mid % 256
    k = np.arange(n, dtype=np.int64)
    return (((mid * 13 + k * 7) % 2048) - 1024).astype(np.int16)


def video_dims(mid: int) -> tuple[int, int]:
    return 8 + mid % 8, 8 + mid % 5                    # (w, h) per frame


def video_frame_count(mid: int) -> int:
    return 3 + mid % 4


def video_frame_pixels(mid: int, f: int) -> np.ndarray:
    """frame f, pixel[k] = (mid*7 + f*11 + k*3) % 256, row-major — closed
    form in (mid, f, k) so the DuckDB oracle recomputes the decoded stats
    arithmetically across every frame."""
    w, h = video_dims(mid)
    k = np.arange(w * h, dtype=np.int64)
    return ((mid * 7 + f * 11 + k * 3) % 256).astype(np.uint8).reshape(h, w)


def media_parquet_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    # _v2: three-way modality split (image | audio | video) + n_frames col
    return os.path.join(_CACHE_ROOT, f"{tag}_v2.parquet")


def synthesize_media(sf_dir: str, force: bool = False) -> str:
    """Materialize the media table for ``sf_dir`` (doc_id mod 3: 0 → PNG
    image, 1 → WAV audio, 2 → PNGV video); returns the parquet path.
    Pure-Python deterministic so Spark and DuckDB read identical bytes."""
    out = media_parquet_path(sf_dir)
    if os.path.exists(out) and not force:
        return out
    os.makedirs(_CACHE_ROOT, exist_ok=True)

    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_pylist()
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "n_samples", "n_frames",
                            "digest")}
    for mid in sorted(ids):
        if mid % 3 == 0:
            arr = image_pixels(mid)
            payload = encode_png(arr)
            w, h = image_dims(mid)
            meta = ("image", w, h, 0, 0, 0)
        elif mid % 3 == 1:
            s = audio_samples(mid)
            payload = encode_wav(s, AUDIO_RATE)
            meta = ("audio", 0, 0, AUDIO_RATE, len(s), 0)
        else:
            nf = video_frame_count(mid)
            payload = encode_vid([video_frame_pixels(mid, f)
                                  for f in range(nf)])
            w, h = video_dims(mid)
            meta = ("video", w, h, 0, 0, nf)
        rows["media_id"].append(mid)
        rows["media_type"].append(meta[0])
        rows["payload"].append(payload)
        rows["width"].append(meta[1])
        rows["height"].append(meta[2])
        rows["sample_rate"].append(meta[3])
        rows["n_samples"].append(meta[4])
        rows["n_frames"].append(meta[5])
        rows["digest"].append(hashlib.sha256(payload).hexdigest()[:16])

    table = pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "media_type": pa.array(rows["media_type"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
        "n_samples": pa.array(rows["n_samples"], pa.int32()),
        "n_frames": pa.array(rows["n_frames"], pa.int32()),
        "digest": pa.array(rows["digest"], pa.string()),
    })
    tmp = out + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return out


def load_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(synthesize_media(sf_dir))
