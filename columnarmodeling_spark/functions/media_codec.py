"""Stdlib-only media codecs: uncompressed 24-bit BMP and 16-bit PCM WAV.

Round-4 upgrade of the multimodal tier (round-2 verdict, "What's
missing" #4): the container has no PIL/ffmpeg, but these two formats
are fully decodable with ``struct`` alone, so the bytes→pixels /
bytes→samples step can be REAL for them while other formats keep the
clearly-marked deterministic stub. Everything here is pure
bytes↔numpy — the Spark plumbing (Arrow batches, schema, partitioning)
lives in ``multimodal.py`` and is shared with the stub path.

Format facts used (public file-format knowledge):

- BMP: 14-byte file header (``BM``, file size, pixel-array offset) +
  40-byte BITMAPINFOHEADER (width, height, planes, bpp, compression).
  Uncompressed 24-bit pixels are stored bottom-up, BGR, each row padded
  to a 4-byte boundary. Positive height = bottom-up.
- WAV: RIFF container (``RIFF`` size ``WAVE``) with a ``fmt `` chunk
  (PCM tag 1, channels, sample rate, bits/sample) and a ``data`` chunk
  of little-endian samples; chunks are word-aligned.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"
_BMP_HEADER = 14 + 40  # file header + BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → uncompressed 24-bit BMP bytes."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_size = (w * 3 + 3) // 4 * 4
    image_size = row_size * h
    file_size = _BMP_HEADER + image_size
    out = bytearray()
    out += struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, _BMP_HEADER)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = pixels[y, :, ::-1]  # RGB → BGR
        out += row.tobytes() + pad
    return bytes(out)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes → RGB uint8 array (h, w, 3).

    Raises ``ValueError`` on any unsupported variant (compression,
    other bit depths, top-down images) rather than guessing.
    """
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    if len(payload) < _BMP_HEADER:
        # malformed inputs raise ValueError uniformly, never struct.error
        raise ValueError("BMP payload shorter than the 54-byte header")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0 or h <= 0 or w <= 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size} bpp={bpp} comp={compression})"
        )
    if offset < _BMP_HEADER:
        # a pixel offset inside the 54-byte header would read header
        # bytes as pixels; the bound check below can't catch it alone
        raise ValueError(f"BMP pixel offset {offset} overlaps the header")
    row_size = (w * 3 + 3) // 4 * 4
    if offset + h * row_size > len(payload):
        # also bounds the (h, w, 3) allocation against hostile headers
        raise ValueError("BMP pixel array exceeds payload size")
    img = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        start = offset + i * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=start)
        img[h - 1 - i] = row.reshape(w, 3)[:, ::-1]  # BGR → RGB, bottom-up
    return img


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor raster resize — the PIL.Image.resize(NEAREST)
    semantics (sample at the scaled pixel center), stdlib+numpy only."""
    h, w, _ = pixels.shape
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return pixels[np.ix_(ys, xs)]


WAV_MAGIC = b"RIFF"


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """int16 sample array → 16-bit PCM WAV bytes (interleaved if the
    array is (n, channels))."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    out = bytearray()
    out += struct.pack("<4sI4s", WAV_MAGIC, 36 + len(data), b"WAVE")
    out += struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        channels * 2, 16,
    )
    out += struct.pack("<4sI", b"data", len(data))
    out += data
    if len(data) % 2:
        out += b"\x00"
    return bytes(out)


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """16-bit PCM WAV bytes → (sample_rate, channels, int16 samples).

    Walks the RIFF chunk list (word-aligned), so extra chunks before
    ``data`` are tolerated; raises ``ValueError`` for non-PCM or
    non-16-bit payloads.
    """
    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # declared chunk size overruns the payload: a truncated file
            # must fail loudly, not yield plausible stats over a prefix
            raise ValueError(f"truncated {cid!r} chunk ({len(body)}/{size} B)")
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_format} bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, samples
