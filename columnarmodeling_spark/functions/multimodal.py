"""Multimodal column plumbing (LLM-pipeline tier, BASELINE.json north star).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched pandas transforms over
``mapInPandas``.

Round 4: the decode step is no longer a pure stub. Two uncompressed
formats are decoded for real with stdlib ``struct`` parsing
(``media_codec.py``: 24-bit BMP → pixels, 16-bit PCM WAV → samples),
selected by magic-byte sniffing. Payloads in any other format — the
ones that would need PIL/ffmpeg, which this environment does not have —
fall back to the clearly-marked deterministic stub so the pipeline
still runs end-to-end. ``resize_media`` likewise does a REAL
nearest-neighbor resize + BMP re-encode for BMP payloads and keeps the
byte-budget stub otherwise.

At 100 TB the partitioning story matters more than the decode: payloads
ride in their own column (Parquet column chunk — never materialized by
queries that don't touch them thanks to column pruning), and batches
are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs cannot OOM an executor.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from columnarmodeling_spark.functions.media_codec import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    resize_nearest,
)

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, fake_width int, fake_height int"
)


def _sniff(payload: bytes) -> str:
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return "other"


def _decode_one(payload: bytes) -> dict:
    """Decode one payload: REAL parse for BMP/WAV (dimensions land in
    the width/height fields), deterministic stub features otherwise.
    A production build adds the PIL/ffmpeg formats in the same slot —
    signature, schema and batching stay identical.

    Sniffing is a 2-4 byte prefix check, so arbitrary binary (or UTF-8
    text routed through this op, as q72 does) can false-positive; a
    payload that *sniffs* like BMP/WAV but fails to parse (truncated,
    compressed, non-24-bit, non-PCM, …) degrades to the stub row rather
    than failing the Spark stage."""
    digest = hashlib.md5(payload).hexdigest()
    n = len(payload)
    kind = _sniff(payload)
    if kind == "bmp":
        try:
            img = decode_bmp(payload)
            return {
                "n_bytes": n,
                "digest": digest,
                "fake_width": img.shape[1],
                "fake_height": img.shape[0],
            }
        except (ValueError, struct.error):
            pass
    elif kind == "wav":
        try:
            rate, channels, samples = decode_wav(payload)
            return {
                "n_bytes": n,
                "digest": digest,
                "fake_width": int(len(samples) // max(channels, 1)),
                "fake_height": channels,
            }
        except (ValueError, struct.error):
            pass
    return {
        "n_bytes": n,
        "digest": digest,
        "fake_width": n % 640,
        "fake_height": n % 480,
    }


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode: binary column → feature rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


MEDIA_RICH_SCHEMA = (
    "doc_id long, kind string, width int, height int, channels int, "
    "sample_rate int, n_samples long, mean_r double, mean_g double, "
    "mean_b double, mean_amp double"
)


def decode_media_rich(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Full bytes→content decode for the formats the stdlib can parse:
    per-channel pixel means for BMP, sample stats for WAV, nulls for
    the fields the other modality doesn't have. Channel sums are exact
    integer arithmetic in float64 (pixel/sample counts ≪ 2^53), so the
    means are engine-exact and oracle-checkable."""

    def one(doc_id: int, payload: bytes) -> dict:
        kind = _sniff(payload)
        row = {
            "doc_id": doc_id, "kind": kind, "width": None, "height": None,
            "channels": None, "sample_rate": None, "n_samples": None,
            "mean_r": None, "mean_g": None, "mean_b": None, "mean_amp": None,
        }
        try:
            if kind == "bmp":
                img = decode_bmp(payload)
                sums = img.reshape(-1, 3).astype(np.float64).sum(axis=0)
                npx = float(img.shape[0] * img.shape[1])
                row.update(
                    width=img.shape[1], height=img.shape[0], channels=3,
                    mean_r=sums[0] / npx, mean_g=sums[1] / npx,
                    mean_b=sums[2] / npx,
                )
            elif kind == "wav":
                rate, channels, samples = decode_wav(payload)
                row.update(
                    channels=channels, sample_rate=rate,
                    n_samples=int(len(samples) // max(channels, 1)),
                    mean_amp=float(
                        np.abs(samples.astype(np.float64)).sum()
                        / max(len(samples), 1)
                    ),
                )
        except (ValueError, struct.error):
            # sniff false-positive / unsupported variant: report the
            # sniffed kind with null content fields instead of failing
            # the stage
            row["kind"] = f"{kind}-unparsed"
        return row

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [one(int(i), p) for i, p in zip(pdf[id_col], pdf[payload_col])]
            )

    return df.mapInPandas(run, schema=MEDIA_RICH_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, n_bytes long, out_bytes long, out_digest string"
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched resize: REAL for BMP payloads (nearest-neighbor
    raster resample to (width, height), re-encoded as BMP); the
    deterministic byte-budget stand-in for other formats (truncate to
    width*height/8 bytes — as if 1 bit/pixel) so output size, schema,
    and batch shape behave like the real op either way. Partitioning
    and batching notes as in ``decode_media``."""
    budget = width * height // 8

    def one(payload: bytes) -> bytes:
        if _sniff(payload) == "bmp":
            try:
                return encode_bmp(resize_nearest(decode_bmp(payload), width, height))
            except (ValueError, struct.error):
                # decode_bmp raises ValueError for every malformed input
                # (incl. short headers); struct.error stays as defense
                # in depth should a codec edge regress → stub path
                pass
        return payload[:budget]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                out = one(p)
                rows.append(
                    {
                        "doc_id": int(i),
                        "n_bytes": len(p),
                        "out_bytes": len(out),
                        "out_digest": hashlib.md5(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
