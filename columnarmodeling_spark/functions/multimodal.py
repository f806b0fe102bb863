"""Multimodal column plumbing (LLM-pipeline tier, BASELINE.json north star).

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, processed by Arrow-batched pandas transforms over
``mapInPandas``. The actual media decode (PIL/ffmpeg/torchaudio) is NOT
available in this environment — per the build contract it is STUBBED:
``decode_media`` computes deterministic pseudo-features (byte length,
md5 digest, fake dimensions derived from the byte length) so the
Spark-side plumbing — schema, batch shape, partitioning — is fully real
and testable, while the media-library call sites are clearly marked.

At 100 TB the partitioning story matters more than the decode: payloads
ride in their own column (Parquet column chunk — never materialized by
queries that don't touch them thanks to column pruning), and batches
are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs cannot OOM an executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, fake_width int, fake_height int"
)


def _decode_one(payload: bytes) -> dict:
    """STUB decode: deterministic fake features in place of a real media
    decode. A production build replaces the body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` — the signature, schema and
    batching stay identical."""
    digest = hashlib.md5(payload).hexdigest()
    n = len(payload)
    return {
        "n_bytes": n,
        "digest": digest,
        "fake_width": n % 640,
        "fake_height": n % 480,
    }


def decode_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched 'decode': binary column → feature rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


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
    """Arrow-batched 'resize' STUB: binary payload → resized payload
    features. A production build decodes, resizes to (width, height)
    and re-encodes (``PIL.Image.resize`` / ffmpeg scale filter); the
    deterministic stand-in truncates the payload to the byte budget of
    the target raster (width*height/8 — as if 1 bit/pixel) so output
    size, schema, and batch shape behave like the real op. Partitioning
    and batching notes as in ``decode_media``."""
    budget = width * height // 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                out = p[:budget]
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
