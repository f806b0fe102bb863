"""Binary snapshot codec (SURVEY §2.1 S9).

The reference's solver emits one binary file per 250 steps: an int32
particle count N, then N×4 little-endian float32 values (4 of the 9
per-particle items selected by the ``PosItem.ini`` bitmap). Verified
layouts: Uniaxial 2 000 004 B = 4 + 125 000×4×4; Brazil 790 404 B =
4 + 49 400×4×4 (``/root/reference/*/Output/MLSOut*.bin``).

Engine form: the snapshot series is stored as Parquet partitioned by
``step`` (filename-embedded step → partition pruning, SURVEY §4), and
this codec converts between the reference's raw-bytes layout and rows.
Encode/decode are Arrow-batched pandas transforms (``applyInPandas`` /
``mapInPandas``) — numpy struct-packing per batch, never per-row Python.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FIELDS = ["f1", "f2", "f3", "f4"]


def encode_groups(
    df: DataFrame, group_col: str, value_cols: list[str]
) -> DataFrame:
    """Pack each group's rows (ordered by the first value col) into one
    reference-layout binary blob: int32 N + N×len(value_cols) float32 LE.

    Returns ``DataFrame[group: long, payload: binary]``.
    """
    n_fields = len(value_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(value_cols[0], kind="mergesort")
        mat = pdf[value_cols].to_numpy(dtype="<f4")  # row-major N×k
        payload = struct.pack("<i", len(pdf)) + mat.tobytes(order="C")
        return pd.DataFrame(
            {"group": [pdf[group_col].iloc[0]], "payload": [payload]}
        )

    return df.groupBy(group_col).applyInPandas(
        pack, schema="group long, payload binary"
    )


def decode_blobs(blobs: DataFrame, n_fields: int = 4) -> DataFrame:
    """Unpack reference-layout blobs back to rows.

    Input ``DataFrame[group: long, payload: binary]`` → output
    ``DataFrame[group: long, idx: long, f1..fk: float]`` where ``idx``
    is the in-file row position (the reference identifies particles by
    file order, SURVEY §1.1).
    """

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for group, payload in zip(pdf["group"], pdf["payload"]):
                n = struct.unpack("<i", payload[:4])[0]
                mat = np.frombuffer(
                    payload, dtype="<f4", count=n * n_fields, offset=4
                ).reshape(n, n_fields)
                out = pd.DataFrame(
                    {f"f{i + 1}": mat[:, i] for i in range(n_fields)}
                )
                out.insert(0, "idx", np.arange(n, dtype="int64"))
                out.insert(0, "group", np.int64(group))
                frames.append(out)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = "group long, idx long, " + ", ".join(
        f"f{i + 1} float" for i in range(n_fields)
    )
    return blobs.mapInPandas(unpack, schema=schema)
