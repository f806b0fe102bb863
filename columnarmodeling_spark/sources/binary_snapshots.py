"""Binary snapshot codec (SURVEY §2.1 S9).

The reference's solver emits one binary file per 250 steps: an int32
particle count N, then N×k little-endian float32 values, where the k
fields are selected by the 28-flag ``PosItem.ini`` bitmap out of the
per-particle item list (the 9 documented items ``UX UY UZ VX VY VZ
EPSX EPSY EPSZ``, ``SysFile.ini:36-44``, plus undocumented tail slots).
Verified layouts (k=4 in the shipped cases, ``PosItem.ini:1``):
Uniaxial 2 000 004 B = 4 + 125 000×4×4; Brazil 790 404 B =
4 + 49 400×4×4 (``/root/reference/*/Output/MLSOut*.bin``). A case with
a different bitmap writes a different field count AND different field
meanings — the codec is parameterized by the bitmap, not hardcoded.

Engine form: the snapshot series is stored as Parquet partitioned by
``step`` (filename-embedded step → partition pruning, SURVEY §4), and
this codec converts between the reference's raw-bytes layout and rows.
Encode/decode are Arrow-batched pandas transforms (``applyInPandas`` /
``mapInPandas``) — numpy struct-packing per batch, never per-row Python.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FIELDS = ["f1", "f2", "f3", "f4"]

N_POSITEM_FLAGS = 28

# The per-particle item axis the bitmap indexes: 9 documented names
# (SysFile.ini:36-44) then anonymous tail slots up to flag 28.
ITEM_NAMES: tuple[str, ...] = (
    "ux", "uy", "uz", "vx", "vy", "vz", "epsx", "epsy", "epsz",
) + tuple(f"item{i}" for i in range(10, N_POSITEM_FLAGS + 1))

# The shipped uniaxial case's bitmap (PosItem.ini:1): flags 5,6,7,21
# (1-based) → fields (vy, vz, epsx, item21), k=4.
UNIAXIAL_POSITEM = (
    "0 0 0 0 1 1 1 0 0 0 0 0 0 0 0 0 0 0 0 0 1 0 0 0 0 0 0 0"
)


def parse_positem(line: str) -> tuple[int, ...]:
    """Parse a ``PosItem.ini`` flag line into a 28-int bitmap."""
    flags = tuple(int(tok) for tok in line.split())
    if len(flags) != N_POSITEM_FLAGS or any(f not in (0, 1) for f in flags):
        raise ValueError(
            f"PosItem bitmap must be {N_POSITEM_FLAGS} 0/1 flags, "
            f"got {line!r}"
        )
    return flags


def bitmap_fields(bitmap: Sequence[int] | str) -> list[str]:
    """Selected item names, in flag order, for a PosItem bitmap."""
    if isinstance(bitmap, str):
        bitmap = parse_positem(bitmap)
    if len(bitmap) != N_POSITEM_FLAGS:
        raise ValueError(
            f"bitmap must have {N_POSITEM_FLAGS} flags, got {len(bitmap)}"
        )
    return [ITEM_NAMES[i] for i, f in enumerate(bitmap) if f]


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


def decode_blobs(
    blobs: DataFrame,
    n_fields: int = 4,
    bitmap: Sequence[int] | str | None = None,
) -> DataFrame:
    """Unpack reference-layout blobs back to rows.

    Input ``DataFrame[group: long, payload: binary]`` → output
    ``DataFrame[group: long, idx: long, <field cols>: float]`` where
    ``idx`` is the in-file row position (the reference identifies
    particles by file order, SURVEY §1.1).

    With *bitmap* (a ``PosItem.ini`` flag line or 28-int sequence), the
    field count AND names come from the bitmap — the decoded columns
    are the selected item names (e.g. the shipped uniaxial bitmap →
    ``vy, vz, epsx, item21``), so a case with a different bitmap
    decodes to differently-shaped, correctly-labeled rows instead of
    mis-decoding. Without it, *n_fields* anonymous columns ``f1..fk``
    (the pre-round-6 surface). Payloads whose byte length does not
    match ``4 + N×k×4`` for the expected k raise loudly.
    """
    if bitmap is not None:
        names = bitmap_fields(bitmap)
        n_fields = len(names)
    else:
        names = [f"f{i + 1}" for i in range(n_fields)]

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for group, payload in zip(pdf["group"], pdf["payload"]):
                n = struct.unpack("<i", payload[:4])[0]
                if len(payload) != 4 + n * n_fields * 4:
                    raise ValueError(
                        f"snapshot payload of group {group}: "
                        f"{len(payload)} bytes does not match "
                        f"4 + {n}x{n_fields}x4 — wrong PosItem bitmap?"
                    )
                mat = np.frombuffer(
                    payload, dtype="<f4", count=n * n_fields, offset=4
                ).reshape(n, n_fields)
                out = pd.DataFrame(
                    {name: mat[:, i] for i, name in enumerate(names)}
                )
                out.insert(0, "idx", np.arange(n, dtype="int64"))
                out.insert(0, "group", np.int64(group))
                frames.append(out)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = "group long, idx long, " + ", ".join(
        f"{name} float" for name in names
    )
    return blobs.mapInPandas(unpack, schema=schema)
