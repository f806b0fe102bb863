"""Unit tests for the I/O tier (SURVEY §2.1): arity-tolerant point scan,
count-headed table, edge list, two-section positional scan, binary
snapshot codec round-trip, fixed-format sinks."""

from __future__ import annotations

import glob
import struct

import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.sources.binary_snapshots import (
    decode_blobs,
    encode_groups,
)
from columnarmodeling_spark.sources.sinks import (
    fixed_point_line,
    vertex_line,
    write_lines,
)
from columnarmodeling_spark.sources.text_tables import (
    read_count_headed,
    read_edge_list,
    read_point_table,
    read_point_table_rejects,
    read_two_section,
)


@pytest.fixture()
def point_file(tmp_path):
    # mirrors BooleanOperation.py:43-66 input: 2-or-3 col lines + junk
    p = tmp_path / "points.txt"
    p.write_text(
        "1.5 2.5 3.5\n"
        "4.0 5.0\n"          # 2-col arity → z defaults 0.0
        "bad line here\n"    # non-numeric → skipped
        "7 8 9\n"
        "1 2 3 4\n"          # wrong arity → skipped
        "\n"
    )
    return str(p)


def test_point_table_arity_tolerance(spark, point_file):
    rows = read_point_table(spark, point_file).orderBy("x").collect()
    assert [(r["x"], r["y"], r["z"]) for r in rows] == [
        (1.5, 2.5, 3.5),
        (4.0, 5.0, 0.0),
        (7.0, 8.0, 9.0),
    ]
    rejects = read_point_table_rejects(spark, point_file).collect()
    assert len(rejects) == 2


def test_count_headed_scan(spark, tmp_path):
    p = tmp_path / "particles.dat"
    p.write_text("3\n1 10.0 20.0\n2 11.0 21.0\n3 12.0 22.0\n")
    df = read_count_headed(spark, str(p), ["id", "x", "y"])
    assert df.count() == 3
    p2 = tmp_path / "bad.dat"
    p2.write_text("5\n1 10.0 20.0\n")
    with pytest.raises(ValueError, match="declares 5"):
        read_count_headed(spark, str(p2), ["id", "x", "y"])


def test_edge_list_scan(spark, tmp_path):
    p = tmp_path / "bonds.dat"
    p.write_text("0\n1 2 1\n2 3 10\n")  # MLSBond.dat shape: flag then edges
    rows = read_edge_list(spark, str(p)).orderBy("src").collect()
    assert [(r["src"], r["dst"], r["type"]) for r in rows] == [
        (1, 2, 1),
        (2, 3, 10),
    ]


def test_two_section_scan(spark, tmp_path):
    # MLSJDat.dat shape: N geometry rows ∥ N attribute rows
    p = tmp_path / "jdat.dat"
    p.write_text(
        "0 0 1.0\n0 0 2.0\n"  # geometry (3 cols)
        "7\n8\n"              # attributes (1 col)
    )
    df = read_two_section(spark, str(p), ["a", "b", "v"], ["jmat"])
    rows = df.orderBy("row_id").collect()
    assert [(r["row_id"], r["v"], r["jmat"]) for r in rows] == [
        (0, 1.0, 7.0),
        (1, 2.0, 8.0),
    ]


def test_binary_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, float(i), i * 0.5, i * 0.25, i * 2.0) for i in range(10)],
        "g LONG, a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE",
    )
    blobs = encode_groups(df, "g", ["a", "b", "c", "d"])
    payload = blobs.collect()[0]["payload"]
    # byte-exact reference layout: int32 N + N*4 float32 LE
    assert len(payload) == 4 + 10 * 4 * 4
    assert struct.unpack("<i", payload[:4])[0] == 10
    assert struct.unpack("<f", payload[4:8])[0] == 0.0

    back = decode_blobs(blobs, 4).orderBy("idx").collect()
    assert len(back) == 10
    assert back[3]["f1"] == 3.0 and back[3]["f4"] == 6.0
    assert [r["idx"] for r in back] == list(range(10))


def test_fixed_format_sink(spark, tmp_path):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "x DOUBLE, y DOUBLE, z DOUBLE")
    out = str(tmp_path / "out")
    write_lines(df, fixed_point_line("x", "y", "z"), out, crlf=True)
    data = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out}/part-*"))
    )
    # GenerateColumnar.py:327-330 byte format: %.8f + CRLF
    assert data == b"1.00000000 2.00000000 3.00000000\r\n"


def test_vertex_line_sink(spark):
    df = spark.createDataFrame(
        [(1, [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0)])],
        "id LONG, vs ARRAY<STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE>>",
    )
    line = df.select(vertex_line("vs").alias("l")).collect()[0]["l"]
    assert line == "1.00000000 2.00000000 3.00000000 4.00000000 5.00000000 6.00000000"


def test_fixed_format_sink_nondefault_precision(spark, tmp_path):
    """S7/S8 golden bytes at a NON-default format (r10 verdict item 7:
    only %.8f was pinned, leaving the fmt parameterization untested):
    %.6e scientific layout, byte-exact against C printf semantics —
    format_string is Java String.format, which matches printf for %e
    away from decimal ties (Java rounds ties HALF_UP, glibc half-even,
    so the pinned values avoid exact .5 tie digits)."""
    df = spark.createDataFrame(
        [(1234.5678, -0.000012345, 0.0)], "x DOUBLE, y DOUBLE, z DOUBLE"
    )
    out = str(tmp_path / "out")
    write_lines(
        df, fixed_point_line("x", "y", "z", fmt="%.6e"), out, crlf=True
    )
    data = b"".join(
        open(f, "rb").read() for f in sorted(glob.glob(f"{out}/part-*"))
    )
    assert data == b"1.234568e+03 -1.234500e-05 0.000000e+00\r\n"


def test_vertex_line_sink_nondefault_precision(spark):
    df = spark.createDataFrame(
        [(1, [(1.5, -2.25, 3.0624)])],
        "id LONG, vs ARRAY<STRUCT<x: DOUBLE, y: DOUBLE, z: DOUBLE>>",
    )
    line = (
        df.select(vertex_line("vs", fmt="%.3e").alias("l"))
        .collect()[0]["l"]
    )
    assert line == "1.500e+00 -2.250e+00 3.062e+00"


def test_snapshot_store_partition_pruning(spark, tmp_path):
    """S9 scale contract: snapshots stored Parquet-partitioned by step
    must prune to one partition when filtered on step (SURVEY §4:
    'per-timestep output files -> partition pruning')."""
    from pyspark.sql import functions as F

    df = spark.range(0, 4000).select(
        (F.col("id") % 4 * 250).alias("step"),
        F.col("id").alias("particle_id"),
        (F.col("id") * 0.5).alias("ux"),
    )
    path = str(tmp_path / "snapshots")
    df.write.partitionBy("step").mode("overwrite").parquet(path)

    pruned = spark.read.parquet(path).filter(F.col("step") == 250)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(step" in plan and "= 250)" in plan
    assert pruned.count() == 1000


def test_config_scalar_read(tmp_path):
    """S5: positional scalar config (MLS00con.dat shape) -> driver dict."""
    from columnarmodeling_spark.sources.text_tables import read_config_scalars

    p = tmp_path / "MLS00con.dat"
    p.write_text("0.002\n1.0\n40 40 40\n1e-7\n500000\n")
    got = read_config_scalars(
        None, str(p), ["dGap", "cell", "lx", "ly", "lz", "dT", "n_steps"]
    )
    assert got["dGap"] == 0.002 and got["dT"] == 1e-7 and got["n_steps"] == 500000.0
    import pytest

    with pytest.raises(ValueError):
        read_config_scalars(None, str(p), ["a"] * 99)


# ---------------------------------------------------------------------------
# round-4: stdlib media codecs (functions/media_codec.py)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_exact():
    import numpy as np

    from columnarmodeling_spark.functions.media_codec import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (4, 4), (13, 7), (5, 9)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_bmp(img)
        assert payload[:2] == b"BM"
        # row stride must be 4-byte padded
        assert (len(payload) - 54) == ((w * 3 + 3) // 4 * 4) * h
        back = decode_bmp(payload)
        assert back.shape == (h, w, 3)
        assert (back == img).all()


def test_wav_roundtrip_exact_and_chunk_walk():
    import struct

    import numpy as np

    from columnarmodeling_spark.functions.media_codec import (
        decode_wav,
        encode_wav,
    )

    samples = (np.arange(-500, 500, 7)).astype(np.int16)
    payload = encode_wav(samples, sample_rate=16000)
    rate, channels, back = decode_wav(payload)
    assert (rate, channels) == (16000, 1)
    assert (back == samples).all()
    # chunk walk: inject an extra chunk before data, still decodes
    extra = struct.pack("<4sI", b"LIST", 6) + b"abcdef"
    patched = payload[:12] + extra + payload[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, _, back2 = decode_wav(patched)
    assert rate2 == 16000 and (back2 == samples).all()


def test_bmp_resize_real(spark):
    """resize_media on a real BMP payload re-encodes a decodable BMP of
    the target raster (not the byte-truncation stub)."""
    import numpy as np

    from columnarmodeling_spark.functions.media_codec import (
        decode_bmp,
        encode_bmp,
        resize_nearest,
    )
    from columnarmodeling_spark.functions.multimodal import resize_media

    img = np.fromfunction(
        lambda y, x, c: (x * 17 + y * 5 + c * 31) % 256, (10, 8, 3)
    ).astype(np.uint8)
    payload = encode_bmp(img)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = resize_media(df, width=4, height=4).collect()[0]
    assert out["n_bytes"] == len(payload)
    # expected: nearest-neighbor resample, re-encoded
    expected = encode_bmp(resize_nearest(img, 4, 4))
    assert out["out_bytes"] == len(expected)
    import hashlib

    assert out["out_digest"] == hashlib.md5(expected).hexdigest()


def test_decode_media_sniffs_real_formats(spark):
    """decode_media: real dimensions for BMP/WAV, stub features for
    other payloads — all through one Arrow-batched pass."""
    import numpy as np

    from columnarmodeling_spark.functions.media_codec import (
        encode_bmp,
        encode_wav,
    )
    from columnarmodeling_spark.functions.multimodal import decode_media

    bmp = encode_bmp(np.zeros((6, 9, 3), dtype=np.uint8))
    wav = encode_wav(np.zeros(123, dtype=np.int16), sample_rate=8000)
    other = b"plain text payload"
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(other))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert (rows[1]["fake_width"], rows[1]["fake_height"]) == (9, 6)
    assert (rows[2]["fake_width"], rows[2]["fake_height"]) == (123, 1)
    assert rows[3]["fake_width"] == len(other) % 640


def test_decode_media_malformed_sniff_falls_back(spark):
    """Payloads that sniff as BMP/WAV but fail to parse (truncated
    header, compressed BMP, non-PCM WAV, text starting with the magic)
    degrade to the deterministic stub row instead of failing the stage
    (round-4 ADVICE: q72 pipes document text through this path)."""
    import struct as _struct

    import numpy as np

    from columnarmodeling_spark.functions.media_codec import encode_bmp
    from columnarmodeling_spark.functions.multimodal import (
        decode_media,
        decode_media_rich,
        resize_media,
    )

    truncated_bmp = b"BM\x01\x02"  # 4 bytes: shorter than the header
    text_bm = b"BMost of this document is prose that merely starts BM"
    bad_wav = b"RIFF" + b"\x10\x00\x00\x00" + b"WAVE" + b"\x00" * 4
    compressed = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    _struct.pack_into("<I", compressed, 30, 1)  # compression=BI_RLE8
    # data chunk declares 1000 bytes but the payload ends after 8: must
    # fall back, never report stats over the truncated prefix
    cut_wav = (
        b"RIFF" + b"\x28\x00\x00\x00" + b"WAVE"
        + b"fmt " + b"\x10\x00\x00\x00"
        + _struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + b"\xe8\x03\x00\x00" + b"\x00" * 8
    )
    payloads = [truncated_bmp, text_bm, bad_wav, bytes(compressed), cut_wav]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert len(rows) == len(payloads)
    for i, p in enumerate(payloads):
        assert rows[i]["fake_width"] == len(p) % 640  # stub features

    rich = {r["doc_id"]: r for r in decode_media_rich(df).collect()}
    for i in rows:
        assert rich[i]["kind"].endswith("-unparsed")
        assert rich[i]["width"] is None and rich[i]["n_samples"] is None

    sized = {r["doc_id"]: r for r in resize_media(df, 8, 8).collect()}
    for i, p in enumerate(payloads):
        assert sized[i]["out_bytes"] == min(len(p), 8 * 8 // 8)  # stub path


def test_bitmap_codec_roundtrip_two_bitmaps(spark):
    """S9 PosItem parameterization: the same encode layout decodes under
    two DIFFERENT bitmaps — the shipped uniaxial one (4 fields → vy, vz,
    epsx, item21) and a 3-field one (ux, uz, epsz) — with field count
    and column names driven by the bitmap; a payload whose length
    disagrees with the bitmap's field count raises instead of
    mis-decoding."""
    import pytest

    from columnarmodeling_spark.sources.binary_snapshots import (
        UNIAXIAL_POSITEM,
        bitmap_fields,
        parse_positem,
    )

    assert bitmap_fields(UNIAXIAL_POSITEM) == ["vy", "vz", "epsx", "item21"]
    assert parse_positem(UNIAXIAL_POSITEM).count(1) == 4

    df4 = spark.createDataFrame(
        [(0, float(i), i * 0.5, i * 0.25, i * 2.0) for i in range(8)],
        "g LONG, a DOUBLE, b DOUBLE, c DOUBLE, d DOUBLE",
    )
    blobs4 = encode_groups(df4, "g", ["a", "b", "c", "d"])
    back4 = decode_blobs(blobs4, bitmap=UNIAXIAL_POSITEM).orderBy("idx")
    assert back4.columns == ["group", "idx", "vy", "vz", "epsx", "item21"]
    rows4 = back4.collect()
    assert rows4[3]["vy"] == 3.0 and rows4[3]["item21"] == 6.0

    bm3 = "1 0 1 0 0 0 0 0 1 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0 0"
    assert bitmap_fields(bm3) == ["ux", "uz", "epsz"]
    df3 = spark.createDataFrame(
        [(7, float(i), -float(i), i * 4.0) for i in range(5)],
        "g LONG, a DOUBLE, b DOUBLE, c DOUBLE",
    )
    blobs3 = encode_groups(df3, "g", ["a", "b", "c"])
    back3 = decode_blobs(blobs3, bitmap=bm3).orderBy("idx")
    assert back3.columns == ["group", "idx", "ux", "uz", "epsz"]
    rows3 = back3.collect()
    assert len(rows3) == 5
    assert rows3[2]["uz"] == -2.0 and rows3[2]["epsz"] == 8.0

    # wrong-bitmap guard: a 3-field payload under the 4-field bitmap
    with pytest.raises(Exception, match="PosItem bitmap"):
        decode_blobs(blobs3, bitmap=UNIAXIAL_POSITEM).collect()

    # malformed bitmaps rejected at the API edge
    with pytest.raises(ValueError):
        parse_positem("1 0 1")
    with pytest.raises(ValueError):
        parse_positem(UNIAXIAL_POSITEM.replace("1", "2", 1))


def test_joint_facets_and_material_parsers(spark, tmp_path):
    """MLSJDat/MLSJMat layouts (4D-LSM joint surface + material):
    flag + count + 9-float triangles; count + parameter row."""
    import pytest

    from columnarmodeling_spark.sources.text_tables import (
        read_joint_facets,
        read_joint_material,
    )

    jd = tmp_path / "MLSJDat.dat"
    jd.write_text(
        "1\n2\n"
        "0 0 0 1 0 0 0 1 0\n"
        "1 0 0 1 1 0 0 1 0\n"
    )
    df = read_joint_facets(spark, str(jd))
    assert df.count() == 2
    assert df.columns == [
        "x1", "y1", "z1", "x2", "y2", "z2", "x3", "y3", "z3"
    ]

    bad = tmp_path / "bad.dat"
    bad.write_text("1\n3\n0 0 0 1 0 0 0 1 0\n")
    with pytest.raises(ValueError, match="declares 3"):
        read_joint_facets(spark, str(bad))

    jm = tmp_path / "MLSJMat.dat"
    jm.write_text("1\n0 90e5 45e5 1800 25 2530 0 1\n")
    mat = read_joint_material(spark, str(jm))
    assert mat["n_sets"] == 1
    assert mat["params"][0][1] == 90e5 and mat["params"][0][2] == 45e5
