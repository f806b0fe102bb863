"""Fixed-format text sinks (SURVEY §2.1 S7/S8).

S7: the mesh exporter writes 4 lines per facet, each ``%.8f %.8f %.8f``
CRLF-terminated (``GenerateColumnar.py:308-332``). S8: the trimmed-face
exporter writes all vertices of one face on one line, variable arity
(``BooleanOperation.py:159-172``). Both become ``format_string`` /
``concat_ws(transform(...))`` column expressions feeding ``write.text``
— formatting happens JVM-side, the sink is a plain text write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_point_line(*cols: str, fmt: str = "%.8f", sep: str = " ") -> Column:
    """One ``%.8f``-formatted line from numeric columns (S7 row shape)."""
    return F.format_string(
        sep.join([fmt] * len(cols)), *[F.col(c) for c in cols]
    )


def vertex_line(vertices_col: str, fmt: str = "%.8f") -> Column:
    """All vertices of a ragged array<struct<x,y,z>> on one line (S8)."""
    return F.concat_ws(
        " ",
        F.transform(
            vertices_col,
            lambda v: F.format_string(f"{fmt} {fmt} {fmt}", v.x, v.y, v.z),
        ),
    )


def write_lines(df: DataFrame, line_col: Column, path: str, crlf: bool = True) -> None:
    """Write one text line per row; CRLF to match the reference's exports."""
    out = df.select(line_col.alias("value"))
    writer = out.write.mode("overwrite")
    if crlf:
        writer = writer.option("lineSep", "\r\n")
    writer.text(path)
