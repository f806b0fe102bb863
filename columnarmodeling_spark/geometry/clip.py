"""Closed-form boolean-cut of facet polygons against convex cutters (J7).

The reference trims grain-boundary faces against a specimen solid by
driving Rhino's ``_-Split`` CAD command per face and rejecting faces that
touch the clip planes (``/root/reference/BooleanOperation.py:99-149``,
cutter choice :178-188). The engine replaces the CAD kernel with
closed-form Sutherland–Hodgman clipping against the half-space
decomposition of the shipped cutter shapes (box / z-slab); the observable
output — trimmed facet vertex rings — is the same for convex cutters.

Spark shape: facet rows → ``mapInPandas`` (Arrow-batched, geometry tier
per SURVEY §2.9) → clipped facet rows with variable-arity vertex arrays.
Each facet clips independently — embarrassingly parallel, no shuffle; at
100 TB this runs scan→clip→sink with no exchange at all.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# half-space: (a, b, c, d) keeps points with a*x + b*y + c*z <= d
HalfSpace = tuple[float, float, float, float]


def slab_halfspaces(z_lo: float, z_hi: float) -> list[HalfSpace]:
    """The reference's two clip planes (BooleanOperation.py:220-244)."""
    return [(0.0, 0.0, -1.0, -z_lo), (0.0, 0.0, 1.0, z_hi)]


def box_halfspaces(
    x0: float, x1: float, y0: float, y1: float, z0: float, z1: float
) -> list[HalfSpace]:
    """Box specimen cutter (BooleanOperation.py:178-181)."""
    return [
        (-1.0, 0.0, 0.0, -x0),
        (1.0, 0.0, 0.0, x1),
        (0.0, -1.0, 0.0, -y0),
        (0.0, 1.0, 0.0, y1),
        (0.0, 0.0, -1.0, -z0),
        (0.0, 0.0, 1.0, z1),
    ]


def _clip_ring(
    ring: list[tuple[float, float, float]], hs: HalfSpace
) -> list[tuple[float, float, float]]:
    """Sutherland–Hodgman: clip a closed ring against one half-space."""
    a, b, c, d = hs
    out: list[tuple[float, float, float]] = []
    n = len(ring)
    for i in range(n):
        p, q = ring[i], ring[(i + 1) % n]
        fp = a * p[0] + b * p[1] + c * p[2] - d
        fq = a * q[0] + b * q[1] + c * q[2] - d
        if fp <= 0:
            out.append(p)
        if (fp < 0 < fq) or (fq < 0 < fp):
            t = fp / (fp - fq)
            out.append(
                (
                    p[0] + t * (q[0] - p[0]),
                    p[1] + t * (q[1] - p[1]),
                    p[2] + t * (q[2] - p[2]),
                )
            )
    return out


def clip_polygon(
    ring: list[tuple[float, float, float]], halfspaces: Iterable[HalfSpace]
) -> list[tuple[float, float, float]]:
    for hs in halfspaces:
        ring = _clip_ring(ring, hs)
        if len(ring) < 3:
            return []
    return ring


def clip_facets(
    facets: DataFrame,
    halfspaces: list[HalfSpace],
    vertex_col: str = "vertices",
) -> DataFrame:
    """Clip every facet's vertex ring; drop facets clipped away (P5).

    *facets* needs ``grain_id``, ``facet_pos`` and *vertex_col* as
    ``array<struct<x,y,z>>``. Output keeps those plus ``nv``.
    """
    hs = list(halfspaces)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid, pos, verts in zip(
                pdf["grain_id"], pdf["facet_pos"], pdf[vertex_col]
            ):
                ring = [(v["x"], v["y"], v["z"]) for v in verts]
                clipped = clip_polygon(ring, hs)
                if clipped:
                    rows.append(
                        (
                            gid,
                            pos,
                            [
                                {"x": x, "y": y, "z": z}
                                for x, y, z in clipped
                            ],
                            len(clipped),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["grain_id", "facet_pos", vertex_col, "nv"]
            )

    return facets.select("grain_id", "facet_pos", vertex_col).mapInPandas(
        run,
        schema=(
            "grain_id long, facet_pos int, "
            f"{vertex_col} array<struct<x: double, y: double, z: double>>, "
            "nv int"
        ),
    )
