"""Closed-form boolean-cut of facet polygons against convex cutters (J7).

The reference trims grain-boundary faces against a specimen solid by
driving Rhino's ``_-Split`` CAD command per face and rejecting faces that
touch the clip planes (``/root/reference/BooleanOperation.py:99-149``).
Its specimen menu (``:178-188``) is box / sphere (center, radius) /
z-axis cylinder (base point, radius, height — the Brazilian-split
plate). The engine replaces the CAD kernel with closed-form
Sutherland–Hodgman clipping against each cutter:

- **box / slab**: intersection of linear half-spaces — exact.
- **sphere / cylinder**: convex quadrics. Edge–surface crossings are
  solved exactly (quadratic roots), including the segment that enters
  AND exits the solid with both endpoints outside; the curved boundary
  between two crossing points is approximated by its chord. Chords of a
  convex body lie inside it, so the approximation never exceeds the
  true cut: clipped area ≤ true clipped area ≤ original, and every
  output vertex is exactly on or inside the cutter (the properties the
  tests pin).
- **section fallback**: when the facet's boundary never touches the
  quadric (the cutter's cross-section lies strictly inside the facet —
  impossible for half-space clipping, routine for a small sphere on a
  big facet), the true cut is the full plane∩solid section; it is
  emitted as an inscribed 32-gon of the exact section curve (circle
  for the sphere, ellipse for the tilted-plane cylinder case).

Spark shape: facet rows → ``mapInPandas`` (Arrow-batched, geometry tier
per SURVEY §2.9) → clipped facet rows with variable-arity vertex arrays.
Each facet clips independently — embarrassingly parallel, no shuffle; at
100 TB this runs scan→clip→sink with no exchange at all.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# half-space: (a, b, c, d) keeps points with a*x + b*y + c*z <= d
HalfSpace = tuple[float, float, float, float]

Point = tuple[float, float, float]

_SECTION_SIDES = 32


class Cutter:
    """A convex cutter surface.

    ``inside(p)``: f(p) <= 0. ``crossings(p, q)``: sorted parameters t
    in (0, 1) where segment p + t*(q - p) crosses the surface.
    ``plane_section(ring)``: inscribed polygon of the FULL intersection
    of the ring's supporting plane with the solid (or None) — used only
    when the ring boundary never touches the surface.
    """

    def __init__(
        self,
        inside: Callable[[Point], bool],
        crossings: Callable[[Point, Point], list[float]],
        plane_section: Callable[[list[Point]], list[Point] | None] | None = None,
    ) -> None:
        self.inside = inside
        self.crossings = crossings
        self.plane_section = plane_section


def _newell_normal(ring: list[Point]) -> tuple[float, float, float]:
    nx = ny = nz = 0.0
    n = len(ring)
    for i in range(n):
        (x1, y1, z1), (x2, y2, z2) = ring[i], ring[(i + 1) % n]
        nx += (y1 - y2) * (z1 + z2)
        ny += (z1 - z2) * (x1 + x2)
        nz += (x1 - x2) * (y1 + y2)
    m = math.sqrt(nx * nx + ny * ny + nz * nz)
    if m < 1e-30:
        return (0.0, 0.0, 1.0)
    return (nx / m, ny / m, nz / m)


def _point_in_ring(p: Point, ring: list[Point], normal: Point) -> bool:
    """Even-odd test in the dominant-axis projection of the ring plane."""
    ax = max(range(3), key=lambda i: abs(normal[i]))
    u, v = [i for i in range(3) if i != ax]
    px, py = p[u], p[v]
    hit = False
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        ay, by = a[v], b[v]
        if (ay > py) != (by > py):
            x = a[u] + (py - ay) / (by - ay) * (b[u] - a[u])
            if px < x:
                hit = not hit
    return hit


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


def halfspace_cutter(hs: HalfSpace) -> Cutter:
    """Linear half-space as a Cutter (exact, single crossing).

    No section fallback: a bounded ring whose boundary misses a plane
    lies wholly on one side of it, so the empty SH result is correct.
    """
    a, b, c, d = hs

    def f(p: Point) -> float:
        return a * p[0] + b * p[1] + c * p[2] - d

    def crossings(p: Point, q: Point) -> list[float]:
        fp, fq = f(p), f(q)
        if (fp < 0 < fq) or (fq < 0 < fp):
            return [fp / (fp - fq)]
        return []

    return Cutter(lambda p: f(p) <= 0.0, crossings)


def _quadratic_roots01(a: float, b: float, c: float) -> list[float]:
    """Real roots of a·t² + b·t + c = 0 strictly inside (0, 1), sorted."""
    if abs(a) < 1e-30:
        if abs(b) < 1e-30:
            return []
        t = -c / b
        return [t] if 0.0 < t < 1.0 else []
    disc = b * b - 4.0 * a * c
    if disc <= 0.0:
        return []
    s = math.sqrt(disc)
    return sorted(t for t in ((-b - s) / (2 * a), (-b + s) / (2 * a)) if 0.0 < t < 1.0)


def sphere_cutter(cx: float, cy: float, cz: float, r: float) -> Cutter:
    """Sphere specimen (BooleanOperation.py:178-182: center, radius)."""

    def inside(p: Point) -> bool:
        return (
            (p[0] - cx) ** 2 + (p[1] - cy) ** 2 + (p[2] - cz) ** 2
            <= r * r + 1e-12
        )

    def crossings(p: Point, q: Point) -> list[float]:
        dx, dy, dz = q[0] - p[0], q[1] - p[1], q[2] - p[2]
        ox, oy, oz = p[0] - cx, p[1] - cy, p[2] - cz
        a = dx * dx + dy * dy + dz * dz
        b = 2.0 * (ox * dx + oy * dy + oz * dz)
        c = ox * ox + oy * oy + oz * oz - r * r
        return _quadratic_roots01(a, b, c)

    def plane_section(ring: list[Point]) -> list[Point] | None:
        # plane ∩ ball = disk: center = sphere center projected onto the
        # plane, radius from the chord formula; inscribed 32-gon.
        nx, ny, nz = _newell_normal(ring)
        px, py, pz = ring[0]
        dist = nx * (cx - px) + ny * (cy - py) + nz * (cz - pz)
        if dist * dist >= r * r:
            return None
        ox, oy, oz = cx - dist * nx, cy - dist * ny, cz - dist * nz
        rc = math.sqrt(r * r - dist * dist)
        # in-plane orthonormal basis
        if abs(nx) <= abs(ny) and abs(nx) <= abs(nz):
            ux, uy, uz = 0.0, -nz, ny
        elif abs(ny) <= abs(nz):
            ux, uy, uz = -nz, 0.0, nx
        else:
            ux, uy, uz = -ny, nx, 0.0
        um = math.sqrt(ux * ux + uy * uy + uz * uz)
        ux, uy, uz = ux / um, uy / um, uz / um
        vx = ny * uz - nz * uy
        vy = nz * ux - nx * uz
        vz = nx * uy - ny * ux
        return [
            (
                ox + rc * (math.cos(a) * ux + math.sin(a) * vx),
                oy + rc * (math.cos(a) * uy + math.sin(a) * vy),
                oz + rc * (math.cos(a) * uz + math.sin(a) * vz),
            )
            for a in (
                2.0 * math.pi * k / _SECTION_SIDES
                for k in range(_SECTION_SIDES)
            )
        ]

    return Cutter(inside, crossings, plane_section)


def cylinder_cutters(
    bx: float, by: float, bz: float, r: float, height: float
) -> list[Cutter]:
    """Z-axis cylinder specimen (BooleanOperation.py:183-188: base point,
    radius, height — the Brazilian-split plate). Decomposed as the
    intersection of the two cap planes (exact) and the infinite
    circular cylinder (quadric in x, y)."""

    def inside(p: Point) -> bool:
        return (p[0] - bx) ** 2 + (p[1] - by) ** 2 <= r * r + 1e-12

    def crossings(p: Point, q: Point) -> list[float]:
        dx, dy = q[0] - p[0], q[1] - p[1]
        ox, oy = p[0] - bx, p[1] - by
        a = dx * dx + dy * dy
        b = 2.0 * (ox * dx + oy * dy)
        c = ox * ox + oy * oy - r * r
        return _quadratic_roots01(a, b, c)

    def plane_section(ring: list[Point]) -> list[Point] | None:
        # plane ∩ infinite cylinder: lift the lateral circle onto the
        # plane — z(θ) = (n·p0 − nx·x(θ) − ny·y(θ)) / nz. A vertical
        # plane (nz = 0) sections to an unbounded strip; a bounded ring
        # whose boundary misses the strip edges lies outside it → None.
        nx, ny, nz = _newell_normal(ring)
        if abs(nz) < 1e-12:
            return None
        px, py, pz = ring[0]
        d = nx * px + ny * py + nz * pz
        out = []
        for k in range(_SECTION_SIDES):
            a = 2.0 * math.pi * k / _SECTION_SIDES
            x = bx + r * math.cos(a)
            y = by + r * math.sin(a)
            out.append((x, y, (d - nx * x - ny * y) / nz))
        return out

    return [
        halfspace_cutter(h) for h in slab_halfspaces(bz, bz + height)
    ] + [Cutter(inside, crossings, plane_section)]


def _clip_ring_cutter(ring: list[Point], cutter: Cutter) -> list[Point]:
    """Sutherland–Hodgman step against one convex cutter surface.

    Emits each inside vertex plus every exact edge crossing — including
    the enter+exit pair of an outside→outside edge that tunnels through
    a curved cutter (impossible for planes, real for spheres/cylinders).
    When the boundary never touches the surface, falls back to the
    cutter's full plane section (the cross-section-inside-facet case).
    """
    out: list[Point] = []
    n = len(ring)
    for i in range(n):
        p, q = ring[i], ring[(i + 1) % n]
        if cutter.inside(p):
            out.append(p)
        for t in cutter.crossings(p, q):
            out.append(
                (
                    p[0] + t * (q[0] - p[0]),
                    p[1] + t * (q[1] - p[1]),
                    p[2] + t * (q[2] - p[2]),
                )
            )
    if not out and n >= 3 and cutter.plane_section is not None:
        # No vertex inside, no edge crossing: either the ring is wholly
        # outside, or the cutter's section sits strictly inside the
        # ring. The section curve cannot cross the ring boundary (that
        # would be an edge crossing), so testing one section point
        # decides containment.
        sec = cutter.plane_section(ring)
        if sec and _point_in_ring(sec[0], ring, _newell_normal(ring)):
            return sec
    return out


def clip_polygon_cutters(
    ring: list[Point], cutters: Iterable[Cutter]
) -> list[Point]:
    """Clip a vertex ring against a convex-cutter intersection."""
    for cutter in cutters:
        ring = _clip_ring_cutter(ring, cutter)
        if len(ring) < 3:
            return []
    return ring


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


def _as_cutter(c: HalfSpace | Cutter) -> Cutter:
    if isinstance(c, Cutter):
        return c
    return halfspace_cutter(c)


def clip_facets(
    facets: DataFrame,
    halfspaces: list[HalfSpace | Cutter],
    vertex_col: str = "vertices",
) -> DataFrame:
    """Clip every facet's vertex ring; drop facets clipped away (P5).

    *facets* needs ``grain_id``, ``facet_pos`` and *vertex_col* as
    ``array<struct<x,y,z>>``. Output keeps those plus ``nv``.
    Entries of *halfspaces* may be plain ``(a,b,c,d)`` half-space tuples
    or ``Cutter`` pairs from :func:`sphere_cutter` /
    :func:`cylinder_cutters`.
    """
    hs = [_as_cutter(c) for c in halfspaces]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid, pos, verts in zip(
                pdf["grain_id"], pdf["facet_pos"], pdf[vertex_col]
            ):
                ring = [(v["x"], v["y"], v["z"]) for v in verts]
                clipped = clip_polygon_cutters(ring, hs)
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
