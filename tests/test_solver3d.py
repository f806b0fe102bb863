"""3D block-solver invariants (simulation/solver3d.py): the halo
argument must hold one dimension up — blocked == per-step to 1e-9 with
real 3x3x3 halo traffic — plus z free fall and 3-axis BC boxes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from columnarmodeling_spark.simulation.solver import BoundaryCondition
from columnarmodeling_spark.simulation.solver3d import (
    run_solver3d,
    run_solver3d_blocked,
    spring_forces3d,
)


def _lattice3d(spark, nx=6, ny=5, nz=4, spacing=1.0):
    pts = []
    edges = []
    for kz in range(nz):
        for j in range(ny):
            for i in range(nx):
                a = (kz * ny + j) * nx + i
                pts.append(
                    (a, i * spacing, j * spacing, kz * spacing,
                     0.0, 0.0, 0.0, 1.0)
                )
                if i + 1 < nx:
                    edges.append((a, a + 1, 0.9 * spacing))
                if j + 1 < ny:
                    edges.append((a, a + nx, 0.9 * spacing))
                if kz + 1 < nz:
                    edges.append((a, a + nx * ny, 0.9 * spacing))
    state = spark.createDataFrame(
        pts,
        "id long, x double, y double, z double, "
        "vx double, vy double, vz double, m double",
    )
    bonds = spark.createDataFrame(edges, "src long, dst long, rest double")
    return state, bonds


def test_forces3d_symmetric(spark):
    state, bonds = _lattice3d(spark)
    f = spring_forces3d(state, bonds, k=1.0).agg(
        F.sum("fx").alias("sx"),
        F.sum("fy").alias("sy"),
        F.sum("fz").alias("sz"),
    ).collect()[0]
    assert abs(f["sx"]) < 1e-9 and abs(f["sy"]) < 1e-9 and abs(f["sz"]) < 1e-9


def test_blocked3d_matches_per_step(spark):
    """Real multi-block 3D halo traffic, with gravity + damping on."""
    state, bonds = _lattice3d(spark)
    kw = dict(k=1.0, dt=0.02, gravity=(0.05, -0.1, 0.08), damping=0.3)
    ref = {
        r["id"]: r for r in run_solver3d(state, bonds, 8, fuse=2, **kw).collect()
    }
    got = {
        r["id"]: r
        for r in run_solver3d_blocked(
            state, bonds, 8, fuse=2, block=3.0, reach=1.2, **kw
        ).collect()
    }
    assert set(got) == set(ref)
    for i in ref:
        for c in ("x", "y", "z", "vx", "vy", "vz"):
            assert abs(got[i][c] - ref[i][c]) < 1e-9, (i, c)


def test_free_fall_z(spark):
    state = spark.createDataFrame(
        [(0, 0.0, 0.0, 100.0, 0.0, 0.0, 0.0, 2.0)],
        "id long, x double, y double, z double, "
        "vx double, vy double, vz double, m double",
    )
    bonds = spark.createDataFrame([], "src long, dst long, rest double")
    g, dt, n = -9.8, 0.01, 10
    r = run_solver3d_blocked(
        state, bonds, n, k=1.0, dt=dt, fuse=5, block=50.0, reach=1.0,
        gravity=(0.0, 0.0, g),
    ).collect()[0]
    assert r["vz"] == pytest.approx(n * g * dt, rel=1e-12)
    assert r["z"] == pytest.approx(
        100.0 + g * dt * dt * n * (n + 1) / 2, rel=1e-12
    )


def test_3axis_bc_box(spark):
    """A velocity BC with a z-range box grabs only the slab inside it —
    the MLSLD00.dat '0 50 / 0 50 / 49 50' top-platen shape."""
    state, bonds = _lattice3d(spark, nx=4, ny=4, nz=4)
    bc = BoundaryCondition(z0=2.5, kind="velocity", vx=0.0, vy=0.0, vz=-2.0)
    out = run_solver3d_blocked(
        state, bonds, 4, k=0.0, dt=0.05, fuse=4, block=20.0, reach=1.0,
        bcs=(bc,),
    )
    rows = out.collect()
    for r in rows:
        if r["z"] < 2.0:  # never entered the box
            assert r["vz"] == 0.0
    # the top slab (z started at 3.0) is moving down at the prescribed v
    top = [r for r in rows if r["vz"] != 0.0]
    assert len(top) == 16
    for r in top:
        assert r["vz"] == -2.0
