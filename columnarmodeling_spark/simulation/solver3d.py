"""3D halo-exchange block solver — the reference's native dimensionality
(``BALL3D_PSLICE.dat`` particles, 3-axis range boxes in every
``MLSLD00.dat`` BC block, ``uz`` platen ramps; the 2D module
``solver.py`` is the plane-strain analog the relational tier uses).

Same design as the 2D block solver, one dimension up: particles
partition into cubic blocks keyed by ``(bx, by, bz)``, each block
replicates a halo of width ``fuse × reach`` from its 26 neighbors
(3×3×3 offsets), and ``fuse`` whole explicit-Euler steps run inside ONE
cogrouped NumPy kernel per shuffle round — force influence travels at
most one bond-hop per step, so owned particles are bit-exact while the
halo covers ``fuse`` hops. The 27-replica explosion is the 3D price of
the halo (2D pays 9); the halo filter trims replicas to the band that
can actually influence the block, so the steady-state blow-up stays far
below 27× for blocks ≫ halo.

Physics parity with the 2D kernels: gravity vector, local damping Dp,
gravity spin-up curve, full BC family with 3-axis range boxes, the
pluggable ``force_law`` hook, and (``run_solver3d_blocked_breaking``)
strain-threshold bond removal with per-bond ``strength``/``k``/
``ustate`` columns — the persistent constitutive state rides the bond
relation across halo-exchange rounds exactly like the 2D breaking
solver's. Shares ``BoundaryCondition`` (its ``z0/z1/vz`` fields are
ignored by the 2D kernels) and ``_curve_scale`` with ``solver.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from columnarmodeling_spark.simulation.solver import (
    BoundaryCondition,
    _checked_positions,
    _curve_scale,
    linear_spring_law,
)


def _bc_mask(bc, x, y, z):
    return (
        (x >= bc.x0) & (x <= bc.x1)
        & (y >= bc.y0) & (y <= bc.y1)
        & (z >= bc.z0) & (z <= bc.z1)
    )


def spring_forces3d(state: DataFrame, bonds: DataFrame, k: float) -> DataFrame:
    """Per-particle net spring force (3D) — the per-step reference used
    by the equivalence tests; optional per-bond ``k`` column."""
    has_k = "k" in bonds.columns
    bcols = ["src", "dst", "rest"] + (["k"] if has_k else [])
    both = bonds.select(*bcols).union(
        bonds.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            "rest",
            *(["k"] if has_k else []),
        )
    )
    a = state.select(
        F.col("id").alias("src"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.col("z").alias("az"),
    )
    b = state.select(
        F.col("id").alias("dst"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("z").alias("bz"),
    )
    e = both.join(a, "src").join(b, "dst")
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    dz = F.col("bz") - F.col("az")
    dist = F.sqrt(dx * dx + dy * dy + dz * dz)
    mag = (F.col("k") if has_k else F.lit(k)) * (dist - F.col("rest"))
    u = lambda d: F.when(dist > 0, d / dist).otherwise(F.lit(0.0))  # noqa: E731
    return (
        e.select(
            F.col("src").alias("id"),
            (mag * u(dx)).alias("fx"),
            (mag * u(dy)).alias("fy"),
            (mag * u(dz)).alias("fz"),
        )
        .groupBy("id")
        .agg(
            F.sum("fx").alias("fx"),
            F.sum("fy").alias("fy"),
            F.sum("fz").alias("fz"),
        )
    )


def run_solver3d(
    state: DataFrame,
    bonds: DataFrame,
    n_steps: int,
    k: float = 1.0,
    dt: float = 0.01,
    fuse: int = 1,
    gravity: tuple[float, float, float] = (0.0, 0.0, 0.0),
    damping: float = 0.0,
) -> DataFrame:
    """Per-step relational 3D loop (exactness reference; the block
    solver below is the throughput shape)."""
    gx, gy, gz = (float(g) for g in gravity)
    bonds = bonds.localCheckpoint(eager=False)
    i = 0
    while i < n_steps:
        burst = min(fuse, n_steps - i)
        for _ in range(burst):
            f = spring_forces3d(state, bonds, k)
            s = state.join(f, "id", "left").fillna(0.0, ["fx", "fy", "fz"])
            fx = F.col("fx") + F.lit(gx) * F.col("m")
            fy = F.col("fy") + F.lit(gy) * F.col("m")
            fz = F.col("fz") + F.lit(gz) * F.col("m")
            if damping != 0.0:
                fx = fx - F.lit(damping) * F.abs(fx) * F.signum("vx")
                fy = fy - F.lit(damping) * F.abs(fy) * F.signum("vy")
                fz = fz - F.lit(damping) * F.abs(fz) * F.signum("vz")
            vx = F.col("vx") + fx / F.col("m") * dt
            vy = F.col("vy") + fy / F.col("m") * dt
            vz = F.col("vz") + fz / F.col("m") * dt
            state = s.select(
                "id",
                (F.col("x") + vx * dt).alias("x"),
                (F.col("y") + vy * dt).alias("y"),
                (F.col("z") + vz * dt).alias("z"),
                vx.alias("vx"),
                vy.alias("vy"),
                vz.alias("vz"),
                "m",
            )
        i += burst
        # lazy: plan truncation is eagerness-independent; rounds fold
        # into the caller's single action
        state = state.localCheckpoint(eager=False)
    return state


def run_solver3d_blocked(
    state: DataFrame,
    bonds: DataFrame,
    n_steps: int,
    k: float = 1.0,
    dt: float = 0.01,
    fuse: int = 25,
    block: float | None = None,
    reach: float | None = None,
    bcs: tuple[BoundaryCondition, ...] | None = None,
    step0: int = 0,
    gravity: tuple[float, float, float] = (0.0, 0.0, 0.0),
    damping: float = 0.0,
    gravity_curve: tuple[tuple[float, float], ...] | None = None,
    force_law=None,
) -> DataFrame:
    """3D halo-exchange block solver (see module docstring). Parameter
    semantics match ``run_solver_blocked`` (including the pluggable
    *force_law* constitutive hook); BC range boxes use all
    three axes and velocity/force/acceleration values are
    ``(vx, vy, vz)``."""
    # checkpoint BEFORE the reach agg (r16 — the r15 fix landed only in
    # the 2D solver): the agg is an action, and on un-checkpointed bonds
    # it re-ran the caller's whole bond build a second time
    bonds = bonds.localCheckpoint(eager=False)
    if reach is None:
        max_rest = bonds.agg(F.max("rest")).collect()[0][0] or 1.0
        reach = 1.5 * float(max_rest)
    halo = fuse * reach
    if block is None:
        block = 4.0 * halo

    i = 0
    while i < n_steps:
        burst = min(fuse, n_steps - i)
        # LAZY per-round checkpoint — same rationale as
        # run_solver_blocked (plan truncation is eagerness-independent;
        # one caller job instead of one eager job per round)
        state = blocked_round3d(
            state, bonds, k, dt, burst, block, halo,
            bcs=bcs, step0=step0 + i, gravity=gravity, damping=damping,
            gravity_curve=gravity_curve,
            force_law=force_law,
        ).localCheckpoint(eager=False)
        i += burst
    return state


def blocked_round3d(
    state: DataFrame,
    bonds: DataFrame,
    k: float,
    dt: float,
    burst: int,
    block: float,
    halo: float,
    bcs: tuple[BoundaryCondition, ...] | None = None,
    step0: int = 0,
    gravity: tuple[float, float, float] = (0.0, 0.0, 0.0),
    damping: float = 0.0,
    gravity_curve: tuple[tuple[float, float], ...] | None = None,
    force_law=None,
) -> DataFrame:
    """One 3D halo-exchange round: 3×3×3 replication, same-block bond
    extraction, ``burst`` Euler sub-steps in one cogrouped NumPy
    kernel. Force order mirrors the 2D kernel exactly (springs →
    gravity·scale(t) → force/nonreflection BCs → local damping →
    integrate → acceleration/velocity BCs → advance). *force_law* is
    the same pluggable constitutive hook as the 2D kernels (the
    UDM.dll analog — see simulation/solver.py): the law signature is
    dimension-agnostic (dist/rest/k/state arrays), default
    linear_spring_law, bit-identical to the pre-hook kernel."""
    import pandas as pd

    gx, gy, gz = (float(g) for g in gravity)
    has_k = "k" in bonds.columns
    out_schema = (
        "id long, x double, y double, z double, "
        "vx double, vy double, vz double, m double"
    )

    def make_kernel(burst: int):
        def kernel(parts: pd.DataFrame, local_bonds: pd.DataFrame):
            cols = [
                "id", "x", "y", "z", "vx", "vy", "vz", "m", "owned"
            ]
            if parts.empty:
                return pd.DataFrame(columns=cols)
            import numpy as np

            ids = parts["id"].to_numpy()
            x = parts["x"].to_numpy(dtype=np.float64).copy()
            y = parts["y"].to_numpy(dtype=np.float64).copy()
            z = parts["z"].to_numpy(dtype=np.float64).copy()
            vx = parts["vx"].to_numpy(dtype=np.float64).copy()
            vy = parts["vy"].to_numpy(dtype=np.float64).copy()
            vz = parts["vz"].to_numpy(dtype=np.float64).copy()
            m = parts["m"].to_numpy(dtype=np.float64)
            if local_bonds.empty:
                src = dst = np.empty(0, dtype=np.int64)
                rest = np.empty(0, dtype=np.float64)
                kk: object = k
            else:
                # vectorized id -> row-index mapping (bit-identical
                # to the old per-bond dict lookup; r15 optimization)
                order = np.argsort(ids, kind="stable")
                sorted_ids = ids[order]
                src = order[
                    _checked_positions(
                        sorted_ids,
                        local_bonds["src"].to_numpy(dtype=np.int64),
                    )
                ]
                dst = order[
                    _checked_positions(
                        sorted_ids,
                        local_bonds["dst"].to_numpy(dtype=np.int64),
                    )
                ]
                rest = local_bonds["rest"].to_numpy(dtype=np.float64)
                kk = (
                    local_bonds["k"].to_numpy(dtype=np.float64)
                    if has_k
                    else k
                )
            law = (
                force_law if force_law is not None else linear_spring_law
            )
            alive = np.ones(len(src), dtype=bool)
            ustate = np.zeros(len(src), dtype=np.float64)
            for s_i in range(burst):
                dx = x[dst] - x[src]
                dy = y[dst] - y[src]
                dz = z[dst] - z[src]
                dist = np.sqrt(dx * dx + dy * dy + dz * dz)
                mag, _jb, ustate = law(dist, rest, kk, None, ustate, alive)
                fx = np.zeros_like(x)
                fy = np.zeros_like(y)
                fz = np.zeros_like(z)
                np.add.at(fx, src, mag * dx)
                np.add.at(fy, src, mag * dy)
                np.add.at(fz, src, mag * dz)
                np.add.at(fx, dst, -mag * dx)
                np.add.at(fy, dst, -mag * dy)
                np.add.at(fz, dst, -mag * dz)
                t_now = (step0 + s_i + 1) * dt
                if gx != 0.0 or gy != 0.0 or gz != 0.0:
                    g_s = _curve_scale(gravity_curve, t_now)
                    fx += gx * g_s * m
                    fy += gy * g_s * m
                    fz += gz * g_s * m
                if bcs:
                    for bc in bcs:
                        if bc.kind not in ("force", "nonreflection"):
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        if bc.kind == "force":
                            fx[msk] += bc.vx * s
                            fy[msk] += bc.vy * s
                            fz[msk] += bc.vz * s
                        else:
                            fx[msk] -= bc.c * s * vx[msk]
                            fy[msk] -= bc.c * s * vy[msk]
                            fz[msk] -= bc.c * s * vz[msk]
                if damping != 0.0:
                    fx -= damping * np.abs(fx) * np.sign(vx)
                    fy -= damping * np.abs(fy) * np.sign(vy)
                    fz -= damping * np.abs(fz) * np.sign(vz)
                vx += fx / m * dt
                vy += fy / m * dt
                vz += fz / m * dt
                if bcs:
                    for bc in bcs:
                        if bc.kind != "acceleration":
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        vx[msk] += bc.vx * s * dt
                        vy[msk] += bc.vy * s * dt
                        vz[msk] += bc.vz * s * dt
                    for bc in bcs:
                        if bc.kind != "velocity":
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        vx[msk] = bc.vx * s
                        vy[msk] = bc.vy * s
                        vz[msk] = bc.vz * s
                x += vx * dt
                y += vy * dt
                z += vz * dt
            return pd.DataFrame(
                {
                    "id": ids,
                    "x": x, "y": y, "z": z,
                    "vx": vx, "vy": vy, "vz": vz,
                    "m": m,
                    "owned": parts["owned"].to_numpy(),
                }
            )

        return kernel

    bxc = F.floor(F.col("x") / F.lit(block))
    byc = F.floor(F.col("y") / F.lit(block))
    bzc = F.floor(F.col("z") / F.lit(block))
    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dz).alias("dz"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    in_halo = (
        (F.col("x") >= F.col("bx") * block - halo)
        & (F.col("x") < (F.col("bx") + 1) * block + halo)
        & (F.col("y") >= F.col("by") * block - halo)
        & (F.col("y") < (F.col("by") + 1) * block + halo)
        & (F.col("z") >= F.col("bz") * block - halo)
        & (F.col("z") < (F.col("bz") + 1) * block + halo)
    )
    rep = (
        state.withColumn("__bx", bxc)
        .withColumn("__by", byc)
        .withColumn("__bz", bzc)
        .withColumn("__o", F.explode(offs))
        .withColumn("bx", F.col("__bx") + F.col("__o.dx"))
        .withColumn("by", F.col("__by") + F.col("__o.dy"))
        .withColumn("bz", F.col("__bz") + F.col("__o.dz"))
        .withColumn(
            "owned",
            (F.col("__o.dx") == 0)
            & (F.col("__o.dy") == 0)
            & (F.col("__o.dz") == 0),
        )
        .filter(F.col("owned") | in_halo)
        .select(
            "id", "x", "y", "z", "vx", "vy", "vz", "m",
            "bx", "by", "bz", "owned",
        )
    )
    # bond co-blocks from endpoint positions — same fused form (and the
    # same exact rep-membership predicate) as the 2D blocked_round:
    # join the 1x state twice, enumerate the 3x3x3 candidates around
    # the src owner, test both endpoints (owner match, or in-halo AND
    # within +-1 of the endpoint's own owner). Identical (bond, block)
    # set to the old double join against the 27x-exploded rep.
    sp = state.select(
        F.col("id").alias("src"),
        F.col("x").alias("__sx"),
        F.col("y").alias("__sy"),
        F.col("z").alias("__sz"),
    )
    dp = state.select(
        F.col("id").alias("dst"),
        F.col("x").alias("__dx"),
        F.col("y").alias("__dy"),
        F.col("z").alias("__dz"),
    )

    def _in_halo3(xc, yc, zc):
        return (
            (xc >= F.col("bx") * block - halo)
            & (xc < (F.col("bx") + 1) * block + halo)
            & (yc >= F.col("by") * block - halo)
            & (yc < (F.col("by") + 1) * block + halo)
            & (zc >= F.col("bz") * block - halo)
            & (zc < (F.col("bz") + 1) * block + halo)
        )

    sxc, syc, szc = F.col("__sx"), F.col("__sy"), F.col("__sz")
    dxc, dyc, dzc = F.col("__dx"), F.col("__dy"), F.col("__dz")
    dobx = F.floor(dxc / F.lit(block))
    doby = F.floor(dyc / F.lit(block))
    dobz = F.floor(dzc / F.lit(block))
    mem_s = (
        (F.col("__o.dx") == 0)
        & (F.col("__o.dy") == 0)
        & (F.col("__o.dz") == 0)
    ) | _in_halo3(sxc, syc, szc)
    mem_d = (
        (dobx == F.col("bx"))
        & (doby == F.col("by"))
        & (dobz == F.col("bz"))
    ) | (
        _in_halo3(dxc, dyc, dzc)
        & (F.abs(F.col("bx") - dobx) <= 1)
        & (F.abs(F.col("by") - doby) <= 1)
        & (F.abs(F.col("bz") - dobz) <= 1)
    )
    eb = (
        bonds.join(sp, "src")
        .join(dp, "dst")
        .withColumn("__o", F.explode(offs))
        .withColumn("bx", F.floor(sxc / F.lit(block)) + F.col("__o.dx"))
        .withColumn("by", F.floor(syc / F.lit(block)) + F.col("__o.dy"))
        .withColumn("bz", F.floor(szc / F.lit(block)) + F.col("__o.dz"))
        .filter(mem_s & mem_d)
        .select(
            "src",
            "dst",
            "rest",
            *(["k"] if has_k else []),
            "bx",
            "by",
            "bz",
        )
    )
    stepped = (
        rep.groupBy("bx", "by", "bz")
        .cogroup(eb.groupBy("bx", "by", "bz"))
        .applyInPandas(
            make_kernel(burst), schema=out_schema + ", owned boolean"
        )
    )
    return stepped.filter("owned").select(
        "id", "x", "y", "z", "vx", "vy", "vz", "m"
    )


def run_solver3d_blocked_breaking(
    state: DataFrame,
    bonds: DataFrame,
    n_steps: int,
    strain_limit: float | None,
    k: float = 1.0,
    dt: float = 0.01,
    fuse: int = 25,
    block: float | None = None,
    reach: float | None = None,
    step0: int = 0,
    bcs: tuple[BoundaryCondition, ...] | None = None,
    gravity: tuple[float, float, float] = (0.0, 0.0, 0.0),
    damping: float = 0.0,
    gravity_curve: tuple[tuple[float, float], ...] | None = None,
    bond_law=None,
) -> tuple[DataFrame, DataFrame]:
    """3D block solver with strain-threshold bond removal — the
    ``run_solver_blocked_breaking`` contract one dimension up (see
    simulation/solver.py for the exactly-once emission, dropped-bond
    and per-bond strength/k/ustate semantics; reference:
    Output/MLSOut00B.dat broken-bond series, SURVEY §2.4 A8, in the
    reference's native 3D).

    Persistent per-bond constitutive state (the UDM ``ustate`` slot)
    rides the bond relation across halo-exchange rounds exactly like
    ``alive``/``break_step``: the kernel returns each surviving bond's
    updated ``ustate`` (emitted once, by the replica owning ``src``)
    and the next round re-reads it, so rate/damage laws observe one
    unbroken history across shuffle boundaries. Returns
    ``(final_state, bond_log)`` with one row per input bond
    (``break_step`` -1 = survived; ``ustate`` = final state)."""
    import numpy as np
    import pandas as pd

    gx, gy, gz = (float(g) for g in gravity)
    has_strength = "strength" in bonds.columns
    has_k = "k" in bonds.columns
    if not has_strength:
        if strain_limit is None:
            raise ValueError(
                "strain_limit is required when bonds has no strength column"
            )
        bonds = bonds.withColumn("strength", F.lit(float(strain_limit)))
    if not has_k:
        bonds = bonds.withColumn("k", F.lit(float(k)))
    has_ustate = "ustate" in bonds.columns
    if not has_ustate:
        bonds = bonds.withColumn("ustate", F.lit(0.0))
    law = bond_law if bond_law is not None else _default_breaking_law()
    # checkpoint BEFORE the reach agg (r16 — the r15 fix landed only in
    # the 2D solver): the agg below is an action, and on un-checkpointed
    # bonds it re-ran the caller's whole bond build a second time
    bonds = bonds.select(
        "src", "dst", "rest", "strength", "k", "ustate"
    ).localCheckpoint(eager=False)
    if reach is None:
        if bond_law is not None:
            raise ValueError(
                "a custom bond_law changes when bonds can break; pass an "
                "explicit `reach` covering the law's maximum live bond "
                "length (e.g. (1 + eps_u) * max rest * margin)"
            )
        agg = bonds.agg(
            F.max("rest").alias("mr"), F.max("strength").alias("ms")
        ).collect()[0]
        max_rest = agg["mr"] or 1.0
        max_strength = (
            agg["ms"] if agg["ms"] is not None else (strain_limit or 0.0)
        )
        reach = 1.05 * (1.0 + float(max_strength)) * float(max_rest)
    halo = fuse * reach
    if block is None:
        block = 4.0 * halo

    out_schema = (
        "kind int, id long, x double, y double, z double, "
        "vx double, vy double, vz double, m double, owned boolean, "
        "src long, dst long, rest double, strength double, k double, "
        "break_step long, ustate double"
    )

    def make_kernel(burst: int, step0: int):
        def kernel(parts: pd.DataFrame, local_bonds: pd.DataFrame):
            cols = [
                "kind", "id", "x", "y", "z", "vx", "vy", "vz", "m",
                "owned", "src", "dst", "rest", "strength", "k",
                "break_step", "ustate",
            ]
            if parts.empty:
                return pd.DataFrame(columns=cols)
            ids = parts["id"].to_numpy()
            x = parts["x"].to_numpy(dtype=np.float64).copy()
            y = parts["y"].to_numpy(dtype=np.float64).copy()
            z = parts["z"].to_numpy(dtype=np.float64).copy()
            vx = parts["vx"].to_numpy(dtype=np.float64).copy()
            vy = parts["vy"].to_numpy(dtype=np.float64).copy()
            vz = parts["vz"].to_numpy(dtype=np.float64).copy()
            m = parts["m"].to_numpy(dtype=np.float64)
            owned_p = parts["owned"].to_numpy()
            if local_bonds.empty:
                src = dst = np.empty(0, dtype=np.int64)
                rest = np.empty(0, dtype=np.float64)
                limit = np.empty(0, dtype=np.float64)
                kb = np.empty(0, dtype=np.float64)
                ustate = np.empty(0, dtype=np.float64)
            else:
                # vectorized id -> row-index mapping (bit-identical
                # to the old per-bond dict lookup; r15 optimization)
                order = np.argsort(ids, kind="stable")
                sorted_ids = ids[order]
                src = order[
                    _checked_positions(
                        sorted_ids,
                        local_bonds["src"].to_numpy(dtype=np.int64),
                    )
                ]
                dst = order[
                    _checked_positions(
                        sorted_ids,
                        local_bonds["dst"].to_numpy(dtype=np.int64),
                    )
                ]
                rest = local_bonds["rest"].to_numpy(dtype=np.float64)
                limit = local_bonds["strength"].to_numpy(dtype=np.float64)
                kb = local_bonds["k"].to_numpy(dtype=np.float64)
                ustate = local_bonds["ustate"].to_numpy(
                    dtype=np.float64
                ).copy()
            alive = np.ones(len(src), dtype=bool)
            break_step = np.full(len(src), -1, dtype=np.int64)
            for s_i in range(burst):
                dx = x[dst] - x[src]
                dy = y[dst] - y[src]
                dz = z[dst] - z[src]
                dist = np.sqrt(dx * dx + dy * dy + dz * dz)
                mag, just_broke, ustate = law(
                    dist, rest, kb, limit, ustate, alive
                )
                if just_broke is None:
                    just_broke = np.zeros(len(src), dtype=bool)
                break_step[just_broke] = step0 + s_i + 1
                alive &= ~just_broke
                fx = np.zeros_like(x)
                fy = np.zeros_like(y)
                fz = np.zeros_like(z)
                np.add.at(fx, src, mag * dx)
                np.add.at(fy, src, mag * dy)
                np.add.at(fz, src, mag * dz)
                np.add.at(fx, dst, -mag * dx)
                np.add.at(fy, dst, -mag * dy)
                np.add.at(fz, dst, -mag * dz)
                t_now = (step0 + s_i + 1) * dt
                if gx != 0.0 or gy != 0.0 or gz != 0.0:
                    g_s = _curve_scale(gravity_curve, t_now)
                    fx += gx * g_s * m
                    fy += gy * g_s * m
                    fz += gz * g_s * m
                if bcs:
                    for bc in bcs:
                        if bc.kind not in ("force", "nonreflection"):
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        if bc.kind == "force":
                            fx[msk] += bc.vx * s
                            fy[msk] += bc.vy * s
                            fz[msk] += bc.vz * s
                        else:
                            fx[msk] -= bc.c * s * vx[msk]
                            fy[msk] -= bc.c * s * vy[msk]
                            fz[msk] -= bc.c * s * vz[msk]
                if damping != 0.0:
                    fx -= damping * np.abs(fx) * np.sign(vx)
                    fy -= damping * np.abs(fy) * np.sign(vy)
                    fz -= damping * np.abs(fz) * np.sign(vz)
                vx += fx / m * dt
                vy += fy / m * dt
                vz += fz / m * dt
                if bcs:
                    for bc in bcs:
                        if bc.kind != "acceleration":
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        vx[msk] += bc.vx * s * dt
                        vy[msk] += bc.vy * s * dt
                        vz[msk] += bc.vz * s * dt
                    for bc in bcs:
                        if bc.kind != "velocity":
                            continue
                        msk = _bc_mask(bc, x, y, z)
                        s = bc.scale_at(t_now)
                        vx[msk] = bc.vx * s
                        vy[msk] = bc.vy * s
                        vz[msk] = bc.vz * s
                x += vx * dt
                y += vy * dt
                z += vz * dt
            p_out = pd.DataFrame(
                {
                    "kind": 0,
                    "id": ids,
                    "x": x, "y": y, "z": z,
                    "vx": vx, "vy": vy, "vz": vz, "m": m,
                    "owned": owned_p,
                    "src": -1, "dst": -1, "rest": 0.0, "strength": 0.0,
                    "k": 0.0,
                    "break_step": -1,
                    "ustate": 0.0,
                }
            )
            emit = (
                np.array([bool(owned_p[s]) for s in src])
                if len(src)
                else np.empty(0, dtype=bool)
            )
            b_out = pd.DataFrame(
                {
                    "kind": 1,
                    "id": -1,
                    "x": 0.0, "y": 0.0, "z": 0.0,
                    "vx": 0.0, "vy": 0.0, "vz": 0.0, "m": 0.0,
                    "owned": True,
                    "src": (
                        local_bonds["src"].to_numpy()[emit]
                        if len(src) else np.empty(0, dtype=np.int64)
                    ),
                    "dst": (
                        local_bonds["dst"].to_numpy()[emit]
                        if len(src) else np.empty(0, dtype=np.int64)
                    ),
                    "rest": rest[emit] if len(src) else np.empty(0),
                    "strength": limit[emit] if len(src) else np.empty(0),
                    "k": kb[emit] if len(src) else np.empty(0),
                    "break_step": (
                        break_step[emit] if len(src)
                        else np.empty(0, dtype=np.int64)
                    ),
                    "ustate": ustate[emit] if len(src) else np.empty(0),
                }
            )
            return pd.concat([p_out, b_out], ignore_index=True)[cols]

        return kernel

    spark = state.sparkSession
    log_schema = (
        "src long, dst long, rest double, strength double, k double, "
        "break_step long, ustate double"
    )
    broken_log = spark.createDataFrame([], log_schema)

    offs = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dz).alias("dz"),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
    )
    i = 0
    while i < n_steps:
        burst = min(fuse, n_steps - i)
        in_halo = (
            (F.col("x") >= F.col("bx") * block - halo)
            & (F.col("x") < (F.col("bx") + 1) * block + halo)
            & (F.col("y") >= F.col("by") * block - halo)
            & (F.col("y") < (F.col("by") + 1) * block + halo)
            & (F.col("z") >= F.col("bz") * block - halo)
            & (F.col("z") < (F.col("bz") + 1) * block + halo)
        )
        rep = (
            state.withColumn("__bx", F.floor(F.col("x") / F.lit(block)))
            .withColumn("__by", F.floor(F.col("y") / F.lit(block)))
            .withColumn("__bz", F.floor(F.col("z") / F.lit(block)))
            .withColumn("__o", F.explode(offs))
            .withColumn("bx", F.col("__bx") + F.col("__o.dx"))
            .withColumn("by", F.col("__by") + F.col("__o.dy"))
            .withColumn("bz", F.col("__bz") + F.col("__o.dz"))
            .withColumn(
                "owned",
                (F.col("__o.dx") == 0)
                & (F.col("__o.dy") == 0)
                & (F.col("__o.dz") == 0),
            )
            .filter(F.col("owned") | in_halo)
            .select(
                "id", "x", "y", "z", "vx", "vy", "vz", "m",
                "bx", "by", "bz", "owned",
            )
        )
        # bond co-blocks from endpoint positions — same fused form (and
        # the same exact rep-membership predicate) as blocked_round3d
        sp = state.select(
            F.col("id").alias("src"),
            F.col("x").alias("__sx"),
            F.col("y").alias("__sy"),
            F.col("z").alias("__sz"),
        )
        dp = state.select(
            F.col("id").alias("dst"),
            F.col("x").alias("__dx"),
            F.col("y").alias("__dy"),
            F.col("z").alias("__dz"),
        )

        def _in_halo3(xc, yc, zc):
            return (
                (xc >= F.col("bx") * block - halo)
                & (xc < (F.col("bx") + 1) * block + halo)
                & (yc >= F.col("by") * block - halo)
                & (yc < (F.col("by") + 1) * block + halo)
                & (zc >= F.col("bz") * block - halo)
                & (zc < (F.col("bz") + 1) * block + halo)
            )

        sxc, syc, szc = F.col("__sx"), F.col("__sy"), F.col("__sz")
        dxc, dyc, dzc = F.col("__dx"), F.col("__dy"), F.col("__dz")
        dobx = F.floor(dxc / F.lit(block))
        doby = F.floor(dyc / F.lit(block))
        dobz = F.floor(dzc / F.lit(block))
        mem_s = (
            (F.col("__o.dx") == 0)
            & (F.col("__o.dy") == 0)
            & (F.col("__o.dz") == 0)
        ) | _in_halo3(sxc, syc, szc)
        mem_d = (
            (dobx == F.col("bx"))
            & (doby == F.col("by"))
            & (dobz == F.col("bz"))
        ) | (
            _in_halo3(dxc, dyc, dzc)
            & (F.abs(F.col("bx") - dobx) <= 1)
            & (F.abs(F.col("by") - doby) <= 1)
            & (F.abs(F.col("bz") - dobz) <= 1)
        )
        eb = (
            bonds.join(sp, "src")
            .join(dp, "dst")
            .withColumn("__o", F.explode(offs))
            .withColumn(
                "bx", F.floor(sxc / F.lit(block)) + F.col("__o.dx")
            )
            .withColumn(
                "by", F.floor(syc / F.lit(block)) + F.col("__o.dy")
            )
            .withColumn(
                "bz", F.floor(szc / F.lit(block)) + F.col("__o.dz")
            )
            .filter(mem_s & mem_d)
            .select(
                "src", "dst", "rest", "strength", "k", "ustate",
                "bx", "by", "bz",
            )
        )
        # LAZY checkpoint — same rationale as the 2D breaking solver
        # (plan truncation is eagerness-independent; the cache-backed
        # RDD computes once for all three consumers, and every round
        # folds into the caller's final action instead of one eager
        # job per round)
        out = (
            rep.groupBy("bx", "by", "bz")
            .cogroup(eb.groupBy("bx", "by", "bz"))
            .applyInPandas(make_kernel(burst, step0 + i), schema=out_schema)
            .localCheckpoint(eager=False)
        )
        state = out.filter("kind = 0 AND owned").select(
            "id", "x", "y", "z", "vx", "vy", "vz", "m"
        )
        bond_rows = out.filter("kind = 1").select(
            "src", "dst", "rest", "strength", "k", "break_step", "ustate"
        )
        # same dropped-bond contract as 2D: a bond longer than the halo
        # at round start co-blocks with no replica of its src and is
        # necessarily broken already — emit it, never drop it silently
        dropped = bonds.join(
            bond_rows.select("src", "dst"), ["src", "dst"], "left_anti"
        ).withColumn("break_step", F.lit(step0 + i + 1).cast("long"))
        broken_log = (
            broken_log.union(
                bond_rows.filter("break_step >= 0").select(
                    "src", "dst", "rest", "strength", "k", "break_step",
                    "ustate",
                )
            )
            .union(
                dropped.select(
                    "src", "dst", "rest", "strength", "k", "break_step",
                    "ustate",
                )
            )
            .localCheckpoint(eager=False)
        )
        bonds = bond_rows.filter("break_step < 0").select(
            "src", "dst", "rest", "strength", "k", "ustate"
        ).localCheckpoint(eager=False)
        i += burst

    bond_log = bonds.withColumn(
        "break_step", F.lit(-1).cast("long")
    ).select(
        "src", "dst", "rest", "strength", "k", "break_step", "ustate"
    ).union(
        broken_log.select(
            "src", "dst", "rest", "strength", "k", "break_step", "ustate"
        )
    )
    keep = ["src", "dst", "rest"]
    if has_strength:
        keep.append("strength")
    if has_k:
        keep.append("k")
    if has_ustate or bond_law is not None:
        keep.append("ustate")
    bond_log = bond_log.select(*keep, "break_step")
    return state, bond_log


def _default_breaking_law():
    from columnarmodeling_spark.simulation.solver import (
        linear_spring_breaking_law,
    )

    return linear_spring_breaking_law
