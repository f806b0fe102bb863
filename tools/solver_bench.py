"""Solver-loop throughput at the reference's scale.

The reference solves 125 000 particles × 500 000 steps in 27 049.7 s on
28 OpenMP threads ≈ 2.31 M particle-steps/s
(/root/reference/UniaxialCompressionTest/CPUTime.txt:1, particle count
from the snapshot headers). This benchmark runs the halo-exchange block
solver on a 125 000-particle spring lattice and reports
particle-steps/s for a few fuse settings.

Usage: python tools/solver_bench.py [n_steps] [fuse...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from columnarmodeling_spark.session import get_spark
from columnarmodeling_spark.simulation.solver import run_solver, run_solver_blocked

NX, NY = 500, 250  # 125 000 particles
SPACING = 1.0


def lattice(spark):
    pts = [
        (j * NX + i, float(i), float(j), 0.0, 0.0, 1.0)
        for j in range(NY)
        for i in range(NX)
    ]
    edges = []
    for j in range(NY):
        for i in range(NX):
            a = j * NX + i
            if i + 1 < NX:
                edges.append((a, a + 1, 0.95))
            if j + 1 < NY:
                edges.append((a, a + NX, 0.95))
    state = spark.createDataFrame(
        pts, "id long, x double, y double, vx double, vy double, m double"
    ).repartition(32).cache()
    bonds = spark.createDataFrame(
        edges, "src long, dst long, rest double"
    ).repartition(32).cache()
    state.count(), bonds.count()
    return state, bonds


def main() -> None:
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    state, bonds = lattice(spark)
    n = NX * NY

    # warm-up (JIT/codegen/Arrow): tiny run, untimed
    run_solver_blocked(state, bonds, 2, fuse=2, block=100.0, reach=1.1).count()

    # (fuse, block) sweep: halo = fuse·reach must stay well under block;
    # bigger fuse amortizes the shuffle round over more steps, smaller
    # block raises parallelism — measured optimum on local[32] at
    # 125k particles is fuse=100, block=250.
    for fuse, block in [(25, 80.0), (50, 130.0), (100, 250.0)]:
        t0 = time.time()
        out = run_solver_blocked(
            state, bonds, n_steps, k=1.0, dt=0.001, fuse=fuse,
            block=block, reach=1.1,
        )
        cnt = out.count()
        dt_s = time.time() - t0
        print(
            f"blocked fuse={fuse} block={block}: {n_steps} steps x {cnt} "
            f"particles in {dt_s:.1f}s = "
            f"{n * n_steps / dt_s / 1e6:.2f}M particle-steps/s"
        )

    # per-step relational loop for contrast (few steps only)
    t0 = time.time()
    run_solver(state, bonds, 5, k=1.0, dt=0.001).count()
    dt_s = time.time() - t0
    print(
        f"per-step loop: 5 steps in {dt_s:.1f}s = "
        f"{n * 5 / dt_s / 1e6:.2f}M particle-steps/s"
    )


if __name__ == "__main__":
    main()
