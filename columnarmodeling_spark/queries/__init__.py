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
        simulation,
        io_codec,
        streaming,
        geometry,
    )


_load_all()
