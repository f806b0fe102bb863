"""Greedy randomized selection under a disjointness constraint
(SURVEY §2.5 W4: ``GenerateColumnar.py:253-263`` layer-1 and ``:289-299``
layer-2 grain selection — shuffle the pool, take until quota, skip any
candidate sharing a node with an already-selected one).

The accept/reject decision depends on every previous accept, so the
operator is inherently sequential (SURVEY §4 "needs custom code"). The
engine keeps the exact semantics by folding on the driver over the
*candidate* list — which is grains (orders of magnitude smaller than the
point data; the heavy per-candidate key-set construction stays
distributed). The deterministic order column replaces Python's
``random.shuffle``: ``md5(id)`` gives a seeded, engine-independent
permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def greedy_disjoint_select(
    candidates: DataFrame,
    order_col: str,
    id_col: str,
    key_set_col: str,
    quota: int,
) -> list:
    """Sequential greedy fold; returns the selected ids in accept order.

    ``candidates`` must be small enough to collect (it is the *grain*
    table, not the point table — the reference's pools are ~150 rows).
    """
    rows = candidates.orderBy(order_col).collect()
    selected: list = []
    used: set = set()
    for r in rows:
        if len(selected) >= quota:
            break
        ks = set(r[key_set_col])
        if used.isdisjoint(ks):
            selected.append(r[id_col])
            used |= ks
    return selected
