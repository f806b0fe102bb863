"""Text-analysis building blocks (tokens, shingles, arithmetic hashes).

These are the engine-side primitives for the training-data-pipeline
operators (dedup, fingerprinting, quality scoring). Everything is a
JVM-side Column expression — no Python UDFs in the hot path — and every
primitive has an exact DuckDB-SQL counterpart so the oracle can replay
the same arithmetic bit-for-bit:

- token split:   ``[^a-z0-9]+`` on lowered text, empties dropped;
- hex hash:      first 15 hex chars of md5 → BIGINT (both engines parse
                 identically; 60 bits, no overflow);
- minhash:       ``(a_i * (u % P) + b_i) % P`` over shingle hashes,
                 P = 2^31 − 1 (Mersenne), per-doc min.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647
# Fixed (a, b) parameter pairs for the minhash family.
MINHASH_AB: list[tuple[int, int]] = [
    (131, 7919),
    (137, 6101),
    (139, 3571),
    (149, 9403),
    (151, 1009),
    (157, 8887),
    (163, 2803),
    (167, 5741),
]


def tokens(col: str) -> Column:
    """Lowercased alnum tokens; identical to the oracle's
    ``list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t->t<>'')``."""
    return F.filter(F.split(F.lower(F.col(col)), "[^a-z0-9]+"), lambda x: x != "")


def word_shingles(tok_col: str, n: int = 3) -> Column:
    """Sliding word n-grams over a token array column (space-joined).

    Guarded for short docs: fewer than *n* tokens → empty array
    (``sequence(0, negative)`` would run descending in Spark).
    """
    parts = ", ".join(f"{tok_col}[i+{j}]" for j in range(n))
    gram = f"transform(sequence(0, size({tok_col})-{n}), i -> concat_ws(' ', {parts}))"
    return F.when(F.size(F.col(tok_col)) >= n, F.expr(gram)).otherwise(
        F.array().cast("array<string>")
    )


def hex_hash(col: Column | str) -> Column:
    """60-bit integer hash: first 15 hex chars of md5. Oracle form:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_value(u_mod_p: Column, a: int, b: int) -> Column:
    """One member of the minhash family on a pre-reduced hash."""
    return (F.lit(a) * u_mod_p + F.lit(b)) % F.lit(MERSENNE_P)


# --- DuckDB oracle fragments (kept beside the Spark forms so the two
# --- sides evolve together) ------------------------------------------------

SQL_TOKENS = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
)
SQL_SHINGLES3 = (
    "list_transform(range(1, len({tk})-1), i -> {tk}[i] || ' ' || {tk}[i+1] || ' ' || {tk}[i+2])"
)
SQL_HEX_HASH = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"
