"""Text kernels shared by the dedup/text operators — built-in-function
compositions (split/transform/array ops), all Tungsten-side."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(text), " ")


def distinct_shingles(text: Column, n: int = 3) -> Column:
    """Array of distinct n-word shingles, built and deduped inside the row
    (zero shuffle; the set semantics DISTINCT would otherwise shuffle for)."""
    w = tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j + 1) for j in range(n)]
            ),
        )
    )


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased canonical form."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def content_fingerprint(text: Column) -> Column:
    """md5 over the sorted distinct token set (order-insensitive identity)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))


def hash32(col: Column) -> Column:
    """Deterministic 32-bit integer hash shared with SQL oracles:
    first 8 hex chars of md5 (identical in Spark and DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def simhash16(text: Column) -> Column:
    """16-bit SimHash computed ENTIRELY inside the row: distinct tokens →
    16-bit md5-derived hashes (``transform``), per-bit ±1 votes
    (``aggregate``), sign → bit.  Zero shuffles — the signature is a
    map-only expression, unlike the groupBy-votes formulation in
    ``operators.dedup.dedup_simhash`` (same numbers, different plan).
    The streaming near-dup filter builds on this: signatures of an
    unbounded stream can't wait for a groupBy."""
    toks = F.array_distinct(tokens(text))
    hs = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
    )

    def vote(b: int) -> Column:
        return F.aggregate(
            hs,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    sig = None
    for b in range(16):
        term = F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return sig
