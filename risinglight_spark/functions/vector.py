"""Vector distance expressions over ``array<float|double>`` columns.

Reference parity: risinglight's VECTOR(n) type with the pgvector
operators ``<->`` (L2), ``<#>`` (negative inner product) and ``<=>``
(cosine distance) — src/types/vector.rs:79-99, src/array/ops.rs:655-719,
planner/mod.rs:74-76.

Implemented as ``F.zip_with`` / ``F.aggregate`` higher-order functions:
these execute JVM-side inside whole-stage codegen (no Python round
trip), so a brute-force scan over billions of embeddings stays a single
codegen'd stage that parallelizes linearly with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dsum(pairs: Column) -> Column:
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _dsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_distance(a: Column, b: Column) -> Column:
    """``a <-> b`` — Euclidean distance (reference vector.rs:81-87).
    (x-y)*(x-y) rather than pow(x-y, 2) so the oracle's expanded SQL is
    bit-identical."""

    def sq(x: Column, y: Column) -> Column:
        d = x.cast("double") - y.cast("double")
        return d * d

    return F.sqrt(_dsum(F.zip_with(a, b, sq)))


def neg_inner_product(a: Column, b: Column) -> Column:
    """``a <#> b`` — negative dot product (reference vector.rs:96-98)."""
    return -dot(a, b)


def norm(a: Column) -> Column:
    return F.sqrt(
        _dsum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """``a <=> b`` — 1 - cosine similarity (reference vector.rs:89-94)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def lit_vector(values: list[float]) -> Column:
    """A constant query vector as an array<double> literal."""
    return F.array(*[F.lit(float(v)) for v in values])


def sql_list_literal(values: list[float]) -> str:
    """The same constant vector as a DuckDB list literal."""
    return "[" + ", ".join(repr(float(v)) for v in values) + "]"


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Flat codegen chain for ``dot`` (0.0 + a1*b1 + ...): bit-identical
    to the zip_with/aggregate fold (same left-associated order).

    Measured warning (round 4): at dim=64 this is ~3x SLOWER than the
    interpreted fold in a pair join (dedup_semdedup 3.8 s -> 11.2 s at
    sf0.1) — 128 element_at calls per row explode the codegen
    expression tree past what JIT handles well, while the fold is one
    tight interpreted loop over a primitive array.  Only consider it
    for small dims (<= ~8) where the chain stays inside one codegen
    method."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.element_at(a, i + 1).cast("double") * F.element_at(
            b, i + 1
        ).cast("double")
    return acc


def l2_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Flat codegen chain for ``l2_distance`` (sqrt(0.0 + (a1-b1)^2 + ...))."""
    acc = F.lit(0.0)
    for i in range(dim):
        d = F.element_at(a, i + 1).cast("double") - F.element_at(
            b, i + 1
        ).cast("double")
        acc = acc + d * d
    return F.sqrt(acc)
