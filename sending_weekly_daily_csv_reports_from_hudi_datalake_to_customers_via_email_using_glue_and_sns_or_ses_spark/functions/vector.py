"""Vector math over ``array<float>`` columns as pure Spark SQL
expressions — zip_with / aggregate run in the JVM inside codegen, so a
cosine sweep over 100 TB of embeddings is a plain columnar scan (no
Arrow round-trip, no Python workers).

Elements are cast to double before multiply/accumulate: float32
accumulation loses ~3 digits at dim 4k+ and, more importantly for the
correctness gate, double accumulation matches what every reference
implementation (NumPy, DuckDB) does.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (sequential left-to-right fold,
    same order as a row-wise loop — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
