"""Vector (array<float/double>) expressions for embedding columns.

JVM-side dot/norm/cosine via zip_with + aggregate — no Python in the
hot path, so brute-force ANN scans stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(
    a: Column | str, b: Column | str, b_norm: float | None = None
) -> Column:
    """``b_norm`` short-circuits the right side's norm with a
    precomputed constant — when ``b`` is a literal query vector, the
    per-row aggregate over its dim literals is pure interpreted-HOF
    overhead (Python float summation runs the same sequential order,
    so the value is identical)."""
    nb = F.lit(float(b_norm)) if b_norm is not None else l2_norm(b)
    return dot_product(a, b) / (l2_norm(a) * nb)


def vector_literal(vec) -> Column:
    """Broadcastable literal array<double> from a Python sequence."""
    return F.array(*[F.lit(float(v)) for v in vec])
