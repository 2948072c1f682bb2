"""Vector constructors / transforms as Column expressions.

Reference: /root/reference/pkg/core/vector/vector.go
  - Normalize :258-269  in-place scale to unit L2 norm; zero vector untouched
  - Zero      :45-53
  - Random    :56-71    uniform [0,1)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .distance import l2_norm

__all__ = ["vector_lit", "normalize", "zero_vector", "random_vector"]


def vector_lit(values: Sequence[float]) -> Column:
    """Array<double> literal for a query vector (constant-folded by Catalyst)."""
    return F.array(*[F.lit(float(v)) for v in values])


def normalize(a: Column) -> Column:
    """Scale to unit L2 norm; zero vector returned untouched
    (vector.go:262-264 skips norm==0)."""
    n = l2_norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a.cast("array<double>"), lambda x: x / n))


def zero_vector(dim: int) -> Column:
    return F.array_repeat(F.lit(0.0), dim)


def random_vector(dim: int, seed: int | None = None) -> Column:
    """Uniform [0,1) per component (vector.go:62-69)."""
    if seed is not None:
        return F.transform(F.sequence(F.lit(1), F.lit(dim)),
                           lambda i: F.rand(seed))
    return F.transform(F.sequence(F.lit(1), F.lit(dim)), lambda _: F.rand())
