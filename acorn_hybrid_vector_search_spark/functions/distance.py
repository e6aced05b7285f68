"""Vector distance / similarity as JVM-side Column expressions.

The reference computes squared-L2 row-by-row in Python
(/root/reference/pre-filter.py:63-95) or inside hnswlib's SIMD kernels
(hnswlib/hnswlib/space_l2.h). Here the distance is a Catalyst higher-order
function expression (``zip_with`` + ``aggregate``): it runs inside
whole-stage codegen on the JVM, is vectorizable by Tungsten, and never
crosses the Python boundary — the correct hot path for a 100 TB scan.

All arithmetic is done in DOUBLE with strict left-to-right accumulation so
results are bit-reproducible and comparable against a DuckDB oracle that
sums in the same order.

For very high dimensions where an Arrow/NumPy BLAS kernel wins, see
``operators/similarity.py``'s pandas-UDF variant; measure before switching
(SURVEY.md §7 risk 2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(v: Column | Sequence[float] | str) -> Column:
    """Accept a Column, a column name, or a Python vector literal."""
    if isinstance(v, Column):
        return v
    if isinstance(v, str):
        return F.col(v)
    return F.array(*[F.lit(float(x)) for x in v])


def l2_sq_distance(a: Column | Sequence[float] | str, b: Column | Sequence[float] | str) -> Column:
    """Squared Euclidean distance between two ARRAY<numeric> columns.

    Matches the reference's distance (hnswlib space='l2' returns squared L2;
    /root/reference/acorn.py:26, /root/reference/pre-filter.py:74-78).
    """
    a, b = _as_col(a), _as_col(b)
    diffs = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2)
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def l2_distance(a: Column | Sequence[float] | str, b: Column | Sequence[float] | str) -> Column:
    """Euclidean distance."""
    return F.sqrt(l2_sq_distance(a, b))


def dot_product(a: Column | Sequence[float] | str, b: Column | Sequence[float] | str) -> Column:
    a, b = _as_col(a), _as_col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | Sequence[float] | str) -> Column:
    a = _as_col(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(
    a: Column | Sequence[float] | str, b: Column | Sequence[float] | str
) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    a, b = _as_col(a), _as_col(b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
