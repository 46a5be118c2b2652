"""Vector-space functions over ARRAY<FLOAT/DOUBLE> embedding columns.

Reference: norm/normalize (sql/builtin_functions.cc:1704-1749),
vector_diff/sum/product/quotient, flatten/reshape/concat/shape
(:2723-2977), and the embedding dataset's KNN surface
(plugins/embedding/embedding.cc). Spark-first: the arithmetic stays
in JVM higher-order functions (F.zip_with / F.aggregate), so a
100 TB scan of embeddings never leaves codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    """Unit-normalize (reference normalize, builtin_functions.cc:1749)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def vector_sum(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def vector_diff(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x - y)


def vector_product(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x * y)


def vector_quotient(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x / y)
