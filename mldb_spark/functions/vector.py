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


def _sql_double(v) -> str:
    """SQL DOUBLE literal text for one float. repr() emits the
    shortest digits that round-trip, and Spark's parser converts
    correctly-rounded, so the parsed value is bitwise identical to
    F.lit(v) (verified over the full 64×64 plane matrix)."""
    import math

    f = float(v)
    if not math.isfinite(f):
        # SQL has no inf/nan double literals; callers guard upstream
        raise ValueError(f"non-finite literal {v!r}")
    return repr(f) + "D"


def array_double_lit(vals) -> Column:
    """ARRAY<DOUBLE> literal in ONE py4j call (optimization r10).
    F.lit(list) / F.array(*[F.lit(x) ...]) round-trips py4j per
    element: a 64×64 plane matrix cost ~3.5s of plan-construction
    time PER QUERY (q31/qa24/qa21 paid it every call). Parsing one
    SQL string is ~1ms and Catalyst constant-folds it to the same
    Literal node — identical plan, identical bits."""
    return F.expr("array(" + ",".join(_sql_double(v) for v in vals) + ")")


# big-matrix literals folded once per (values, SparkContext): the
# parsed array(array(...)) tree carries one expression node per
# element, and Catalyst re-walks those ~4k nodes in EVERY query that
# embeds the matrix (~0.3-0.7s per query for the 64×64 plane matrix).
# Folding through a 1-row optimizedPlan() yields the same single
# Literal node F.lit would build — without F.lit's per-element py4j
# round-trips — and a Literal is a plain value+type, reusable across
# queries. Keyed on the application id so a restarted JVM never sees
# a stale java object; any failure falls back to the parsed tree.
_FOLDED_MATRIX_CACHE: dict = {}


def matrix_double_lit(rows) -> Column:
    """ARRAY<ARRAY<DOUBLE>> literal in ONE py4j call (see
    array_double_lit); matrices with ≥256 elements additionally fold
    to a single cached Literal node."""
    txt = (
        "array("
        + ",".join(
            "array(" + ",".join(_sql_double(v) for v in r) + ")" for r in rows
        )
        + ")"
    )
    col = F.expr(txt)
    vals = tuple(tuple(float(v) for v in r) for r in rows)
    if sum(len(r) for r in vals) < 256:
        return col
    try:
        from pyspark.sql import SparkSession
        from pyspark.sql.column import Column as _PyColumn

        spark = SparkSession.getActiveSession()
        if spark is None:
            return col
        key = (spark.sparkContext.applicationId, vals)
        hit = _FOLDED_MATRIX_CACHE.get(key)
        if hit is not None:
            return hit
        jexpr = (
            spark.range(1)
            .select(col.alias("m"))
            ._jdf.queryExecution()
            .optimizedPlan()
            .expressions()
            .apply(0)
            .child()
        )
        if jexpr.getClass().getSimpleName() != "Literal":
            return col
        folded = _PyColumn(
            spark._jvm.org.apache.spark.sql.classic.ExpressionUtils.column(jexpr)
        )
        _FOLDED_MATRIX_CACHE[key] = folded
        return folded
    except Exception:
        return col


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


# --- tensor shape family (sql/builtin_functions.cc:2723-2977; doc ---------
# ValueExpression.md §Vector space functions). Embeddings are nested
# Spark arrays; the nesting DEPTH is a static property of the column
# type, so every function below takes `ndim` and compiles to pure JVM
# higher-order functions — no Python crossing, codegen-friendly at
# any scan width.


def ndim_of_dtype(dtype: str) -> int:
    """Nesting depth of a Spark SQL type string:
    'array<array<double>>' -> 2, 'array<float>' -> 1, scalar -> 0."""
    return dtype.count("array<")


def tensor_flatten(a: Column, ndim: int) -> Column:
    """flatten (builtin_functions.cc:2723): n-d embedding -> 1-d,
    row-major (last dimension fastest), e.g.
    flatten([[1,2],[3,4]]) == [1,2,3,4]."""
    if ndim < 1:
        raise ValueError("flatten() requires an embedding argument")
    for _ in range(ndim - 1):
        a = F.flatten(a)
    return a


def tensor_shape(a: Column, ndim: int) -> Column:
    """shape (builtin_functions.cc:2977): the size of each dimension
    as a 1-d int array. Dim k is measured on the first element path
    (embeddings are rectangular by contract)."""
    if ndim < 1:
        raise ValueError("shape() requires an embedding argument")
    dims: list[Column] = []
    cur = a
    for _ in range(ndim):
        dims.append(F.size(cur))
        cur = F.get(cur, 0)
    return F.array(*dims)


def _prod(xs: list[int]) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def _nest(flat: Column, shape: list[int]) -> Column:
    """Build nested arrays of the given static shape from a 1-d slice
    of exactly prod(shape) elements (row-major)."""
    if len(shape) == 1:
        return flat
    inner = _prod(shape[1:])
    return F.transform(
        F.sequence(F.lit(0), F.lit(shape[0] - 1)),
        lambda i: _nest(F.slice(flat, i * inner + 1, inner), shape[1:]),
    )


def tensor_reshape(
    a: Column, shape: list[int], ndim_in: int = 1, fill: Column | None = None
) -> Column:
    """reshape (builtin_functions.cc:2725): reinterpret an embedding
    as the given static shape, row-major. Two-arg form requires the
    element counts to match (mismatch -> NULL, the engine's
    fail-as-NULL convention standing in for the reference's query
    error); three-arg form pads missing elements with `fill` and
    truncates extras (reference reshape(val, shape, newel))."""
    if any(d <= 0 for d in shape):
        raise ValueError(f"reshape() needs positive dims, got {shape}")
    flat = tensor_flatten(a, ndim_in) if ndim_in > 1 else a
    total = _prod(shape)
    if fill is not None:
        flat = F.slice(
            F.concat(flat, F.array_repeat(fill.cast("double"), total)), 1, total
        )
        return _nest(flat, shape)
    return F.when(F.size(flat) == total, _nest(flat, shape))


def tensor_slice(a: Column, index: int, ndim: int) -> Column:
    """slice (doc ValueExpression.md §Vector space functions): select
    the index-th element of the LAST dimension — for an m x n
    embedding, slice(x, i) is the i-th COLUMN as an m-vector (0-based
    indexing, matching embedding path addressing x.0, x.1, ...)."""
    if ndim < 1:
        raise ValueError("slice() requires an embedding argument")
    if ndim == 1:
        return F.get(a, index)
    return F.transform(a, lambda row: tensor_slice(row, index, ndim - 1))


def tensor_concat(*cols: Column) -> Column:
    """concat (builtin_functions.cc:2947): join embeddings along the
    FIRST dimension (1-d: ordinary concatenation; 2-d: vertical
    stack) — shapes must agree on every other dimension, mirroring
    calcShape's result[0] += shape[0] rule. Spark's array concat has
    exactly this semantics on (nested) arrays."""
    return F.concat(*cols)


def p_norm(a: Column, p: float = 2.0) -> Column:
    """p-norm with the reference's exact cases (builtin_functions.cc:
    1706-1749 norm): p=0 counts non-zero elements, p=inf is the max
    element, p=1 the plain total (no abs — distribution::total()),
    p=2 the l2 norm, other finite p>0 the generalized power mean
    root. Invalid p (<=0 or non-finite, other than 0/inf) raises."""
    import math

    if p == 0:
        return F.size(F.filter(a, lambda x: x.cast("double") != 0.0)).cast("double")
    if math.isinf(p):
        return F.array_max(a).cast("double")
    if p <= 0.0 or not math.isfinite(p):
        raise ValueError(f"invalid power {p} for norm()")
    if p == 1:
        return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    if p == 2:
        return l2_norm(a)
    return F.pow(
        F.aggregate(
            F.transform(a, lambda x: F.pow(x.cast("double"), F.lit(p))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.lit(1.0 / p),
    )


def normalize_p(a: Column, p: float = 2.0) -> Column:
    """normalize(v, p) = v / norm(v, p) for every p case, including
    p=0 (divide by the non-zero count — the reference's
    normalize(), builtin_functions.cc:1600-1627)."""
    n = p_norm(a, p)
    return F.transform(a, lambda x: x.cast("double") / n)
