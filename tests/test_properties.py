"""Property-based tests (hypothesis) for the pure-Python layers:
the dialect parser and the oracle-comparison canonicalizer. These run
without a SparkSession, so hypothesis can afford many examples."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from mldb_spark.dialect import ast
from mldb_spark.dialect.parser import parse_expression, parse_statement, tokenize
from mldb_spark.testing import canonical_hash

idents = st.from_regex(r"[a-z_][a-z_0-9]{0,10}", fullmatch=True).filter(
    lambda s: s not in {
        "select", "from", "where", "and", "or", "not", "in", "is", "null",
        "true", "false", "between", "like", "case", "end", "then", "else",
        "cast", "as", "group", "by", "having", "order", "limit", "offset",
        "named", "when", "distinct", "on", "excluding", "join", "inner",
        "left", "right", "full", "outer", "cross", "asc", "desc", "string",
        "integer", "number", "boolean", "timestamp",
    }
)


@given(idents, st.integers(-1000, 1000), st.integers(1, 1000))
def test_arithmetic_precedence(a, x, y):
    e = parse_expression(f"{a} + {x} * {y}")
    assert isinstance(e, ast.Binary) and e.op == "+"
    assert isinstance(e.right, ast.Binary) and e.right.op == "*"


@given(idents, idents, st.sampled_from(["=", "<", ">", "<=", ">=", "!="]))
def test_comparison_binds_looser_than_arithmetic(a, b, op):
    e = parse_expression(f"{a} + 1 {op} {b} - 2")
    assert isinstance(e, ast.Binary) and e.op == op
    assert isinstance(e.left, ast.Binary) and e.left.op == "+"
    assert isinstance(e.right, ast.Binary) and e.right.op == "-"


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_tokenizer_never_crashes_or_loops(s):
    try:
        toks = tokenize(s)
        assert toks[-1].kind == "eof"
        assert len(toks) <= len(s) + 1
    except SyntaxError:
        pass  # rejecting bad characters is fine; hanging/crashing is not


@given(st.text(alphabet="abcdef'\"().,*", max_size=30))
def test_parser_never_hangs_on_garbage(s):
    try:
        parse_statement("SELECT " + s + " FROM t")
    except (SyntaxError, IndexError, ValueError):
        pass


@given(
    st.lists(
        st.tuples(
            st.integers(-5, 5),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(max_size=5),
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=200)
def test_canonical_hash_is_order_insensitive(rows):
    cols = ["a", "b", "c"]
    shuffled = list(rows)
    random.Random(0).shuffle(shuffled)
    assert canonical_hash(rows, cols) == canonical_hash(shuffled, cols)
    # and column order must not matter either (values move with names)
    perm = [tuple((r[2], r[0], r[1])) for r in rows]
    assert canonical_hash(rows, cols) == canonical_hash(perm, ["c", "a", "b"])


@given(st.lists(st.tuples(st.integers(0, 3)), min_size=1, max_size=10))
def test_canonical_hash_detects_any_value_change(rows):
    cols = ["x"]
    changed = [(rows[0][0] + 1,)] + rows[1:]
    assert canonical_hash(rows, cols) != canonical_hash(changed, cols)


# --- tensor family properties (spark-backed, small example budget) --------


@given(
    st.integers(1, 4),
    st.integers(1, 4),
    st.integers(0, 3),
)
@settings(max_examples=12, deadline=None)
def test_tensor_reshape_flatten_roundtrip_property(spark, a, b, idx):
    """flatten(reshape(v, [a, b])) == v for any a*b-element vector,
    and slice picks the idx-th column (row-major layout invariants,
    builtin_functions.cc:2723-2977)."""
    from pyspark.sql import functions as F

    from mldb_spark.functions.vector import (
        tensor_flatten,
        tensor_reshape,
        tensor_slice,
    )

    n = a * b
    v = [float(i * 7 % 11) for i in range(n)]
    df = spark.range(1).select(F.lit(v).alias("v"))
    m = tensor_reshape(F.col("v"), [a, b], 1)
    out = df.select(
        tensor_flatten(m, 2).alias("rt"),
        (tensor_slice(m, min(idx, b - 1), 2)).alias("col"),
    ).collect()[0]
    assert [float(x) for x in out["rt"]] == v
    j = min(idx, b - 1)
    assert [float(x) for x in out["col"]] == [v[i * b + j] for i in range(a)]
