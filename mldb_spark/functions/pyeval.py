"""pyeval — the inline-lambda escape hatch of the dialect, standing
in for the reference's jseval (builtin/js/js_function.cc:117-226; doc
ValueExpression.md §jseval). The reference embeds a JS engine in the
server; this engine's extension language is Python, so the same
contract is exposed as

    pyeval('<python expression>', 'a,b', expr1, expr2)
    pyeval('<python expression>', 'a,b', expr1, expr2, {type: 'string'})

— argument N+2 binds to the N-th declared name, the expression is
evaluated once per row, and the result column defaults to double
(override with the trailing {type: ...} options row: string /
integer / number / boolean).

Execution shape: the lambda is compiled ONCE at bind time and runs
inside an Arrow-batched pandas UDF — rows cross into Python in
columnar batches (the same boundary every jseval call pays in the
reference, which is why both engines document the native-function
path as the fast one). `math` and `re` are in scope; failures follow
the row-level error convention (NULL out, never a failed job).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    MapType,
    StringType,
)

_TYPES: dict[str, DataType] = {
    "number": DoubleType(),
    "double": DoubleType(),
    "integer": LongType(),
    "string": StringType(),
    "boolean": BooleanType(),
    # dict results become a MAP<string,string> row — `AS *` spreads it
    # to sparse columns (the jseval row-output contract, MLDB-704's
    # `jseval(...) AS *`); values render as strings like the engine's
    # other open-schema row forms
    "row": MapType(StringType(), StringType()),
}

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def compile_lambda(src: str, argnames: list[str]):
    """Compile 'a*2 + b' with declared names ['a', 'b'] into a plain
    Python callable. Raises at bind time on a syntax error or bad
    argument name — query-compile failures must not wait for
    executors."""
    for n in argnames:
        if not _NAME_RE.match(n):
            raise ValueError(f"pyeval: invalid argument name {n!r}")
    # tolerate the reference's `return <expr>` spelling (jseval
    # bodies are statements; a single trailing return is the common
    # form in its test corpus — MLDB-704)
    stripped = src.strip()
    if stripped.startswith("return "):
        src = stripped[len("return "):]
    env = {"math": math, "re": re}
    try:
        fn = eval(  # noqa: S307 — pyeval IS the documented escape hatch
            "lambda {}: ({})".format(", ".join(argnames), src), env
        )
    except SyntaxError as e:
        raise ValueError(f"pyeval: cannot compile {src!r}: {e}") from e
    return fn


def pyeval_udf(src: str, argnames: list[str], out_type: str = "number"):
    """Bind-time construction of the Arrow-batched UDF for one pyeval
    call site. Per-row exceptions PROPAGATE with the script's own
    message (MLDBFB-458/MLDB-723: the reference surfaces a thrown
    string in the query error); a lambda returning None yields NULL."""
    if out_type not in _TYPES:
        raise ValueError(
            f"pyeval: unknown type {out_type!r} (one of {sorted(_TYPES)})"
        )
    fn = compile_lambda(src, argnames)
    spark_type = _TYPES[out_type]
    def _row_cast(r):
        if not isinstance(r, dict):
            raise TypeError("pyeval row output needs a dict")
        return {
            str(k): (None if v is None else str(v)) for k, v in r.items()
        }

    cast = {
        "number": float, "double": float, "integer": int,
        "string": str, "boolean": bool, "row": _row_cast,
    }[out_type]

    @F.pandas_udf(spark_type)
    def run(*cols: pd.Series) -> pd.Series:
        out = []
        # struct-typed arguments arrive as a pd.DataFrame — hand the
        # lambda a per-row dict (the {*} row-input contract, MLDB-704)
        mats = [
            c.to_dict("records") if isinstance(c, pd.DataFrame) else c.to_list()
            for c in cols
        ]
        for vals in zip(*mats):
            try:
                r = fn(*vals)
                out.append(None if r is None else cast(r))
            except Exception as e:
                # the reference PROPAGATES the script's exception with
                # its message (MLDBFB-458: `throw "this query is
                # weird"` must surface "this query is weird" in the
                # query error, not a silent NULL)
                raise RuntimeError(f"pyeval: {e}") from e
        return pd.Series(out, dtype=object)

    def apply(*args: Column) -> Column:
        if len(args) != len(argnames):
            raise ValueError(
                f"pyeval: {len(argnames)} declared names "
                f"({', '.join(argnames)}) but {len(args)} arguments"
            )
        return run(*args)

    return apply
