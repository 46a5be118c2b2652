"""Shared test utilities: the local replica of the driver's
Spark-vs-DuckDB comparison (row count, column names, order-insensitive
value hash)."""

from __future__ import annotations

import hashlib
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def canonical_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rendered = sorted("|".join(_cell(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(rendered).encode()).hexdigest()


def compare_spark_duck(df, con, sql: str) -> list[str]:
    """Return a list of problems (empty = parity).

    Spark rows come via collect(), NOT toPandas(): pandas coerces
    NULL doubles to NaN, which would falsely diverge from DuckDB's
    NULLs."""
    s_cols = list(df.columns)
    s_rows = [tuple(r) for r in df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    problems = []
    if len(s_rows) != len(d_rows):
        problems.append(f"row count {len(s_rows)} vs {len(d_rows)}")
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
    if not problems and canonical_hash(s_rows, s_cols) != canonical_hash(d_rows, d_cols):
        s_sorted = sorted(
            s_rows, key=lambda r: [_cell(r[i]) for i in sorted(range(len(s_cols)), key=lambda i: s_cols[i])]
        )
        d_sorted = sorted(
            d_rows, key=lambda r: [_cell(r[i]) for i in sorted(range(len(d_cols)), key=lambda i: d_cols[i])]
        )
        diff = next(
            (
                f"first diff: spark={a} duck={b}"
                for a, b in zip(s_sorted, d_sorted)
                if canonical_hash([a], s_cols) != canonical_hash([b], d_cols)
            ),
            "value-hash mismatch",
        )
        problems.append(diff)
    return problems
