from __future__ import annotations

from pyspark.sql import functions as F

from mldb_spark.api import Mldb
from mldb_spark.catalog import load
from mldb_spark.operators.relational import column_expr, column_stats


def test_column_stats_shape(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    stats = column_stats(part)
    rows = {r["columnName"]: r for r in stats.collect()}
    assert set(rows) == set(part.columns)
    assert rows["p_partkey"]["n_nonnull"] == part.count()
    assert rows["p_type"]["dtype"] == "string"


def test_column_expr_select_densest(spark, sf_dir):
    part = load(spark, sf_dir, "part")
    out = column_expr(
        part,
        where=F.col("dtype") != "string",
        order_by=F.desc("n_distinct_approx"),
        limit=2,
    )
    assert len(out.columns) == 2
    assert all(dict(part.dtypes)[c] != "string" for c in out.columns)


def test_column_expr_prefix_filter(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    out = column_expr(orders, where=F.col("columnName").startswith("o_order"))
    assert set(out.columns) == {
        "o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority"
    }


def test_mldb_api_roundtrip(spark, sf_dir):
    mldb = Mldb(spark)
    mldb.create_dataset("orders", load(spark, sf_dir, "orders"))
    out = mldb.transform(
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey",
        "per_customer",
    )
    assert "per_customer" in mldb.datasets()
    # transformed dataset is queryable by name
    top = mldb.query(
        "SELECT count(*) AS big FROM per_customer WHERE n >= $floor",
        params={"floor": 5},
    ).collect()[0]["big"]
    assert 0 < top <= out.count()

    train, test = mldb.split("orders", [0.8, 0.2])
    assert abs(train.count() + test.count() - mldb.dataset("orders").count()) == 0


def test_sql_expression_function(spark, sf_dir):
    mldb = Mldb(spark)
    mldb.create_dataset("orders", load(spark, sf_dir, "orders"))
    mldb.create_sql_expression_function(
        "pricing", "o_totalprice * 1.1 AS with_tax, upper(o_orderstatus) AS status"
    )
    out = mldb.apply_function("pricing", mldb.dataset("orders"))
    row = out.limit(1).collect()[0]
    assert abs(row["with_tax"] - row["o_totalprice"] * 1.1) < 1e-9
    assert row["status"] == row["o_orderstatus"].upper()
    # open schema: expression over a missing column yields NULL
    mldb.create_sql_expression_function("ghost", "no_such + 1 AS g")
    assert mldb.apply_function("ghost", mldb.dataset("orders")).limit(1).collect()[0]["g"] is None


def test_sql_query_function(spark, sf_dir):
    mldb = Mldb(spark)
    mldb.create_dataset("orders", load(spark, sf_dir, "orders"))
    mldb.create_sql_query_function(
        "big_orders",
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > $floor",
    )
    n1 = mldb.apply_function("big_orders", {"floor": 100000}).collect()[0]["n"]
    n2 = mldb.apply_function("big_orders", {"floor": 300000}).collect()[0]["n"]
    assert n1 > n2 > 0


def test_restamp_and_cell_timestamps(spark, sf_dir):
    from mldb_spark.operators.temporal import (
        cell_timestamps,
        events_to_cells,
        restamp,
    )

    cells = events_to_cells(load(spark, sf_dir, "events"))
    stamped = restamp(cells, "2030-01-01 00:00:00")
    ts = cell_timestamps(stamped).limit(5).collect()
    assert all(
        r["earliest_timestamp"] == r["latest_timestamp"]
        and r["n_distinct_timestamps"] == 1
        for r in ts
    )


def test_sql_query_function_named_columns(spark, sf_dir):
    """sql.query NAMED_COLUMNS output (builtin/sql_functions.cc:316;
    doc SqlQueryFunction.md): (column, value) rows pivot into one
    dynamic row."""
    from mldb_spark.api import Mldb
    from mldb_spark.catalog import load

    mldb = Mldb(spark)
    mldb.create_dataset("region4", load(spark, sf_dir, "region"))
    mldb.create_sql_query_function(
        "region_row",
        "SELECT r_name AS column, cast(r_regionkey AS string) AS value FROM region4",
        output="NAMED_COLUMNS",
    )
    out = mldb.apply_function("region_row")
    rows = out.collect()
    assert len(rows) == 1
    row = rows[0].asDict()
    assert row.get("AMERICA") == "0" or "AMERICA" in row


def test_transform_skip_empty_rows_drops_cellless_rows(spark, sf_dir):
    """ADVICE r8: the injected __rowName column must not count as a
    cell — a row whose value columns are all NULL is 'empty' and
    skipEmptyRows drops it (builtin/sql_functions.cc transform)."""
    from mldb_spark.api import Mldb

    mldb = Mldb(spark)
    df = spark.createDataFrame(
        [("r1", 1.0), ("r2", None)], "k string, v double"
    )
    mldb.create_dataset("ser_src", df)
    out = mldb.transform(
        "SELECT v NAMED k FROM ser_src", "ser_out", skip_empty_rows=True
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["v"] == 1.0


def test_decode_cell_converts_non_utc_offsets(spark):
    """ADVICE r8: {"ts": "...-05:00"} must store the UTC instant,
    not the naive local time with the offset stripped."""
    import datetime as dt

    from mldb_spark.api import Mldb

    got = Mldb._decode_cell({"ts": "2017-01-01T05:00:00-05:00"})
    assert got == dt.datetime(2017, 1, 1, 10, 0, 0)
    got_z = Mldb._decode_cell({"ts": "2017-01-01T05:00:00Z"})
    assert got_z == dt.datetime(2017, 1, 1, 5, 0, 0)


def test_user_dunder_columns_survive_wildcards(spark):
    """ADVICE r8: a legitimate user column like `a.__x` (legal in the
    reference's open path scheme) must survive SELECT * — only
    engine-reserved internals hide."""
    from mldb_spark.api import Mldb

    mldb = Mldb(spark)
    df = spark.createDataFrame([(1, 2)], ["`a.__x`", "__y_user"])
    df = df.toDF("a.__x", "__y_user")
    mldb.create_dataset("dunder_src", df)
    out = mldb.query("SELECT * FROM dunder_src")
    assert "a.__x" in out.columns
    assert "__y_user" in out.columns
    # engine internals still hide
    from mldb_spark.dialect.translate import _hidden_col

    assert _hidden_col("__rowName")
    assert _hidden_col("t1.__cellsRow")
    assert _hidden_col("__g0") and _hidden_col("__ord3")
    assert not _hidden_col("__y_user")
    assert not _hidden_col("a.__x")


def test_import_text_unique_temp_dataset(spark, tmp_path):
    """ADVICE r8: import.text's intermediate must not persist in the
    registry nor collide across imports."""
    from mldb_spark.api import Mldb

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n3,4\n")
    mldb = Mldb(spark)
    mldb.create_entity(
        "procedure",
        {
            "type": "import.text",
            "id": "imp_a",
            "params": {
                "dataFileUrl": f"file://{p}",
                "outputDataset": "imp_a_out",
                "runOnCreation": True,
            },
        },
    )
    assert not any(d.startswith("__import_raw") for d in mldb.datasets())
    assert mldb.dataset("imp_a_out").count() == 2


def test_bucketize_percentile_validation(spark, sf_dir):
    """ADVICE r8: bucketize percentileBuckets validation
    (bucketize_procedure.cc:79-100) — bounds, ordering, overlap."""
    import pytest as _pytest

    from mldb_spark.api import Mldb
    from mldb_spark.catalog import load

    mldb = Mldb(spark)
    mldb.create_dataset(
        "bk_src", load(spark, sf_dir, "region"), row_name_col="r_name"
    )
    base = {
        "type": "bucketize",
        "id": "bk_proc",
        "params": {
            "inputData": "SELECT * FROM bk_src ORDER BY r_regionkey",
            "outputDataset": "bk_out",
            "runOnCreation": True,
        },
    }

    def run(buckets):
        cfg = dict(base)
        cfg["params"] = dict(base["params"], percentileBuckets=buckets)
        return mldb.create_entity("procedure", cfg)

    with _pytest.raises(ValueError, match="lower bound"):
        run({"b1": [-5, 50]})
    with _pytest.raises(ValueError, match="higher bound must be lower"):
        run({"b1": [0, 150]})
    with _pytest.raises(ValueError, match="greater than lower"):
        run({"b1": [50, 50]})
    with _pytest.raises(ValueError, match="overlapping"):
        run({"b1": [0, 60], "b2": [40, 100]})
    ok = run({"lo": [0, 50], "hi": [50, 100]})
    assert ok is not None


def test_column_stats_need_flags(spark, sf_dir):
    """Optimization r9: COLUMN EXPR's phase 1 computes only the stats
    the clause expressions reference — name-only selection runs no
    data aggregate (unrequested stats are NULL, loudly absent)."""
    part = load(spark, sf_dir, "part")
    meta_only = column_stats(part, need_counts=False, need_distinct=False)
    rows = {r["columnName"]: r for r in meta_only.collect()}
    assert set(rows) == set(part.columns)
    assert rows["p_type"]["dtype"] == "string"
    assert rows["p_partkey"]["n_nonnull"] is None
    assert rows["p_partkey"]["n_distinct_approx"] is None
    counts_only = column_stats(part, need_counts=True, need_distinct=False)
    r = counts_only.filter(F.col("columnName") == "p_partkey").collect()[0]
    assert r["n_nonnull"] == part.count()
    assert r["n_distinct_approx"] is None


def test_column_expr_stat_needs_detection():
    """The dialect's AST scan requests counts only for rowCount()
    (and raw stats-column references), distinct only for
    n_distinct_approx."""
    from mldb_spark.dialect.parser import parse_statement
    from mldb_spark.dialect.translate import _column_expr_stat_needs

    def item_of(sql):
        stm = parse_statement(sql)
        return next(
            it for it in stm.select if type(it).__name__ == "ColumnExprItem"
        )

    name_only = item_of(
        "SELECT COLUMN EXPR (WHERE columnName() LIKE 'l_%' "
        "ORDER BY columnName() LIMIT 2) FROM t"
    )
    assert _column_expr_stat_needs(name_only) == (False, False)
    with_counts = item_of(
        "SELECT COLUMN EXPR (ORDER BY rowCount() DESC LIMIT 2) FROM t"
    )
    assert _column_expr_stat_needs(with_counts) == (True, False)
    with_distinct = item_of(
        "SELECT COLUMN EXPR (WHERE n_distinct_approx > 3) FROM t"
    )
    assert _column_expr_stat_needs(with_distinct) == (False, True)


def test_column_expr_rowcount_still_works(spark):
    """rowCount()-driven COLUMN EXPR keeps working through the
    need-flag path (the MLDB-1172 idiom)."""
    from mldb_spark.dialect import MldbContext

    ctx = MldbContext(spark)
    df = spark.createDataFrame(
        [(1, 1.0, None), (2, 2.0, None), (3, None, 5.0)],
        "id long, dense double, sparse double",
    )
    ctx.register("cx_need", df)
    out = ctx.query(
        "SELECT COLUMN EXPR (ORDER BY rowCount() DESC LIMIT 2) FROM cx_need"
    )
    assert set(out.columns) == {"id", "dense"}


def test_api_column_expr_need_flags(spark, monkeypatch):
    """Optimization r9: the Python-API column_expr prunes its stats
    pass to what the clause Columns reference — name/type-only
    selections run no data aggregate at all."""
    from pyspark.sql import functions as F

    from mldb_spark.operators import relational as rel

    df = spark.createDataFrame(
        [(1, 1.0), (2, None)], "id long, dense double"
    )
    seen = {}
    orig = rel.column_stats

    def spy(d, columns=None, need_counts=True, need_distinct=True):
        seen["flags"] = (need_counts, need_distinct)
        return orig(d, columns, need_counts, need_distinct)

    monkeypatch.setattr(rel, "column_stats", spy)
    out = rel.column_expr(df, where=F.col("dtype") == "double")
    assert seen["flags"] == (False, False)
    assert out.columns == ["dense"]
    out = rel.column_expr(df, order_by=F.desc("n_nonnull"), limit=1)
    assert seen["flags"] == (True, False)
    assert out.columns == ["id"]
    out = rel.column_expr(df, where=F.col("n_distinct_approx") >= 1)
    assert seen["flags"] == (False, True)
    assert set(out.columns) == {"id", "dense"}
