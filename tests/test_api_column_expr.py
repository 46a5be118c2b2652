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
