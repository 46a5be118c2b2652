"""Bucketed-table co-located joins: the repeated-join scale path.

Two tables bucketed on the join key with equal bucket counts must
join without a shuffle exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mldb_spark.catalog import load, write_bucketed


def test_time_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from mldb_spark.catalog import write_time_partitioned

    ev = load(spark, sf_dir, "events")
    out = str(tmp_path / "ev_parts")
    write_time_partitioned(ev, out)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # a time filter on the partition column must prune partitions
    one_day = back.filter(F.col("__part") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "__part" in plan.split("PartitionFilters")[1].split("]")[0]


def test_tsne_real_contract(spark, sf_dir):
    # tsne_train is a real solver now (was a stub): bounded sample in,
    # (id, x, y) coordinates out
    from mldb_spark.ml.procedures import tsne_train

    coords = tsne_train(
        load(spark, sf_dir, "embeddings"), "embedding", max_rows=30, perplexity=5.0
    )
    rows = coords.collect()
    assert len(rows) == 30
    assert set(rows[0].asDict()) == {"vec_id", "x", "y"}


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", ["l_orderkey"], 8)
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8)
    try:
        a = spark.table("b_lineitem")
        b = spark.table("b_orders")
        joined = a.join(
            b.hint("merge"), a["l_orderkey"] == b["o_orderkey"]
        ).groupBy().agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # neither join input may carry a hashpartitioning exchange —
        # the bucket layout already provides the distribution
        join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning" not in join_section
        n = joined.collect()[0]["n"]
        assert n == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
