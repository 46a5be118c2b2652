"""Scale probe: time the corpus-pipeline operators on 1x/4x/16x
replicas of the sf0.1 documents table and print the scaling curve.

The correctness gates run at small SF; this probe is the empirical
leg of the 100 TB story — each op below is designed to scale linearly
in corpus size (single hash-shuffle or broadcast-join plans), and the
probe shows the measured exponent. Replica text is perturbed with a
replica-tag token so near-dup ops see realistic near-duplicates
instead of a degenerate all-exact-dup corpus.

Usage: python tools/scale_probe.py [sf_dir] [max_factor]
Prints one line per (op, factor): seconds + output rows, then a
per-op scaling summary (t_16x / t_1x; linear == ~16).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mldb_spark.catalog import load  # noqa: E402
from mldb_spark.caching import release_cached  # noqa: E402
from mldb_spark.session import get_spark  # noqa: E402


def replicate(docs, k: int):
    """k near-duplicate replicas per doc: unique ids, text perturbed
    with a per-replica tag token (shingles mostly shared -> realistic
    near-dup load, no degenerate exact-dup explosion)."""
    if k == 1:
        return docs
    return (
        docs.crossJoin(F.broadcast(docs.sparkSession.range(k).select(F.col("id").alias("__r"))))
        .select(
            (F.col("doc_id") * k + F.col("__r")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" replica"), F.col("__r").cast("string")
            ).alias("text"),
            "source",
            "n_chars",
        )
    )


def replicate_cells(cells, k: int):
    """k replicas of the cell table with disjoint row keys — the
    load shape for the all_cells / cells-temporal probes (VERDICT r5
    #8): rows multiply, per-row superposition depth stays constant,
    so the conditional-agg pivot must stay flat."""
    if k == 1:
        return cells
    return (
        cells.crossJoin(
            F.broadcast(
                cells.sparkSession.range(k).select(F.col("id").alias("__r"))
            )
        )
        .select(
            F.concat(F.col("row"), F.lit("#"), F.col("__r").cast("string")).alias("row"),
            "column", "value", "ts",
        )
    )


def probe_cell_ops(spark, cells):
    from mldb_spark.dialect import MldbContext
    from mldb_spark.operators.temporal import all_cells

    def all_cells_where():
        return all_cells(
            cells,
            where_row=(F.col("purchase") > 200) & (F.col("click") < 100),
            where_columns=["purchase", "click"],
        )

    def cells_temporal_sql():
        ctx = MldbContext(spark)
        ctx.register_cells("pc", cells)
        return ctx.query(
            "SELECT rowName() AS r, temporal_count(purchase) AS n, "
            "temporal_sum(purchase) AS s, temporal_max(click) AS m "
            "FROM pc WHERE temporal_count(purchase) >= 1"
        )

    def cells_when_sql():
        ctx = MldbContext(spark)
        ctx.register_cells("pw", cells)
        return ctx.query(
            "SELECT rowName() AS r, purchase FROM pw "
            "WHEN value_timestamp() < latest_timestamp({*})"
        )

    return {
        "all_cells_where": all_cells_where,
        "cells_temporal_sql": cells_temporal_sql,
        "cells_when_sql": cells_when_sql,
    }


def probe_ops(spark, docs):
    from mldb_spark.corpus import (
        decontaminate,
        dedup_lines,
        explode_pseudo_lines,
        mixture_sample,
        repetition_signals,
        unigram_logprob_scores,
    )
    from mldb_spark.dedup import (
        connected_components,
        dedup_exact,
        minhash_near_duplicates,
        simhash_near_duplicates,
    )

    bench = docs.filter(F.col("doc_id") % 997 == 0)
    corpus = docs.filter(F.col("doc_id") % 997 != 0)
    return {
        "dedup_exact": lambda: dedup_exact(docs),
        "minhash_neardup": lambda: minhash_near_duplicates(
            docs, num_hashes=16, bands=4, threshold=0.25, shingle_words=3
        ),
        # fused-rescore path (optimization r9): the radius filter runs
        # inside the collision join, so growth tracks TRUE pairs, not
        # raw collisions — the row that shows it
        "simhash_neardup": lambda: simhash_near_duplicates(
            docs, max_hamming=8
        ),
        "decontaminate": lambda: decontaminate(corpus, bench, n=4),
        "repetition_signals": lambda: repetition_signals(docs),
        "mixture_sample": lambda: mixture_sample(
            docs, weight_col="n_chars", alpha=0.5
        ),
        "line_dedup": lambda: dedup_lines(explode_pseudo_lines(docs, 8)),
        "unigram_logprob": lambda: unigram_logprob_scores(docs),
        # pairs -> groups (pointer-jumping min-label): the dedup
        # resolution step; input pair count grows superlinearly with
        # replicas, so time tracks OUTPUT (pairs), not corpus rows
        "connected_components": lambda: connected_components(
            minhash_near_duplicates(
                docs, num_hashes=16, bands=4, threshold=0.25, shingle_words=3
            ).select(
                F.col("id_a").alias("a"), F.col("id_b").alias("b")
            )
        ),
        # same resolution forced onto the DISTRIBUTED loop (the 100 TB
        # path; the default hybrid may route small pair sets to driver
        # union-find) — this row is the scale evidence for the
        # pointer-jumping rounds themselves
        "cc_distributed": lambda: connected_components(
            minhash_near_duplicates(
                docs, num_hashes=16, bands=4, threshold=0.25, shingle_words=3
            ).select(
                F.col("id_a").alias("a"), F.col("id_b").alias("b")
            ),
            driver_cutoff=0,
        ),
    }


def replicate_embeddings(emb, k: int):
    """k near-duplicate replicas per vector: unique ids, first
    component perturbed per replica so hyperplane banding sees
    realistic near-dup load rather than exact collisions."""
    if k == 1:
        return emb
    dim_rest = F.slice(F.col("embedding"), 2, 10_000)
    first = F.element_at(F.col("embedding"), 1) + F.col("__r") * 0.001
    return (
        emb.crossJoin(
            F.broadcast(
                emb.sparkSession.range(k).select(F.col("id").alias("__r"))
            )
        )
        .select(
            (F.col("vec_id") * k + F.col("__r")).alias("vec_id"),
            F.concat(F.array(first), dim_rest).alias("embedding"),
        )
    )


def exact_replicate_embeddings(emb, k: int):
    """k EXACT replicas per vector (no perturbation): every replica
    shares every band key, so the banding collapses and candidate
    pairs grow k(k-1)/2 per group — the adversarial corpus the
    max_candidate_pairs budget exists for."""
    if k == 1:
        return emb
    return (
        emb.crossJoin(
            F.broadcast(
                emb.sparkSession.range(k).select(F.col("id").alias("__r"))
            )
        )
        .select(
            (F.col("vec_id") * k + F.col("__r")).alias("vec_id"),
            "embedding",
        )
    )


def probe_budget_guard(spark, emb_base, factors):
    """VERDICT r8 #6 (r7 ask #3's third criterion): demonstrate the
    candidate-pair budget RAISING before the rescore join when the
    banding collapses. Exact-replica corpora push the deduped
    candidate count past the cap; the guard's one count action on the
    persisted candidate table must fire the ValueError without ever
    starting the O(pairs)·dim exact-rescore join — so the raise time
    tracks the banding join only."""
    from mldb_spark.similarity import (
        embedding_cosine_near_duplicates,
        seeded_planes,
    )

    planes = seeded_planes(64, num_planes=64)
    n_base = emb_base.count()
    print(
        "\nbudget-guard raise probe (exact-replica corpus, cap = "
        "n_vectors): the banding collapse must raise BEFORE rescore"
    )
    for k in factors:
        if k < 4:  # k(k-1)/2 <= k below 4: cap not exceeded
            continue
        collapsed = exact_replicate_embeddings(emb_base, k)
        release_cached()
        spark.catalog.clearCache()
        cap = n_base * k  # << k(k-1)/2 per-group pair growth
        t0 = time.time()
        try:
            embedding_cosine_near_duplicates(
                collapsed,
                threshold=0.99,
                planes=planes,
                bands=8,
                max_candidate_pairs=cap,
            )
            outcome = "NO-RAISE (UNEXPECTED — guard regressed)"
        except ValueError:
            outcome = "raised before rescore"
        dt = time.time() - t0
        release_cached()
        print(
            f"budget_guard           x{k:<4d} {dt:7.2f}s  "
            f"vectors={n_base * k} cap={cap} -> {outcome}",
            flush=True,
        )


def probe_embedding_ops(spark, emb):
    """semantic_dedup (qa24's shape, VERDICT r6 #5): banding shuffle
    over the corpus + component resolution on the pair set."""
    from mldb_spark.similarity import (
        embedding_neighbors_batch,
        seeded_planes,
        semantic_dedup,
    )

    planes = seeded_planes(64, num_planes=64)

    def neighbors_batch():
        # 64 query points broadcast over ONE corpus scan (VERDICT r7
        # #6): wall time should track the CORPUS size (the scan),
        # not queries x corpus. Scalar coordinate columns — the
        # operator's per-dimension contract (tests/test_plans.py:358).
        dims = 16
        ds = emb.select(
            "vec_id",
            *[F.col("embedding")[i].alias(f"e{i}") for i in range(dims)],
        )
        qs = (
            ds.filter(F.col("vec_id") % 157 == 3)
            .limit(64)
            .select(F.col("vec_id").alias("query_id"),
                    *[f"e{i}" for i in range(dims)])
        )
        return embedding_neighbors_batch(
            ds, qs, row_name_col="vec_id", num_neighbors=10
        )

    return {
        "semantic_dedup": lambda: semantic_dedup(
            emb, threshold=0.4, planes=planes, bands=8
        ),
        "neighbors_batch": neighbors_batch,
    }


def probe_sql_ops(spark, docs):
    """qa21's SQL dedup chain (VERDICT r6 #5): the dialect surface
    must add no shuffles over the direct API composition."""
    from mldb_spark.dialect import MldbContext

    def dedup_chain_sql():
        ctx = MldbContext(spark)
        ctx.register("documents", docs)
        return ctx.query(
            "SELECT node, component FROM dedup_groups(minhash_pairs("
            "documents, {numHashes: 16, bands: 4, threshold: 0.25, "
            "shingleWords: 3}))"
        )

    def corpus_chain_sql():
        # qa25's chained corpus SQL (VERDICT r7 #6): two
        # single-shuffle FROM-clause passes + one equi-join on doc id
        ctx = MldbContext(spark)
        ctx.register("documents", docs)
        return ctx.query(
            "SELECT u.doc_id AS doc_id, r.n_words AS n_words, "
            "u.avg_logprob AS avg_logprob, r.passes AS passes "
            "FROM unigram_logprob_scores(documents) AS u "
            "JOIN repetition_signals(documents) AS r ON u.doc_id = r.doc_id"
        )

    return {
        "dedup_chain_sql": dedup_chain_sql,
        "corpus_chain_sql": corpus_chain_sql,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("mldb_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, sf_dir, "documents")
    emb_base = load(spark, sf_dir, "embeddings")
    from mldb_spark.operators.temporal import events_to_cells

    cells_base = events_to_cells(load(spark, sf_dir, "events"))
    # warm-up: run every op once untimed so no op pays first-use JVM
    # / codegen / Arrow-init cost inside its measured window
    for mk in probe_ops(spark, base).values():
        mk().count()
        release_cached()
    for mk in probe_cell_ops(spark, cells_base).values():
        mk().count()
        release_cached()
    for mk in {**probe_embedding_ops(spark, emb_base),
               **probe_sql_ops(spark, base)}.values():
        mk().count()
        release_cached()

    factors = [f for f in (1, 4, 16, 64, 256) if f <= max_factor]
    times: dict[str, dict[int, float]] = {}
    for k in factors:
        docs = replicate(base, k)
        cells = replicate_cells(cells_base, k)
        ops = dict(probe_ops(spark, docs))
        ops.update(probe_cell_ops(spark, cells))
        ops.update(probe_embedding_ops(spark, replicate_embeddings(emb_base, k)))
        ops.update(probe_sql_ops(spark, docs))
        for name, mk in ops.items():
            release_cached()
            spark.catalog.clearCache()
            t0 = time.time()
            df = mk()
            n = df.count()
            dt = time.time() - t0
            release_cached()
            times.setdefault(name, {})[k] = dt
            print(f"{name:22s} x{k:<4d} {dt:7.2f}s  rows={n}", flush=True)

    print("\nscaling t_max/t_1 (data grew %dx):" % factors[-1])
    for name, ts in times.items():
        ratio = ts[factors[-1]] / ts[factors[0]]
        print(f"{name:22s} {ratio:6.1f}x")

    probe_budget_guard(spark, emb_base, factors)


if __name__ == "__main__":
    main()
