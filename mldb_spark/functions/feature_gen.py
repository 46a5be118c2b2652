"""Feature-generation applied functions (SURVEY §2.12).

Reference parity:
- pooling (builtin/pooling_function.cc:182): pool the embedding
  vectors of a row's bag of words with avg/min/max/sum aggregators,
  concatenated in aggregator order — the word2vec→document-embedding
  workhorse. Empty bags yield all-zero embeddings (pooling_function.cc
  applyT's empty branch).
- feature_hasher (plugins/feature_gen/feature_generators.cc:155):
  hashing-trick bucketizer — every feature hashes into one of
  2^num_bits buckets. The reference uses sipHash/highwayhash (C++
  internals); here the hash is md5-derived so any engine with md5()
  replays the exact bucket assignment (same portability argument as
  dedup.minhash_signatures).

Both are shuffle-conscious: pooling is one broadcast join (the word-
vector table is vocabulary-sized) plus per-dimension codegen'd
aggregates; feature hashing is pure column expressions until a single
groupBy on (row, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, num_bits: int = 8) -> Column:
    """md5-derived bucket in [0, 2^num_bits): first 8 hex digits as an
    integer, masked to num_bits. Engine-portable (DuckDB:
    CAST('0x'||substr(md5(x),1,8) AS BIGINT) % 2^num_bits)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % (1 << num_bits)


def feature_hash_rows(
    feats: DataFrame,
    num_bits: int = 8,
    id_col: str = "doc_id",
    feat_col: str = "feature",
    value_col: str | None = None,
    mode: str = "columns",
) -> DataFrame:
    """Hashing-trick features from long-format (row, feature[, value]).

    mode='columns' hashes the feature name alone;
    mode='columnsAndValues' hashes 'name::value' (the reference's two
    modes, feature_generators.cc:36-38). Output (id, bucket, weight):
    weight = count of features landing in the bucket (columns mode) or
    the sum of their values. Dense 2^num_bits vectors come from
    hashed_feature_vector."""
    if mode == "columns":
        # value (when numeric) weights the bucket; name alone is hashed
        key = F.col(feat_col)
        w = F.lit(1.0) if value_col is None else F.col(value_col).cast("double")
    elif mode == "columnsAndValues":
        # the value participates in the HASH (name::value), each
        # distinct feature contributes unit weight — the reference's
        # one-hot-ish mode (feature_generators.cc:114-117)
        if value_col is None:
            raise ValueError("columnsAndValues mode needs value_col")
        key = F.concat_ws("::", F.col(feat_col), F.col(value_col).cast("string"))
        w = F.lit(1.0)
    else:
        raise ValueError(f"unknown feature_hasher mode {mode!r}")
    return (
        feats.select(F.col(id_col), hash_bucket(key, num_bits).alias("bucket"), w.alias("__w"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("__w").alias("weight"))
    )


def hashed_feature_vector(
    hashed: DataFrame, num_bits: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Assemble (id, bucket, weight) into dense array<double> vectors
    of length 2^num_bits (zeros for empty buckets) — the hashColumn%d
    row the reference emits, as one array column."""
    n = 1 << num_bits
    per_row = hashed.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "weight"))).alias("__m")
    )
    idxs = F.sequence(F.lit(0), F.lit(n - 1))
    return per_row.select(
        F.col(id_col),
        F.transform(idxs, lambda i: F.coalesce(F.element_at("__m", i.cast("long")), F.lit(0.0))).alias(
            "features"
        ),
    )


def pooling(
    bags: DataFrame,
    vectors: DataFrame,
    aggregators: tuple[str, ...] = ("avg",),
    id_col: str = "doc_id",
    token_col: str = "token",
    word_col: str = "word",
    vec_col: str = "vector",
) -> DataFrame:
    """Pool per-row word embeddings (builtin/pooling_function.cc:182).

    bags: long-format (row, token); vectors: (word, array) — e.g.
    word2vec_train's output. For each aggregator in order, aggregate
    the vectors of the row's matched words element-wise and concat:
    output dim = |vector| * |aggregators|. Rows whose tokens match no
    vocabulary word yield all-zero embeddings like the reference.

    Plan: broadcast the vocabulary-sized vector table, posexplode the
    matched vectors once, per-(row, dim) codegen'd aggregates, then
    ordered reassembly — no Python in the row path.
    """
    valid = {"avg", "min", "max", "sum"}
    bad = [a for a in aggregators if a not in valid]
    if bad:
        raise ValueError(f"invalid aggregators {bad}; valid: {sorted(valid)}")
    # bags feeds TWO consumers (the matched-vector join and the
    # all-rows outer frame) and typically sits on top of a full corpus
    # tokenize+explode; Catalyst does not share that subtree across
    # branches, so persist it once — unless the caller already did.
    from pyspark import StorageLevel

    from mldb_spark.caching import persist_tracked

    if bags.storageLevel == StorageLevel.NONE:
        bags = persist_tracked(bags)
    dim = len(vectors.select(vec_col).first()[0])
    fns = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum}

    matched = bags.join(
        F.broadcast(vectors), bags[token_col] == vectors[word_col]
    ).select(F.col(id_col), F.posexplode(vec_col).alias("dim", "v"))
    per_dim = matched.groupBy(id_col, "dim").agg(
        *[fns[a]("v").alias(f"__{a}") for a in aggregators]
    )

    def ordered(agg: str) -> Column:
        return F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col(f"__{agg}").alias("val")))
            ),
            lambda s: s["val"],
        )

    pooled = per_dim.groupBy(id_col).agg(
        F.concat(*[ordered(a) for a in aggregators]).alias("embedding")
    )
    zeros = F.array_repeat(F.lit(0.0), dim * len(aggregators))
    all_rows = bags.select(id_col).distinct()
    return all_rows.join(pooled, id_col, "left").select(
        F.col(id_col), F.coalesce("embedding", zeros).alias("embedding")
    )
