"""SVM / random forest / GMM / word2vec wrappers + NLP functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from mldb_spark.catalog import load
from mldb_spark.functions.text import filter_stopwords, stem, stem_tokens, tokenize
from mldb_spark.ml.procedures import (
    gaussian_clustering_train,
    random_forest_train,
    svm_train,
    word2vec_train,
)
from mldb_spark.ml.registry import FunctionRegistry


def _separable(spark):
    return spark.createDataFrame(
        [(float(i), float((i * 7) % 13), 1.0 if i > 60 else 0.0) for i in range(120)],
        "x double, noise double, label double",
    )


def test_svm_separates(spark):
    reg = FunctionRegistry()
    data = _separable(spark)
    svm_train(data, ["x", "noise"], "label", "svm", reg)
    scored = reg.apply("svm", data)
    # margins should order with the label
    hi = scored.filter(F.col("label") == 1.0).agg(F.avg("margin")).collect()[0][0]
    lo = scored.filter(F.col("label") == 0.0).agg(F.avg("margin")).collect()[0][0]
    assert hi > lo


def test_random_forest(spark):
    reg = FunctionRegistry()
    data = _separable(spark)
    random_forest_train(data, ["x", "noise"], "label", num_trees=20, name="rf", registry=reg)
    scored = reg.apply("rf", data)
    acc = scored.withColumn(
        "ok", ((F.col("score") > 0.5) == (F.col("label") == 1.0)).cast("int")
    ).agg(F.avg("ok")).collect()[0][0]
    assert acc > 0.9


def test_gaussian_clustering(spark, sf_dir):
    reg = FunctionRegistry()
    emb = load(spark, sf_dir, "embeddings")
    model = gaussian_clustering_train(emb, "embedding", k=3, name="gmm", registry=reg)
    out = reg.apply("gmm", emb)
    assert out.select("prediction").distinct().count() <= 3
    assert len(model.weights) == 3


def test_word2vec(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    model, vectors = word2vec_train(docs, vector_size=16, min_count=5)
    vocab = vectors.count()
    assert vocab > 10
    row = vectors.limit(1).collect()[0]
    assert len(row["vector"]) == 16
    # similar words query works (the embedding-dataset use case)
    syn = model.findSynonymsArray("data", 3)
    assert len(syn) == 3


def test_filter_stopwords_and_stem(spark):
    df = spark.createDataFrame([("the running dogs quickly jumped",)], "t string")
    out = df.select(
        filter_stopwords(tokenize(F.col("t"))).alias("f"),
        stem_tokens(tokenize(F.col("t"))).alias("s"),
    ).collect()[0]
    assert "the" not in out["f"] and "running" in out["f"]
    stems = dict(zip(["the", "running", "dogs", "quickly", "jumped"], out["s"]))
    assert stems["running"] == "runn"
    assert stems["dogs"] == "dog"
    assert stems["quickly"] == "quick"
    assert stems["jumped"] == "jump"
    assert stems["the"] == "the"  # guard: stem would drop below 3 chars


def test_feature_hasher_modes(spark):
    from mldb_spark.functions.feature_gen import (
        feature_hash_rows,
        hashed_feature_vector,
    )

    feats = spark.createDataFrame(
        [(1, "color", "red"), (1, "size", "xl"), (2, "color", "red"), (2, "color", "blue")],
        "doc_id long, feature string, val string",
    )
    cols = feature_hash_rows(feats, num_bits=4, feat_col="feature").collect()
    # columns mode: doc 2's two 'color' features land in ONE bucket, weight 2
    d2 = [r for r in cols if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["weight"] == 2.0
    # columnsAndValues mode distinguishes red vs blue
    cav = feature_hash_rows(
        feats, num_bits=8, feat_col="feature", value_col="val", mode="columnsAndValues"
    )
    assert cav.filter("doc_id = 2").count() == 2
    vec = hashed_feature_vector(cav, num_bits=8).collect()
    for r in vec:
        assert len(r["features"]) == 256
        assert abs(sum(r["features"]) - 2.0) < 1e-12  # each doc has 2 unit features


def test_pooling_contract(spark):
    from mldb_spark.functions.feature_gen import pooling

    bags = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (3, "zzz")], "doc_id long, token string"
    )
    vectors = spark.createDataFrame(
        [("a", [1.0, 3.0]), ("b", [3.0, 5.0])], "word string, vector array<double>"
    )
    out = {r["doc_id"]: r["embedding"] for r in
           pooling(bags, vectors, aggregators=("avg", "max", "sum")).collect()}
    assert out[1] == [2.0, 4.0, 3.0, 5.0, 4.0, 8.0]  # avg | max | sum
    assert out[2] == [1.0, 3.0, 1.0, 3.0, 1.0, 3.0]
    assert out[3] == [0.0] * 6  # no vocabulary hit -> zeros (reference contract)
