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
