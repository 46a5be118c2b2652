"""ML training procedures on MLlib (SURVEY §2.13).

Each mirrors a reference procedure's contract (inputs: a query/
DataFrame; outputs: datasets + a registered apply-function), but the
estimator is MLlib's — the reference's own JML/SVD kernels are
single-node C++ and the whole point of this rebuild is to let the
distributed implementations do that work.

Reference procedure → here:
- kmeans.train (plugins/jml/kmeans_interface.cc:389) → kmeans_train
- classifier.train/.test (plugins/jml/classifier.cc:1491,
  accuracy.cc:1006) → classifier_train / classifier_test
- probabilizer.train (plugins/jml/probabilizer.cc:292)
  → probabilizer_train (platt-style logistic on scores)
- tfidf.train (plugins/nlp/tfidf.cc:472) → tfidf_train (MLlib
  CountVectorizer+IDF) and tfidf_table (pure-DataFrame twin whose
  arithmetic a SQL oracle can replay)
- svd.train (plugins/embedding/svd.cc:1023) → pca_train (PCA over
  the embedding column; truncated-SVD equivalent for centered data)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mldb_spark.functions.text import tokenize
from mldb_spark.ml.registry import GLOBAL_REGISTRY, FunctionRegistry


def _to_vector(df: DataFrame, array_col: str, out_col: str = "features") -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(array_col).cast("array<double>")))


def kmeans_train(
    df: DataFrame,
    array_col: str,
    k: int = 8,
    seed: int = 42,
    name: str = "kmeans",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """k-means over an ARRAY<numeric> column. Returns (model,
    centroids_df); registers `name` as an assignment function adding
    a `cluster` column. Distributed Lloyd iterations — each pass is
    one map-side nearest-centroid assignment (centroids broadcast)
    plus one aggregate; no driver-side loops over rows."""
    from pyspark.ml.clustering import KMeans

    vecs = _to_vector(df, array_col)
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster").fit(vecs)
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )

    def assign(d: DataFrame) -> DataFrame:
        return model.transform(_to_vector(d, array_col)).drop("features")

    registry.register(name, assign)
    return model, centroids


def classifier_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    name: str = "classifier",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """Binary classifier (logistic regression — the reference's 'glz'
    default, ClassifierConf.md). Returns the model; registers `name`
    as a scorer adding `score` (P(label=1))."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    train = assembler.transform(df).withColumn("label", F.col(label_col).cast("double"))
    model = LogisticRegression(maxIter=50, regParam=0.01).fit(train)

    def score(d: DataFrame) -> DataFrame:
        scored = model.transform(assembler.transform(d))
        return scored.withColumn(
            "score", vector_to_array(F.col("probability")).getItem(1)
        ).drop("features", "rawPrediction", "probability", "prediction")

    registry.register(name, score)
    return model


def classifier_test(scored: DataFrame, label_col: str = "label", score_col: str = "score") -> DataFrame:
    """classifier.test: AUC + accuracy dataset (accuracy.cc:1006).
    AUC via MLlib's BinaryClassificationEvaluator (distributed
    threshold sweep)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    # the evaluator accepts a plain double rawPrediction column — no
    # need to wrap the score in a length-2 vector
    prepped = scored.withColumn("label", F.col(label_col).cast("double")).withColumn(
        "rawPrediction", F.col(score_col).cast("double")
    )
    auc = BinaryClassificationEvaluator(rawPredictionCol="rawPrediction").evaluate(prepped)
    acc = (
        scored.withColumn("correct", ((F.col(score_col) > 0.5) == (F.col(label_col) == 1)).cast("long"))
        .agg((F.sum("correct") / F.count(F.lit(1))).alias("acc"))
        .collect()[0]["acc"]
    )
    return scored.sparkSession.createDataFrame(
        [(float(auc), float(acc))], "auc double, accuracy double"
    )


def probabilizer_train(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    name: str = "probabilizer",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """Score→probability calibration: logistic regression on the raw
    score (Platt scaling), the reference probabilizer's contract."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=[score_col], outputCol="features")
    model = LogisticRegression(maxIter=50).fit(
        assembler.transform(scored).withColumn("label", F.col(label_col).cast("double"))
    )

    def calibrate(d: DataFrame) -> DataFrame:
        out = model.transform(assembler.transform(d))
        return out.withColumn(
            "prob", vector_to_array(F.col("probability")).getItem(1)
        ).drop("features", "rawPrediction", "probability", "prediction")

    registry.register(name, calibrate)
    return model


def tfidf_train(
    docs: DataFrame,
    text_col: str = "text",
    min_df: int = 1,
    vocab_size: int = 1 << 18,
):
    """tfidf.train on MLlib CountVectorizer+IDF; returns the fitted
    PipelineModel producing a sparse tfidf vector column."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, CountVectorizer

    toks = docs.withColumn("tokens", tokenize(F.col(text_col)))
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", minDF=min_df, vocabSize=vocab_size)
    idf = IDF(inputCol="tf", outputCol="tfidf")
    return Pipeline(stages=[cv, idf]).fit(toks)


def tfidf_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Pure-DataFrame TF-IDF table: (doc, token, tf, df, tfidf) with
    the MLlib/standard smoothed idf = ln((N+1)/(df+1)). Exact
    arithmetic a SQL oracle replays; also the long-format output the
    reference's tfidf function produces per token. Two shuffles:
    token counts per doc, then doc-frequency join (broadcast — the
    vocabulary is small next to the corpus)."""
    toks = docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.count()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


def svm_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    name: str = "svm",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """svm.train (plugins/jml/svm.cc:464) → MLlib LinearSVC; registers
    a margin-score function."""
    from pyspark.ml.classification import LinearSVC
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    model = LinearSVC(maxIter=50, regParam=0.01).fit(
        assembler.transform(df).withColumn("label", F.col(label_col).cast("double"))
    )

    def score(d: DataFrame) -> DataFrame:
        out = model.transform(assembler.transform(d))
        return out.withColumn(
            "margin", vector_to_array(F.col("rawPrediction")).getItem(1)
        ).drop("features", "rawPrediction", "prediction")

    registry.register(name, score)
    return model


def random_forest_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    num_trees: int = 50,
    seed: int = 42,
    name: str = "rf",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """randomforest.binary.train (plugins/jml/randomforest_procedure.cc:411)
    → MLlib RandomForestClassifier. MLlib does the feature bucketizing
    the reference hand-rolls (core/bucket.h) internally."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    model = RandomForestClassifier(numTrees=num_trees, seed=seed).fit(
        assembler.transform(df).withColumn("label", F.col(label_col).cast("double"))
    )

    def score(d: DataFrame) -> DataFrame:
        out = model.transform(assembler.transform(d))
        return out.withColumn(
            "score", vector_to_array(F.col("probability")).getItem(1)
        ).drop("features", "rawPrediction", "probability", "prediction")

    registry.register(name, score)
    return model


def gaussian_clustering_train(
    df: DataFrame,
    array_col: str,
    k: int = 4,
    seed: int = 42,
    name: str = "gmm",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """gaussianclustering.train (plugins/jml/em_interface.cc:383) →
    MLlib GaussianMixture (EM); registers a soft-assignment function."""
    from pyspark.ml.clustering import GaussianMixture

    model = GaussianMixture(k=k, seed=seed, featuresCol="features").fit(
        _to_vector(df, array_col)
    )

    def assign(d: DataFrame) -> DataFrame:
        return model.transform(_to_vector(d, array_col)).drop("features", "probability")

    registry.register(name, assign)
    return model


def word2vec_train(
    docs: DataFrame,
    text_col: str = "text",
    vector_size: int = 32,
    min_count: int = 2,
    seed: int = 42,
):
    """Word2Vec over the corpus (the reference only IMPORTS word2vec
    binaries, plugins/nlp/word2vec.cc:248 — training distributed is
    the Spark-native upgrade). Returns (model, vectors_df) where
    vectors_df is (word, vector ARRAY<FLOAT>) — the same embedding-
    dataset shape import.word2vec produces."""
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    toks = docs.withColumn("tokens", tokenize(F.col(text_col)))
    model = Word2Vec(
        vectorSize=vector_size,
        minCount=min_count,
        seed=seed,
        inputCol="tokens",
        outputCol="w2v",
    ).fit(toks)
    vectors = model.getVectors().select(
        "word", vector_to_array(F.col("vector")).alias("vector")
    )
    return model, vectors


def tsne_train(df: DataFrame, array_col: str, n_components: int = 2):
    """tsne.train (plugins/jml/tsne_interface.cc:452) — STUB.

    t-SNE is a driver-side visualization aid over a few thousand
    points, not a distributed algorithm; the reference runs it
    single-node too. scikit-learn is not in this container, so this
    raises with the exact recipe; the contract (sampled collect →
    sklearn TSNE → re-join coordinates by id) is fixed."""
    raise NotImplementedError(
        "tsne.train needs scikit-learn (not installed): collect a "
        "<=10k-row sample of the embedding column, run "
        "sklearn.manifold.TSNE(n_components=%d).fit_transform, and "
        "createDataFrame the (id, x, y) coordinates back" % n_components
    )


def pca_train(df: DataFrame, array_col: str, k: int = 8):
    """PCA over a dense embedding column. Returns (model,
    explained_variance list). For the reference svd.train's full
    row/column output contract over sparse cell data, use svd_train."""
    from pyspark.ml.feature import PCA

    model = PCA(k=k, inputCol="features", outputCol="pca").fit(_to_vector(df, array_col))
    return model, [float(x) for x in model.explainedVariance]


def svd_train(
    cells: DataFrame,
    row_col: str = "row_id",
    column_col: str = "column",
    value_col: str = "value",
    k: int = 8,
    name: str = "svd",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """svd.train (plugins/embedding/svd.cc:1023,1028): truncated SVD of
    a long-format sparse matrix (row, column, value), emitting the
    reference's THREE outputs:

    - row embeddings dataset (rowOutput): one row per input row,
      embedding = U·Σ = X·V (the projection of the row into the
      latent space);
    - column embeddings dataset (columnOutput): one row per column,
      embedding = the column's right-singular-vector loadings (V) —
      what the reference's reddit chain clusters
      (testing/reddit_benchmark.py:23-103);
    - `{name}.embedRow` applied function: embeds any long-format
      rowset via x·V — consistent with rowOutput by construction.

    Spark-first shape: the factorization runs on MLlib's distributed
    IndexedRowMatrix.computeSVD (one of the few places the RDD API is
    the genuine distributed kernel — the Gram matrix is n_cols², so
    cap the column space like any LSA pipeline: CountVectorizer-style
    min_df/vocab_size upstream). Row/column index maps are dataset-
    sized DataFrames; only the vocab-sized column map is collected.

    Returns (row_embeddings, column_embeddings, singular_values).
    """
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    spark = cells.sparkSession
    col_rows = cells.select(column_col).distinct().orderBy(column_col).collect()
    col_idx = {r[column_col]: i for i, r in enumerate(col_rows)}
    n_cols = len(col_idx)
    if k > min(n_cols, 2**31):
        raise ValueError(f"k={k} exceeds column count {n_cols}")
    bidx = spark.sparkContext.broadcast(col_idx)

    # dense row index without a global window: sort once, zipWithIndex
    # (distributed, order-preserving over sorted partitions)
    row_map = (
        cells.select(row_col).distinct().orderBy(row_col)
        .rdd.map(lambda r: r[0]).zipWithIndex()
        .toDF([row_col, "__ridx"])
    )
    indexed = cells.join(row_map, row_col).select("__ridx", column_col, value_col)
    ccol, vcol = column_col, value_col
    vec_rows = (
        indexed.rdd.map(lambda r: (r["__ridx"], (bidx.value[r[ccol]], float(r[vcol]))))
        .groupByKey()
        .map(lambda kv: IndexedRow(kv[0], Vectors.sparse(n_cols, sorted(kv[1]))))
    )
    svd = IndexedRowMatrix(vec_rows).computeSVD(k, computeU=True)
    sigma = [float(x) for x in svd.s]

    u_df = svd.U.rows.map(
        lambda r: (int(r.index), [float(x) for x in r.vector])
    ).toDF(["__ridx", "__u"])
    row_emb = (
        row_map.join(u_df, "__ridx")
        .select(
            F.col(row_col),
            F.expr(
                "transform(__u, (x, i) -> x * element_at(array({}), i + 1))".format(
                    ", ".join(repr(s) for s in sigma)
                )
            ).alias("embedding"),
        )
    )

    v = svd.V.toArray()  # n_cols x k, local (vocab-sized)
    col_emb = spark.createDataFrame(
        [(c, [float(x) for x in v[i]]) for c, i in col_idx.items()],
        f"{column_col} string, embedding array<double>",
    )

    def embed_rows(d: DataFrame) -> DataFrame:
        """x·V per row of a long-format (row, column, value) rowset:
        broadcast-join the vocab-sized V table, per-dimension partial
        sums, then reassemble the ordered embedding array — all
        codegen'd aggregates, no Python in the row path."""
        contrib = d.join(F.broadcast(col_emb), column_col).select(
            F.col(row_col),
            F.col(value_col),
            F.posexplode("embedding").alias("dim", "vj"),
        )
        per_dim = contrib.groupBy(row_col, "dim").agg(
            F.sum(F.col("vj") * F.col(value_col)).alias("c")
        )
        return per_dim.groupBy(row_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda s: s["c"]
            ).alias("embedding")
        )

    registry.register(f"{name}.embedRow", embed_rows)
    return row_emb, col_emb, sigma
