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


class _LocalKMeansModel:
    """Shim matching the MLlib surface callers use (clusterCenters)
    for the local fast path below."""

    def __init__(self, centers):
        self._centers = centers

    def clusterCenters(self):
        return self._centers


def _local_kmeans(X, k: int, seed: int, n_iter: int = 60):
    """Seeded kmeans++ + Lloyd in numpy, deterministic. Ties in the
    assignment break to the LOWEST cluster id (argmin keeps the first
    minimum) — the same rule the SQL oracles replay."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(k, n)
    centers = [X[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [np.square(X - c).sum(axis=1) for c in centers], axis=0
        )
        s = d2.sum()
        idx = rng.choice(n, p=d2 / s) if s > 0 else rng.randint(n)
        centers.append(X[idx])
    C = np.array(centers, dtype=float)
    for _ in range(n_iter):
        d = np.square(X[:, None, :] - C[None, :, :]).sum(axis=2)
        lab = d.argmin(axis=1)
        newC = np.array([
            X[lab == j].mean(axis=0) if (lab == j).any() else C[j]
            for j in range(k)
        ])
        if np.allclose(newC, C):
            break
        C = newC
    return C


def kmeans_train(
    df: DataFrame,
    array_col: str,
    k: int = 8,
    seed: int = 42,
    name: str = "kmeans",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    local_cutoff: int = 4096,
):
    """k-means over an ARRAY<numeric> column. Returns (model,
    centroids_df); registers `name` as an assignment function adding
    a `cluster` column.

    Two regimes (VERDICT r8 #5 — the MLlib fit costs seconds of pure
    scheduling on tiny inputs):
    - <= local_cutoff rows (term embeddings, entity trainings, the
      reference's own vocab-sized kmeans chains): collect once, run
      seeded kmeans++/Lloyd in numpy on the driver. The collect is
      bounded by the cutoff (a few MB).
    - larger: MLlib's distributed Lloyd — each pass one map-side
      nearest-centroid assignment (centroids broadcast) plus one
      aggregate; no driver-side loops over rows.
    EITHER way the registered assignment is broadcast-argmin with
    ties to the lowest cluster id, so the oracle's centroid-replay
    contract is identical in both regimes."""
    spark = df.sparkSession
    head = df.select(array_col).limit(local_cutoff + 1).collect()
    if len(head) <= local_cutoff and head:
        import numpy as np

        X = np.array([r[0] for r in head], dtype=float)
        C = _local_kmeans(X, k, seed)
        model = _LocalKMeansModel([c for c in C])
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(C)],
            "cluster int, centroid array<double>",
        )

        def assign(d: DataFrame, _C=C) -> DataFrame:
            # pure-JVM argmin over ONE nested centroid literal — a
            # per-centroid expression tree (k × dim literal nodes +
            # k HOF lambdas) blows codegen up exactly like the old
            # hyperplane kernel did; array_position(min) keeps the
            # FIRST (lowest-id) minimum on ties, the oracle's rule.
            # One-parse literal (optimization r10): F.lit(nested)
            # pays a py4j round-trip per element.
            from mldb_spark.functions.vector import matrix_double_lit

            c_lit = matrix_double_lit([[float(x) for x in c] for c in _C])
            dists = F.transform(
                c_lit,
                lambda c: F.aggregate(
                    F.zip_with(
                        F.col(array_col),
                        c,
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            cluster = (
                F.array_position(dists, F.array_min(dists)) - 1
            ).cast("int")
            return d.withColumn("cluster", cluster)

        registry.register(name, assign)
        return model, centroids

    from pyspark.ml.clustering import KMeans

    vecs = _to_vector(df, array_col)
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster").fit(vecs)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster int, centroid array<double>",
    )

    def assign(d: DataFrame) -> DataFrame:
        return model.transform(_to_vector(d, array_col)).drop("features")

    registry.register(name, assign)
    return model, centroids


# Local-regime bounds for the glz/boolean fast path: collect at most
# _LR_LOCAL_ROWS+1 rows of at most _LR_LOCAL_FEATS features (~50 MB
# ceiling) — inputs beyond either bound keep the distributed MLlib fit.
_LR_LOCAL_ROWS = 200_000
_LR_LOCAL_FEATS = 32
# One regularization constant for BOTH the MLlib glz estimators and
# the local Newton fast path — a change to one must not silently
# desync the other (ADVICE r9).
_GLZ_REG_PARAM = 0.01


def _margin_or_raise(margin, ctx: str):
    """NULL-feature guard for the local fast-path scorers (ADVICE r9):
    the MLlib regime raises loudly via VectorAssembler when a feature
    is NULL at apply time; a plain column-expression margin would
    instead yield NULL and downstream metrics (AUC sums) would skip
    the row silently. One error surface for both regimes — the extra
    isNotNull branch is codegen'd JVM, evaluated per row only."""
    return F.when(margin.isNotNull(), margin).otherwise(
        F.raise_error(
            F.lit(f"{ctx}: NULL feature value at apply time")
        ).cast("double")
    )


def _local_logistic(X, y, lam: float, max_iter: int = 50, tol: float = 1e-12):
    """Newton-Raphson on MLlib LogisticRegression's exact objective:
    (1/n)·Σ logloss + (λ/2)·‖β_std‖² with features scaled by the
    unbiased std and the intercept unregularized. The objective is
    strictly convex (λ>0, or full-rank X at λ=0), so the optimum is
    UNIQUE — this converges to the same coefficients MLlib's LBFGS
    does (verified to 6 decimals on the gate data), in ~6 local
    iterations instead of ~50 scheduled Spark jobs. Returns
    (coefficients, intercept) or None when the problem looks
    degenerate (solver failure / no convergence) — callers fall back
    to MLlib so the error surface is unchanged."""
    import numpy as np

    n, d = X.shape
    std = X.std(axis=0, ddof=1) if n > 1 else np.ones(d)
    std = np.where(std > 0, std, 1.0)
    Xs = X / std
    beta = np.zeros(d + 1)
    for _ in range(max_iter):
        z = np.clip(beta[0] + Xs @ beta[1:], -500, 500)
        p = 1.0 / (1.0 + np.exp(-z))
        r = (p - y) / n
        g = np.empty(d + 1)
        g[0] = r.sum()
        g[1:] = Xs.T @ r + lam * beta[1:]
        W = (p * (1.0 - p)) / n
        H = np.empty((d + 1, d + 1))
        H[0, 0] = W.sum()
        hx = Xs.T @ W
        H[0, 1:] = hx
        H[1:, 0] = hx
        H[1:, 1:] = (Xs.T * W) @ Xs + lam * np.eye(d)
        try:
            step = np.linalg.solve(H, g)
        except np.linalg.LinAlgError:
            return None
        if not np.all(np.isfinite(step)):
            return None
        beta = beta - step
        if np.abs(step).max() < tol:
            return beta[1:] / std, float(beta[0])
    return None


class _LocalLogisticModel:
    """Shim matching the MLlib LogisticRegressionModel surface the
    callers use (coefficients, intercept) for the local fast path."""

    def __init__(self, coefficients, intercept):
        self.coefficients = coefficients
        self.intercept = intercept


def _try_local_logistic(
    df: DataFrame, feature_cols, label_col, lam: float, max_iter: int = 50
):
    """Bounded-collect front end for _local_logistic: returns
    (coefficients, intercept) or None when the input exceeds the
    local bounds or looks degenerate (NaN/null features, constant
    labels) — those keep the exact MLlib path and its error
    surface. max_iter is honored as an ITERATION BUDGET (the same
    upper-bound semantics MLlib's maxIter has): Newton runs at most
    max_iter steps and the result is used only if it CONVERGED within
    them — so the caller never sees a partially-converged local
    answer; if the budget is too small to converge, the MLlib path
    (which can legitimately stop early) takes over."""
    import numpy as np

    if len(feature_cols) > _LR_LOCAL_FEATS:
        return None
    head = (
        df.select(
            *[F.col(f"`{c}`").cast("double") for c in feature_cols],
            F.col(label_col).cast("double").alias("__y"),
        )
        .limit(_LR_LOCAL_ROWS + 1)
        .toPandas()
    )
    if len(head) > _LR_LOCAL_ROWS or len(head) == 0:
        return None
    M = head.to_numpy(dtype=float)
    if not np.all(np.isfinite(M)):
        return None
    X, y = M[:, :-1], M[:, -1]
    if y.min() == y.max() or not set(np.unique(y)) <= {0.0, 1.0}:
        return None
    return _local_logistic(X, y, lam, max_iter=max_iter)


def classifier_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    name: str = "classifier",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    max_iter: int = 50,
    algorithm: str = "glz",
    mode: str = "boolean",
    weight_col: "str | None" = None,
):
    """classifier.train with the reference's algorithm/mode matrix
    (ClassifierConf.md; classifiers.json ships glz, dt, bagging,
    boosting (bbdt), naive_bayes; modes boolean/regression/
    categorical — MLDB-174/1597/647). Each maps to the MLlib
    estimator with the same learning bias:

      glz        -> LogisticRegression / LinearRegression
      dt         -> DecisionTree{Classifier,Regressor}
      bagging    -> RandomForest{Classifier,Regressor} (bagged trees)
      boosting / bbdt -> GBT{Classifier,Regressor}
      naive_bayes -> NaiveBayes (boolean only; non-negative features)

    Returns the model; registers `name` as a scorer adding `score`
    (P(label=1) in boolean mode, the prediction in regression mode,
    the predicted class in categorical mode)."""
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        LogisticRegression,
        NaiveBayes,
        RandomForestClassifier,
    )
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.regression import (
        DecisionTreeRegressor,
        GBTRegressor,
        LinearRegression,
        RandomForestRegressor,
    )

    if mode not in ("boolean", "regression", "categorical"):
        raise ValueError(f"unknown classifier mode {mode!r}")
    algo = {"bbdt": "boosting"}.get(algorithm, algorithm)
    # per-example weights (the reference's trainingData `weight`
    # output, MLDB-198) ride MLlib's weightCol on the estimators that
    # support it
    wkw = {"weightCol": weight_col} if weight_col else {}
    cls_est = {
        "glz": lambda: LogisticRegression(
            maxIter=max_iter, regParam=_GLZ_REG_PARAM, **wkw
        ),
        "dt": lambda: DecisionTreeClassifier(maxDepth=8, seed=1),
        "bagging": lambda: RandomForestClassifier(numTrees=20, seed=1),
        "boosting": lambda: GBTClassifier(maxIter=min(max_iter, 20), seed=1),
        # gaussian NB: continuous features (the multinomial default
        # expects count-like inputs)
        "naive_bayes": lambda: NaiveBayes(modelType="gaussian"),
    }
    reg_est = {
        "glz": lambda: LinearRegression(
            maxIter=max_iter, regParam=_GLZ_REG_PARAM, **wkw
        ),
        "dt": lambda: DecisionTreeRegressor(maxDepth=8, seed=1),
        "bagging": lambda: RandomForestRegressor(numTrees=20, seed=1),
        "boosting": lambda: GBTRegressor(maxIter=min(max_iter, 20), seed=1),
    }
    table = reg_est if mode == "regression" else cls_est
    if algo not in table:
        raise ValueError(f"unknown algorithm {algorithm!r} for mode {mode!r}")

    # categorical (string) FEATURES one-hot encode against a capped
    # per-column vocabulary (MLDB-1766's dt-with-categoricals; the
    # reference's classifiers consume string features natively). The
    # distinct-collect is vocab-sized and capped — an unbounded
    # category set must be hashed upstream (feature_gen.feature_hash).
    _ONE_HOT_CAP = 256
    dtypes = dict(df.dtypes)
    encoded_cols: list[str] = []
    onehot_exprs: list = []
    for c in feature_cols:
        if dtypes.get(c) == "string":
            vocab = [
                r[0]
                for r in df.select(c).distinct().orderBy(c)
                .limit(_ONE_HOT_CAP + 1).collect()
                if r[0] is not None
            ]
            if len(vocab) > _ONE_HOT_CAP:
                raise ValueError(
                    f"categorical feature {c!r} exceeds {_ONE_HOT_CAP} "
                    "distinct values; hash it upstream"
                )
            for v in vocab:
                out_name = f"{c}__{v}"
                onehot_exprs.append(
                    (out_name, (F.col(c) == F.lit(v)).cast("double"))
                )
                encoded_cols.append(out_name)
        else:
            encoded_cols.append(c)
    if onehot_exprs:
        for out_name, expr in onehot_exprs:
            df = df.withColumn(out_name, expr)
        feature_cols = encoded_cols

    # MISSING feature values: the reference's JML trees split natively
    # on is-missing (MLDB-785); MLlib estimators reject NaN/null
    # features outright. When (and only when) a feature column carries
    # nulls, add a 0/1 missing-indicator column and zero-impute the
    # value — the tree recovers the missingness split through the
    # indicator, and null-free trainings keep their exact feature
    # layout (q77/q78's exported coefficient order is unchanged).
    null_row = df.select(
        F.count(F.lit(1)).alias("__nrows"),
        *[
            # backtick: flattened row features carry literal dotted
            # names (MLDB-1273's row.a)
            F.sum(F.col(f"`{c}`").isNull().cast("int")).alias(f"__n{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).collect()[0]
    if int(null_row["__nrows"]) == 0:
        # an empty training set must be a clean error, never an opaque
        # MLlib crash ('nothing has been added to this summarizer' —
        # MLDBFB-724's classifier.experiment segfault class). Rides the
        # existing null-scan aggregate: zero extra jobs.
        raise ValueError(
            "classifier.train: training set is empty — all rows were "
            "filtered or the input dataset has no rows"
        )
    missing_cols = [
        c for i, c in enumerate(feature_cols) if (null_row[f"__n{i}"] or 0) > 0
    ]
    if missing_cols:
        for c in missing_cols:
            df = df.withColumn(f"{c}__isnull", F.col(f"`{c}`").isNull().cast("double"))
            df = df.withColumn(c, F.coalesce(F.col(f"`{c}`"), F.lit(0.0)))
        feature_cols = feature_cols + [f"{c}__isnull" for c in missing_cols]

    # VectorAssembler parses dotted inputCols as nested struct paths —
    # flattened row features (MLDB-1273's literal `row.a` column names)
    # alias to safe internal names at train AND score time
    dotted = {
        c: f"__feat{i}" for i, c in enumerate(feature_cols) if "." in c
    }
    if dotted:
        for c, s in dotted.items():
            df = df.withColumn(s, F.col(f"`{c}`"))
        feature_cols = [dotted.get(c, c) for c in feature_cols]

    # glz/boolean local fast path (optimization r9): the L2-logistic
    # objective is strictly convex, so MLlib's ~50 scheduled LBFGS
    # jobs and a 6-iteration driver-side Newton land on the SAME
    # unique optimum (verified to 6 decimals on the gate data). The
    # collect is bounded (_LR_LOCAL_ROWS/_LR_LOCAL_FEATS); anything
    # bigger, weighted, degenerate, or non-boolean keeps the
    # distributed MLlib fit and its exact error surface.
    # max_iter is an ITERATION BUDGET (MLlib's maxIter is the same
    # upper bound, not a demand for partial convergence): the Newton
    # fast path runs under the caller's budget and is used only when
    # it CONVERGED within it — a budget too small to converge falls
    # back to MLlib, the only path with meaningful partial-convergence
    # behavior (ADVICE r9, re-tuned in r10: the original >= 50 gate
    # re-routed q74's max_iter=20 fold fits to ~50 scheduled
    # treeAggregate jobs each when Newton converges in ~8 steps)
    if algo == "glz" and mode == "boolean" and not weight_col:
        local = _try_local_logistic(
            df, feature_cols, label_col, lam=_GLZ_REG_PARAM, max_iter=max_iter
        )
        if local is not None:
            w_loc, b_loc = local
            model = _LocalLogisticModel([float(x) for x in w_loc], float(b_loc))

            def score_local(d: DataFrame) -> DataFrame:
                if "features" in d.columns:
                    d = d.withColumnRenamed("features", "__features_pin")
                for out_name, expr in onehot_exprs:
                    if out_name not in d.columns:
                        d = d.withColumn(out_name, expr)
                for c in missing_cols:
                    if f"{c}__isnull" not in d.columns:
                        d = d.withColumn(
                            f"{c}__isnull", F.col(f"`{c}`").isNull().cast("double")
                        )
                        d = d.withColumn(c, F.coalesce(F.col(f"`{c}`"), F.lit(0.0)))
                for c, s in dotted.items():
                    if s not in d.columns:
                        d = d.withColumn(s, F.col(f"`{c}`"))
                margin = F.lit(float(model.intercept))
                for c, wj in zip(feature_cols, model.coefficients):
                    margin = margin + F.col(f"`{c}`").cast("double") * F.lit(
                        float(wj)
                    )
                margin = _margin_or_raise(margin, "classifier.train")
                # P(label=1) = sigmoid(margin) — the same double
                # arithmetic MLlib's probability column computes
                return d.withColumn(
                    "score", F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
                )

            registry.register(name, score_local)
            return model

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    labels: list[str] = []
    if mode == "categorical" and dict(df.dtypes)[label_col] == "string":
        # string class labels index to 0..k-1 for MLlib and map back
        # on output (the reference's categorical mode keys its
        # scores.<class> outputs by the original label)
        labels = [
            r[0]
            for r in df.select(label_col).distinct().orderBy(label_col).collect()
        ]
        idx = {v: float(i) for i, v in enumerate(labels)}
        mapping = F.create_map(
            *[x for v, i in idx.items() for x in (F.lit(v), F.lit(i))]
        )
        df = df.withColumn("__label_idx", mapping[F.col(label_col)])
        label_src = "__label_idx"
    else:
        label_src = label_col
    train = assembler.transform(df).withColumn("label", F.col(label_src).cast("double"))
    model = table[algo]().fit(train)

    def score(d: DataFrame) -> DataFrame:
        # a caller-supplied `features` ROW pin (SQL application,
        # MLDB-647) would collide with the assembler's output column —
        # stash it; its flattened fields are already columns
        if "features" in d.columns:
            d = d.withColumnRenamed("features", "__features_pin")
        # replay the train-time one-hot encoding on the scored input
        for out_name, expr in onehot_exprs:
            if out_name not in d.columns:
                d = d.withColumn(out_name, expr)
        # replay the train-time missing-indicator encoding (MLDB-785)
        for c in missing_cols:
            if f"{c}__isnull" not in d.columns:
                d = d.withColumn(
                    f"{c}__isnull", F.col(f"`{c}`").isNull().cast("double")
                )
                d = d.withColumn(c, F.coalesce(F.col(f"`{c}`"), F.lit(0.0)))
        # replay the dotted-feature aliasing (MLDB-1273)
        for c, s in dotted.items():
            if s not in d.columns:
                d = d.withColumn(s, F.col(f"`{c}`"))
        scored = model.transform(assembler.transform(d))
        if mode == "regression":
            out = scored.withColumn("score", F.col("prediction"))
        elif mode == "categorical":
            out = scored.withColumn("score", F.col("prediction"))
            if labels:
                back = F.array(*[F.lit(v) for v in labels])
                out = out.withColumn(
                    "predicted", back[F.col("prediction").cast("int")]
                )
            if "probability" in out.columns:
                probs = vector_to_array(F.col("probability"))
                names = labels or [
                    str(i) for i in range(int(model.numClasses))
                ]
                out = out.withColumn(
                    "scores",
                    F.map_from_arrays(
                        F.array(*[F.lit(n) for n in names]),
                        F.slice(probs, 1, len(names)),
                    ),
                )
        elif "probability" in scored.columns:
            out = scored.withColumn(
                "score", vector_to_array(F.col("probability")).getItem(1)
            )
        else:  # GBT boolean exposes rawPrediction only pre-3.0 paths
            out = scored.withColumn("score", F.col("prediction"))
        return out.drop(
            *[c for c in ("features", "rawPrediction", "probability", "prediction")
              if c in out.columns and c != "score"]
        )

    registry.register(name, score)
    return model


def classifier_test(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    mode: str = "boolean",
    weight_col: "str | None" = None,
) -> DataFrame:
    """classifier.test: AUC + accuracy dataset (accuracy.cc:1006).
    AUC computed EXACTLY via the rank-sum identity over distinct
    scores (see the boolean branch) — the reference sweeps every
    threshold, so the binned MLlib evaluator would diverge on large
    score sets.

    Modes (MLDB-256 — the accuracy procedure accepts all classifier
    modes): 'regression' returns (mse, r2, quantile_err_50,
    quantile_err_90) where quantile errors are percentiles of the
    absolute error (the reference's quantileErrors); 'categorical'
    returns the confusion matrix (label, predicted, count) — one
    groupBy shuffle."""
    if mode == "regression":
        # weighted sufficient statistics in one partial-aggregable
        # pass (r2: SStot = Σw·y² − (Σw·y)²/Σw); quantile errors are
        # the reference's exact contract (accuracy.cc:785,945):
        # RELATIVE errors |(p−y)/y|, UNWEIGHTED, picked at sorted
        # index int((n−1)·q) — no interpolation, so computed by a
        # row_number selection (one sort of the error column; at
        # corpus scale swap in approx_percentile).
        w = (
            F.col(weight_col).cast("double")
            if weight_col
            else F.lit(1.0)
        )
        base = scored.select(
            F.col(label_col).cast("double").alias("y"),
            F.col(score_col).cast("double").alias("p"),
            w.alias("w"),
        )
        st = base.agg(
            F.sum(F.col("w") * (F.col("p") - F.col("y")) ** 2).alias("ssres"),
            F.sum(F.col("w") * F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("w") * F.col("y")).alias("sy"),
            F.sum("w").alias("tw"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        mse = float(st["ssres"]) / float(st["tw"])
        sstot = float(st["syy"]) - float(st["sy"]) ** 2 / float(st["tw"])
        if sstot <= 0.0:
            # zero-variance targets (MLDB-174 test_r2_edge): a
            # perfect constant prediction scores 1, an imperfect
            # one 0 — never NaN from the 0/0
            r2 = 1.0 if float(st["ssres"]) <= 0.0 else 0.0
        else:
            r2 = 1.0 - float(st["ssres"]) / sstot
        n = int(st["n"])
        idxs = {q: int((n - 1) * q) for q in (0.25, 0.5, 0.75, 0.9)}
        # |(p−y)/y| with the reference's IEEE edge behavior on y=0
        # (C++ gives ±inf / nan; Spark's ANSI `/` would throw)
        rel = base.select(
            F.abs(
                F.when(
                    F.col("y") != 0, (F.col("p") - F.col("y")) / F.col("y")
                ).otherwise(
                    F.when(
                        F.col("p") == F.col("y"), F.lit(float("nan"))
                    ).otherwise(F.lit(float("inf")))
                )
            ).alias("rel")
        )
        # index the sorted error column through the parallel
        # zipWithIndex pattern (VERDICT r8 #4) — a global
        # Window.orderBy here single-partitions the whole error
        # column; global_hash_index range-partitions the sort and
        # numbers per-partition with broadcast offsets. Same values
        # at every index: ties order arbitrarily in both, but the
        # sort key IS the value being picked.
        from mldb_spark.operators.relational import global_hash_index

        ranked = global_hash_index(rel, F.col("rel"), "__rk").filter(
            F.col("__rk").isin(list(set(idxs.values())))
        )
        picked = {r["__rk"]: r["rel"] for r in ranked.collect()}
        qs = {q: float(picked[i]) for q, i in idxs.items()}
        return scored.sparkSession.createDataFrame(
            [(mse, r2, qs[0.25], qs[0.5], qs[0.75], qs[0.9])],
            "mse double, r2 double, quantile_err_25 double, "
            "quantile_err_50 double, quantile_err_75 double, "
            "quantile_err_90 double",
        )
    if mode == "categorical":
        pred_col = "predicted" if "predicted" in scored.columns else score_col
        return (
            scored.groupBy(
                F.col(label_col).cast("string").alias("label"),
                F.col(pred_col).cast("string").alias("predicted"),
            )
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy("label", "predicted")
        )
    if mode != "boolean":
        raise ValueError(f"unknown classifier.test mode {mode!r}")

    # EXACT AUC via the rank-sum identity (trapezoid ROC over every
    # distinct threshold with tied groups averaged == Mann-Whitney U),
    # the reference's full-threshold sweep (accuracy.cc:1006). MLlib's
    # BinaryClassificationEvaluator bins at numBins=1000 distinct
    # scores — approximate above that, and not replayable by a SQL
    # oracle. Shape: one partial-aggregable groupBy(score) over the
    # corpus, then a single-partition window over the DISTINCT-score
    # table only (threshold-set-sized, not corpus-sized), then one
    # 1-row aggregate. Accuracy (threshold 0.5) rides the same pass.
    wb = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    g = (
        scored.select(
            F.col(score_col).cast("double").alias("p"),
            F.col(label_col).cast("double").alias("y"),
            wb.alias("w"),
        )
        .groupBy("p")
        # weighted counts: an example of weight w counts as w
        # duplicates (integer weights keep the tie-rank identity)
        .agg(
            F.sum("w").alias("cnt"),
            F.sum(F.col("y") * F.col("w")).alias("pos"),
        )
    )
    w = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    g = g.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    return (
        g.agg(
            # average ascending rank of each tied-score group times
            # its positive count
            F.sum(
                F.col("pos") * (F.col("cum_before") + (F.col("cnt") + 1) / 2.0)
            ).alias("rsum"),
            F.sum("pos").alias("npos"),
            F.sum(F.col("cnt") - F.col("pos")).alias("nneg"),
            F.sum(
                F.when(F.col("p") > 0.5, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            ).alias("ncorrect"),
            F.sum("cnt").alias("n"),
        )
        .select(
            F.when(
                (F.col("npos") > 0) & (F.col("nneg") > 0),
                (F.col("rsum") - F.col("npos") * (F.col("npos") + 1) / 2.0)
                / (F.col("npos") * F.col("nneg")),
            )
            .otherwise(F.lit(0.5))  # degenerate single-class split
            .alias("auc"),
            (F.col("ncorrect") / F.col("n")).alias("accuracy"),
        )
    )


def multilabel_train(
    df: DataFrame,
    feature_cols: list[str],
    label_cols: list[str],
    strategy: str = "one-vs-all",
    name: str = "multilabel",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    max_iter: int = 50,
):
    """classifier.train mode=multilabel
    (plugins/jml/classifier.cc:63,85-100 and
    testing/multilabel-classifier-test.py): the label is a ROW — each
    non-null column is a present label. Strategies prepare the
    training examples exactly like the reference:

    - one-vs-all: one independent binary fit per label (P(label_i));
      each fit is a distributed MLlib estimator, the loop is
      label-count-sized;
    - decompose: every example decomposes into one single-label
      example per present label, then ONE multinomial fit over the
      exploded set (P(category) sums to 1);
    - random: ONE deterministic (hash-seeded) label is kept per
      example, then the multinomial fit — the reference's sampling
      strategy made reproducible.

    Registers `name` as a scorer adding a `scores` STRUCT column
    keyed by label name (`fn({features:…})[scores.label0]` reads one
    class's score, `… as *` spreads them)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    if strategy not in ("one-vs-all", "decompose", "random"):
        raise ValueError(f"unknown multilabelStrategy {strategy!r}")
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    present = {
        c: F.col(c).isNotNull() & (F.col(c).cast("string") != F.lit("false"))
        for c in label_cols
    }

    if strategy == "one-vs-all":
        models = {}
        for c in label_cols:
            models[c] = LogisticRegression(maxIter=max_iter, regParam=0.01).fit(
                assembler.transform(
                    df.withColumn("label", present[c].cast("double"))
                )
            )

        def score(d: DataFrame) -> DataFrame:
            out = assembler.transform(d)
            for c, m in models.items():
                out = m.transform(out)
                out = out.select(
                    *[x for x in out.columns
                      if x not in ("rawPrediction", "probability",
                                   "prediction")],
                    vector_to_array(F.col("probability")).getItem(1)
                    .alias(f"__p_{c}"),
                )
            return out.withColumn(
                "scores",
                F.struct(*[F.col(f"__p_{c}").alias(c) for c in label_cols]),
            ).drop("features", *[f"__p_{c}" for c in label_cols])

        registry.register(name, score)
        return models

    # decompose / random: explode (or pick) a single label per
    # example, then one multinomial fit
    lab_arr = F.array_compact(
        F.array(*[F.when(present[c], F.lit(c)) for c in label_cols])
    )
    if strategy == "decompose":
        flat = df.withColumn("label", F.explode(lab_arr))
    else:  # random: deterministic hash pick, the reference's sampling
        pick = F.pmod(
            F.xxhash64(*[F.col(c) for c in feature_cols]),
            F.greatest(F.size(lab_arr), F.lit(1)),
        )
        flat = df.withColumn(
            "label", F.element_at(lab_arr, (pick + 1).cast("int"))
        ).filter(F.col("label").isNotNull())
    from pyspark.ml.feature import StringIndexer

    idx = StringIndexer(inputCol="label", outputCol="__li").fit(flat)
    classes = list(idx.labels)
    model = LogisticRegression(
        maxIter=max_iter, regParam=0.01, labelCol="__li"
    ).fit(assembler.transform(idx.transform(flat)))

    def score_multi(d: DataFrame) -> DataFrame:
        out = model.transform(assembler.transform(d))
        probs = vector_to_array(F.col("probability"))
        fields = [
            probs.getItem(classes.index(c)).alias(c)
            if c in classes
            else F.lit(0.0).alias(c)
            for c in label_cols
        ]
        return out.withColumn("scores", F.struct(*fields)).drop(
            "features", "rawPrediction", "probability", "prediction"
        )

    registry.register(name, score_multi)
    return model


def multilabel_test(
    scored: DataFrame,
    score_fields: list[str],
    label_fields: list[str],
    recall_over_n: "list[int]" = (1,),
    score_col: str = "score",
    label_col: str = "label",
    weight_col: "str | None" = None,
) -> dict:
    """classifier.test mode=multilabel (accuracy.cc:640-764): per
    example, every label is ranked by its score with the reference's
    tie handling — averageRank = (2·earliestRank + ties − 1)/2 — and

    - coverageError = Σ (1 + max averageRank over TRUE labels)·w·|L|
      / Σ w·|L|  (each true label contributes the example's weight);
    - recallOverTopN[n] per label and weighted: a true label counts
      fully when its whole tie group fits in the top n, fractionally
      (numPositions/ties) when the group straddles the cut.

    Shape: one explode over true labels + one groupBy label; the
    rank arithmetic runs as array higher-order functions (no Python
    in the row path)."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    sc = F.col(score_col)
    lb = F.col(label_col)
    scores_arr = F.array(
        *[sc.getField(f).cast("double").alias("s") for f in score_fields]
    )
    true_arr = F.array_compact(
        F.array(
            *[
                F.when(
                    lb.getField(f).isNotNull()
                    & (lb.getField(f).cast("string") != F.lit("false")),
                    F.lit(f),
                )
                for f in label_fields
            ]
        )
    )
    base = scored.select(
        w.alias("w"), scores_arr.alias("ss"), true_arr.alias("tl")
    ).filter(F.size("tl") > 0)
    name_arr = F.array(*[F.lit(f) for f in score_fields])
    per_label = base.select(
        "w", "ss",
        F.explode("tl").alias("lab"),
        F.size("tl").alias("nl"),
    ).withColumn(
        "sl",
        F.element_at(
            F.map_from_arrays(name_arr, F.col("ss")), F.col("lab")
        ),
    ).withColumn(
        "er",
        F.size(F.filter("ss", lambda x: x > F.col("sl"))),
    ).withColumn(
        "ties",
        F.size(F.filter("ss", lambda x: x == F.col("sl"))),
    ).withColumn(
        "avg_rank",
        (2 * F.col("er") + F.col("ties") - 1) / 2.0,
    )
    # per-(label, n) recall credit with the straddling-tie fraction
    recs = {}
    for i, n in enumerate(recall_over_n):
        credit = (
            F.when(F.col("er") >= n, F.lit(0.0))
            .when(
                (F.col("ties") > 1) & (F.col("er") + F.col("ties") - 1 >= n),
                F.col("w") * (n - F.col("er")) / F.col("ties"),
            )
            .otherwise(F.col("w"))
        )
        per_label = per_label.withColumn(f"__credit{i}", credit)
    lab_stats = per_label.groupBy("lab").agg(
        F.sum("w").alias("labw"),
        *[
            F.sum(f"__credit{i}").alias(f"__c{i}")
            for i in range(len(recall_over_n))
        ],
    )
    label_statistics = {
        r["lab"]: {
            "recallOverTopN": [
                float(r[f"__c{i}"]) / float(r["labw"])
                for i in range(len(recall_over_n))
            ]
        }
        for r in lab_stats.collect()
    }
    tot = per_label.agg(
        F.sum("w").alias("tw"),
        *[
            F.sum(f"__credit{i}").alias(f"__c{i}")
            for i in range(len(recall_over_n))
        ],
    ).collect()[0]
    covtot = (
        base.select(
            "w", "ss", F.size("tl").alias("nl"),
            F.array_max(
                F.transform(
                    "tl",
                    lambda lab: (
                        2 * F.size(
                            F.filter(
                                "ss",
                                lambda x: x > F.element_at(
                                    F.map_from_arrays(name_arr, F.col("ss")),
                                    lab,
                                ),
                            )
                        )
                        + F.size(
                            F.filter(
                                "ss",
                                lambda x: x == F.element_at(
                                    F.map_from_arrays(name_arr, F.col("ss")),
                                    lab,
                                ),
                            )
                        )
                        - 1
                    ) / 2.0,
                )
            ).alias("mr"),
        )
        .agg(F.sum((1 + F.col("mr")) * F.col("w") * F.col("nl")).alias("ce"))
        .collect()[0]["ce"]
    )
    return {
        "labelStatistics": label_statistics,
        "recallOverN": list(recall_over_n),
        "weightedStatistics": {
            "coverageError": float(covtot) / float(tot["tw"]),
            "recallOverTopN": [
                float(tot[f"__c{i}"]) / float(tot["tw"])
                for i in range(len(recall_over_n))
            ],
        },
    }


def classifier_test_roc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    weight_col: "str | None" = None,
    row_name_col: "str | None" = None,
) -> DataFrame:
    """classifier.test boolean mode's OUTPUT DATASET
    (plugins/jml/accuracy.cc; exact rows pinned by
    testing/test_classifier_test_proc.py): one row per test example
    with the threshold-sweep statistics at that example's score —
    index (rank, ties share), weight, label, score, weighted
    truePositives/falseNegatives/trueNegatives/falsePositives,
    true/falsePositiveRate, accuracy, recall, precision. Tied scores
    share one threshold (the reference includes the whole tie group).

    Scale shape (VERDICT r8 #2 — no global window over per-example
    rows): partial-aggregate per DISTINCT score first (one shuffle
    with map-side combine), run the unpartitioned cumulative window
    over the threshold-set-sized distinct table only — the same shape
    `classifier_test` uses for exact AUC — then equi-join the
    cumulative TP/FP back to the examples on score (AQE broadcasts
    the threshold table when it is small). Grouping by score makes
    the tie handling exact: a rows frame over the distinct table
    equals the reference's range frame over examples."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    rn_cols = (
        [F.col(row_name_col).cast("string").alias("__rowName")]
        if row_name_col and row_name_col in scored.columns
        else []
    )
    from mldb_spark.caching import persist_tracked

    # persist: base feeds THREE consumers (the totals aggregate, the
    # distinct-score partial agg, and the per-example output join) —
    # un-persisted, the scoring pass + test-set scan re-ran per
    # consumer (optimization r9). Values are unchanged: same plan per
    # consumer, just materialized once.
    base = persist_tracked(
        scored.select(
            F.col(score_col).cast("double").alias("score"),
            F.col(label_col).cast("double").alias("label"),
            w.alias("weight"),
            *rn_cols,
        )
    )
    tot = base.agg(
        F.sum(F.col("weight") * F.col("label")).alias("tp_all"),
        F.sum(F.col("weight") * (1 - F.col("label"))).alias("tn_all"),
    )
    g = base.groupBy("score").agg(
        F.count(F.lit(1)).alias("__nrows"),
        F.sum(F.col("weight") * F.col("label")).alias("__pos"),
        F.sum(F.col("weight") * (1 - F.col("label"))).alias("__neg"),
    )
    w_prev = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cur = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "score",
        # rank with ties sharing: 1 + #examples with strictly higher
        # score (rank() over per-example rows gives exactly this)
        (F.coalesce(F.sum("__nrows").over(w_prev), F.lit(0)) + 1)
        .cast("int")
        .alias("index"),
        F.sum("__pos").over(w_cur).alias("truePositives"),
        F.sum("__neg").over(w_cur).alias("falsePositives"),
    )
    out = base.crossJoin(F.broadcast(tot)).join(cum, "score")
    tp, fp = F.col("truePositives"), F.col("falsePositives")
    return out.select(
        *(["__rowName"] if rn_cols else []),
        "index",
        "weight",
        F.col("label").cast("long").alias("label"),
        "score",
        tp,
        (F.col("tp_all") - tp).alias("falseNegatives"),
        (tp / F.col("tp_all")).alias("truePositiveRate"),
        (F.col("tn_all") - fp).alias("trueNegatives"),
        fp,
        (fp / F.col("tn_all")).alias("falsePositiveRate"),
        ((tp + F.col("tn_all") - fp) / (F.col("tp_all") + F.col("tn_all"))).alias(
            "accuracy"
        ),
        (tp / F.col("tp_all")).alias("recall"),
        (tp / (tp + fp)).alias("precision"),
    )


def categorical_statistics(
    scored: DataFrame,
    label_col: str = "label",
    pred_col: str = "predicted",
    weight_col: "str | None" = None,
) -> DataFrame:
    """classifier.test mode=categorical labelStatistics
    (plugins/jml/accuracy.cc; exact numbers pinned by MLDB-256):
    per-label (support, precision, recall, f1Score, accuracy) from
    the confusion matrix, where accuracy is the label's one-vs-rest
    accuracy (tp + tn) / total. Scale shape: ONE groupBy shuffle to
    the (label, predicted) confusion matrix (<= |labels|² rows);
    everything downstream is label-sized joins."""
    cw = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    from mldb_spark.caching import persist_tracked

    # persist: the confusion matrix is <= |labels|² rows but feeds
    # FIVE consumers below (label set twice, support, pred_n, tp) —
    # un-persisted, each one re-ran the full scoring pass + groupBy
    # over the test set (optimization r9)
    conf = persist_tracked(
        scored.groupBy(
            F.col(label_col).cast("string").alias("label"),
            F.col(pred_col).cast("string").alias("predicted"),
        )
        .agg(F.sum(cw).alias("n"))  # weighted confusion counts
    )
    labels = (
        conf.select(F.col("label").alias("L"))
        .union(conf.select(F.col("predicted").alias("L")))
        .distinct()
    )
    support = conf.groupBy("label").agg(F.sum("n").alias("support"))
    pred_n = conf.groupBy("predicted").agg(F.sum("n").alias("pred_n"))
    tp = conf.filter(F.col("label") == F.col("predicted")).select(
        F.col("label").alias("L"), F.col("n").alias("tp")
    )
    total = conf.agg(F.sum("n").alias("total"))
    out = (
        labels.join(support, labels["L"] == support["label"], "left")
        .join(pred_n, labels["L"] == pred_n["predicted"], "left")
        .join(tp, "L", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("L").alias("label"),
            F.coalesce("support", F.lit(0.0)).alias("support"),
            F.coalesce("tp", F.lit(0.0)).alias("__tp"),
            F.coalesce("pred_n", F.lit(0.0)).alias("__pn"),
            F.col("total").alias("__total"),
        )
    )
    precision = F.when(
        F.col("__pn") > 0, F.col("__tp") / F.col("__pn")
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("support") > 0, F.col("__tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        precision + recall > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(F.lit(0.0))
    accuracy = (
        F.col("__tp")
        + (F.col("__total") - F.col("support") - F.col("__pn") + F.col("__tp"))
    ) / F.col("__total")
    return out.select(
        "label",
        # weighted support stays fractional when weights are
        F.when(
            F.col("support") == F.floor("support"),
            F.col("support").cast("long").cast("double"),
        ).otherwise(F.col("support")).alias("support"),
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1Score"),
        accuracy.alias("accuracy"),
    ).orderBy("label")


def weighted_statistics(label_stats: DataFrame) -> dict:
    """Support-weighted roll-up of categorical_statistics — the
    reference's weightedStatistics block (MLDB-256)."""
    row = (
        label_stats.agg(
            F.sum("support").alias("support"),
            (F.sum(F.col("f1Score") * F.col("support")) / F.sum("support")).alias("f1Score"),
            (F.sum(F.col("recall") * F.col("support")) / F.sum("support")).alias("recall"),
            (F.sum(F.col("precision") * F.col("support")) / F.sum("support")).alias("precision"),
            (F.sum(F.col("accuracy") * F.col("support")) / F.sum("support")).alias("accuracy"),
        )
    ).collect()[0]
    return {
        "support": int(row["support"]),
        "f1Score": row["f1Score"],
        "recall": row["recall"],
        "precision": row["precision"],
        "accuracy": row["accuracy"],
    }


def argmax_prediction(scored: DataFrame, score_cols: list[str], out_col: str = "predicted") -> DataFrame:
    """predicted = argmax over per-class score columns (the
    `{* EXCLUDING(label)} as score` testingData idiom); ties resolve
    to the lexically-largest class name (struct max)."""
    arr = F.array(
        *[
            F.struct(
                F.col(f"`{c}`" if "." in c else c).cast("double").alias("s"),
                F.lit(c).alias("k"),
            )
            for c in score_cols
        ]
    )
    return scored.withColumn(out_col, F.array_max(arr)["k"])


def probabilizer_train(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    name: str = "probabilizer",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """Score→probability calibration: logistic regression on the raw
    score (Platt scaling), the reference probabilizer's contract.

    Local fast path (optimization r9): one unregularized feature —
    the log-loss optimum is unique whenever the scores are not
    separable, so the bounded-collect Newton fit replaces MLlib's
    ~50 scheduled LBFGS jobs with the same (pa, pb); separable or
    oversized inputs fall back to the MLlib fit."""
    local = _try_local_logistic(scored, [score_col], label_col, lam=0.0)
    if local is not None:
        (pa,), pb = local
        model = _LocalLogisticModel([float(pa)], float(pb))

        def calibrate_local(d: DataFrame) -> DataFrame:
            z = F.lit(float(pb)) + F.col(score_col).cast("double") * F.lit(
                float(pa)
            )
            return d.withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))

        registry.register(name, calibrate_local)
        return model

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
    # corpus size rides in as a broadcast one-row cross join
    # (optimization r9, the q61 min_df pattern): the eager docs.count()
    # was a SEPARATE full corpus pass per call, purely to bake N into
    # the idf literal — lazy keeps it one plan, one scan of docs for
    # the count aggregate
    n_docs_df = docs.select(
        F.count(F.lit(1)).cast("double").alias("__ndocs")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("__ndocs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


def _local_linear_svc(X, y01, lam: float):
    """Driver-side solve of MLlib LinearSVC's exact objective:
    (1/n)·Σ hinge(y·(w_std·x_std + b)) + (λ/2)·‖w_std‖² with features
    scaled by the unbiased std and the intercept unregularized. The
    objective is strictly convex in w (λ>0) and — on non-separable
    data — in b, so the optimum is unique; hinge's kink is handled by
    ε-continuation over a quadratically smoothed hinge (Newton with
    backtracking at each ε, warm-started), whose solution converges to
    the hinge optimum as ε→0. On the q66 gate data this lands at a
    strictly LOWER primal objective than MLlib's OWLQN at tol=1e-3
    (0.3392433 vs 0.3392449; max coefficient gap 3.8e-4 — MLlib's
    loose tol stops short, it is the same unique optimum). Returns
    (coefficients, intercept) or None on any numerical trouble —
    callers fall back to the distributed MLlib fit."""
    import numpy as np

    n, d = X.shape
    std = X.std(axis=0, ddof=1) if n > 1 else np.ones(d)
    std = np.where(std > 0, std, 1.0)
    y = 2.0 * y01 - 1.0
    A = np.hstack([X / std, np.ones((n, 1))])
    th = np.zeros(d + 1)

    def f(theta, eps):
        z = 1.0 - y * (A @ theta)
        band = np.abs(z) < eps
        lin = z >= eps
        return (
            np.sum(z[lin]) + np.sum((z[band] + eps) ** 2 / (4 * eps))
        ) / n + 0.5 * lam * theta[:d] @ theta[:d]

    for eps in (1e-1, 1e-2, 1e-3, 1e-4, 1e-5, 1e-6, 1e-7, 1e-8):
        for _ in range(100):
            z = 1.0 - y * (A @ th)
            band = np.abs(z) < eps
            lin = z >= eps
            loss = f(th, eps)
            dz = np.zeros(n)
            dz[lin] = 1.0
            dz[band] = (z[band] + eps) / (2 * eps)
            g = -(A * (y * dz)[:, None]).sum(axis=0) / n
            g[:d] += lam * th[:d]
            if np.linalg.norm(g) < 1e-10:
                break
            Ab = A[band]
            H = (Ab.T @ Ab) / (2 * eps * n)
            H[:d, :d] += lam * np.eye(d)
            H += 1e-12 * np.eye(d + 1)
            try:
                step = np.linalg.solve(H, g)
            except np.linalg.LinAlgError:
                return None
            if not np.all(np.isfinite(step)):
                return None
            t = 1.0
            for _ in range(60):
                if f(th - t * step, eps) <= loss - 1e-4 * t * (g @ step):
                    break
                t *= 0.5
            th = th - t * step
            if t * np.linalg.norm(step) < 1e-14:
                break
    if not np.all(np.isfinite(th)):
        return None
    # Separable-input guard (VERDICT r9 #7): when the solve ends with
    # (numerically) zero hinge loss on EVERY point, the unregularized
    # intercept can be non-unique (kink points from one class only →
    # a flat segment in b) and the Newton result may differ from
    # MLlib's. Fall back to the distributed fit so both regimes share
    # one answer. λ>0 keeps w unique either way; non-separable data
    # always leaves points with real hinge loss (z ≫ 0), so this
    # never triggers there. Tolerance 1e-6 ≫ the final smoothing
    # eps=1e-8, under which kink points land at margin 1 ± O(eps).
    if np.all(y * (A @ th) >= 1.0 - 1e-6):
        return None
    return th[:d] / std, float(th[d])


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

    # bounded local fast path (optimization r9, the _local_logistic
    # pattern): the L2-hinge objective has a unique optimum on
    # non-separable data, so a driver-side continuation-Newton solve
    # replaces MLlib's ~50 scheduled OWLQN jobs. Degenerate inputs
    # (constant labels — where the unregularized intercept makes the
    # optimum non-unique — NaNs, oversized data) keep the MLlib path.
    import numpy as np

    local = None
    if len(feature_cols) <= _LR_LOCAL_FEATS:
        head = (
            df.select(
                *[F.col(f"`{c}`").cast("double") for c in feature_cols],
                F.col(label_col).cast("double").alias("__y"),
            )
            .limit(_LR_LOCAL_ROWS + 1)
            .toPandas()
        )
        if 0 < len(head) <= _LR_LOCAL_ROWS:
            M = head.to_numpy(dtype=float)
            if np.all(np.isfinite(M)):
                X, y = M[:, :-1], M[:, -1]
                if y.min() != y.max() and set(np.unique(y)) <= {0.0, 1.0}:
                    local = _local_linear_svc(X, y, lam=0.01)
    if local is not None:
        w_loc, b_loc = local
        model = _LocalLogisticModel([float(x) for x in w_loc], float(b_loc))

        def score_local(d: DataFrame) -> DataFrame:
            # margin = b + w·x — exactly rawPrediction[1] of the MLlib
            # model, as pure JVM expressions
            margin = F.lit(float(model.intercept))
            for c, wj in zip(feature_cols, model.coefficients):
                margin = margin + F.col(f"`{c}`").cast("double") * F.lit(float(wj))
            return d.withColumn("margin", _margin_or_raise(margin, "svm.train"))

        registry.register(name, score_local)
        return model

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    # tol mirrors libsvm's default stopping eps (-e 0.001), the
    # reference's actual convergence criterion (plugins/jml/svm.cc) —
    # MLlib's 1e-6 default buys nothing but iterations here
    model = LinearSVC(maxIter=50, regParam=0.01, tol=1e-3).fit(
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
    # persist the assembled frame THROUGH the fit (optimization r10,
    # guide §2.4; VERDICT r9 #8): tree induction scans the input for
    # metadata (take + aggregate) before MLlib's own internal cache of
    # the converted bagged RDD exists — without the barrier the
    # featurization pipeline recomputes per pass (measured ~10%:
    # 4.03s -> 3.62s warm fit on the q65 gate). Released right after
    # the fit; the registered scorer only needs the model.
    from mldb_spark.caching import persist_tracked

    assembled = persist_tracked(
        assembler.transform(df).withColumn(
            "label", F.col(label_col).cast("double")
        )
    )
    try:
        model = RandomForestClassifier(numTrees=num_trees, seed=seed).fit(assembled)
    finally:
        assembled.unpersist()

    def score(d: DataFrame) -> DataFrame:
        out = model.transform(assembler.transform(d))
        return out.withColumn(
            "score", vector_to_array(F.col("probability")).getItem(1)
        ).drop("features", "rawPrediction", "probability", "prediction")

    registry.register(name, score)
    return model


class _LocalGMMModel:
    """Shim matching the MLlib GaussianMixtureModel surface the
    callers use (weights, gaussiansDF) for the local fast path."""

    def __init__(self, spark, weights, means, covs):
        self._spark = spark
        self.weights = [float(w) for w in weights]
        self._means = means
        self._covs = covs

    @property
    def gaussiansDF(self):
        from pyspark.ml.linalg import Matrices, Vectors

        d = len(self._means[0])
        rows = [
            (
                Vectors.dense([float(x) for x in m]),
                Matrices.dense(d, d, [float(x) for x in c.T.ravel()]),
            )
            for m, c in zip(self._means, self._covs)
        ]
        return self._spark.createDataFrame(rows, ["mean", "cov"])


def _local_gmm(X, k: int, seed: int, n_iter: int = 100, tol: float = 1e-6):
    """Seeded full-covariance EM in numpy, deterministic: kmeans++
    means init (the same _local_kmeans kernel), uniform weights,
    global covariance start, ridge-regularized M-step. Returns
    (weights, means, covs)."""
    import numpy as np

    n, d = X.shape
    k = min(k, n)
    means = np.array(_local_kmeans(X, k, seed, n_iter=20), dtype=float)
    covs = np.array([np.cov(X.T) + 1e-6 * np.eye(d) for _ in range(k)])
    if covs.ndim == 1:  # d == 1 degenerates
        covs = covs.reshape(k, 1, 1)
    weights = np.full(k, 1.0 / k)
    prev_ll = -np.inf
    log_resp = None
    for _ in range(n_iter):
        # E-step: log densities via slogdet + solve
        logp = np.empty((n, k))
        for j in range(k):
            diff = X - means[j]
            sign, logdet = np.linalg.slogdet(covs[j])
            sol = np.linalg.solve(covs[j], diff.T).T
            quad = np.einsum("ij,ij->i", diff, sol)
            logp[:, j] = (
                np.log(max(weights[j], 1e-300))
                - 0.5 * (d * np.log(2.0 * np.pi) + logdet + quad)
            )
        m = logp.max(axis=1, keepdims=True)
        lse = m + np.log(np.exp(logp - m).sum(axis=1, keepdims=True))
        log_resp = logp - lse
        ll = float(lse.sum())
        resp = np.exp(log_resp)
        # M-step
        nk = resp.sum(axis=0) + 1e-300
        weights = nk / n
        means = (resp.T @ X) / nk[:, None]
        for j in range(k):
            diff = X - means[j]
            covs[j] = (resp[:, j][:, None] * diff).T @ diff / nk[j]
            covs[j] += 1e-6 * np.trace(covs[j]) / d * np.eye(d) + 1e-12 * np.eye(d)
        if abs(ll - prev_ll) < tol * max(1.0, abs(prev_ll)):
            break
        prev_ll = ll
    return weights, means, covs


def gaussian_clustering_train(
    df: DataFrame,
    array_col: str,
    k: int = 4,
    seed: int = 42,
    name: str = "gmm",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    local_cutoff: int = 4096,
):
    """gaussianclustering.train (plugins/jml/em_interface.cc:383) →
    GaussianMixture (EM); registers a hard-assignment function adding
    `prediction`.

    Two regimes, the kmeans_train pattern (optimization r9): the
    MLlib EM schedules ~2 one-task stages PER ITERATION — 210 stages
    and 16s of wall for 1.7s of task time on the 2000-vector gate —
    so inputs ≤ local_cutoff rows collect once and fit a seeded
    numpy EM on the driver; larger inputs keep MLlib's distributed
    EM. The local regime registers argmax of
    ln(w_k) − ½(ln|Σ_k| + (x−μ_k)ᵀΣ_k⁻¹(x−μ_k)) with ties to the
    LOWEST component id — pure-JVM expressions over one nested
    literal (the kmeans assign pattern), the exact formula the q67
    oracle replays from the exported fixtures; the MLlib regime
    registers model.transform (MLlib's posterior argmax)."""
    import numpy as np

    spark = df.sparkSession
    head = df.select(array_col).limit(local_cutoff + 1).collect()
    fitted = None
    if len(head) <= local_cutoff and head:
        X = np.array([r[0] for r in head], dtype=float)
        fitted = _local_gmm(X, k, seed)
        # degenerate input (1 row / k>n tiny sets): np.cov yields NaN
        # covariances that would otherwise flow into the assignment
        # literals — fall back to the MLlib fit instead (ADVICE r9)
        if not all(bool(np.isfinite(a).all()) for a in fitted):
            fitted = None
    if fitted is not None:
        weights, means, covs = fitted
        model = _LocalGMMModel(spark, weights, means, covs)
        d = X.shape[1]
        consts, mus, precs = [], [], []
        for j in range(len(weights)):
            sign, logdet = np.linalg.slogdet(covs[j])
            consts.append(
                float(np.log(max(float(weights[j]), 1e-300)) - 0.5 * logdet)
            )
            mus.append([float(x) for x in means[j]])
            precs.append(
                [[float(x) for x in row] for row in np.linalg.inv(covs[j])]
            )

        def assign(dd: DataFrame) -> DataFrame:
            # one-parse literals (optimization r10): F.lit(mu) /
            # F.lit(P) round-trip py4j per element — k 64×64
            # precision matrices cost seconds of plan construction
            from mldb_spark.functions.vector import (
                array_double_lit,
                matrix_double_lit,
            )

            comps = F.array(
                *[
                    F.struct(
                        F.lit(consts[j]).alias("c"),
                        array_double_lit(mus[j]).alias("mu"),
                        matrix_double_lit(precs[j]).alias("P"),
                    )
                    for j in range(len(consts))
                ]
            )

            def score(s):
                diff = F.zip_with(
                    F.col(array_col), s["mu"], lambda a, b: a.cast("double") - b
                )
                quad = F.aggregate(
                    F.zip_with(
                        s["P"],
                        diff,
                        lambda row, di: di
                        * F.aggregate(
                            F.zip_with(row, diff, lambda p, dj: p * dj),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                return s["c"] - 0.5 * quad

            scores = F.transform(comps, score)
            pred = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
            return dd.withColumn("prediction", pred)

        registry.register(name, assign)
        return model

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


def _tsne_exact(X, n_components=2, perplexity=15.0, n_iter=500, seed=42):
    """Exact t-SNE (van der Maaten & Hinton 2008) in numpy: pairwise
    Gaussian affinities with per-point perplexity calibration, then
    gradient descent on the KL divergence against the Student-t
    low-dim kernel. O(n²) — for the <=10k-point visualization samples
    the procedure collects, same regime the reference's single-node
    implementation targets."""
    import numpy as np

    n = X.shape[0]
    rng = np.random.RandomState(seed)
    D = np.square(X[:, None, :] - X[None, :, :]).sum(-1)
    P = np.zeros((n, n))
    target = np.log(min(perplexity, max(2.0, (n - 1) / 3.0)))
    for i in range(n):
        lo, hi, beta = 1e-20, 1e20, 1.0
        Di = np.delete(D[i], i)
        for _ in range(50):
            Pi = np.exp(-Di * beta)
            s = Pi.sum()
            if s <= 1e-300:
                beta, hi = (lo + beta) / 2.0, beta
                continue
            Pi = Pi / s
            H = -(Pi * np.log(np.maximum(Pi, 1e-300))).sum()
            if abs(H - target) < 1e-5:
                break
            if H > target:
                lo, beta = beta, beta * 2 if hi >= 1e20 else (beta + hi) / 2
            else:
                hi, beta = beta, (lo + beta) / 2
        row = np.exp(-np.delete(D[i], i) * beta)
        row = row / max(row.sum(), 1e-300)
        P[i, np.arange(n) != i] = row
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    Y = rng.randn(n, n_components) * 1e-4
    dY = np.zeros_like(Y)
    gains = np.ones_like(Y)
    momentum = 0.5
    # sklearn-style auto learning rate: too-hot steps explode the
    # layout during exaggeration and strand it in a diffuse state
    exaggeration = 12.0
    exag_until = min(250, n_iter // 2)
    lr = max(n / (4.0 * exaggeration), 50.0)
    for it in range(n_iter):
        # ||y_i - y_j||² via the Gram identity: inside the Spark
        # driver process, (n, n, 2) broadcast temporaries allocate
        # ~10× slower than standalone numpy (fresh large pages next
        # to the JVM heap every iteration); the matmul form reuses
        # BLAS buffers and is the standard O(n²) path
        ysq = (Y * Y).sum(1)
        num = 1.0 / (
            1.0 + np.maximum(ysq[:, None] + ysq[None, :] - 2.0 * (Y @ Y.T), 0.0)
        )
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (P * (exaggeration if it < exag_until else 1.0)) - Q
        # gradient via the standard matmul identity:
        # grad_i = 4·Σ_j W_ij (y_i − y_j)  with  W = PQ∘num
        #        = 4·(rowsum(W)·y_i − (W·Y)_i)
        # — replaces the (n, n, 2) broadcast temporary per iteration
        # (13× on the 300-point gate sample; same math, FP-reassociated)
        W = PQ * num
        grad = 4.0 * (W.sum(1)[:, None] * Y - W @ Y)
        gains = np.where(np.sign(grad) != np.sign(dY), gains + 0.2, gains * 0.8)
        gains = np.maximum(gains, 0.01)
        dY = momentum * dY - lr * gains * grad
        Y = Y + dY
        Y = Y - Y.mean(0)
        if it == exag_until:
            momentum = 0.8
    return Y


def tsne_train(
    df: DataFrame,
    array_col: str,
    id_col: str = "vec_id",
    n_components: int = 2,
    perplexity: float = 15.0,
    max_rows: int = 5000,
    seed: int = 42,
    n_iter: int = 500,
):
    """tsne.train (plugins/jml/tsne_interface.cc:452): 2-D/3-D
    embedding for visualization. Like the reference, t-SNE is a
    single-node algorithm over a bounded sample: collect up to
    max_rows (deterministic id order), run the exact numpy solver,
    and return the (id, x[, y[, z]]) coordinate DataFrame."""
    import numpy as np

    rows = (
        df.select(id_col, array_col).orderBy(id_col).limit(max_rows).collect()
    )
    ids = [r[id_col] for r in rows]
    X = np.array([r[array_col] for r in rows], dtype=np.float64)
    Y = _tsne_exact(X, n_components, perplexity, n_iter=n_iter, seed=seed)
    coords = [(i, *[float(v) for v in y]) for i, y in zip(ids, Y)]
    names = ["x", "y", "z"][:n_components]
    # carry the INPUT's id type — string column/row names (the
    # reference's reddit/stackoverflow chains run tsne over token
    # embeddings) must not be forced through a long schema
    id_type = dict(df.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, " + ", ".join(
        f"{n} double" for n in names
    )
    return df.sparkSession.createDataFrame(coords, schema)


def tsne_embed_row(
    train_df: DataFrame,
    coords: DataFrame,
    array_col: str,
    id_col: str = "vec_id",
    k: int = 3,
    name: str | None = None,
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """tsne.embedRow (plugins/jml/tsne_interface.cc:458): out-of-sample
    embedding for a trained t-SNE map. t-SNE is non-parametric, so the
    reference (and everyone else) interpolates: find the k nearest
    TRAINING points in the original space and take the inverse-
    distance-weighted mean of their map positions. A training row
    lands exactly on its own map position (distance 0 dominates).

    Scale shape: the trained map is bounded by tsne_train's max_rows
    (<=5k x dim), so it broadcasts into an Arrow-batched mapInPandas
    kernel — new rows stream through in one corpus scan, no shuffle,
    no driver loop. Distances use the ||v||^2 + ||x||^2 - 2 v.x form
    (one matmul per batch, never a (batch, n, dim) intermediate).
    """
    import numpy as np

    out_names = [c for c in coords.columns if c != id_col]
    joined = (
        train_df.select(id_col, array_col)
        .join(coords, id_col)
        .orderBy(id_col)
        .collect()
    )
    if not joined:
        raise ValueError("empty trained map")
    X = np.array([r[array_col] for r in joined], dtype=np.float64)
    Y = np.array([[r[c] for c in out_names] for r in joined], dtype=np.float64)
    x_sq = (X * X).sum(1)
    kk = min(k, X.shape[0])

    def embed(d: DataFrame) -> DataFrame:
        from pyspark.sql.types import DoubleType, StructField, StructType

        clash = [c for c in out_names if c in d.columns]
        if clash:
            raise ValueError(
                f"input already has coordinate column(s) {clash}; rename "
                f"them before embedding (outputs are {out_names})"
            )
        # copy the input schema and append the coord fields — string
        # surgery on simpleString() breaks on nested/renderer-variant
        # types and cannot detect name collisions
        schema = StructType(
            list(d.schema.fields)
            + [StructField(c, DoubleType()) for c in out_names]
        )
        cols = d.columns

        def fn(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                V = np.stack(pdf[array_col].to_numpy()).astype(np.float64)
                d2 = np.maximum(
                    (V * V).sum(1)[:, None] + x_sq[None, :] - 2.0 * (V @ X.T), 0.0
                )
                idx = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                nd = np.sqrt(np.take_along_axis(d2, idx, axis=1))
                w = 1.0 / (nd + 1e-12)
                w = w / w.sum(1, keepdims=True)
                emb = (w[:, :, None] * Y[idx]).sum(1)
                out = pdf[cols].copy()
                for j, c in enumerate(out_names):
                    out[c] = emb[:, j]
                yield out

        return d.mapInPandas(fn, schema)

    if name:
        registry.register(name, embed)
    return embed


def classifier_explain(
    model,
    feature_cols: list[str],
    name: str = "explain",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
):
    """classifier.explain (plugins/jml/classifier.cc:1502) for linear
    models: per-feature contribution = coefficient * feature value,
    plus the bias — the additive decomposition of the decision margin.
    Registers `name` adding explain_<feature> columns and a bias
    column; pure Column arithmetic over broadcast coefficients."""
    coefs = [float(c) for c in model.coefficients]
    bias = float(model.intercept)
    if len(coefs) != len(feature_cols):
        raise ValueError("feature_cols length != model coefficients")

    def explain(d: DataFrame) -> DataFrame:
        out = d
        for c, w in zip(feature_cols, coefs):
            out = out.withColumn(f"explain_{c}", F.round(F.col(c) * F.lit(w), 6))
        return out.withColumn("bias", F.lit(round(bias, 6)))

    registry.register(name, explain)
    return explain


def classifier_experiment(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    folds: int = 3,
    hash_col: str | None = None,
    name: str = "experiment",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    max_iter: int = 50,
    dataset_folds: "list[tuple[Column, Column]] | None" = None,
    on_fold_model=None,
) -> DataFrame:
    """classifier.experiment (plugins/jml/experiment_procedure.cc:618):
    k-fold train/test harness. Fold assignment is a deterministic
    hash-mod on hash_col (crc32 of the concatenated features when no
    id column is given), so reruns and engines agree on the split.
    Returns one row per fold: (fold, n_train, n_test, auc, accuracy).
    Each fold's fit/evaluate is a distributed job; the folds are
    DRIVER-side control flow like the reference's harness, but run
    concurrently from a thread pool — the Spark scheduler interleaves
    their jobs, so k folds on an underloaded cluster cost ~one fold's
    wall clock. The tagged input is persist_tracked once (each fold
    reads it k+1 times: fit passes + eval); fold sizes come from a
    single groupBy instead of 2k count() jobs."""
    from concurrent.futures import ThreadPoolExecutor

    from mldb_spark.caching import persist_tracked

    if dataset_folds is not None:
        # EXPLICIT fold specs (MLDB-878's datasetFolds grammar): each
        # fold names its own training/testing row conditions — the
        # harness evaluates them against the SAME tagged input (one
        # persist), so folds may overlap or leave rows out, exactly
        # like the reference's trainingWhere/testingWhere.
        tagged = persist_tracked(df)

        def run_spec(arg):
            k, (train_cond, test_cond) = arg
            train = tagged.filter(train_cond)
            test = tagged.filter(test_cond)
            reg = FunctionRegistry()
            classifier_train(
                train, feature_cols, label_col, f"{name}_f{k}", reg,
                max_iter=max_iter,
            )
            scored = reg.apply(f"{name}_f{k}", test)
            m = classifier_test(scored, label_col, "score").collect()[0]
            return (
                k, train.count(), test.count(),
                round(m["auc"], 6), round(m["accuracy"], 6),
            )

        with ThreadPoolExecutor(max_workers=4) as pool:
            results = list(pool.map(run_spec, enumerate(dataset_folds)))
        return df.sparkSession.createDataFrame(
            results,
            "fold int, n_train long, n_test long, auc double, accuracy double",
        )

    key = F.col(hash_col) if hash_col else F.crc32(F.concat_ws("|", *feature_cols))
    tagged = persist_tracked(
        df.withColumn("__fold", F.pmod(key.cast("long"), F.lit(folds)))
    )
    sizes = {
        r["__fold"]: r["n"]
        for r in tagged.groupBy("__fold").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(sizes.values())

    def run_fold(k: int):
        train = tagged.filter(F.col("__fold") != k)
        test = tagged.filter(F.col("__fold") == k)
        reg = FunctionRegistry()
        model = classifier_train(
            train, feature_cols, label_col, f"{name}_f{k}", reg,
            max_iter=max_iter,
        )
        if on_fold_model is not None:
            # fixture-export hook (q74's oracle graduation): the
            # caller collects the fitted per-fold parameters
            on_fold_model(k, model)
        scored = reg.apply(f"{name}_f{k}", test)
        m = classifier_test(scored, label_col, "score").collect()[0]
        n_test = sizes.get(k, 0)
        return (k, total - n_test, n_test, round(m["auc"], 6), round(m["accuracy"], 6))

    with ThreadPoolExecutor(max_workers=min(folds, 4)) as pool:
        results = list(pool.map(run_fold, range(folds)))
    return df.sparkSession.createDataFrame(
        results, "fold int, n_train long, n_test long, auc double, accuracy double"
    )


def permuter_run(param_grid: dict[str, list], fn) -> list[dict]:
    """permuter.run (builtin/permuter_procedure.cc:206): run a
    procedure once per element of the cartesian parameter product.
    fn(params: dict) -> result; returns [{**params, 'result': ...}].
    The driver loop launches one distributed job per combination —
    the harness itself is control flow, like the reference's."""
    import itertools

    keys = sorted(param_grid)
    out = []
    for combo in itertools.product(*[param_grid[k] for k in keys]):
        params = dict(zip(keys, combo))
        out.append({**params, "result": fn(params)})
    return out


def pca_train(df: DataFrame, array_col: str, k: int = 8):
    """PCA over a dense embedding column. Returns (model,
    explained_variance list). For the reference svd.train's full
    row/column output contract over sparse cell data, use svd_train."""
    from pyspark.ml.feature import PCA

    model = PCA(k=k, inputCol="features", outputCol="pca").fit(_to_vector(df, array_col))
    return model, [float(x) for x in model.explainedVariance]


# Bounds for svd_train's driver-local Gram accumulation: at most
# _LOCAL_GRAM_CELLS_CAP collected cell rows AND _LOCAL_GRAM_PAIRS_CAP
# Σt² index entries (~8 int64 arrays of that length); either over-cap
# keeps the distributed self-join Gram.
_LOCAL_GRAM_CELLS_CAP = 2_000_000
_LOCAL_GRAM_PAIRS_CAP = 8_000_000


def svd_train(
    cells: DataFrame,
    row_col: str = "row_id",
    column_col: str = "column",
    value_col: str = "value",
    k: int = 8,
    name: str = "svd",
    registry: FunctionRegistry = GLOBAL_REGISTRY,
    max_columns: int = 131072,
    gram_local_cap: int = 4096,
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

    Spark-first shape, two regimes by column count (the same cutover
    MLlib's own computeSVD makes between local and distributed
    eigensolvers):

    - n_cols <= gram_local_cap: the Gram matrix XᵀX is computed as a
      codegen'd self-join + hash aggregate (all JVM), collected
      (n_cols² doubles — 128 MB at the 4096 default), and
      eigendecomposed on the driver; row embeddings come back as the
      X·V broadcast join. No Python touches cell rows at all — this
      is the hot path for pruned LSA vocabularies.
    - larger vocabularies: MLlib's distributed
      IndexedRowMatrix.computeSVD (one of the few places the RDD API
      is the genuine distributed kernel). Row/column index maps are
      dataset-sized DataFrames; only the vocab-sized column map is
      collected, hard-capped by max_columns.

    Returns (row_embeddings, column_embeddings, singular_values).
    """
    spark = cells.sparkSession
    # the cell table feeds THREE passes (column map, row map, matrix
    # build) — persist it so the upstream pipeline (tokenize/joins in
    # the callers) runs once; tracked so release_cached() frees it
    from mldb_spark.caching import persist_tracked

    cells = persist_tracked(cells)
    # the column map is the ONLY collect, and it is hard-capped: the
    # limit bounds driver memory BEFORE anything materializes, and an
    # over-cap vocabulary fails loudly instead of silently collecting
    # an unbounded map (the Gram matrix is n_cols² — an unpruned
    # column space is a caller bug, not something to soldier through)
    col_rows = (
        cells.select(column_col).distinct().orderBy(column_col)
        .limit(max_columns + 1).collect()
    )
    if len(col_rows) > max_columns:
        raise ValueError(
            f"svd_train: column space exceeds max_columns={max_columns}; "
            f"prune the vocabulary upstream (min_df / top-N cut) — the "
            f"Gram matrix cost is quadratic in the column count"
        )
    col_idx = {r[column_col]: i for i, r in enumerate(col_rows)}
    n_cols = len(col_idx)
    if k > min(n_cols, 2**31):
        raise ValueError(f"k={k} exceeds column count {n_cols}")

    if n_cols <= gram_local_cap:
        # Gram fast path: G = XᵀX, then eigh(G) = V·Λ·Vᵀ with Λ = Σ²,
        # so V and σ=sqrt(λ) are exactly the right singular
        # vectors/values of X. Two regimes for building G:
        import numpy as np

        G = None
        # Bounded LOCAL Gram (optimization r10, the kmeans/gmm local
        # pattern): at gate scale the distributed per-row self-join is
        # ~2s of shuffle-join scheduling for a vocab²-sized result
        # (qa31: 116k cells → a 31×31 Gram). When the PRUNED cell
        # table is small, one Arrow toPandas + a vectorized bincount
        # outer-product accumulate computes the same G in ~0.1s. Hard
        # caps on cells AND Σt² pairs keep the driver bounded; any
        # over-cap or failure falls through to the distributed join.
        # FP note: accumulation order differs from the distributed
        # sum (ULP-level); every gate consumes V through exported
        # fixtures the oracle replays, so both sides stay consistent
        # (verified empirically at sf0.001/0.01/0.1).
        n_cells = cells.count()  # cells is persisted; count from cache
        if n_cells <= _LOCAL_GRAM_CELLS_CAP:
            try:
                pdf = cells.select(row_col, column_col, value_col).toPandas()
                c_codes = (
                    pdf[column_col].map(col_idx).to_numpy(dtype=np.int64)
                )
                vals = pdf[value_col].to_numpy(dtype=np.float64)
                _, r_codes = np.unique(
                    pdf[row_col].to_numpy(), return_inverse=True
                )
                order_r = np.argsort(r_codes, kind="stable")
                c_codes, vals = c_codes[order_r], vals[order_r]
                t = np.bincount(r_codes)  # tokens per row
                if int((t.astype(np.int64) ** 2).sum()) <= _LOCAL_GRAM_PAIRS_CAP:
                    t2 = t.astype(np.int64) ** 2
                    starts = np.concatenate(([0], np.cumsum(t)[:-1]))
                    pair_off = np.concatenate(([0], np.cumsum(t2)[:-1]))
                    total = int(t2.sum())
                    local_p = np.arange(total) - np.repeat(pair_off, t2)
                    t_rep = np.repeat(t, t2)
                    s_rep = np.repeat(starts, t2)
                    gl = s_rep + local_p // t_rep
                    gr = s_rep + local_p % t_rep
                    G = np.bincount(
                        c_codes[gl] * n_cols + c_codes[gr],
                        weights=vals[gl] * vals[gr],
                        minlength=n_cols * n_cols,
                    ).reshape(n_cols, n_cols)
            except Exception:
                G = None
        if G is None:
            # distributed Gram: per-row self-join (pair count per row
            # is t², bounded by the pruned vocab) — all codegen'd JVM
            cidx_df = F.broadcast(
                spark.createDataFrame(
                    [(c, i) for c, i in col_idx.items()],
                    f"{column_col} string, __ci int",
                )
            )
            a = cells.join(cidx_df, column_col).select(
                F.col(row_col).alias("__r"),
                F.col("__ci").alias("ci"),
                F.col(value_col).alias("vi"),
            )
            b = a.select(
                F.col("__r"), F.col("ci").alias("cj"), F.col("vi").alias("vj")
            )
            g_rows = (
                a.join(b, "__r")
                .where(F.col("ci") <= F.col("cj"))
                .groupBy("ci", "cj")
                .agg(F.sum(F.col("vi") * F.col("vj")).alias("g"))
                .collect()
            )
            G = np.zeros((n_cols, n_cols))
            for r in g_rows:
                G[r["ci"], r["cj"]] = r["g"]
                G[r["cj"], r["ci"]] = r["g"]
        lam, vec = np.linalg.eigh(G)  # ascending eigenvalues
        order = np.argsort(lam)[::-1][:k]
        sigma = [float(np.sqrt(max(float(lam[i]), 0.0))) for i in order]
        v = vec[:, order]  # n_cols x k
    else:
        from pyspark.mllib.linalg import Vectors
        from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

        bidx = spark.sparkContext.broadcast(col_idx)
        # dense row index without a global window: sort once,
        # zipWithIndex (distributed, order-preserving over sorted
        # partitions)
        row_map = (
            cells.select(row_col).distinct().orderBy(row_col)
            .rdd.map(lambda r: r[0]).zipWithIndex()
            .toDF([row_col, "__ridx"])
        )
        indexed = cells.join(row_map, row_col).select("__ridx", column_col, value_col)
        # group CELLS → per-row pair lists in DataFrame land (codegen'd
        # hash aggregate); Python touches each row exactly once to build
        # the mllib SparseVector — an RDD groupByKey here would serialize
        # every cell through Python and shuffle pickled tuples
        grouped = indexed.groupBy("__ridx").agg(
            F.collect_list(F.struct(F.col(column_col).alias("c"), F.col(value_col).alias("v"))).alias("__pairs")
        )
        vec_rows = grouped.rdd.map(
            lambda r: IndexedRow(
                r["__ridx"],
                Vectors.sparse(n_cols, sorted((bidx.value[p["c"]], float(p["v"])) for p in r["__pairs"])),
            )
        )
        # computeSVD(computeU=False): U is never materialized — row
        # embeddings come from the same X·V broadcast join as
        # embedRow (U·Σ = X·V), saving the A·V·Σ⁻¹ passes; without
        # caching each pass re-runs the upstream pipeline through the
        # Python workers. Tracked so release_cached() frees it.
        from mldb_spark.caching import cache_tracked_rdd

        vec_rows = cache_tracked_rdd(vec_rows)
        svd = IndexedRowMatrix(vec_rows).computeSVD(k, computeU=False)
        sigma = [float(x) for x in svd.s]
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
    # rowOutput = U·Σ = X·V: the SAME broadcast-join kernel as
    # embedRow, guaranteeing rowOutput/embedRow consistency by
    # construction in both regimes
    row_emb = embed_rows(cells)
    return row_emb, col_emb, sigma


def tfidf_score_table(
    bags: DataFrame,
    dfs: DataFrame,
    corpus_size: int | None,
    tf_type: str = "raw",
    idf_type: str = "inverseSmooth",
    id_col: str = "doc_id",
    term_col: str = "term",
    freq_col: str = "frequency",
    df_col: str = "df",
) -> DataFrame:
    """The reference tfidf FUNCTION's full scoring matrix
    (plugins/nlp/tfidf.cc:357-420; MLDB-1101): score each (doc, term,
    frequency) row against a document-frequency table with

      tf:  raw = f | log = ln(1+f) | augmented = .5 + .5*f/maxF(doc)
      idf: unary = 1 | inverse = ln(N/(1+df))
           | inverseSmooth = ln(1 + N/(1+df))   (the default)
           | inverseMax = ln(1 + maxNt(doc)/(1+df))
           | probabilisticInverse = ln((N-df)/(1+df))

    where maxF(doc) is the doc's max term frequency and maxNt(doc)
    the max df among the doc's KNOWN terms. Unknown terms score with
    df = 0 (the reference's dfs.find miss). Plan: one broadcast df
    join + one per-doc window for the two maxima — no Python."""
    from pyspark.sql import Window

    if tf_type not in ("raw", "log", "augmented"):
        raise ValueError(f"unknown tfType {tf_type!r}")
    if idf_type not in (
        "unary", "inverse", "inverseSmooth", "inverseMax",
        "probabilisticInverse",
    ):
        raise ValueError(f"unknown idfType {idf_type!r}")
    # corpus_size=None means "caller skipped the corpus count" — legal
    # for the N-free flavors (unary/inverseMax); an N-dependent idf
    # without a real count must fail loudly here, not emit -inf/NaN
    # scores downstream (ADVICE r9)
    if corpus_size is None and idf_type in (
        "inverse", "inverseSmooth", "probabilisticInverse",
    ):
        raise ValueError(
            f"idfType {idf_type!r} needs the corpus size N — pass the "
            f"document count instead of corpus_size=None"
        )
    j = bags.join(F.broadcast(dfs), term_col, "left").withColumn(
        "__df", F.coalesce(F.col(df_col), F.lit(0)).cast("double")
    )
    w = Window.partitionBy(id_col)
    j = j.withColumn("__maxF", F.max(freq_col).over(w)).withColumn(
        "__maxNt", F.max("__df").over(w)
    )
    f = F.col(freq_col).cast("double")
    tf = {
        "raw": f,
        "log": F.log(F.lit(1.0) + f),
        "augmented": F.lit(0.5) + F.lit(0.5) * f / F.col("__maxF"),
    }[tf_type]
    n = F.lit(float(corpus_size if corpus_size is not None else 0.0))
    dfv = F.col("__df")
    idf = {
        "unary": F.lit(1.0),
        "inverse": F.log(n / (F.lit(1.0) + dfv)),
        "inverseSmooth": F.log(F.lit(1.0) + n / (F.lit(1.0) + dfv)),
        "inverseMax": F.log(
            F.lit(1.0) + F.col("__maxNt") / (F.lit(1.0) + dfv)
        ),
        "probabilisticInverse": F.log((n - dfv) / (F.lit(1.0) + dfv)),
    }[idf_type]
    return j.select(
        F.col(id_col), F.col(term_col), (tf * idf).alias("score")
    )
