"""Training-corpus shaping operators: decontamination, quality rules,
mixture sampling, and span-level dedup.

Beyond the reference's surface (nothing equivalent exists in
/root/reference — its NLP plugins stop at tokenize/tfidf/word2vec);
these are the standard LLM-data-pipeline passes that run right after
dedup (dedup.py) and PII scrubbing (functions/text.py redact_pii):

- decontaminate: drop training documents that share any n-token
  shingle with an evaluation/benchmark set (the GPT-3 appendix-C /
  Gopher-style n-gram overlap rule).
- repetition_signals: Gopher-style repetition/quality signals per
  document (dup-word/dup-line fractions, top-word mass) + the
  combined pass/fail rule.
- mixture_rates / mixture_sample: deterministic per-source
  downsampling so the kept corpus approaches a temperature-flattened
  source mixture at a token budget (the alpha-sampling rule used for
  multilingual/multi-source training mixes).
- explode_pseudo_lines / dedup_lines: C4-style cross-document span
  dedup — each distinct line survives once, at its first occurrence.

Design for 100 TB:
- decontaminate broadcasts the DISTINCT benchmark shingle set (eval
  suites are MB-sized even when the corpus is TB-sized), so the
  corpus side is one shingle scan + broadcast semi-join + id
  anti-join — the corpus text itself never shuffles;
- mixture_sample aggregates per-source token counts (rows = number of
  sources), derives keep-rates on the driver-free lazy plan, and
  broadcasts the rate table back; the keep decision is a pure-JVM
  deterministic hash test per row — no shuffle of the corpus at all;
- repetition_signals keeps everything in whole-stage codegen except
  the top-word pass (one explode + partial-aggregated shuffles);
- dedup_lines is one shuffle keyed on line content (see its docstring
  for the boilerplate-skew guard at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mldb_spark.dedup import shingle_rows

# Knuth multiplicative hash on the doc key -> uniform-ish [0, 1).
# Chosen over md5 so ANY engine (DuckDB, Spark, a C job) replays the
# keep decision with plain integer arithmetic — no hex parsing.
# The key is first reduced mod 2^31 (pmod, so negative keys work) so
# the Knuth multiply fits int64: (2^31-1) * 2654435761 ~= 5.7e18 <
# 2^63-1.  Without the reduction, realistic 64-bit doc ids (xxhash
# style, >= 2^33) overflow — Spark ANSI raises ARITHMETIC_OVERFLOW
# and DuckDB raises OutOfRangeException.
_HASH_MOD = 4_294_967_296  # 2^32
_HASH_MUL = 2_654_435_761  # Knuth's A * 2^32
_KEY_MOD = 2_147_483_648  # 2^31 — pre-reduction so the product fits int64


def _uniform_hash(key: F.Column) -> F.Column:
    reduced = F.pmod(key.cast("long"), F.lit(_KEY_MOD))
    return (
        (reduced * F.lit(_HASH_MUL)) % F.lit(_HASH_MOD)
    ).cast("double") / F.lit(float(_HASH_MOD))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    mark_only: bool = False,
) -> DataFrame:
    """Remove (or mark) corpus docs sharing any n-token shingle with
    the benchmark set.

    mark_only=True returns the full corpus with a `contaminated`
    boolean instead of filtering — the audit view.
    """
    bench_sh = (
        shingle_rows(benchmark, n=n, id_col=id_col, text_col=text_col)
        .select("sh")
        .distinct()
    )
    hits = (
        shingle_rows(
            corpus.select(id_col, text_col), n=n, id_col=id_col, text_col=text_col
        )
        .join(F.broadcast(bench_sh), "sh", "left_semi")
        .select(id_col)
        .distinct()
    )
    if mark_only:
        return corpus.join(
            hits.withColumn("contaminated", F.lit(True)), id_col, "left"
        ).fillna(False, subset=["contaminated"])
    return corpus.join(hits, id_col, "left_anti")


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition/quality signals per document
    (Rae et al. 2021 §A1.1 shapes, thresholds approximated):

    - n_words, mean_word_len — length gates;
    - frac_dup_words = 1 - distinct/total tokens — word-level
      repetition (pure JVM array expressions);
    - frac_dup_lines — duplicate-line fraction (0 for single-line
      docs);
    - frac_top_word — mass of the most frequent token, via ONE
      explode + two partial-aggregated shuffles on (id, token) then
      id; never a per-doc quadratic array lambda.

    Returns one row per doc keyed by id_col. `passes` applies the
    combined filter rule.
    """
    from mldb_spark.functions.text import tokenize

    toks = tokenize(F.col(text_col))
    lines = F.split(F.col(text_col), "\n")
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_words"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.length(F.concat_ws("", toks)) / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_word_len"),
        F.round(
            F.when(
                F.size(toks) > 0,
                1.0 - F.size(F.array_distinct(toks)) / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("frac_dup_words"),
        F.round(
            F.when(
                F.size(lines) > 0,
                1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("frac_dup_lines"),
    )
    top = (
        docs.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("__top"), F.sum("c").alias("__n"))
        .select(
            F.col(id_col),
            F.round(F.col("__top") / F.col("__n"), 4).alias("frac_top_word"),
        )
    )
    out = base.join(top, id_col, "left").fillna(0.0, subset=["frac_top_word"])
    passes = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 2)
        & (F.col("mean_word_len") <= 10)
        & (F.col("frac_dup_lines") <= 0.30)
        & (F.col("frac_top_word") <= 0.20)
    )
    return out.withColumn("passes", passes)


def mixture_rates(
    corpus: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_tokens",
    alpha: float = 0.5,
    target_weight: float | None = None,
) -> DataFrame:
    """Per-source keep-rates for a temperature-alpha mixture.

    With p_s = weight_s / total, the target mixture samples source s
    proportionally to p_s^alpha (alpha=1 keeps the natural mix,
    alpha=0 flattens to uniform). target_weight is the total kept
    budget (default: the largest budget where no source needs
    upsampling, i.e. every rate stays <= 1).

    Returns (source, weight, rate) — rows = number of sources.
    """
    # alpha=0.5 goes through sqrt (IEEE-exact, replayable bit-for-bit
    # by any engine); general alpha through pow (libm-dependent in the
    # last ulp — only observable exactly at a keep/drop boundary)
    if alpha == 0.5:
        powa = F.sqrt
    else:
        def powa(c):
            return F.pow(c, F.lit(alpha))

    per_src = corpus.groupBy(source_col).agg(
        F.sum(weight_col).cast("double").alias("weight")
    )
    tot = per_src.select(
        F.sum("weight").alias("__tot"),
        F.sum(powa(F.col("weight"))).alias("__ptot"),
    )
    # q_s = weight_s^alpha / sum(weight^alpha); expected kept weight
    # from s is q_s * target; rate_s = q_s * target / weight_s.
    rated = per_src.crossJoin(F.broadcast(tot)).select(
        source_col,
        "weight",
        (powa(F.col("weight")) / F.col("__ptot") / F.col("weight")).alias(
            "__q_per_w"
        ),
    )
    if target_weight is None:
        # max target with all rates <= 1: min over sources of 1/q_per_w
        cap = rated.select(
            F.min(F.lit(1.0) / F.col("__q_per_w")).alias("__target")
        )
        rated = rated.crossJoin(F.broadcast(cap))
    else:
        rated = rated.withColumn("__target", F.lit(float(target_weight)))
    return rated.select(
        source_col,
        "weight",
        F.least(F.lit(1.0), F.col("__q_per_w") * F.col("__target")).alias("rate"),
    )


def mixture_sample(
    corpus: DataFrame,
    source_col: str = "source",
    weight_col: str = "n_tokens",
    key_col: str = "doc_id",
    alpha: float = 0.5,
    target_weight: float | None = None,
) -> DataFrame:
    """Deterministically sample the corpus toward the alpha-tempered
    source mixture: keep a row iff uniform_hash(key) < rate(source).

    The decision is replayable by any engine from (key, source) alone;
    re-runs and incremental loads keep exactly the same documents.
    """
    rates = mixture_rates(
        corpus, source_col, weight_col, alpha=alpha, target_weight=target_weight
    ).select(source_col, "rate")
    return (
        corpus.join(F.broadcast(rates), source_col)
        .filter(_uniform_hash(F.col(key_col)) < F.col("rate"))
        .drop("rate")
    )


def dedup_lines(
    lines: DataFrame,
    line_col: str = "line",
    doc_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Cross-document line deduplication (the C4-style pass: each
    distinct line survives once, at its first occurrence in corpus
    order): keep a (doc, pos, line) row iff no earlier (doc, pos)
    carries the same line.

    One shuffle, keyed on the line itself — the window partitions by
    line content, so skew follows boilerplate frequency; at 100 TB
    scale, partition on md5(line) and pre-aggregate boilerplate
    (df-guarded, as winnow_overlap_pairs does) before this pass.
    """
    w = Window.partitionBy(line_col).orderBy(doc_col, pos_col)
    return (
        lines.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def explode_pseudo_lines(
    docs: DataFrame,
    tokens_per_line: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk each document's token stream into fixed-width
    pseudo-lines -> (doc_id, pos, line) rows. The unit generator for
    span-level dedup on corpora without natural line structure
    (C4 dedups three-sentence spans the same way). Pure JVM: slice a
    materialized token array per chunk index."""
    from mldb_spark.functions.text import tokenize

    n = tokens_per_line
    toked = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("__toks"))
    n_lines = F.ceil(F.size("__toks") / F.lit(n)).cast("int")
    # sequence(1, 0) would generate DESCENDING [1, 0]: empty docs must
    # produce an empty line array, not a reversed one
    chunks = F.when(
        n_lines >= 1,
        F.transform(
            F.sequence(F.lit(1), n_lines),
            lambda i: F.concat_ws(" ", F.slice("__toks", (i - 1) * n + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "line")
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Greedy first-fit-decreasing sequence packing: assign documents
    to fixed-budget context windows (sequences) so concatenated
    training examples waste as little of the window as possible — the
    assembly step between a shaped corpus and a trainer.

    Distributed shape: docs are salted into n_buckets by the
    deterministic Knuth hash and each bucket packs independently in
    one Arrow batch (applyInPandas) — embarrassingly parallel, with
    waste bounded by the per-bucket boundary effect (one partially
    filled bin per bucket). Docs longer than max_tokens get their own
    sequence with overflow=true (the caller chunks or drops them).

    Returns (bucket, seq, doc_id-named id, n_tokens, overflow);
    (bucket, seq) is the global sequence key. Deterministic: FFD
    order is (tokens desc, id asc) within a bucket.
    """
    import pandas as pd

    out_schema = (
        f"bucket int, seq int, {id_col} long, {tokens_col} long, overflow boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per seq
        seqs, overflows = [], []
        for tok in pdf[tokens_col]:
            if tok > max_tokens:
                bins.append(0)
                seqs.append(len(bins) - 1)
                overflows.append(True)
                continue
            for i, rem in enumerate(bins):
                if rem >= tok:
                    bins[i] = rem - tok
                    seqs.append(i)
                    break
            else:
                bins.append(max_tokens - tok)
                seqs.append(len(bins) - 1)
            overflows.append(False)
        pdf = pdf.assign(seq=seqs, overflow=overflows)
        return pdf[["bucket", "seq", id_col, tokens_col, "overflow"]]

    salted = docs.select(
        (
            (F.pmod(F.col(id_col).cast("long"), F.lit(_KEY_MOD)) * F.lit(_HASH_MUL))
            % F.lit(_HASH_MOD)
            % F.lit(n_buckets)
        )
        .cast("int")
        .alias("bucket"),
        F.col(id_col).cast("long"),
        F.col(tokens_col).cast("long"),
    )
    return salted.groupBy("bucket").applyInPandas(pack, out_schema)


def packing_stats(
    packed: DataFrame, max_tokens: int, tokens_col: str = "n_tokens"
) -> DataFrame:
    """Per-bucket packing audit: sequences used, tokens packed, fill
    efficiency (packed / (sequences * budget), overflow docs
    excluded)."""
    return (
        packed.groupBy("bucket")
        .agg(
            F.countDistinct("seq").alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(~F.col("overflow"), F.col(tokens_col)).otherwise(0)).alias(
                "packed_tokens"
            ),
            F.sum(F.when(F.col("overflow"), 1).otherwise(0)).alias("n_overflow"),
        )
        .withColumn(
            "efficiency",
            F.round(
                F.col("packed_tokens")
                / ((F.col("n_seqs") - F.col("n_overflow")) * F.lit(max_tokens)),
                4,
            ),
        )
    )


def unigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Unigram language-model score per document — the LM-perplexity
    quality proxy (CCNet-style) without an external model: the corpus
    itself is the LM. Two passes:

      1. vocab: token -> count over the whole corpus (hash agg);
      2. per-doc mean log p(token), with additive smoothing
         log((c + a) / (N + a*|V|)).

    Lower (more negative) mean logprob == more surprising text: the
    tail to drop or route for review. At 100 TB the vocab can reach
    10^8 rows, so the token join is a plain shuffle equi-join with
    partial aggregation on both sides (AQE broadcasts it when the
    vocab is actually small); corpus totals ride in as a one-row
    broadcast cross join, never a driver collect.
    """
    from mldb_spark.functions.text import tokenize

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    totals = vocab.agg(
        F.sum("c").cast("double").alias("__n"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    a = float(smoothing)
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.log((F.col("c") + F.lit(a)) / (F.col("__n") + F.lit(a) * F.col("__v"))).alias(
                "__lp"
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
        F.round(F.min("__lp"), 4).alias("min_logprob"),
    )
