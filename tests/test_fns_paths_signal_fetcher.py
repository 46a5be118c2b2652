from __future__ import annotations

import math
import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

from mldb_spark.functions.paths import (
    flatten_path,
    parse_path,
    path_element,
    path_length,
    stringify_path,
    unflatten_path,
)
from mldb_spark.functions.signal import amplitude, fft, phase
from mldb_spark.sources.fetcher import fetch_dataset


def test_path_roundtrip(spark):
    df = spark.createDataFrame(
        [("a.b.c",), ('x."dotted.name".z',)], "s string"
    ).select("s", parse_path(F.col("s")).alias("p"))
    rows = {r["s"]: r for r in df.select(
        "s", "p",
        stringify_path(F.col("p")).alias("rendered"),
        path_length(F.col("p")).alias("len"),
        path_element(F.col("p"), 1).alias("el1"),
    ).collect()}
    assert rows["a.b.c"]["p"] == ["a", "b", "c"]
    assert rows["a.b.c"]["rendered"] == "a.b.c"
    assert rows["a.b.c"]["len"] == 3 and rows["a.b.c"]["el1"] == "b"
    quoted = rows['x."dotted.name".z']
    assert quoted["p"] == ["x", "dotted.name", "z"]
    assert quoted["rendered"] == 'x."dotted.name".z'


def test_flatten_unflatten(spark):
    df = spark.createDataFrame([(["a", "b.c"],)], "p array<string>")
    out = df.select(
        flatten_path(F.col("p")).alias("flat"),
        unflatten_path(flatten_path(F.col("p"))).alias("back"),
    ).collect()[0]
    assert out["flat"] == ['a."b.c"']
    assert out["back"] == ["a", "b.c"]


def test_fft_amplitude_phase(spark):
    # pure cosine at bin 1: amplitude spectrum has two peaks of N/2
    n = 8
    sig = [math.cos(2 * math.pi * k / n) for k in range(n)]
    df = spark.createDataFrame([(sig,)], "v array<double>")
    out = df.select(
        amplitude(fft(F.col("v"))).alias("amp"),
        phase(fft(F.col("v"))).alias("ph"),
    ).collect()[0]
    amp = out["amp"]
    assert len(amp) == n
    assert abs(amp[1] - n / 2) < 1e-9 and abs(amp[n - 1] - n / 2) < 1e-9
    assert all(a < 1e-9 for i, a in enumerate(amp) if i not in (1, n - 1))
    expected = np.angle(np.fft.fft(np.array(sig)))
    assert all(abs(p - e) < 1e-9 for p, e in zip(out["ph"], expected))


def test_fetcher_file_urls_and_errors(spark):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "payload.bin")
        with open(path, "wb") as f:
            f.write(b"hello fetcher")
        urls = spark.createDataFrame(
            [(1, f"file://{path}"), (2, f"file://{d}/missing.bin"), (3, None)],
            "id long, url string",
        )
        out = {r["id"]: r for r in fetch_dataset(urls).collect()}
    assert bytes(out[1]["content"]) == b"hello fetcher" and out[1]["error"] is None
    assert out[2]["content"] is None and "Error" in out[2]["error"]
    assert out[3]["error"].startswith("ValueError")


def test_tokenize_opts(spark):
    from mldb_spark.functions.text import tokenize_opts

    df = spark.createDataFrame([("The quick, brown fox! ok",)], "t string")

    def run(**kw):
        return df.select(tokenize_opts(F.col("t"), **kw).alias("x")).collect()[0]["x"]

    assert run() == ["the", "quick", "brown", "fox", "ok"]
    assert run(min_token_length=3) == ["the", "quick", "brown", "fox"]
    assert run(ngram_range=(2, 2)) == [
        "the_quick", "quick_brown", "brown_fox", "fox_ok"
    ]
    both = run(ngram_range=(1, 2))
    assert "the" in both and "the_quick" in both and len(both) == 9
    assert run(limit=2, offset=1) == ["quick", "brown"]
    assert run(split_chars=",") == ["the quick", " brown fox! ok"]


def test_aggregates_of_rows_dialect(spark, sf_dir):
    from mldb_spark.catalog import load
    from mldb_spark.dialect import MldbContext

    ctx = MldbContext(spark)
    ctx.register("lineitem", load(spark, sf_dir, "lineitem"))
    row = ctx.query(
        "SELECT sum({q: l_quantity, d: l_discount}) AS sums, count({*}) AS counts "
        "FROM lineitem"
    ).collect()[0]
    li = load(spark, sf_dir, "lineitem")
    expect_q = li.agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(row["sums"]["q"] - expect_q) < 1e-6
    assert row["counts"]["l_orderkey"] == li.count()
    assert set(row["counts"].asDict()) == set(li.columns)


def test_token_counts_map_single_pass_parity(spark):
    """The single-pass aggregate bag (optimization r10) matches the
    old map_from_arrays(distinct, per-distinct filter) form exactly:
    same first-occurrence key order, same counts, null-safe."""
    from mldb_spark.functions.text import token_counts_map, tokenize_counts

    df = spark.createDataFrame(
        [("b a b c a b",), ("solo",), ("",), (None,)], "t string"
    )
    toks = F.split(F.col("t"), " ")
    toks = F.filter(toks, lambda x: x != F.lit(""))
    old = F.map_from_arrays(
        F.array_distinct(toks),
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda x: x == d)),
        ),
    )
    rows = df.select(
        token_counts_map(toks).alias("new"), old.alias("old")
    ).collect()
    for r in rows:
        if r["old"] is None:
            assert r["new"] is None
        else:
            assert list(r["new"].items()) == list(r["old"].items())
    # counts exact through the regex-tokenizer entry point too
    bag = df.limit(1).select(tokenize_counts(F.col("t")).alias("m")).collect()
    assert dict(bag[0]["m"]) == {"b": 3, "a": 2, "c": 1}
