from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_decontaminate_planted(spark):
    from mldb_spark.corpus import decontaminate

    bench = _docs(spark, [(100, "the secret eval answer is forty two ok", "eval")])
    corpus = _docs(
        spark,
        [
            # contains the benchmark 5-gram "secret eval answer is forty"
            (1, "padding words then the secret eval answer is forty two end", "a"),
            # clean
            (2, "completely unrelated text with no overlap at all here", "a"),
            # shares words but never 5 consecutive ones
            (3, "the secret is eval answer forty the two ok is", "b"),
        ],
    )
    kept = decontaminate(corpus, bench, n=5)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]

    marked = decontaminate(corpus, bench, n=5, mark_only=True)
    flags = {r["doc_id"]: r["contaminated"] for r in marked.collect()}
    assert flags == {1: True, 2: False, 3: False}

    # short docs (< n tokens) emit no shingles and are never dropped
    tiny = _docs(spark, [(9, "secret eval", "a")])
    assert decontaminate(tiny, bench, n=5).count() == 1


def test_repetition_signals_planted(spark):
    from mldb_spark.corpus import repetition_signals

    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam", "a"),  # all one word
            (2, "alpha beta gamma delta", "a"),  # all distinct
            (3, "line one\nline two\nline one\nline one", "a"),  # dup lines
            (4, "", "a"),  # empty
        ],
    )
    sig = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert sig[1]["frac_top_word"] == 1.0 and sig[1]["frac_dup_words"] == 0.75
    assert sig[2]["frac_top_word"] == 0.25 and sig[2]["frac_dup_words"] == 0.0
    assert sig[3]["frac_dup_lines"] == 0.5
    assert sig[4]["n_words"] == 0 and sig[4]["frac_top_word"] == 0.0
    # the repetition gates fire: doc 1 fails on top-word mass, and all
    # of these fail the 50-word length floor
    assert not any(r["passes"] for r in sig.values())


def test_mixture_sample_determinism_and_budget(spark, sf_dir):
    from mldb_spark.catalog import load
    from mldb_spark.corpus import mixture_rates, mixture_sample

    docs = load(spark, sf_dir, "documents")
    rates = {
        r["source"]: r["rate"]
        for r in mixture_rates(docs, weight_col="n_chars", alpha=0.5).collect()
    }
    assert all(0.0 < v <= 1.0 for v in rates.values())
    # default target: the largest source's rate saturates at exactly 1
    # only when it is also the flattest; at minimum SOME source hits 1
    assert max(rates.values()) >= 1.0 - 1e-9

    kept1 = mixture_sample(docs, weight_col="n_chars", alpha=0.5)
    kept2 = mixture_sample(docs, weight_col="n_chars", alpha=0.5)
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    assert ids1 == sorted(r["doc_id"] for r in kept2.collect())
    assert 0 < len(ids1) < docs.count()

    # alpha=1 keeps the natural mix: every rate is 1, nothing dropped
    rates_nat = mixture_rates(docs, weight_col="n_chars", alpha=1.0).collect()
    assert all(abs(r["rate"] - 1.0) < 1e-9 for r in rates_nat)

    # explicit budget: kept weight per source lands near rate * weight
    half = mixture_sample(
        docs,
        weight_col="n_chars",
        alpha=0.5,
        target_weight=docs.agg(F.sum("n_chars")).collect()[0][0] / 2.0,
    )
    assert 0 < half.count() < docs.count()


def test_redact_pii_planted(spark):
    from mldb_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.co.uk now"),
            (2, "server at 192.168.001.1 port"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "call +44 (0)20 7946-0958 today"),
            (5, "clean text with no pii at all"),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("red"),
            pii_counts(F.col("t")).alias("c"),
        ).collect()
    }
    assert out[1]["red"] == "mail <EMAIL> now" and out[1]["c"]["email"] == 1
    assert out[2]["red"] == "server at <IP> port" and out[2]["c"]["ip"] == 1
    assert out[3]["red"] == "ssn <ID> leaked" and out[3]["c"]["id"] == 1
    assert out[4]["red"] == "call <PHONE> today" and out[4]["c"]["phone"] == 1
    assert out[5]["red"] == out[5]["t"] if "t" in out[5] else True
    assert sum(out[5]["c"][k] for k in ("email", "ip", "id", "phone")) == 0
    # staged counting: the IP is counted once as IP, never again as a
    # phone-shaped digit run
    assert out[2]["c"]["phone"] == 0


def test_line_dedup_first_occurrence(spark):
    from mldb_spark.corpus import dedup_lines, explode_pseudo_lines

    docs = _docs(
        spark,
        [
            (1, "a b c d e f", "s"),  # lines: "a b c", "d e f"
            (2, "a b c x y z", "s"),  # "a b c" duplicates doc 1 pos 0
            (3, "", "s"),  # empty doc -> no lines
        ],
    )
    lines = explode_pseudo_lines(docs, tokens_per_line=3)
    got = {(r["doc_id"], r["pos"], r["line"]) for r in lines.collect()}
    assert got == {
        (1, 0, "a b c"),
        (1, 1, "d e f"),
        (2, 0, "a b c"),
        (2, 1, "x y z"),
    }
    kept = {(r["doc_id"], r["line"]) for r in dedup_lines(lines).collect()}
    assert kept == {(1, "a b c"), (1, "d e f"), (2, "x y z")}


def test_pack_sequences_invariants(spark, sf_dir):
    from mldb_spark.catalog import load
    from mldb_spark.corpus import pack_sequences, packing_stats
    from mldb_spark.functions.text import token_count

    MAX = 128
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, max_tokens=MAX, n_buckets=4)
    rows = packed.collect()

    # every doc assigned exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    # bin capacity: non-overflow sequences fit the budget; overflow
    # iff the doc alone exceeds it
    from collections import defaultdict

    fills = defaultdict(int)
    for r in rows:
        assert r["overflow"] == (r["n_tokens"] > MAX)
        if not r["overflow"]:
            fills[(r["bucket"], r["seq"])] += r["n_tokens"]
    assert fills and all(v <= MAX for v in fills.values())

    # FFD guarantee: every bin except at most one PER BUCKET is more
    # than half full
    under = defaultdict(int)
    for (b, _s), v in fills.items():
        if v <= MAX / 2:
            under[b] += 1
    assert all(v <= 1 for v in under.values())

    # deterministic across runs
    again = {(r["bucket"], r["seq"], r["doc_id"]) for r in packed.collect()}
    assert again == {(r["bucket"], r["seq"], r["doc_id"]) for r in rows}

    stats = packing_stats(packed, max_tokens=MAX).collect()
    assert all(0 < r["efficiency"] <= 1.0 for r in stats if r["efficiency"])


def test_redact_pii_idempotent(spark):
    from mldb_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "a@b.co 1.2.3.4 123-45-6789 +1 555 123 4567 mixed in text"),
            (2, "<EMAIL> already redacted stays <PHONE> put"),
        ],
        "id long, t string",
    )
    once = df.select("id", redact_pii(F.col("t")).alias("r1"))
    twice = once.select("id", redact_pii(F.col("r1")).alias("r2"))
    j = once.join(twice, "id").collect()
    assert all(r["r1"] == r["r2"] for r in j)


def test_pack_sequences_matches_reference_model(spark):
    """Spark FFD packing == a pure-python FFD over the same
    (tokens desc, id asc) order, bucket by bucket."""
    import random

    from mldb_spark.corpus import pack_sequences

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 180)) for i in range(200)]
    MAX, NB = 128, 3
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        (r["bucket"], r["seq"], r["doc_id"]): r["overflow"]
        for r in pack_sequences(docs, max_tokens=MAX, n_buckets=NB).collect()
    }

    MUL, MOD = 2_654_435_761, 4_294_967_296
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for i, tok in rows:
        by_bucket.setdefault((i * MUL) % MOD % NB, []).append((i, tok))
    want = {}
    for b, items in by_bucket.items():
        items.sort(key=lambda it: (-it[1], it[0]))
        bins: list[int] = []
        for i, tok in items:
            if tok > MAX:
                bins.append(0)
                want[(b, len(bins) - 1, i)] = True
                continue
            for j, rem in enumerate(bins):
                if rem >= tok:
                    bins[j] = rem - tok
                    want[(b, j, i)] = False
                    break
            else:
                bins.append(MAX - tok)
                want[(b, len(bins) - 1, i)] = False
    assert got == want


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule in isolation: case, fragment,
    tracking params, default ports, www., trailing slash, bare host."""
    from pyspark.sql import functions as F

    from mldb_spark.functions.web import canonicalize_url

    cases = {
        "HTTP://WWW.Example.COM:80/Path/?utm_source=x&q=1#f":
            "http://example.com/Path?q=1",
        "https://example.com:443/": "https://example.com/",
        "https://sub.example.com/a/b?fbclid=1": "https://sub.example.com/a/b",
        "http://example.com/p?a=1&utm_campaign=c&b=2":
            "http://example.com/p?a=1&b=2",
        "https://example.com/page/": "https://example.com/page",
        "http://example.com": "http://example.com/",
        "https://example.com/?ref=hn": "https://example.com/",
        # non-default port survives
        "https://example.com:8443/x": "https://example.com:8443/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    out = {
        r["url"]: r["c"]
        for r in df.select("url", canonicalize_url(F.col("url")).alias("c")).collect()
    }
    assert out == cases


def test_uniform_hash_64bit_keys(spark):
    """Regression (r4 verdict #1): the Knuth keep-hash must not
    overflow int64 for realistic 64-bit doc ids.  Keys >= 2^33 (xxhash
    style) and negative keys previously raised ARITHMETIC_OVERFLOW
    under Spark ANSI; the fixed hash pre-reduces the key mod 2^31 and
    stays replayable in DuckDB with plain integer arithmetic."""
    import duckdb

    from mldb_spark.corpus import _uniform_hash, mixture_sample, pack_sequences

    keys = [
        0,
        1,
        2**31 - 1,
        2**31,
        2**33,
        2**33 + 12345,
        2**62 + 7,
        9223372036854775807,  # int64 max
        -1,
        -(2**40),
    ]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", _uniform_hash(F.col("doc_id")).alias("h")).collect()
    }
    assert all(0.0 <= v < 1.0 for v in got.values())

    # DuckDB replays the exact same decision with plain arithmetic
    want = {
        k: duckdb.sql(
            f"SELECT CAST((((({k} % 2147483648) + 2147483648) % 2147483648)"
            " * 2654435761) % 4294967296 AS DOUBLE) / 4294967296"
        ).fetchone()[0]
        for k in keys
    }
    for k in keys:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])

    # end-to-end: mixture_sample and pack_sequences run on 64-bit ids
    docs = spark.createDataFrame(
        [(k, "src%d" % (abs(k) % 3), 100 + abs(k) % 50) for k in keys],
        "doc_id long, source string, n_tokens long",
    )
    kept = mixture_sample(
        docs, weight_col="n_tokens", key_col="doc_id", alpha=0.5
    )
    assert kept.count() >= 1  # no crash; deterministic subset
    packed = pack_sequences(docs, max_tokens=256, n_buckets=4)
    assert packed.count() == len(keys)
