"""DuckDB oracle SQL for every query in mldb_spark.queries.

Each SQL string mirrors its Spark twin expression-by-expression
(same aliases, same rounding, same fold order for float arithmetic)
so the driver's row-count + schema + value-hash comparison passes.

DuckDB-vs-Spark type notes honored here:
- DuckDB SUM(INTEGER) returns HUGEINT → always CAST(... AS BIGINT);
- DuckDB len()/ntile()/row_number() return BIGINT; the Spark side
  casts its INT counterparts to long instead;
- "column", "key", "value" are quoted (reserved-ish in DuckDB);
- md5() hex strings are byte-identical across engines.
"""

from __future__ import annotations

from mldb_spark.functions.text import _SUFFIXES, STOPWORDS

# shared SQL fragments -------------------------------------------------------

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


def _hits(words: tuple[str, ...], toks: str = "toks") -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({inlist})))"


_LANG_CASE = f"""
CASE
  WHEN de >= en AND de >= es AND de >= fr AND de > 0 THEN 'de'
  WHEN en >= es AND en >= fr AND en > 0 THEN 'en'
  WHEN es >= fr AND es > 0 THEN 'es'
  WHEN fr > 0 THEN 'fr'
  ELSE 'und'
END
"""

_COS = (
    "round(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))), 6)"
)

ORACLES: dict[str, str] = {}

ORACLES["q01_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
       round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
       round(avg(l_discount) + 1e-9, 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q02_top_revenue_parts"] = """
SELECT p_type,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY p_type
ORDER BY revenue DESC, p_type
LIMIT 10
"""

ORACLES["q03_segment_order_stats"] = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       count(DISTINCT c_custkey) AS n_customers,
       round(sum(o_totalprice), 2) AS total_revenue,
       round(avg(o_totalprice) + 1e-9, 4) AS avg_order_value
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLES["q04_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q05_region_revenue"] = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""

ORACLES["q06_latest_order_per_customer"] = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY o_custkey
"""

ORACLES["q07_events_pivot"] = """
SELECT user_id,
       coalesce(round(sum(CASE WHEN event_type = 'click' THEN "value" END), 2), 0.0) AS click,
       coalesce(round(sum(CASE WHEN event_type = 'error' THEN "value" END), 2), 0.0) AS error,
       coalesce(round(sum(CASE WHEN event_type = 'purchase' THEN "value" END), 2), 0.0) AS purchase,
       coalesce(round(sum(CASE WHEN event_type = 'signup' THEN "value" END), 2), 0.0) AS signup,
       coalesce(round(sum(CASE WHEN event_type = 'view' THEN "value" END), 2), 0.0) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""

ORACLES["q08_melt_part"] = """
SELECT p_partkey, 'p_size' AS "key", CAST(p_size AS DOUBLE) AS "value" FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS "key", p_retailprice AS "value" FROM part
ORDER BY p_partkey, "key"
"""

ORACLES["q09_horizontal_agg"] = """
SELECT l_orderkey, l_linenumber,
       greatest(l_quantity, l_extendedprice, l_discount) AS h_max,
       least(l_quantity, l_extendedprice, l_discount) AS h_min,
       round(((0.0 + l_quantity) + l_extendedprice) + l_discount, 2) AS h_sum,
       CAST(3 AS BIGINT) AS h_count
FROM lineitem
WHERE l_orderkey % 97 = 0
ORDER BY l_orderkey, l_linenumber
"""

ORACLES["q10_string_agg"] = """
SELECT n_name,
       string_agg(c_name, ',' ORDER BY c_name) AS customers,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

ORACLES["q11_distinct_counts"] = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["q12_null_logic"] = """
SELECT nullif(o_orderstatus, 'O') AS status_or_null,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_coalesced,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS size_class,
       count(*) AS n,
       CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       count(nullif(o_orderstatus, 'O')) AS n_nonnull
FROM orders
GROUP BY 1, 2, 3
ORDER BY size_class, status_coalesced
"""

ORACLES["q13_hash_mod_sample"] = """
SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sampled_revenue
FROM lineitem
WHERE l_orderkey % 7 = 0
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLES["q14_union_datasets"] = """
WITH u AS (
  SELECT c_custkey, c_mktsegment, c_acctbal, NULL AS c_name
  FROM customer WHERE c_mktsegment = 'BUILDING'
  UNION ALL
  SELECT c_custkey, c_mktsegment, NULL AS c_acctbal, c_name
  FROM customer WHERE c_mktsegment = 'MACHINERY'
)
SELECT c_mktsegment, count(*) AS n,
       count(c_acctbal) AS n_with_balance,
       count(c_name) AS n_with_name
FROM u GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

ORACLES["q15_in_subquery"] = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS total_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# q16 replays the fixed-cut range lookup (queries.Q16_CUTS) as the
# identical first-match CASE ladder — no ntile, no global sort
from mldb_spark.queries import Q16_CUTS as _Q16_CUTS

_Q16_CASE = (
    "CASE "
    + " ".join(
        f"WHEN c_acctbal <= {c} THEN {i + 1}" for i, c in enumerate(_Q16_CUTS)
    )
    + " ELSE 10 END"
)

ORACLES["q16_bucketize"] = f"""
WITH b AS (
  SELECT c_acctbal, CAST({_Q16_CASE} AS BIGINT) AS bucket
  FROM customer
)
SELECT bucket, count(*) AS n,
       round(min(c_acctbal), 2) AS lo,
       round(max(c_acctbal), 2) AS hi,
       round(avg(c_acctbal) + 1e-9, 4) AS mean_bal
FROM b GROUP BY bucket ORDER BY bucket
"""

ORACLES["q17_top_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_custkey, rank
"""

ORACLES["q18_stats_table"] = """
WITH st AS (
  SELECT o_orderkey, o_custkey,
         count(*) OVER w AS st_count,
         coalesce(CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) OVER w AS BIGINT), 0) AS st_outcomes
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT * FROM st WHERE o_custkey % 10 = 0 ORDER BY o_orderkey
"""

ORACLES["q19_sessionize"] = """
WITH g AS (
  SELECT user_id, "value",
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_sess,
         ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, "value",
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM g
),
per_sess AS (
  SELECT user_id, session_id, count(*) AS n_events, round(sum("value"), 2) AS session_value
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       max(n_events) AS max_session_events,
       round(sum(session_value), 2) AS total_value
FROM per_sess GROUP BY user_id ORDER BY user_id
"""

ORACLES["q20_latest_cells"] = """
SELECT CAST(user_id AS VARCHAR) AS "row", event_type AS "column",
       arg_max("value", ts) AS "value", max(ts) AS ts
FROM events
GROUP BY 1, 2
ORDER BY "row", "column"
"""

ORACLES["q21_temporal_aggs"] = """
SELECT CAST(user_id AS VARCHAR) AS "row", event_type AS "column",
       count("value") AS temporal_count,
       round(sum("value"), 2) AS temporal_sum,
       round(min("value"), 2) AS temporal_min,
       round(max("value"), 2) AS temporal_max,
       round(avg("value") + 1e-9, 4) AS temporal_avg
FROM events
GROUP BY 1, 2
ORDER BY "row", "column"
"""

ORACLES["q22_when_filter"] = """
SELECT event_type AS "column", count(*) AS n_cells, round(sum("value"), 2) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
GROUP BY 1
ORDER BY "column"
"""

ORACLES["q23_tumbling_window"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       count(*) AS n, round(sum("value"), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""

ORACLES["q24_token_counts"] = f"""
SELECT token, count(*) AS freq
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token
LIMIT 20
"""

ORACLES["q25_doc_token_stats"] = f"""
WITH t AS (SELECT lang, len({_TOKS}) AS n_tokens, n_chars FROM documents)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens) + 1e-9, 4) AS avg_tokens,
       round(avg(n_chars) + 1e-9, 4) AS avg_chars
FROM t GROUP BY lang ORDER BY lang
"""

ORACLES["q26_language_id"] = f"""
WITH t AS (SELECT lang, {_TOKS} AS toks FROM documents),
h AS (
  SELECT lang,
         {_hits(STOPWORDS["de"])} AS de,
         {_hits(STOPWORDS["en"])} AS en,
         {_hits(STOPWORDS["es"])} AS es,
         {_hits(STOPWORDS["fr"])} AS fr
  FROM t
)
SELECT lang, {_LANG_CASE} AS guessed, count(*) AS n
FROM h
GROUP BY 1, 2
ORDER BY lang, guessed
"""

ORACLES["q27_quality_scores"] = f"""
WITH t AS (
  SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n,
         CASE WHEN len(toks) > 0
              THEN length(array_to_string(toks, '')) / len(toks) ELSE 0.0 END AS mean_len,
         CASE WHEN len(toks) > 0
              THEN {_hits(STOPWORDS["en"], "toks")} / len(toks) ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0
              THEN len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) / length(text)
              ELSE 0.0 END AS sym_ratio
  FROM t
),
q AS (
  SELECT doc_id, lang,
         round((((least(n / 100.0, 1.0) * 0.4)
           + (CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 0.3 ELSE 0.0 END))
           + (least(stop_ratio * 4, 1.0) * 0.2))
           + ((1.0 - least(sym_ratio * 10, 1.0)) * 0.1), 4) AS quality
  FROM m
)
SELECT lang, count(*) AS n_docs,
       round(avg(quality) + 1e-9, 4) AS avg_quality,
       CAST(sum(CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM q GROUP BY lang ORDER BY lang
"""

ORACLES["q28_fingerprints"] = f"""
SELECT doc_id, md5({_NORM}) AS fingerprint
FROM documents
WHERE doc_id % 9 = 0
ORDER BY doc_id
"""

ORACLES["q29_exact_dedup"] = f"""
SELECT count(*) AS n_docs,
       count(DISTINCT md5({_NORM})) AS n_distinct,
       count(*) - count(DISTINCT md5({_NORM})) AS n_duplicates
FROM documents
"""

ORACLES["q30_knn_bruteforce"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id % 100 = 3
),
scored AS (
  SELECT q.query_id, e.vec_id,
         {_COS.format(a="q.qvec", b="e.embedding")} AS cos_sim
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""

# word-3-shingles from the token list (mirrors text.word_shingles):
# indices 1..len-2, each "t[i] t[i+1] t[i+2]"
_SHINGLES = (
    "list_transform(range(1, greatest(len({t}) - 1, 1)),"
    " i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2])"
)

_MH16 = ",\n       ".join(
    f"min(md5('{i}:' || tok)) AS mh{i}" for i in range(16)
)

ORACLES["q32_minhash_signatures"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id % 25 = 0
),
u AS (SELECT doc_id, unnest(list_distinct(toks)) AS tok FROM t)
SELECT doc_id,
       {_MH16}
FROM u GROUP BY doc_id ORDER BY doc_id
"""


def _band_expr(b: int, r: int = 4) -> str:
    parts = ", ".join(f"mh{b * r + j}" for j in range(r))
    return f"md5(concat_ws('|', '{b}', {parts}))"


_BAND_SELECTS = "\nUNION ALL\n".join(
    f"""  SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         {" + ".join(f"(CASE WHEN x.mh{i} = y.mh{i} THEN 1 ELSE 0 END)" for i in range(16))} AS matches
  FROM banded x JOIN banded y ON x.band{b} = y.band{b} AND x.doc_id < y.doc_id"""
    for b in range(4)
)

ORACLES["q33_minhash_pairs"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {_SHINGLES.format(t="toks")} AS sh FROM t),
u AS (SELECT doc_id, unnest(list_distinct(sh)) AS tok FROM s),
sig AS (
  SELECT doc_id,
       {_MH16}
  FROM u GROUP BY doc_id
),
banded AS (
  SELECT *, {", ".join(f"{_band_expr(b)} AS band{b}" for b in range(4))}
  FROM sig
),
pairs AS (
{_BAND_SELECTS}
)
SELECT id_a, id_b, max(matches / 16.0) AS est_jaccard
FROM pairs
GROUP BY id_a, id_b
HAVING max(matches / 16.0) >= 0.25
ORDER BY id_a, id_b
"""

ORACLES["q34_shingle_jaccard"] = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id, source,
         list_distinct({_SHINGLES.format(t="toks")}) AS sh
  FROM t
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
  FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT * FROM p WHERE jaccard >= 0.02 ORDER BY id_a, id_b
"""

ORACLES["q37_summary_stats"] = """
SELECT 'l_quantity' AS "column", count(l_quantity) AS n,
       count(DISTINCT l_quantity) AS n_distinct,
       round(min(l_quantity), 2) AS vmin, round(max(l_quantity), 2) AS vmax,
       round(avg(l_quantity) + 1e-9, 4) AS vavg, round(sum(l_quantity), 2) AS vsum
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(l_extendedprice), count(DISTINCT l_extendedprice),
       round(min(l_extendedprice), 2), round(max(l_extendedprice), 2),
       round(avg(l_extendedprice) + 1e-9, 4), round(sum(l_extendedprice), 2)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(l_discount), count(DISTINCT l_discount),
       round(min(l_discount), 2), round(max(l_discount), 2),
       round(avg(l_discount) + 1e-9, 4), round(sum(l_discount), 2)
FROM lineitem
ORDER BY "column"
"""

ORACLES["q38_merge_datasets"] = """
WITH c AS (
  SELECT CAST(c_custkey AS VARCHAR) AS rowName, round(c_acctbal, 2) AS bal,
         c_mktsegment AS segment
  FROM customer
),
o AS (
  SELECT CAST(o_custkey AS VARCHAR) AS rowName, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS bal
  FROM orders GROUP BY 1
)
SELECT coalesce(c.rowName, o.rowName) AS rowName,
       coalesce(o.bal, c.bal) AS bal,
       c.segment AS segment,
       o.n_orders AS n_orders
FROM c FULL OUTER JOIN o ON c.rowName = o.rowName
ORDER BY rowName
"""

ORACLES["q39_json_extract"] = """
WITH j AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM j GROUP BY event_type ORDER BY event_type
"""

ORACLES["q40_row_dataset"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id % 25 = 0
),
u AS (SELECT doc_id, unnest(toks) AS "column" FROM t)
SELECT doc_id, "column", count(*) AS "value"
FROM u GROUP BY doc_id, "column" ORDER BY doc_id, "column"
"""

_WILSON_COMMON = """
WITH a AS (
  SELECT event_type, count(*) AS trials,
         CAST(sum(CASE WHEN "value" > 100 THEN 1 ELSE 0 END) AS BIGINT) AS successes
  FROM events GROUP BY event_type
),
w AS (
  SELECT *, successes / trials AS p, CAST(1.281551565545 AS DOUBLE) AS z FROM a
)
"""

ORACLES["q41_wilson_bounds"] = (
    _WILSON_COMMON
    + """
SELECT event_type, trials, successes,
       round(((p + z*z/(2.0*trials)) - z*sqrt(p*(1-p)/trials + z*z/(4.0*trials*trials)))
             / (1.0 + z*z/trials), 6) AS lb_80,
       round(((p + z*z/(2.0*trials)) + z*sqrt(p*(1-p)/trials + z*z/(4.0*trials*trials)))
             / (1.0 + z*z/trials), 6) AS ub_80
FROM w ORDER BY event_type
"""
)

ORACLES["q42_geo_distance"] = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey % 179) - 89) + 0.5 AS lat1,
         ((c_custkey % 359) - 179) + 0.5 AS lon1,
         CAST(48.8566 AS DOUBLE) AS lat2, CAST(2.3522 AS DOUBLE) AS lon2
  FROM customer WHERE c_custkey % 31 = 0
)
SELECT c_custkey,
       round(6371000.0 * 2.0 * asin(sqrt(
         sin(radians(lat2 - lat1)/2) * sin(radians(lat2 - lat1)/2)
         + cos(radians(lat1)) * cos(radians(lat2))
           * sin(radians(lon2 - lon1)/2) * sin(radians(lon2 - lon1)/2)
       )), 2) AS dist_to_paris_m
FROM pts ORDER BY c_custkey
"""

ORACLES["q43_like_regex"] = """
SELECT CAST(sum(CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brass,
       CAST(sum(CASE WHEN regexp_matches(p_type, '^ECONOMY') THEN 1 ELSE 0 END) AS BIGINT) AS n_economy,
       CAST(sum(CASE WHEN p_name LIKE '%a%e%' THEN 1 ELSE 0 END) AS BIGINT) AS n_a_e,
       CAST(sum(CASE WHEN regexp_replace(p_type, '[AEIOU]', '', 'g') LIKE '%BRSS%' THEN 1 ELSE 0 END) AS BIGINT) AS n_brss_devoweled
FROM part
"""

ORACLES["q44_levenshtein"] = """
WITH s AS (
  SELECT p_partkey, p_name,
         string_split(p_name, ' ')[1] || '|' ||
         CAST(CAST(floor(length(p_name) / 4) AS BIGINT) AS VARCHAR) AS blk
  FROM part WHERE p_partkey % 50 = 1
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM s a JOIN s b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
ORDER BY id_a, id_b
"""

ORACLES["q46_tfidf"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
       round(tf.tf * ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1.0)
                        / (dfreq.df + 1.0)), 6) AS tfidf
FROM tf JOIN dfreq ON tf.token = dfreq.token
WHERE tf.doc_id % 25 = 0
ORDER BY tf.doc_id, tf.token
"""

ORACLES["q45_cast_rules"] = """
SELECT count(*) AS n,
       count(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS n_priority_digit,
       CAST(sum(TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS BIGINT) AS sum_priority_digit,
       count(TRY_CAST(o_orderstatus AS BIGINT)) AS n_status_as_int,
       CAST(sum(CASE WHEN TRY_CAST(o_orderstatus AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_failures
FROM orders
"""

ORACLES["q50_dialect_groupby"] = """
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderpriority HAVING count(*) > 0 ORDER BY o_orderpriority
"""

ORACLES["q51_dialect_when_distinct"] = """
SELECT user_id, event_type, "value", event_id FROM (
  SELECT user_id, event_type, "value", event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY user_id, "value" DESC, event_id) AS rn
  FROM events WHERE ts >= TIMESTAMP '2024-01-15'
) WHERE rn = 1
"""

ORACLES["q52_date_parts"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total,
       count(DISTINCT month(o_orderdate)) AS n_months
FROM orders GROUP BY 1, 2 ORDER BY yr, qtr
"""

ORACLES["q53_dist_table"] = """
WITH dt AS (
  SELECT o_orderkey, o_custkey,
         count(o_totalprice) OVER w AS dt_count,
         coalesce(round(avg(o_totalprice) OVER w + 1e-9, 4), -1.0) AS dt_avg,
         coalesce(round(min(o_totalprice) OVER w, 2), -1.0) AS dt_min,
         coalesce(round(max(o_totalprice) OVER w, 2), -1.0) AS dt_max
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT * FROM dt WHERE o_custkey % 20 = 0 ORDER BY o_orderkey
"""

ORACLES["q54_transpose"] = """
SELECT event_type AS "row", count(*) AS n_cells,
       count(DISTINCT CAST(user_id AS VARCHAR)) AS n_columns,
       round(sum("value"), 2) AS sum_value
FROM events GROUP BY 1 ORDER BY "row"
"""

ORACLES["q55_atom_dataset"] = """
WITH atoms AS (
  SELECT o_orderkey, 'price' AS "column", o_totalprice AS "value" FROM orders
  UNION ALL
  SELECT o_orderkey, 'priority', TRY_CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) FROM orders
  UNION ALL
  SELECT o_orderkey, 'month', CAST(month(o_orderdate) AS DOUBLE) FROM orders
)
SELECT "column", count("value") AS n,
       round(sum("value"), 2) AS total,
       round(min("value"), 2) AS vmin,
       round(max("value"), 2) AS vmax
FROM atoms GROUP BY 1 ORDER BY "column"
"""

ORACLES["q56_bigram_counts"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(toks), 1)),
                               i -> toks[i] || '_' || toks[i+1])) AS bigram
  FROM t
)
SELECT bigram, count(*) AS freq
FROM s GROUP BY bigram
ORDER BY freq DESC, bigram
LIMIT 20
"""

ORACLES["q57_cell_timestamps"] = """
SELECT CAST(user_id AS VARCHAR) AS "row", event_type AS "column",
       min(ts) AS earliest_timestamp,
       max(ts) AS latest_timestamp,
       count(DISTINCT ts) AS n_distinct_timestamps
FROM events GROUP BY 1, 2 ORDER BY "row", "column"
"""

ORACLES["q58_likelihood_ratio"] = """
WITH t AS (
  SELECT event_type,
         "value" > 100 AS o,
         dayofweek(ts) IN (0, 6) AS f  -- duckdb: Sunday=0, Saturday=6
  FROM events
),
c AS (
  SELECT event_type,
         CAST(sum(CASE WHEN o THEN 1 ELSE 0 END) AS BIGINT) AS n_true_outcome,
         CAST(sum(CASE WHEN o AND f THEN 1 ELSE 0 END) AS BIGINT) AS n_feat_true,
         CAST(sum(CASE WHEN NOT o THEN 1 ELSE 0 END) AS BIGINT) AS n_false_outcome,
         CAST(sum(CASE WHEN (NOT o) AND f THEN 1 ELSE 0 END) AS BIGINT) AS n_feat_false
  FROM t GROUP BY event_type
)
SELECT event_type, n_true_outcome, n_feat_true, n_false_outcome, n_feat_false,
       round(ln((n_feat_true / n_true_outcome) / (n_feat_false / n_false_outcome)), 6) AS llr
FROM c ORDER BY event_type
"""

# stem ladder mirroring functions.text.stem: first matching suffix
# wins, guarded so stems keep >= 3 chars
_STEM_CASE = "CASE " + " ".join(
    f"WHEN ends_with(tok, '{suf}') AND length(tok) - {len(suf)} >= 3 "
    f"THEN substr(tok, 1, length(tok) - {len(suf)})"
    for suf in _SUFFIXES
) + " ELSE tok END"

ORACLES["q59_stemmed_vocab"] = f"""
WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents)
SELECT {_STEM_CASE} AS stem, count(*) AS freq
FROM toks
GROUP BY 1
ORDER BY freq DESC, stem
LIMIT 20
"""

_ALL_STOP = ", ".join(
    f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws})
)

ORACLES["q60_stopword_filtered"] = f"""
WITH toks AS (SELECT lang, unnest({_TOKS}) AS tok FROM documents)
SELECT lang, count(*) AS n_tokens,
       CAST(sum(CASE WHEN tok NOT IN ({_ALL_STOP}) THEN 1 ELSE 0 END) AS BIGINT) AS n_content,
       count(DISTINCT CASE WHEN tok NOT IN ({_ALL_STOP}) THEN tok END) AS n_content_vocab
FROM toks GROUP BY lang ORDER BY lang
"""

# q31 replays the hyperplane-band LSH blocking bit-for-bit: the same
# seeded planes (similarity.seeded_planes) inlined as literal arrays,
# the same 4 bands of 4 bits, then exact cosine rescoring. Candidate
# sets match because both engines take sign of a sequential float64
# dot product over identical literals.
from mldb_spark.similarity import seeded_planes as _seeded_planes

# 64 planes in 8 bands of 8 bits (round 9, VERDICT r8 #5): the old
# 16 planes / 4 bands gave 4-BIT band keys — 16 buckets per band, so
# the banding fully collapsed (C(n,2) candidates at sf0.1) and the
# "blocked" rescore was an O(n²) pandas pass. 8-bit bands keep ~99%
# recall at cos 0.95 while cutting the candidate mass ~30×; the
# oracle replays the identical planes and band widths, so the pair
# set stays hash-exact on both sides.
_Q31_PLANES = _seeded_planes(64, num_planes=64)
_Q31_SIG = "concat(" + ", ".join(
    "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ["
    + ", ".join(repr(x) for x in p)
    + "]) >= 0 THEN '1' ELSE '0' END)"
    for p in _Q31_PLANES
) + ")"
_Q31_BANDS = " OR ".join(
    f"substr(a.s, {b * 8 + 1}, 8) = substr(b.s, {b * 8 + 1}, 8)" for b in range(8)
)

ORACLES["q31_embedding_neardup"] = f"""
WITH sig AS (
  SELECT vec_id, embedding, {_Q31_SIG} AS s FROM embeddings
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM sig a JOIN sig b
    ON a.vec_id < b.vec_id AND ({_Q31_BANDS})
)
SELECT id_a, id_b, {_COS.format(a="va", b="vb")} AS cos_sim
FROM cand
WHERE {_COS.format(a="va", b="vb")} >= 0.4
ORDER BY id_a, id_b
"""

# q62/q63 replay the md5-derived bucket assignment exactly:
# bucket(x, bits) = CAST('0x'||substr(md5(x),1,8) AS BIGINT) % 2^bits
_BUCKET = "CAST(('0x' || substr(md5({x}),1,8)) AS BIGINT) % {n}"

ORACLES["q62_feature_hash"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS feature FROM documents),
h AS (
  SELECT doc_id, {_BUCKET.format(x="feature", n=64)} AS bucket,
         CAST(count(*) AS DOUBLE) AS weight
  FROM toks GROUP BY doc_id, bucket
)
SELECT bucket, sum(weight) AS total_weight,
       CAST(count(*) AS BIGINT) AS n_docs
FROM h GROUP BY bucket ORDER BY bucket
"""

# pooling: dim j of word w = bucket('j:w', 10 bits) / 1024 — exact
# binary rationals, so the avg/max pooling arithmetic is replayable
_Q63_VEC = ", ".join(
    _BUCKET.format(x="('{}:' || word)".format(j), n=1024) + " / 1024.0"
    for j in range(4)
)

ORACLES["q63_pooling"] = f"""
WITH bags AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
vocab AS (SELECT DISTINCT token AS word FROM bags),
vectors AS (SELECT word, [{_Q63_VEC}] AS vector FROM vocab),
per_doc AS (
  SELECT b.doc_id,
         avg(v.vector[1]) AS a0, avg(v.vector[4]) AS a3,
         max(v.vector[1]) AS m0, max(v.vector[4]) AS m3
  FROM bags b JOIN vectors v ON b.token = v.word
  GROUP BY b.doc_id
)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(p.a0), 6) AS avg_dim0, round(avg(p.a3), 6) AS avg_dim3,
       round(avg(p.m0), 6) AS avg_maxdim0, round(avg(p.m3), 6) AS avg_maxdim3
FROM documents d JOIN per_doc p USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""

ORACLES["q64_bow_stats_table"] = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_distinct({_TOKS})) AS word FROM documents
),
stats AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM toks GROUP BY word
)
SELECT word, n_docs, n_pos,
       round((n_pos + 1.0) / (n_docs + 2.0), 6) AS p_pos
FROM stats WHERE n_docs >= 5
ORDER BY p_pos DESC, n_docs DESC, word
LIMIT 20
"""

ORACLES["q69_column_expr_dialect"] = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
FROM lineitem
WHERE l_orderkey % 97 = 0
ORDER BY l_orderkey, l_linenumber
"""

# q70: the same family/regex tables the Spark ladder uses, as CASE
# chains — imported from functions.web so the two stay in sync
from mldb_spark.functions.web import _BROWSERS as _UA_BROWSERS
from mldb_spark.functions.web import _OSES as _UA_OSES
from mldb_spark.functions.web import _SPIDER_RE as _UA_SPIDER
from mldb_spark.queries import Q70_UAS as _Q70_UAS

_Q70_VALUES = ", ".join(f"({i}, '{ua}')" for i, ua in enumerate(_Q70_UAS))
_Q70_BROWSER = (
    "CASE "
    + " ".join(
        f"WHEN regexp_matches(ua, '{rx}') THEN '{fam}'" for fam, rx in _UA_BROWSERS
    )
    + " ELSE 'Other' END"
)
_Q70_OS = (
    "CASE "
    + " ".join(f"WHEN regexp_matches(ua, '{rx}') THEN '{fam}'" for fam, rx in _UA_OSES)
    + " ELSE 'Other' END"
)

ORACLES["q70_parse_useragent"] = f"""
WITH uas(id, ua) AS (VALUES {_Q70_VALUES})
SELECT CAST(id AS BIGINT) AS id,
       {_Q70_BROWSER} AS browser_family,
       {_Q70_OS} AS os_family,
       regexp_matches(ua, '{_UA_SPIDER}') AS is_spider
FROM uas ORDER BY id
"""

# q71: identical regexp strip chain over the same synthetic markup
_Q71_HTML = (
    "'<html><head><script>var x=1;</script></head><body><p>' || text || "
    "'</p><!-- c --><a href=''http://x.example/a''>link &amp; more</a></body></html>'"
)
_Q71_TXT = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace({h},"
    " '(?is)<script[^>]*>.*?</script>', ' ', 'g'),"
    " '(?is)<style[^>]*>.*?</style>', ' ', 'g'),"
    " '(?s)<!--.*?-->', ' ', 'g'),"
    " '<[^>]+>', ' ', 'g'),"
    " '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),"
    " '&quot;', '\"'), '&#39;', ''''), '&apos;', ''''),"
    " '\\s+', ' ', 'g'))"
)

ORACLES["q71_html_text"] = f"""
WITH t AS (SELECT lang, {_Q71_TXT.format(h=_Q71_HTML)} AS txt FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(string_split(txt, ' '))) AS BIGINT) AS n_words
FROM t GROUP BY lang ORDER BY lang
"""

ORACLES["q72_tokensplit"] = """
WITH t AS (
  SELECT source,
         len(string_split_regex(text, '\\s+')) AS n0,
         len(string_split_regex(regexp_replace(text, '(data|the)', ' \\1', 'g'), '\\s+')) AS n1
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n0) AS BIGINT) AS tokens_before,
       CAST(sum(n1) AS BIGINT) AS tokens_after
FROM t GROUP BY source ORDER BY source
"""

ORACLES["q73_sentiwordnet"] = f"""
WITH swn0 AS (
  SELECT column0 AS pos, CAST(column2 AS DOUBLE) AS p, CAST(column3 AS DOUBLE) AS n,
         unnest(string_split(column4, ' ')) AS term
  FROM read_csv('/root/repo/mldb_spark/data/sentiwordnet_sample.tsv',
                delim='\t', header=false, all_varchar=true)
),
swn1 AS (
  SELECT regexp_replace(term, '#\\d+$', '') AS word, pos,
         round(avg(p), 6) AS sp, round(avg(n), 6) AS sn
  FROM swn0 GROUP BY 1, 2
),
by_word AS (
  SELECT word, round(avg(sp), 6) AS p, round(avg(sn), 6) AS n
  FROM swn1 GROUP BY word
),
toks AS (SELECT lang, unnest({_TOKS}) AS word FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_hits,
       round(avg(p), 6) AS avg_pos, round(avg(n), 6) AS avg_neg
FROM toks JOIN by_word USING (word)
GROUP BY lang ORDER BY lang
"""

# --- importers / exporters / streaming / dialect gates (q81-q90) -----------

ORACLES["q81_import_text"] = """
WITH src AS (
  SELECT * FROM read_csv('/root/repo/mldb_spark/data/products_sample.csv', header=true)
  WHERE stock >= 30
)
SELECT category, count(*) AS n, round(sum(price), 2) AS total_price,
       CAST(sum(stock) AS BIGINT) AS total_stock
FROM src GROUP BY category ORDER BY category
"""

ORACLES["q82_import_json"] = """
SELECT ("user").geo.cc AS cc, count(*) AS n, round(sum(v), 2) AS total_v,
       min(("user").name) AS first_user
FROM read_json_auto('/root/repo/mldb_spark/data/events_sample.jsonl')
GROUP BY 1 ORDER BY cc
"""

ORACLES["qa29_column_expr_nested"] = """
WITH src AS (
  SELECT * FROM read_json_auto('/root/repo/mldb_spark/data/events_sample.jsonl')
),
fa AS (
  SELECT 'flat' AS variant, upper(("user").geo.cc) AS cc,
         CAST(count(*) AS BIGINT) AS n,
         min(upper(("user").geo.city)) AS first_val
  FROM src GROUP BY 2
),
sa AS (
  SELECT 'structured' AS variant, ("user").geo.cc AS cc,
         CAST(count(*) AS BIGINT) AS n,
         min(("user").name) AS first_val
  FROM src GROUP BY 2
)
SELECT * FROM fa UNION ALL SELECT * FROM sa ORDER BY variant, cc
"""

ORACLES["q83_export_csv_roundtrip"] = """
SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

ORACLES["q84_streaming_rollup"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
       count(*) AS n, round(sum("value"), 2) AS total_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""

ORACLES["q35_variance_stddev"] = """
SELECT l_returnflag,
       round(var_samp(l_quantity) + 1e-9, 4) AS var_qty,
       round(stddev_samp(l_quantity) + 1e-9, 4) AS std_qty,
       round(var_pop(l_discount) + 1e-9, 6) AS varp_disc,
       round(stddev_pop(l_discount) + 1e-9, 6) AS stdp_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

ORACLES["q36_named_rowname"] = """
SELECT c_name AS name, c_acctbal AS bal,
       'cust-' || c_custkey AS "rowName"
FROM customer WHERE c_acctbal > 9000 ORDER BY bal DESC, name LIMIT 20
"""

ORACLES["q47_keys_of"] = """
SELECT p_brand AS brand, count(*) AS n FROM part
WHERE list_contains(
  list_filter(string_split_regex(lower(p_name), '[^a-z0-9]+'), t -> t <> ''),
  'widget')
GROUP BY p_brand ORDER BY brand
"""

ORACLES["q48_structured_mutable"] = """
WITH probe(row_name, r_key, r_name, weight) AS (
  VALUES ('r1', 1, 'AMERICA', 2.5), ('r2', 2, 'ASIA', 4.0),
         ('r3', 3, 'EUROPE', 1.25), ('r4', 4, 'AFRICA', 3.75),
         ('r5', 0, 'MIDDLE EAST', 0.5)
)
SELECT probe.row_name, region.r_name AS region,
       round(CAST(probe.weight AS DOUBLE) * 2, 2) AS w2
FROM probe JOIN region ON probe.r_name = region.r_name
ORDER BY probe.row_name
"""

ORACLES["q49_word2vec_import"] = """
WITH vecs(word, vector) AS (
  VALUES ('alpha', [1.0, 2.0, 2.0]), ('beta', [0.0, 3.0, 4.0]),
         ('gamma', [6.0, 8.0, 0.0]), ('delta', [1.0, 0.0, 0.0])
)
SELECT word,
       round(sqrt(list_dot_product(CAST(vector AS DOUBLE[]),
                                   CAST(vector AS DOUBLE[]))), 4) AS norm
FROM vecs ORDER BY word
"""

ORACLES["q90_fetcher_blob"] = """
SELECT 'products_sample.csv' AS name, CAST(size AS BIGINT) AS n_bytes,
       md5(decode(content)) AS content_md5
FROM read_blob('/root/repo/mldb_spark/data/products_sample.csv')
"""

ORACLES["q91_tensor_ops"] = """
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       '8x8' AS shp,
       round(CAST(embedding[4] AS DOUBLE) + CAST(embedding[12] AS DOUBLE) + CAST(embedding[20] AS DOUBLE) + CAST(embedding[28] AS DOUBLE) + CAST(embedding[36] AS DOUBLE) + CAST(embedding[44] AS DOUBLE) + CAST(embedding[52] AS DOUBLE) + CAST(embedding[60] AS DOUBLE), 5) AS col3_sum,
       round(CAST(embedding[3] AS DOUBLE) + CAST(embedding[11] AS DOUBLE) + CAST(embedding[19] AS DOUBLE) + CAST(embedding[27] AS DOUBLE) + CAST(embedding[35] AS DOUBLE) + CAST(embedding[43] AS DOUBLE) + CAST(embedding[51] AS DOUBLE) + CAST(embedding[59] AS DOUBLE) + 1.0 + 1.0, 5) AS pad_col2_sum,
       CAST(16 AS BIGINT) AS cat_len,
       round(CAST(embedding[6] AS DOUBLE), 5) AS elem5,
       CAST(0.0 AS DOUBLE) AS rt_err
FROM embeddings WHERE vec_id < 20 ORDER BY vec_id
"""

ORACLES["q92_extract_domain"] = """
SELECT CAST(c_custkey AS BIGINT) AS ck,
       lower(replace(c_mktsegment, ' ', '')) || '.shop.example.com' AS host,
       'example.com' AS domain,
       '192.168.0.1' AS ip_host
FROM customer WHERE c_custkey <= 100 ORDER BY ck
"""

ORACLES["q93_get_all_cells"] = """
WITH cells AS (
  SELECT CAST(user_id AS VARCHAR) AS "row", event_type AS "column",
         "value", ts
  FROM events
), surv AS (
  SELECT DISTINCT "row" FROM (
    SELECT "row", "column", arg_max("value", ts) AS latest_value
    FROM cells GROUP BY 1, 2
  ) WHERE "column" = 'purchase' AND latest_value > 900
)
SELECT c."row", c."column", round(c."value", 2) AS "value", c.ts
FROM cells c JOIN surv USING ("row")
ORDER BY c."row", c."column", c.ts
"""

ORACLES["q94_pyeval"] = """
SELECT CAST(c_custkey AS BIGINT) AS k,
       round(c_custkey * 2 + c_acctbal, 2) AS v,
       lower(trim(c_mktsegment)) AS seg,
       CAST(length(c_name) AS BIGINT) AS name_len
FROM customer WHERE c_custkey <= 200 ORDER BY k
"""

ORACLES["q95_xlsx_roundtrip"] = """
WITH src(name, score, n, ok) AS (
  VALUES ('alice', 12.5, 3, true), ('bob', -4.0, 0, false),
         ('carol mae', 0.25, 7, true), ('dee & co <x>', 100.0, 2, false)
)
SELECT name, round(CAST(score AS DOUBLE), 2) AS score,
       CAST(n AS BIGINT) AS n, ok
FROM src ORDER BY name
"""

ORACLES["q96_jdbc_roundtrip"] = """
SELECT r_name, count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""

ORACLES["q97_st_contains"] = """
WITH pts AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CAST(c_custkey % 97 AS DOUBLE) / 10.0 AS lat,
         CAST((c_custkey * 7) % 89 AS DOUBLE) / 10.0 AS lon
  FROM customer WHERE c_custkey <= 500
), tests AS (
  SELECT ck, lat, lon,
         ((((8.85 - 0.05) * (lat - 0.05) - (0.15 - 0.05) * (lon - 0.05)) > 0 AND ((4.45 - 8.85) * (lat - 0.15) - (9.15 - 0.15) * (lon - 8.85)) > 0 AND ((0.05 - 4.45) * (lat - 9.15) - (0.05 - 9.15) * (lon - 4.45)) > 0) OR (((8.85 - 0.05) * (lat - 0.05) - (0.15 - 0.05) * (lon - 0.05)) < 0 AND ((4.45 - 8.85) * (lat - 0.15) - (9.15 - 0.15) * (lon - 8.85)) < 0 AND ((0.05 - 4.45) * (lat - 9.15) - (0.05 - 9.15) * (lon - 4.45)) < 0)) AS in_outer,
         ((((5.55 - 3.05) * (lat - 2.05) - (2.15 - 2.05) * (lon - 3.05)) > 0 AND ((4.35 - 5.55) * (lat - 2.15) - (4.85 - 2.15) * (lon - 5.55)) > 0 AND ((3.05 - 4.35) * (lat - 4.85) - (2.05 - 4.85) * (lon - 4.35)) > 0) OR (((5.55 - 3.05) * (lat - 2.05) - (2.15 - 2.05) * (lon - 3.05)) < 0 AND ((4.35 - 5.55) * (lat - 2.15) - (4.85 - 2.15) * (lon - 5.55)) < 0 AND ((3.05 - 4.35) * (lat - 4.85) - (2.05 - 4.85) * (lon - 4.35)) < 0)) AS in_hole
  FROM pts
)
SELECT ck, round(lat, 1) AS lat, round(lon, 1) AS lon,
       (in_outer AND NOT in_hole) AS inside
FROM tests ORDER BY ck
"""

ORACLES["q98_winnow_fingerprints"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id < 200
), g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
                        i -> array_to_string(toks[i:i+3], ' ')) AS grams
  FROM t
), h AS (
  SELECT doc_id,
         list_transform(grams,
                        gr -> CAST(('0x' || substr(md5(gr), 1, 8)) AS BIGINT)) AS hs
  FROM g
), m AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                       j -> list_aggregate(hs[j:j+3], 'min'))) AS fps
  FROM h
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
       list_aggregate(fps, 'min') AS min_fp,
       list_aggregate(fps, 'max') AS max_fp
FROM m ORDER BY doc_id
"""

ORACLES["q99_bpe_token_budget"] = f"""
WITH d AS (
  SELECT source,
         CAST(len(regexp_extract_all(text,
           '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+'))
           AS BIGINT) AS n_pre,
         CAST(len({_TOKS}) AS BIGINT) AS n_words
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_pre) AS BIGINT) AS total_pretokens,
       max(n_pre) AS max_pretokens,
       round(avg(n_pre) + 1e-9, 4) AS avg_pretokens,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM d GROUP BY source ORDER BY source
"""

ORACLES["qa01_sqlite_roundtrip"] = """
SELECT event_type AS "column", count(*) AS n_cells,
       count(DISTINCT user_id) AS n_rows,
       round(min(value), 2) AS vmin, round(max(value), 2) AS vmax,
       max(ts) AS latest_ts
FROM events WHERE user_id < 20
GROUP BY event_type ORDER BY "column"
"""

ORACLES["qa02_decontaminate"] = f"""
WITH t AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, source,
         list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
                        i -> array_to_string(toks[i:i+3], ' ')) AS shs
  FROM t
), bench AS (
  SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id % 50 = 0
), hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 50 <> 0)
  WHERE s IN (SELECT s FROM bench)
), base AS (
  SELECT source, count(*) AS n_corpus FROM t WHERE doc_id % 50 <> 0 GROUP BY source
), keptc AS (
  SELECT source, count(*) AS n_kept FROM t
  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hits)
  GROUP BY source
)
SELECT b.source, b.n_corpus, coalesce(k.n_kept, 0) AS n_kept,
       b.n_corpus - coalesce(k.n_kept, 0) AS n_contaminated
FROM base b LEFT JOIN keptc k USING (source)
ORDER BY source
"""

ORACLES["qa03_quality_rules"] = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents WHERE doc_id < 150
), base AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_words,
    round(CASE WHEN len(toks) > 0 THEN
      CAST(list_aggregate(list_transform(toks, tk -> len(tk)), 'sum') AS DOUBLE)
        / len(toks) ELSE 0.0 END, 4) AS mean_word_len,
    round(CASE WHEN len(toks) > 0 THEN
      1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      ELSE 0.0 END, 4) AS frac_dup_words,
    round(CASE WHEN len(string_split(text, chr(10))) > 0 THEN
      1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
        / len(string_split(text, chr(10))) ELSE 0.0 END, 4) AS frac_dup_lines
  FROM t
), top AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS frac_top_word
  FROM (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
    GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_words, b.mean_word_len, b.frac_dup_words,
       coalesce(p.frac_top_word, 0.0) AS frac_top_word,
       (b.n_words >= 50 AND b.n_words <= 100000
        AND b.mean_word_len >= 2 AND b.mean_word_len <= 10
        AND b.frac_dup_lines <= 0.30
        AND coalesce(p.frac_top_word, 0.0) <= 0.20) AS passes
FROM base b LEFT JOIN top p USING (doc_id)
ORDER BY b.doc_id
"""

ORACLES["qa04_mixture_sample"] = """
WITH per AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS weight
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(sqrt(weight)) AS ptot FROM per
), rated AS (
  SELECT source, weight,
         sqrt(weight) / (SELECT ptot FROM tot) / weight AS q_per_w
  FROM per
), cap AS (
  SELECT min(1.0 / q_per_w) AS target FROM rated
), rates AS (
  SELECT source, least(1.0, q_per_w * (SELECT target FROM cap)) AS rate
  FROM rated
)
SELECT d.source, count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
FROM documents d JOIN rates r USING (source)
WHERE CAST(((((d.doc_id % 2147483648) + 2147483648) % 2147483648)
            * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 < r.rate
GROUP BY d.source ORDER BY d.source
"""

# qa05 builds its SQL from the SAME pattern constants the Spark side
# uses (functions/text.py PII_PATTERNS) — pattern parity by
# construction; DuckDB regexp_replace needs the explicit 'g' flag to
# match Spark's replace-all semantics
from mldb_spark.functions.text import PII_PATTERNS as _PII

_PP = {n: p for n, (p, _t) in zip(("email", "ip", "ssn", "phone"), _PII)}
_PT = {n: t for n, (_p, t) in zip(("email", "ip", "ssn", "phone"), _PII)}

ORACLES["qa05_pii_redaction"] = f"""
WITH t AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
      || '@example.com or call +1 (555) 01'
      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      || '-3456 at 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
      || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END AS t0
  FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id, t0,
    regexp_replace(t0, '{_PP["email"]}', '{_PT["email"]}', 'g') AS t1
  FROM t
), s2 AS (
  SELECT *, regexp_replace(t1, '{_PP["ip"]}', '{_PT["ip"]}', 'g') AS t2 FROM s
), s3 AS (
  SELECT *, regexp_replace(t2, '{_PP["ssn"]}', '{_PT["ssn"]}', 'g') AS t3 FROM s2
), s4 AS (
  SELECT *, regexp_replace(t3, '{_PP["phone"]}', '{_PT["phone"]}', 'g') AS t4 FROM s3
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t0, '{_PP["email"]}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t1, '{_PP["ip"]}')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(t2, '{_PP["ssn"]}')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(t3, '{_PP["phone"]}')) AS BIGINT) AS n_phone,
  md5(t4) AS redacted_md5,
  CAST(len(t4) AS BIGINT) AS redacted_len
FROM s4 ORDER BY doc_id
"""

ORACLES["qa06_line_dedup"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), l AS (
  SELECT doc_id, pos,
         array_to_string(toks[(pos - 1) * 8 + 1:pos * 8], ' ') AS line
  FROM (
    SELECT doc_id, toks,
           unnest(range(1, greatest(CAST(ceil(len(toks) / 8.0) AS INT), 0) + 1)) AS pos
    FROM t
  )
), d AS (
  SELECT doc_id, pos, line,
         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
  FROM l
)
SELECT doc_id, count(*) AS n_lines,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM d GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["qa08_unigram_logprob"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), totals AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM vocab
), scored AS (
  SELECT t.doc_id,
         ln((vocab.c + 0.5) / ((SELECT n FROM totals) + 0.5 * (SELECT v FROM totals))) AS lp
  FROM toks t JOIN vocab USING (tok)
)
SELECT doc_id, count(*) AS n_toks,
       round(avg(lp), 4) AS avg_logprob,
       round(min(lp), 4) AS min_logprob
FROM scored WHERE doc_id < 150
GROUP BY doc_id ORDER BY doc_id
"""

ORACLES["qa09_time_arithmetic"] = """
SELECT event_id,
       ts + INTERVAL 1 DAY AS next_day,
       ts - INTERVAL 6 HOUR AS back6h,
       ts + INTERVAL 150 MINUTE AS in150m,
       ts + INTERVAL 7 DAY AS in1w
FROM events WHERE event_id < 300
ORDER BY event_id
"""

ORACLES["qa10_date_part_units"] = """
SELECT event_id,
       CAST(dayofyear(ts) - 1 AS BIGINT) AS doy0,
       CAST((dayofyear(ts) - 1) // 7 AS BIGINT) AS week0,
       CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(isodow(ts) AS BIGINT) AS isodow,
       CAST(weekofyear(ts) AS BIGINT) AS isoweek,
       CAST(isoyear(ts) AS BIGINT) AS isoyear,
       CAST(month(ts) // 4 + 1 AS BIGINT) AS qtr,
       CAST(CAST(date_trunc('day', ts) AS DATE) - CAST(dayofweek(ts) AS INT) AS VARCHAR) || ' 00:00:00' AS wk_sunday,
       CAST(make_timestamp(year(ts)::BIGINT, GREATEST((month(ts) // 4) * 3, 1)::BIGINT, 1, 0, 0, 0.0) AS VARCHAR) AS qtr_start
FROM events WHERE event_id < 500 ORDER BY event_id
"""

ORACLES["qa11_p_norms"] = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) != 0.0)) AS DOUBLE) AS n0,
       round(list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE))), (a, b) -> a + b), 6) AS n1,
       round(sqrt(list_reduce(list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)), 6) AS n2,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS ninf
FROM embeddings WHERE vec_id < 500 ORDER BY vec_id
"""

ORACLES["qa12_row_number"] = """
SELECT event_id,
       row_number() OVER (ORDER BY event_id) AS rn_num,
       count(*) OVER () AS total
FROM events WHERE event_id < 1000 ORDER BY event_id
"""

ORACLES["qa13_dedup_clusters"] = f"""
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 500),
fp AS (
  SELECT doc_id, md5({_NORM}) AS fp FROM documents WHERE doc_id < 500
),
exact_pairs AS (
  SELECT g.a AS a, f2.doc_id AS b
  FROM (SELECT fp, MIN(doc_id) AS a FROM fp GROUP BY fp) g
  JOIN fp f2 USING (fp)
  WHERE f2.doc_id > g.a
),
chain_pairs AS (
  SELECT d.doc_id AS a, d.doc_id + 1 AS b
  FROM docs d JOIN docs d2 ON d2.doc_id = d.doc_id + 1
  WHERE d.doc_id % 10 < 9
),
edges AS (
  SELECT a, b FROM exact_pairs UNION SELECT a, b FROM chain_pairs
  UNION SELECT b AS a, a AS b FROM exact_pairs
  UNION SELECT b AS a, a AS b FROM chain_pairs
),
RECURSIVE_CLOSURE AS (
  WITH RECURSIVE r(s, t) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.s, e.b FROM r JOIN edges e ON r.t = e.a
  )
  SELECT s, t FROM r
)
SELECT s AS node, LEAST(s, MIN(t)) AS component
FROM RECURSIVE_CLOSURE GROUP BY s ORDER BY node
"""

ORACLES["qa14_url_canonicalize"] = """
SELECT doc_id,
       'HTTPS://WWW.' || upper(source) || '.example.com:443/' || lang ||
         '/d' || doc_id || '/?utm_source=feed&id=' || doc_id ||
         '&fbclid=x#section' AS raw_url,
       'https://' || lower(source) || '.example.com/' || lang ||
         '/d' || doc_id || '?id=' || doc_id AS canon
FROM documents WHERE doc_id < 3000 ORDER BY doc_id
"""

ORACLES["qa15_percentiles"] = """
SELECT source, count(*) AS n,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99,
       round(quantile_cont(n_chars, 0.5), 6) AS med
FROM documents GROUP BY source ORDER BY source
"""

ORACLES["qa16_get_all_where"] = """
WITH cells AS (
  SELECT CAST(user_id AS VARCHAR) AS "row", event_type AS "column",
         "value", ts
  FROM events
), latest AS (
  SELECT "row", "column", arg_max("value", ts) AS v
  FROM cells GROUP BY 1, 2
), piv AS (
  SELECT "row",
         max(CASE WHEN "column" = 'purchase' THEN v END) AS purchase,
         max(CASE WHEN "column" = 'click' THEN v END) AS click
  FROM latest GROUP BY "row"
), surv AS (
  SELECT "row" FROM piv WHERE purchase > 200 AND click < 100
)
SELECT c."row", c."column", round(c."value", 2) AS "value", c.ts
FROM cells c JOIN surv USING ("row")
ORDER BY c."row", c."column", c.ts
"""

ORACLES["qa17_corpus_sql_surface"] = f"""
WITH t AS (
  SELECT doc_id, source, text, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 3, 1) + 1),
                        i -> array_to_string(toks[i:i+3], ' ')) AS shs
  FROM t
), bench AS (
  SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id % 50 = 0
), hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 50 <> 0)
  WHERE s IN (SELECT s FROM bench)
), kept AS (
  SELECT doc_id, source, text FROM t
  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hits)
)
SELECT source, count(*) AS n_kept,
       CAST(sum(length(
         regexp_replace(text || ' x@y.com', '{_PP["email"]}',
                        '{_PT["email"]}', 'g')
       )) AS BIGINT) AS red_len
FROM kept GROUP BY source ORDER BY source
"""

ORACLES["qa18_feature_tables"] = """
WITH base AS (
  SELECT * FROM orders WHERE o_custkey < 500
)
SELECT o_orderkey,
  CAST(count(o_totalprice) OVER wc AS BIGINT) AS cust_n,
  coalesce(round(avg(o_totalprice) OVER wc + 1e-9, 4), -1) AS cust_avg,
  coalesce(round(min(o_totalprice) OVER wc + 1e-9, 2), -1) AS cust_min,
  coalesce(round(max(o_totalprice) OVER wc + 1e-9, 2), -1) AS cust_max,
  CAST(count(*) OVER wp AS BIGINT) AS prio_trials,
  CAST(coalesce(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
                OVER wp, 0) AS BIGINT) AS prio_big
FROM base
WINDOW
  wc AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
  wp AS (PARTITION BY o_orderpriority ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
ORDER BY o_orderkey
"""

ORACLES["qa19_summary_statistics"] = """
WITH n AS (SELECT count(*) AS total FROM part)
SELECT * FROM (
  SELECT 'p_size' AS "column", 'number' AS data_type,
    CAST((SELECT total FROM n) - count(p_size) AS BIGINT) AS num_null,
    CAST(count(DISTINCT p_size) AS BIGINT) AS num_unique,
    round(min(p_size) + 1e-9, 4) AS min_v,
    round(max(p_size) + 1e-9, 4) AS max_v,
    round(avg(p_size) + 1e-9, 4) AS avg_v,
    round(stddev_samp(p_size) + 1e-9, 4) AS std_v,
    round(quantile_disc(p_size, 0.25) + 1e-9, 4) AS q1_v,
    round(quantile_disc(p_size, 0.5) + 1e-9, 4) AS med_v,
    round(quantile_disc(p_size, 0.75) + 1e-9, 4) AS q3_v
  FROM part
  UNION ALL
  SELECT 'p_retailprice', 'number',
    CAST((SELECT total FROM n) - count(p_retailprice) AS BIGINT),
    CAST(count(DISTINCT p_retailprice) AS BIGINT),
    round(min(p_retailprice) + 1e-9, 4),
    round(max(p_retailprice) + 1e-9, 4),
    round(avg(p_retailprice) + 1e-9, 4),
    round(stddev_samp(p_retailprice) + 1e-9, 4),
    round(quantile_disc(p_retailprice, 0.25) + 1e-9, 4),
    round(quantile_disc(p_retailprice, 0.5) + 1e-9, 4),
    round(quantile_disc(p_retailprice, 0.75) + 1e-9, 4)
  FROM part
  UNION ALL
  SELECT 'p_type', 'categorical',
    CAST((SELECT total FROM n) - count(p_type) AS BIGINT),
    CAST(count(DISTINCT p_type) AS BIGINT),
    -1, -1, -1, -1, -1, -1, -1
  FROM part
) ORDER BY "column"
"""

ORACLES["qa20_cells_temporal_sql"] = """
WITH cells AS (
  SELECT CAST(user_id AS VARCHAR) AS r, event_type AS c, "value" AS v, ts
  FROM events
), per AS (
  SELECT r,
    count(v) FILTER (c = 'purchase') AS n_p,
    round(sum(v) FILTER (c = 'purchase') + 0.000000001, 2) AS sum_p,
    round(max(v) FILTER (c = 'click') + 0.000000001, 2) AS max_c,
    round(arg_max(v, ts) FILTER (c = 'purchase') + 0.000000001, 2)
      AS latest_p
  FROM cells GROUP BY r
)
SELECT r, CAST(n_p AS BIGINT) AS n_p, sum_p,
       coalesce(max_c, -1) AS max_c, latest_p
FROM per WHERE n_p >= 2 ORDER BY r
"""

# qa21: the q33 minhash-pair chain feeding a recursive-CTE transitive
# closure — the DuckDB replay of dedup_groups(minhash_pairs(...)).
ORACLES["qa21_dedup_chain_sql"] = f"""
WITH pairs AS (
  SELECT id_a, id_b FROM ({ORACLES["q33_minhash_pairs"]}) q
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
closure AS (
  WITH RECURSIVE r(s, t) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.s, e.b FROM r JOIN edges e ON r.t = e.a
  )
  SELECT s, t FROM r
)
SELECT CAST(s AS BIGINT) AS node,
       CAST(LEAST(s, MIN(t)) AS BIGINT) AS component
FROM closure GROUP BY s ORDER BY node
"""

# q77/q78 (graduated from ROWS_ONLY, VERDICT r5 #6): the Spark query
# exports its fitted logistic coefficients to .oracle_fixtures/ and
# these oracles replay the closed-form scoring. The parity harness
# runs the Spark side first, so the fixture is fresh.
import os as _os

_FIXDIR = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".oracle_fixtures")

_ORDER_FEATS = """
  SELECT o_orderkey,
         CAST(year(o_orderdate) - 1995 AS DOUBLE) AS f_year,
         CAST(month(o_orderdate) AS DOUBLE) AS f_month,
         CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) AS f_priority,
         CAST(o_custkey % 100 AS DOUBLE) AS f_cust,
         CAST(2 * CAST(substr(o_orderpriority, 1, 1) AS DOUBLE)
              + month(o_orderdate) + (o_orderkey % 7) >= 16 AS DOUBLE) AS label
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
    AND o_custkey IS NOT NULL
"""

ORACLES["q77_sql_applied_function"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q77_coefs.parquet')),
f AS ({_ORDER_FEATS}),
s AS (
  SELECT label,
         1.0 / (1.0 + exp(-(c.b + c.w_year * f_year + c.w_month * f_month
                            + c.w_prio * f_priority + c.w_cust * f_cust)))
           AS score
  FROM f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
)
SELECT label, count(*) AS n,
       round(min(score) + 0.000000001, 4) AS min_score,
       round(max(score) + 0.000000001, 4) AS max_score
FROM s GROUP BY label ORDER BY label
"""

ORACLES["q78_classifier_explain"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q78_coefs.parquet')),
f AS ({_ORDER_FEATS}),
e AS (
  SELECT label,
         round(f_year * c.w_year, 6) AS ey,
         round(f_month * c.w_month, 6) AS em,
         round(f_priority * c.w_prio, 6) AS ep,
         round(f_cust * c.w_cust, 6) AS ec,
         round(c.b, 6) AS bias
  FROM f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(ey) + 1e-9, 4) AS avg_f_year,
       round(avg(em) + 1e-9, 4) AS avg_f_month,
       round(avg(ep) + 1e-9, 4) AS avg_f_priority,
       round(avg(ec) + 1e-9, 4) AS avg_f_cust,
       round(avg(bias) + 1e-9, 4) AS avg_bias
FROM e GROUP BY label ORDER BY label
"""

# q80/q85/q86 (graduated from ROWS_ONLY, VERDICT r6 #4): the Spark
# query exports its engine-internal kernel output (Porter stem table,
# xxhash64 simhash signatures, LSH bucket signatures) and these
# oracles replay every relational step downstream of the kernel.
ORACLES["q80_porter_stems"] = f"""
WITH v AS (SELECT * FROM read_parquet('{_FIXDIR}/q80_stems.parquet')),
t AS (SELECT unnest({_TOKS}) AS tok FROM documents)
SELECT v.stem, count(*) AS freq
FROM t JOIN v USING (tok)
GROUP BY v.stem
ORDER BY freq DESC, stem
LIMIT 20
"""

ORACLES["q85_simhash_dedup"] = f"""
WITH s AS (SELECT * FROM read_parquet('{_FIXDIR}/q85_simhash.parquet'))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY id_a, id_b
"""

ORACLES["q86_lsh_ann"] = f"""
WITH bk AS (SELECT * FROM read_parquet('{_FIXDIR}/q86_buckets.parquet')),
c AS (SELECT e.vec_id, bk.bucket, e.embedding
      FROM embeddings e JOIN bk USING (vec_id)),
q AS (SELECT vec_id AS query_id, bucket, embedding AS qvec
      FROM embeddings JOIN bk USING (vec_id) WHERE vec_id % 100 = 3),
scored AS (
  SELECT q.query_id, c.vec_id,
         {_COS.format(a="q.qvec", b="c.embedding")} AS cos_sim
  FROM c JOIN q USING (bucket)
  WHERE c.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""

# q87/q76/q79/q61 (graduated from ROWS_ONLY, VERDICT r7 #1): the Spark
# query exports the model-fit output (kmeans centroids, IVF cell
# assignments, word2vec vectors, SVD term loadings) and these oracles
# replay every step downstream of the fit closed-form — assignment
# argmins, probe selection, pooling arithmetic, vocabulary pruning —
# so only the iterative estimator itself stays engine-internal.
# Distance replay matches Spark's element-order fold: unnest both
# lists positionally and sum (ev-cv)^2; argmin ties break to the
# lowest cluster/cell id, the same rule MLlib's findClosest applies
# (strict < keeps the first index).
# q67 (round 9, VERDICT r8 #3): gaussian clustering graduates via the
# exported-kernel pattern — the fitted (weight, mean, precision
# matrix, log|Σ|) per component is a compact 4×(1+8+64+1) fixture at
# the gate's 8-dim slice, and the oracle replays the argmax
# log-density assignment: score_k = ln(w_k) − ½(ln|Σ_k| + quadratic
# form via the exported precision entries). Ties break to the lowest
# component id (MLlib Vector.argmax keeps the first max). Only the
# EM trajectory stays engine-internal.
ORACLES["q67_gaussian_clusters"] = f"""
WITH comps AS (SELECT * FROM read_parquet('{_FIXDIR}/q67_comps.parquet')),
means AS (SELECT * FROM read_parquet('{_FIXDIR}/q67_means.parquet')),
prec AS (SELECT * FROM read_parquet('{_FIXDIR}/q67_prec.parquet')),
d AS (
  SELECT e.vec_id, m.component, m.i,
         CAST(e.embedding AS DOUBLE[])[m.i] - m.mu AS dv
  FROM embeddings e CROSS JOIN means m
),
quad AS (
  SELECT d1.vec_id, p.component, sum(p.p * d1.dv * d2.dv) AS q
  FROM prec p
  JOIN d d1 ON d1.component = p.component AND d1.i = p.i
  JOIN d d2 ON d2.component = p.component AND d2.i = p.j
           AND d2.vec_id = d1.vec_id
  GROUP BY d1.vec_id, p.component
),
sc AS (
  SELECT quad.vec_id, quad.component,
         ln(c.weight) - 0.5 * (c.logdet + quad.q) AS s
  FROM quad JOIN comps c ON c.component = quad.component
),
a AS (
  SELECT vec_id, component,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY s DESC, component ASC
         ) AS rn
  FROM sc
)
SELECT CAST(component AS BIGINT) AS prediction,
       CAST(count(*) AS BIGINT) AS n
FROM a WHERE rn = 1 GROUP BY 1 ORDER BY 1
"""

ORACLES["q87_kmeans"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q87_centroids.parquet')),
d AS (
  SELECT vec_id, cluster, sum((ev - cv) * (ev - cv)) AS d2
  FROM (
    SELECT e.vec_id, c.cluster,
           unnest(CAST(e.embedding AS DOUBLE[])) AS ev,
           unnest(c.centroid) AS cv
    FROM embeddings e CROSS JOIN c
  )
  GROUP BY vec_id, cluster
),
a AS (
  SELECT vec_id, cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rn
  FROM d
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n
FROM a WHERE rn = 1 GROUP BY cluster ORDER BY cluster
"""

ORACLES["q76_ivf_ann"] = f"""
WITH asg AS (SELECT * FROM read_parquet('{_FIXDIR}/q76_cells.parquet')),
cent AS (SELECT * FROM read_parquet('{_FIXDIR}/q76_centroids.parquet')),
q0 AS (SELECT vec_id AS query_id, embedding AS qvec
       FROM embeddings WHERE vec_id % 100 = 3),
qd AS (
  SELECT query_id, cell, sum((qv - cv) * (qv - cv)) AS d2
  FROM (
    SELECT q0.query_id, cent.cell,
           unnest(CAST(q0.qvec AS DOUBLE[])) AS qv,
           unnest(cent.centroid) AS cv
    FROM q0 CROSS JOIN cent
  )
  GROUP BY query_id, cell
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT query_id, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, cell ASC) AS rn
    FROM qd
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN asg a USING (cell)
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT c.query_id, c.vec_id,
         {_COS.format(a="qe.embedding", b="ce.embedding")} AS cos_sim
  FROM cand c
  JOIN embeddings qe ON qe.vec_id = c.query_id
  JOIN embeddings ce ON ce.vec_id = c.vec_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank
"""

ORACLES["q79_word2vec_pooling"] = f"""
WITH v AS (SELECT * FROM read_parquet('{_FIXDIR}/q79_vectors.parquet')),
bags AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
matched AS (
  SELECT b.doc_id, unnest(v.vector) AS val, unnest(range(len(v.vector))) AS dim
  FROM bags b JOIN v ON b.token = v.word
),
per_dim AS (SELECT doc_id, dim, avg(val) AS a FROM matched GROUP BY doc_id, dim),
norms AS (SELECT doc_id, sqrt(sum(a * a)) AS nrm FROM per_dim GROUP BY doc_id),
alldocs AS (SELECT DISTINCT doc_id FROM bags),
pooled AS (
  SELECT d.doc_id, coalesce(n.nrm, 0.0) AS nrm
  FROM alldocs d LEFT JOIN norms n USING (doc_id)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(nrm) + 1e-9, 4) AS avg_norm
FROM documents JOIN pooled USING (doc_id)
GROUP BY lang ORDER BY lang
"""

ORACLES["q61_svd_term_clusters"] = f"""
WITH emb AS (SELECT * FROM read_parquet('{_FIXDIR}/q61_term_emb.parquet')),
cent AS (SELECT * FROM read_parquet('{_FIXDIR}/q61_centroids.parquet')),
cells AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  GROUP BY doc_id, tok
),
nd AS (SELECT count(*) AS ndocs FROM documents),
vocab AS (
  SELECT tok FROM (SELECT tok, count(*) AS df FROM cells GROUP BY tok)
  CROSS JOIN nd
  WHERE df >= greatest(3, CAST(floor(ndocs / 200.0) AS BIGINT))
),
terms AS (
  SELECT emb."column" AS term, emb.embedding
  FROM emb JOIN vocab ON emb."column" = vocab.tok
),
d AS (
  SELECT term, cluster, sum((tv - cv) * (tv - cv)) AS d2
  FROM (
    SELECT t.term, c.cluster, unnest(t.embedding) AS tv, unnest(c.centroid) AS cv
    FROM terms t CROSS JOIN cent c
  )
  GROUP BY term, cluster
),
a AS (
  SELECT term, cluster,
         row_number() OVER (PARTITION BY term ORDER BY d2 ASC, cluster ASC) AS rn
  FROM d
)
SELECT cluster, CAST(count(*) AS BIGINT) AS n_terms, min(term) AS first_term
FROM a WHERE rn = 1
GROUP BY cluster ORDER BY cluster
"""

# q66/q68/q88/q89 (graduated from ROWS_ONLY, VERDICT r7 #1 pattern,
# round 8): the Spark query exports its fitted model parameters
# (SVM hyperplane, classifier+Platt coefficient pair, logistic
# coefficients, PCA component vectors) and these oracles replay the
# entire application/evaluation pipeline downstream of the optimizer
# closed-form.
ORACLES["q66_svm_margin"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q66_coefs.parquet')),
f AS ({_ORDER_FEATS}),
m AS (
  SELECT label,
         c.b + c.w_year * f_year + c.w_month * f_month
             + c.w_prio * f_priority + c.w_cust * f_cust AS margin
  FROM f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(margin) + 1e-9, 4) AS avg_margin
FROM m GROUP BY label ORDER BY label
"""

ORACLES["q68_probabilizer"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q68_coefs.parquet')),
s AS (
  SELECT 1.0 / (1.0 + exp(-(c.b + c.w_year * f_year + c.w_month * f_month
                            + c.w_prio * f_priority + c.w_cust * f_cust)))
           AS score
  FROM ({_ORDER_FEATS}) f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
),
p AS (
  SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS decile,
         1.0 / (1.0 + exp(-(c.pa * score + c.pb))) AS prob
  FROM s CROSS JOIN c
)
SELECT decile, CAST(count(*) AS BIGINT) AS n,
       round(min(prob) + 1e-9, 4) AS min_prob,
       round(max(prob) + 1e-9, 4) AS max_prob
FROM p GROUP BY decile ORDER BY decile
"""

# exact rank-sum AUC: avg ascending rank of each tied-score group =
# rows strictly below + (group size + 1)/2; AUC = (Σ pos-ranks −
# npos(npos+1)/2) / (npos·nneg) — identical arithmetic to the Spark
# side's classifier_test, so the replay is deterministic.
ORACLES["q88_classifier_eval"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q88_coefs.parquet')),
s AS (
  SELECT label,
         1.0 / (1.0 + exp(-(c.b + c.w_year * f_year + c.w_month * f_month
                            + c.w_prio * f_priority + c.w_cust * f_cust)))
           AS p
  FROM ({_ORDER_FEATS}) f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
),
g AS (SELECT p, count(*) AS cnt, sum(label) AS pos FROM s GROUP BY p),
g2 AS (
  SELECT *,
         coalesce(sum(cnt) OVER (
           ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM g
),
a AS (
  SELECT sum(pos * (cum_before + (cnt + 1) / 2.0)) AS rsum,
         sum(pos) AS npos, sum(cnt - pos) AS nneg,
         sum(CASE WHEN p > 0.5 THEN pos ELSE cnt - pos END) AS ncorrect,
         sum(cnt) AS n
  FROM g2
)
SELECT round((rsum - npos * (npos + 1) / 2.0) / (npos * nneg) + 1e-9, 4) AS auc,
       round(ncorrect * 1.0 / n + 1e-9, 4) AS accuracy
FROM a
"""

# explained variance replay: var(X·vᵢ) / Σⱼ var(xⱼ) — the
# eigenvalue/trace ratio when vᵢ is a true covariance eigenvector;
# the sample/population variance convention cancels in the ratio.
ORACLES["q89_pca"] = f"""
WITH pc AS (SELECT * FROM read_parquet('{_FIXDIR}/q89_components.parquet')),
proj AS (
  SELECT component, vec_id, sum(ev * cv) AS p
  FROM (
    SELECT pc.component, e.vec_id,
           unnest(CAST(e.embedding AS DOUBLE[])) AS ev,
           unnest(pc.vector) AS cv
    FROM embeddings e CROSS JOIN pc
  )
  GROUP BY component, vec_id
),
comp_var AS (SELECT component, var_samp(p) AS v FROM proj GROUP BY component),
dims AS (
  SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
         unnest(range(len(embedding))) AS dim
  FROM embeddings
),
total AS (
  SELECT sum(v) AS tot
  FROM (SELECT var_samp(x) AS v FROM dims GROUP BY dim)
)
SELECT CAST(component AS INTEGER) AS component,
       round(v / tot + 1e-9, 4) AS explained_variance
FROM comp_var CROSS JOIN total ORDER BY component
"""

# qa22: per-cell WHEN replay — drop each row's globally-latest cell,
# then GET_LATEST over the survivors.
ORACLES["qa22_cells_when_sql"] = """
WITH cells AS (
  SELECT CAST(user_id AS VARCHAR) AS r, event_type AS c, "value" AS v, ts
  FROM events
), latest_any AS (
  SELECT r, max(ts) AS lt FROM cells GROUP BY r
), surv AS (
  SELECT cells.* FROM cells JOIN latest_any USING (r)
  WHERE ts < lt
), piv AS (
  SELECT r,
         arg_max(v, ts) FILTER (c = 'purchase') AS p,
         arg_max(v, ts) FILTER (c = 'click') AS cl
  FROM surv GROUP BY r
)
SELECT r, round(p + 0.000000001, 2) AS surv_p,
       coalesce(round(cl + 0.000000001, 2), -1.0) AS surv_c
FROM piv WHERE p IS NOT NULL ORDER BY r
"""

# qa23: the tfidf scoring matrix (augmented tf x inverseMax idf) —
# tokenize, document frequencies, per-doc maxima, closed-form score.
ORACLES["qa23_tfidf_matrix"] = f"""
WITH docs AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id % 20 = 0
), n AS (SELECT count(*) AS total FROM docs),
bags AS (
  SELECT doc_id, tok AS term, count(*) AS frequency
  FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) u
  GROUP BY doc_id, tok
), dfs AS (
  SELECT term, count(*) AS df FROM bags GROUP BY term
), j AS (
  SELECT b.doc_id, b.term, b.frequency,
         CAST(coalesce(d.df, 0) AS DOUBLE) AS dfv,
         max(b.frequency) OVER (PARTITION BY b.doc_id) AS maxF,
         max(CAST(coalesce(d.df, 0) AS DOUBLE))
           OVER (PARTITION BY b.doc_id) AS maxNt
  FROM bags b LEFT JOIN dfs d USING (term)
)
SELECT doc_id, term,
       round((0.5 + 0.5 * frequency / maxF)
             * ln(1.0 + maxNt / (1.0 + dfv)) + 1e-9, 6) AS score
FROM j
WHERE term IN ('the', 'data', 'model', 'learning')
ORDER BY doc_id, term
"""

# qa24: SemDeDup — the q31 pair set resolved to components with a
# recursive CTE; every id maps to its component minimum (itself when
# unmatched).
ORACLES["qa24_semantic_dedup"] = f"""
WITH sig AS (
  SELECT vec_id, embedding, {_Q31_SIG} AS s FROM embeddings
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM sig a JOIN sig b
    ON a.vec_id < b.vec_id AND ({_Q31_BANDS})
), pairs AS (
  SELECT id_a, id_b FROM cand
  WHERE {_COS.format(a="va", b="vb")} >= 0.4
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
), closure AS (
  WITH RECURSIVE r(s, t) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.s, e.b FROM r JOIN edges e ON r.t = e.a
  )
  SELECT s, t FROM r
), comp AS (
  SELECT s AS node, LEAST(s, MIN(t)) AS component
  FROM closure GROUP BY s
)
SELECT e.vec_id,
       CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS survivor,
       CAST(e.vec_id != coalesce(c.component, e.vec_id) AS BIGINT)
         AS is_duplicate
FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
ORDER BY e.vec_id
"""

# qa25: corpus-tier chain — unigram LM scores joined with Gopher
# repetition signals, both replayed end-to-end (vocab/totals from the
# FULL corpus; signals per doc), matching the dialect's
# unigram_logprob_scores() JOIN repetition_signals() surfaces.
ORACLES["qa25_corpus_chain_sql"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY tok
), totals AS (
  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM vocab
), scored AS (
  SELECT t.doc_id,
         ln((vocab.c + 0.5) / ((SELECT n FROM totals) + 0.5 * (SELECT v FROM totals))) AS lp
  FROM toks t JOIN vocab USING (tok)
), u AS (
  SELECT doc_id, round(avg(lp), 4) AS avg_logprob
  FROM scored GROUP BY doc_id
), t AS (
  SELECT doc_id, text, {_TOKS} AS dtoks FROM documents
), base AS (
  SELECT doc_id,
    CAST(len(dtoks) AS BIGINT) AS n_words,
    round(CASE WHEN len(dtoks) > 0 THEN
      CAST(list_aggregate(list_transform(dtoks, tk -> len(tk)), 'sum') AS DOUBLE)
        / len(dtoks) ELSE 0.0 END, 4) AS mean_word_len,
    round(CASE WHEN len(string_split(text, chr(10))) > 0 THEN
      1.0 - CAST(len(list_distinct(string_split(text, chr(10)))) AS DOUBLE)
        / len(string_split(text, chr(10))) ELSE 0.0 END, 4) AS frac_dup_lines
  FROM t
), top AS (
  SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS frac_top_word
  FROM (
    SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
  ) GROUP BY doc_id
)
SELECT b.doc_id, b.n_words,
       coalesce(p.frac_top_word, 0.0) AS frac_top_word,
       u.avg_logprob,
       (b.n_words >= 50 AND b.n_words <= 100000
        AND b.mean_word_len >= 2 AND b.mean_word_len <= 10
        AND b.frac_dup_lines <= 0.30
        AND coalesce(p.frac_top_word, 0.0) <= 0.20) AS passes
FROM base b LEFT JOIN top p USING (doc_id) JOIN u USING (doc_id)
WHERE b.doc_id < 150
ORDER BY b.doc_id
"""

# qa26: ordered string_agg — DuckDB's native ORDER BY form replays
# the dialect's 3-argument string_agg.
ORACLES["qa26_ordered_string_agg"] = """
SELECT o_orderpriority AS priority,
       string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses,
       count(*) AS n
FROM orders WHERE o_orderkey < 400
GROUP BY o_orderpriority ORDER BY priority
"""

# qa27: cross-type ORDER BY (MLDB-989 semantics) — explicit rank +
# per-rank keys replay the engine's sortable-key encoding: NULL(0) <
# numbers(1) < rows(3) < embeddings(4); the row key is its name-sorted
# cells (here cell 'a' decides, cell b is constant), the embedding
# key element-wise.
ORACLES["qa27_cross_type_order"] = """
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents WHERE doc_id < 120
ORDER BY
  CASE doc_id % 4 WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 1 THEN 3 ELSE 4 END,
  CASE WHEN doc_id % 4 = 2 THEN n_chars % 5 END,
  CASE WHEN doc_id % 4 = 1 THEN n_chars % 7 END,
  CASE WHEN doc_id % 4 = 3 THEN n_chars % 3 END,
  doc_id
LIMIT 47
"""

# qa28: natural path-element ordering — numeric names by VALUE.
ORACLES["qa28_natural_path_order"] = """
SELECT CAST(doc_id AS VARCHAR) AS r FROM documents
ORDER BY doc_id LIMIT 31
"""

# qa30 (round 8): classifier.test's threshold-sweep output table —
# sigmoid scoring from the exported coefficients, then the full
# window replay (rank index, RANGE-frame cumulative TP/FP so tied
# scores share a threshold, derived rates).
ORACLES["qa30_roc_table"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/qa30_coefs.parquet')),
s AS (
  SELECT label,
         1.0 / (1.0 + exp(-(c.b + c.w_year * f_year + c.w_month * f_month
                            + c.w_prio * f_priority + c.w_cust * f_cust)))
           AS score
  FROM ({_ORDER_FEATS}) f CROSS JOIN c
  WHERE o_orderkey % 5 = 0
),
tot AS (SELECT sum(label) AS tp_all, sum(1 - label) AS tn_all FROM s),
r AS (
  SELECT s.label, s.score, tot.tp_all, tot.tn_all,
         rank() OVER (ORDER BY s.score DESC) AS idx,
         sum(s.label) OVER (
           ORDER BY s.score DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         sum(1 - s.label) OVER (
           ORDER BY s.score DESC
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
  FROM s CROSS JOIN tot
)
SELECT CAST(idx AS BIGINT) AS idx,
       CAST(label AS BIGINT) AS label,
       round(score + 1e-9, 4) AS score_r,
       tp, (tp_all - tp) AS fn,
       round(tp / tp_all + 1e-9, 4) AS tpr,
       (tn_all - fp) AS tn, fp,
       round(fp / tn_all + 1e-9, 4) AS fpr,
       round((tp + tn_all - fp) / (tp_all + tn_all) + 1e-9, 4) AS acc,
       round(tp / (tp + fp) + 1e-9, 4) AS prec
FROM r ORDER BY idx, label
"""

# q74 (graduated round 8): the k-fold experiment harness replayed
# closed-form from per-fold coefficient fixtures — hash-mod fold
# assignment, per-fold sigmoid scoring of the HELD-OUT fold, exact
# rank-sum AUC + threshold-0.5 accuracy, train/test counts.
ORACLES["q74_classifier_experiment"] = f"""
WITH c AS (SELECT * FROM read_parquet('{_FIXDIR}/q74_coefs.parquet')),
f AS ({_ORDER_FEATS}),
tot AS (SELECT count(*) AS total FROM f),
s AS (
  SELECT c.fold, f.label,
         1.0 / (1.0 + exp(-(c.b + c.w_year * f_year + c.w_month * f_month
                            + c.w_prio * f_priority + c.w_cust * f_cust)))
           AS p
  FROM f JOIN c ON (f.o_orderkey % 3) = c.fold
),
g AS (SELECT fold, p, count(*) AS cnt, sum(label) AS pos
      FROM s GROUP BY fold, p),
g2 AS (
  SELECT *,
         coalesce(sum(cnt) OVER (
           PARTITION BY fold ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM g
),
a AS (
  SELECT fold,
         sum(pos * (cum_before + (cnt + 1) / 2.0)) AS rsum,
         sum(pos) AS npos, sum(cnt - pos) AS nneg,
         sum(CASE WHEN p > 0.5 THEN pos ELSE cnt - pos END) AS ncorrect,
         sum(cnt) AS n
  FROM g2 GROUP BY fold
)
SELECT CAST(fold AS INTEGER) AS fold,
       CAST(tot.total - n AS BIGINT) AS n_train,
       CAST(n AS BIGINT) AS n_test,
       round((rsum - npos * (npos + 1) / 2.0) / (npos * nneg) + 1e-9, 4)
         AS auc,
       round(ncorrect * 1.0 / n + 1e-9, 4) AS accuracy
FROM a CROSS JOIN tot ORDER BY fold
"""

# q65 (graduated round 8, the q85 exported-OUTPUT pattern): the
# forest's per-example scores export once; the oracle replays every
# evaluation step downstream of tree induction — grouped-score
# rank-sum AUC with tie averaging, threshold accuracy.
ORACLES["q65_random_forest"] = f"""
WITH s AS (SELECT score AS p, label
           FROM read_parquet('{_FIXDIR}/q65_scores.parquet')),
g AS (SELECT p, count(*) AS cnt, sum(label) AS pos FROM s GROUP BY p),
g2 AS (
  SELECT *,
         coalesce(sum(cnt) OVER (
           ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM g
),
a AS (
  SELECT sum(pos * (cum_before + (cnt + 1) / 2.0)) AS rsum,
         sum(pos) AS npos, sum(cnt - pos) AS nneg,
         sum(CASE WHEN p > 0.5 THEN pos ELSE cnt - pos END) AS ncorrect,
         sum(cnt) AS n
  FROM g2
)
SELECT round((rsum - npos * (npos + 1) / 2.0) / (npos * nneg) + 1e-9, 4)
         AS auc,
       round(ncorrect * 1.0 / n + 1e-9, 4) AS accuracy
FROM a
"""

# qa31/qa32 (round 9, VERDICT r8 #7): the reference's own benchmark
# pipelines as chained macro-gates (testing/reddit_benchmark.py:23-103,
# testing/stackoverflow_benchmark.py:23-62). The oracle replays the
# data-shaping spine closed-form — tokenize (the dialect's
# case-preserving [^a-z0-9]+ split; value:1 makes the bag a SET for
# qa31, occurrence counts for qa32) → transpose → per-column counts →
# top-20. The svd/kmeans/tsne stages run inside the gates and carry
# their own oracle gates (q61/q87/q75).
_RAW_TOKS = "list_filter(string_split_regex(text, '[^a-z0-9]+'), t -> t <> '')"

ORACLES["qa31_reddit_pipeline"] = f"""
WITH cells AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id, unnest({_RAW_TOKS}) AS tok FROM documents)
)
SELECT tok || '|1' AS name, CAST(count(*) AS BIGINT) AS numUsers
FROM cells GROUP BY tok
ORDER BY numUsers DESC, name ASC LIMIT 20
"""

ORACLES["qa32_stackoverflow_pipeline"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                        t -> t <> '')) AS tok
  FROM documents
),
cells AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT tok || '|1' AS name,
       CAST(count(*) AS BIGINT) AS numQuestions,
       CAST(sum(c) AS BIGINT) AS totalCount
FROM cells GROUP BY tok
ORDER BY numQuestions DESC, name ASC LIMIT 20
"""
