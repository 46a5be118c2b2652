"""Core scalar functions from the reference's builtin library.

Reference: /root/reference sql/builtin_functions.cc (math/statistics
families, registration sites cited per function). All are pure Column
expressions — they inline into whole-stage codegen, nothing crosses
into Python at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(x: Column, step: Column | float) -> Column:
    """Round x to the nearest multiple of step.

    Reference: quantize, sql/builtin_functions.cc:3133 region.
    """
    step = F.lit(step) if not isinstance(step, Column) else step
    return F.round(x / step) * step


def clamp(x: Column, lo: Column | float, hi: Column | float) -> Column:
    """Clamp x into [lo, hi]; NULL bounds leave that side open.

    Reference: clamp, sql/builtin_functions.cc:3133.
    """
    lo = F.lit(lo) if not isinstance(lo, Column) else lo
    hi = F.lit(hi) if not isinstance(hi, Column) else hi
    return F.least(F.greatest(x, lo), hi)


def replace_not_finite(x: Column, repl: Column | float) -> Column:
    """Replace NaN/inf with repl (reference replace_not_finite)."""
    repl = F.lit(repl) if not isinstance(repl, Column) else repl
    return F.when(F.isnan(x) | x.isin(float("inf"), float("-inf")), repl).otherwise(x)


def binomial_lb_80(trials: Column, successes: Column) -> Column:
    """Wilson score 80% lower bound on a binomial proportion.

    Reference: binomial_lb_80, sql/builtin_functions.cc:946. z for 80%
    two-sided = 1.281551565545.
    """
    return _wilson(trials, successes, lower=True)


def binomial_ub_80(trials: Column, successes: Column) -> Column:
    """Wilson score 80% upper bound (sql/builtin_functions.cc:947)."""
    return _wilson(trials, successes, lower=False)


def _wilson(n: Column, k: Column, lower: bool) -> Column:
    z = F.lit(1.281551565545)
    p = k / n
    denom = F.lit(1.0) + z * z / n
    center = p + z * z / (F.lit(2.0) * n)
    margin = z * F.sqrt(p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n))
    return (center - margin) / denom if lower else (center + margin) / denom


def jaccard_index(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns as sets.

    Reference: jaccard_index, sql/builtin_functions.cc:1337 (operates
    on rows-as-sets; here the Spark-native form takes arrays).
    """
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def geo_distance(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in meters.

    Reference: geo_distance, sql/builtin_geo_functions.cc (286 LoC file).
    """
    r = F.lit(6371000.0)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return r * F.lit(2.0) * F.asin(F.sqrt(a))


def _ring_crossings_odd(ring: Column, lat: Column, lon: Column) -> Column:
    """Odd-crossings (ray-cast) test for one GeoJSON ring
    (array of [lon, lat] points, implicitly closed): true when the
    point is inside the ring. Pure JVM higher-order functions."""
    # edges = zip(ring, rotate(ring, 1)); the rotation closes the loop
    rot = F.concat(F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1))
    edges = F.zip_with(
        ring,
        rot,
        lambda a, b: F.struct(
            a[0].alias("x1"), a[1].alias("y1"), b[0].alias("x2"), b[1].alias("y2")
        ),
    )
    hits = F.filter(
        edges,
        lambda e: ((e["y1"] > lat) != (e["y2"] > lat))
        & (
            lon
            < (e["x2"] - e["x1"]) * (lat - e["y1"]) / (e["y2"] - e["y1"])
            + e["x1"]
        ),
    )
    return F.size(hits) % 2 == 1


def st_contains_point(rings: Column, lat: Column, lon: Column, multi: bool = False) -> Column:
    """ST_Contains_Point (sql/builtin_geo_functions.cc:71-282):
    point-in-polygon over GeoJSON coordinates. `rings` is the GeoJSON
    `coordinates` member — for a Polygon an array of rings (ring 0
    exterior, the rest holes, RFC 7946 §3.1.6), for a MultiPolygon
    (multi=True) an array of polygons, any of which may contain.
    Points are [lon, lat] pairs, rings implicitly closed.

    Divergence note: the reference tests on the S2 sphere; this is
    planar ray casting — identical verdicts except for polygons
    spanning the antimeridian or with >~100 km edge curvature, the
    standard trade for a codegen'd JVM expression (no geometry lib in
    the row path)."""

    def poly_contains(poly: Column) -> Column:
        outer = _ring_crossings_odd(F.element_at(poly, 1), lat, lon)
        holes = F.filter(
            F.slice(poly, 2, F.greatest(F.size(poly) - 1, F.lit(0))),
            lambda ring: _ring_crossings_odd(ring, lat, lon),
        )
        return outer & (F.size(holes) == 0)

    if multi:
        return F.size(F.filter(rings, poly_contains)) > 0
    return poly_contains(rings)


def likelihood_ratio(outcome: Column, feature: Column) -> dict[str, Column]:
    """Log-likelihood ratio of a boolean feature given a boolean
    outcome: ln(P(feature|outcome) / P(feature|not outcome)), from
    the four cell counts of the 2x2 contingency table.

    Reference: the likelihood_ratio aggregate
    (sql/builtin_aggregators.cc:947, undocumented upstream); this is
    the standard log-LR it computes, exposed as aggregate Columns so
    it runs inside any groupBy. Returns the component counts too —
    at scale you keep them (they re-aggregate; the ratio itself
    doesn't)."""
    o = outcome.cast("boolean")
    f = feature.cast("boolean")
    n_to = F.sum((o & f).cast("long"))
    n_o = F.sum(o.cast("long"))
    n_tn = F.sum((~o & f).cast("long"))
    n_n = F.sum((~o).cast("long"))
    llr = F.log((n_to / n_o) / (n_tn / n_n))
    return {"n_true_outcome": n_o, "n_feat_true": n_to, "n_false_outcome": n_n,
            "n_feat_false": n_tn, "llr": llr}


def row_hash(key: Column) -> Column:
    """Deterministic 64-bit row hash.

    Reference: rowHash() pseudo-column (doc ValueExpression.md
    §Dataset-provided functions) used for stable sampling and implicit
    ORDER BY tiebreaks (core/bound_queries.cc:1139-1142). xxhash64 is
    Spark-native and stable across partitions/executors; for
    cross-engine (duckdb-oracle) parity use the md5-based variant
    below instead.
    """
    return F.xxhash64(key)


def row_hash_portable(key: Column) -> Column:
    """Engine-portable deterministic hash: first 15 hex digits of
    md5(cast(key as string)) as a BIGINT. Identical SQL exists in any
    engine with md5(), which makes it oracle-checkable."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
