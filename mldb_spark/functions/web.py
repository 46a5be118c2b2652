"""Web-content enricher functions: user-agent parsing and HTML text
extraction (SURVEY §2.12).

Reference parity:
- http.useragent / parse_useragent
  (plugins/html/useragent_function.cc:106): the reference wraps
  ua-parser with its regexes.yaml database; this engine ships a
  compact heuristic covering the major browser/OS/device families and
  the spider flag — pure Column expressions (regexp_extract + CASE),
  no Python in the row path, so the whole parse is codegen'd and a
  SQL oracle can replay it.
- parse_html / html text extraction (plugins/html/parse_html.cc:353):
  the reference uses hubbub; here a regexp pipeline strips
  script/style blocks, comments and tags and decodes the common
  entities — the 95% case for web-corpus text mining. html_links
  extracts href targets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BROWSERS = [
    # order matters: Edge/Opera embed Chrome's token, Chrome embeds
    # Safari's — first match wins. 'Mobile Safari' before 'Safari'
    # (uap-core's family split, pinned by MLDB-1753's iPhone UA).
    ("Edge", r"(?:Edg|Edge)/(\d+[\.\d]*)"),
    ("Opera", r"(?:OPR|Opera)/(\d+[\.\d]*)"),
    ("Chrome", r"Chrome/(\d+[\.\d]*)"),
    ("Firefox", r"Firefox/(\d+[\.\d]*)"),
    ("Mobile Safari", r"Version/(\d+[\.\d]*).*Mobile.*Safari"),
    ("Safari", r"Version/(\d+[\.\d]*).*Safari"),
    ("IE", r"MSIE (\d+[\.\d]*)"),
]

_OSES = [
    ("Windows", r"Windows NT (\d+[\.\d]*)"),
    ("iOS", r"(?:iPhone|iPad).*OS (\d+[_\d]*)"),
    ("Mac OS X", r"Mac OS X (\d+[_\.\d]*)"),
    ("Android", r"Android (\d+[\.\d]*)"),
    ("Linux", r"(Linux)"),
]

_SPIDER_RE = r"(?i)(bot|crawler|spider|slurp|archiver|fetch|scrape)"


def parse_useragent(ua: Column) -> Column:
    """Struct(browser_family, browser_version, os_family, os_version,
    device_brand, device_model, is_spider) from a user-agent string —
    the output surface of the reference's http.useragent function
    (plugins/html/useragent_function.cc:95-104)."""
    # fold families in reverse so the FIRST listed family wins
    # (chained when() would re-embed prior conditions; this stays a
    # flat ladder of independent rlike tests)
    def semver3(v: Column) -> Column:
        # uap-core renders browser versions major.minor.patch,
        # zero-filling missing parts ('5.1' -> '5.1.0'; MLDB-1753)
        parts = F.split(v, r"\.")
        return F.when(v == "", v).otherwise(
            F.concat_ws(
                ".",
                F.try_element_at(parts, F.lit(1)),
                F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit("0")),
                F.coalesce(F.try_element_at(parts, F.lit(3)), F.lit("0")),
            )
        )

    browser = F.lit("Other")
    bver = F.lit("")
    for fam, rx in reversed(_BROWSERS):
        hit = ua.rlike(rx)
        browser = F.when(hit, F.lit(fam)).otherwise(browser)
        bver = F.when(hit, semver3(F.regexp_extract(ua, rx, 1))).otherwise(bver)
    osfam = F.lit("Other")
    osver = F.lit("")
    for fam, rx in reversed(_OSES):
        hit = ua.rlike(rx)
        osfam = F.when(hit, F.lit(fam)).otherwise(osfam)
        ver = (
            F.lit("")
            if fam == "Linux"
            else F.regexp_replace(F.regexp_extract(ua, rx, 1), "_", ".")
        )
        osver = F.when(hit, ver).otherwise(osver)
    brand = (
        F.when(ua.contains("iPhone"), F.lit("Apple"))
        .when(ua.contains("iPad"), F.lit("Apple"))
        .when(ua.contains("Macintosh"), F.lit("Apple"))
        .when(ua.rlike(r"(?i)samsung|sm-"), F.lit("Samsung"))
        .when(ua.rlike(r"(?i)pixel"), F.lit("Google"))
        .otherwise(F.lit(""))
    )
    model = (
        F.when(ua.contains("iPhone"), F.lit("iPhone"))
        .when(ua.contains("iPad"), F.lit("iPad"))
        .when(ua.rlike(r"(?i)pixel \d"), F.regexp_extract(ua, r"(?i)(Pixel \d\w*)", 1))
        .when(ua.rlike(r"SM-\w+"), F.regexp_extract(ua, r"(SM-\w+)", 1))
        .otherwise(F.lit(""))
    )
    return F.struct(
        browser.alias("browser_family"),
        bver.alias("browser_version"),
        osfam.alias("os_family"),
        osver.alias("os_version"),
        brand.alias("device_brand"),
        model.alias("device_model"),
        ua.rlike(_SPIDER_RE).alias("is_spider"),
    )


_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
]


def html_text(html: Column) -> Column:
    """Visible text from HTML: drop script/style/comments, strip
    tags, decode common entities, squeeze whitespace (reference
    parse_html extractText, plugins/html/parse_html.cc:353)."""
    # separate script/style passes: backreference-free patterns replay
    # in RE2 engines (DuckDB) as well as Java regex
    t = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_links(html: Column) -> Column:
    """Array of href targets (single- or double-quoted)."""
    return F.regexp_extract_all(
        html, F.lit(r"""(?i)href\s*=\s*["']([^"']+)["']"""), F.lit(1)
    )


def extract_domain(url: Column, remove_subdomain: bool = False) -> Column:
    """extract_domain(url[, {removeSubdomain}]) — the reference's http
    function family (sql/builtin_http_functions.cc:38-77): the host
    part of a URL; with removeSubdomain, the last two dot-separated
    labels unless the host is an IP address (the reference skips IPs
    via Url::hostIsIpAddress). NULL in -> NULL out. Pure JVM
    (parse_url + regexp), so it rides whole-stage codegen over a
    100 TB url column."""
    host = F.parse_url(url, F.lit("HOST"))
    if not remove_subdomain:
        return host
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
    # rfind two dots from the end == capture the trailing two labels
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(is_ip | (two == ""), host).otherwise(two)


def canonicalize_url(url: Column) -> Column:
    """Canonical form for URL-keyed dedup (the first stage of a
    web-corpus pipeline: exact-dup keys and blocklist joins both key
    on this). Pure JVM expressions — no Python in the hot path.

    Rules (the common-subset of crawl-dedup canonicalizers):
    - lowercase scheme and host;
    - strip the fragment (#...);
    - strip known tracking query params (utm_*, fbclid, gclid,
      ref) and the whole '?' when nothing survives;
    - drop default ports (:80 for http, :443 for https);
    - remove a trailing slash on a non-root path;
    - strip a leading 'www.' host label.
    """
    c = F.trim(url)
    # fragment off first (everything after #)
    c = F.regexp_replace(c, r"#.*$", "")
    # split scheme://host[:port]/path?query — lowercase scheme+host
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    # default ports + www.
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    # split path vs query
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    # drop tracking params from the query, preserving order
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=")
        & (p != ""),
    )
    new_query = F.array_join(kept, "&")
    # trailing slash off non-root paths; empty path becomes /
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    out = F.concat(scheme, F.lit("://"), hostport, path)
    return F.when(new_query != "", F.concat(out, F.lit("?"), new_query)).otherwise(out)
