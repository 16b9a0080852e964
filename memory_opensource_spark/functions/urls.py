"""URL canonicalization for crawl dedup (round-10).

Web-crawl pipelines dedup by URL before they ever touch content (CCNet /
RefinedWeb both do a URL-level pass first — the same page is re-crawled
with tracking query params, fragments, default ports, ``www.`` aliases and
trailing-slash variants, and content dedup is orders of magnitude more
expensive than string normalization).  Reference analog: none (the memory
service never ingests crawls) — this is part of the LLM-data-pipeline
family, like the Gopher tables.

``canonical_url`` is a PURE Column expression (regexp + array primitives,
whole-stage codegen, zero shuffle, no UDF) applying the documented rules:

1. scheme and host lowercase; ``www.`` prefix dropped from the host
2. default ports dropped (``:80`` for http, ``:443`` for https); other
   ports kept
3. fragment (``#...``) dropped
4. tracking query params dropped (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``); surviving params SORTED bytewise and re-joined with ``&``;
   an emptied query drops its ``?``
5. trailing ``/`` dropped from the path (the root path canonicalizes to
   no path at all)

Rules chosen for determinism + DuckDB mirrorability (the oracle runs the
same regexes via regexp_extract/list_filter/list_sort) — NOT a full RFC
3986 normalizer (no percent-decoding, no path-segment resolution; both
would need semantics the gate cannot pin byte-for-byte across engines).
NULL urls stay NULL.  Scheme-less inputs (``example.com/a``) pass through
UNCHANGED — without a scheme the host/path split is ambiguous, so the
safe dedup key is the raw string, never a mangled ``://example.com/a``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params dropped during canonicalization (anchored key=... form)
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|ref)="


def canonical_url(url: Column) -> Column:
    """The documented canonical form of ``url`` (module docstring rules).

    Shape: ~10 regexp/array expressions per row, all JVM-side — safe in
    the same projection as other scan-side signals."""
    u = F.regexp_replace(url, "#.*$", "")                 # 3. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]+)", 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(hostport, ":[0-9]+$", "")),
        r"^www\.", "")                                    # 1. host
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443"))))  # 2.
    path = F.regexp_replace(
        F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1), "/+$", "")   # 5.
    qstr = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(qstr, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE)))        # 4.
    query = F.array_join(params, "&")
    canonical = F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(""),
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(""))
    # scheme-less inputs pass through unchanged (module docstring): an
    # empty scheme would otherwise emit a mangled '://host/...' form.
    return F.when(scheme != "", canonical).otherwise(url)


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin of :func:`canonical_url` over the SQL expression
    ``expr`` — SAME regexes, mirrored primitives (regexp_extract /
    list_filter / list_sort).  Kept beside the Column form so the two
    cannot drift silently; the gate compares their outputs value-by-value."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?]+)', 1)"
    host = (f"regexp_replace(lower(regexp_replace({hostport}, ':[0-9]+$', "
            f"'')), '^www\\.', '')")
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    keep_port = (f"({port} <> '' AND NOT ({scheme} = 'http' AND {port} = "
                 f"'80') AND NOT ({scheme} = 'https' AND {port} = '443'))")
    path = (f"regexp_replace(regexp_extract({rest}, '^[^/?]*([^?]*)', 1), "
            f"'/+$', '')")
    qstr = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (f"list_sort(list_filter(string_split({qstr}, '&'), x -> "
              f"x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')))")
    query = f"array_to_string({params}, '&')"
    canonical = (f"({scheme} || '://' || {host} || "
                 f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || "
                 f"{path} || "
                 f"(CASE WHEN {query} <> '' THEN '?' || {query} ELSE '' END))")
    # scheme-less passthrough — mirrors the Column form exactly
    return f"(CASE WHEN {scheme} <> '' THEN {canonical} ELSE {expr} END)"


def url_host(url: Column) -> Column:
    """Lowercased host of ``url``: optional scheme and userinfo stripped,
    port stripped, first path/query/fragment-delimited token.  Scheme-less
    inputs treat their first segment as the host (``example.com/a`` ->
    ``example.com``).  NULL stays NULL."""
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]+)", 1)
    return F.lower(F.regexp_replace(
        F.regexp_replace(hostport, "^.*@", ""), ":[0-9]+$", ""))


def host_suffixes(url: Column) -> Column:
    """Label-boundary suffixes of the host of ``url``:
    ``a.b.example.com`` -> [a.b.example.com, b.example.com, example.com,
    com].  The match key set for domain-blocklist filtering — a blocklist
    entry ``example.com`` blocks the host and every subdomain, and can
    NEVER match mid-label (``le.com`` does not block ``example.com``)."""
    host = url_host(url)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."))


def url_blocked(url: Column, domains: list[str]) -> Column:
    """Scan-side predicate: True when any host suffix of ``url`` is in the
    LITERAL ``domains`` list (the small-blocklist form — stays a pure
    Column expression, zero shuffle).  For registry-scale blocklists (the
    UT1 lists run to millions of domains) use
    :func:`filter_blocked_urls`, which joins an arbitrary-size blocklist
    table instead of inlining literals.  NULL url -> False (kept)."""
    dset = F.array(*[F.lit(d.lower()) for d in domains])
    return F.coalesce(
        F.exists(host_suffixes(url), lambda s: F.array_contains(dset, s)),
        F.lit(False))


def filter_blocked_urls(df, blocklist, url_col: str = "url",
                        keep_blocked: bool = False):
    """Domain-blocklist filtering (r12) — the CCNet/RefinedWeb UT1-style
    crawl stage: drop every row whose URL host (or any parent domain on a
    label boundary) appears in ``blocklist`` ({domain} rows, any size).

    Shape for 100 TB: DISTINCT the url values, explode the ≤ label-count
    host suffixes per distinct url, equi-join the blocklist on the suffix
    string (Catalyst broadcasts a small list, shuffles a UT1-scale one —
    no forced strategy), then one semi/anti join back on the URL VALUE —
    no regex-per-domain, no O(rows x domains) work.  Correlating on the
    value (not a synthetic row id) keeps the operator deterministic under
    task retry/speculation and nondeterministic shuffle-fetch order: a
    ``monotonically_increasing_id`` correlate would re-evaluate the input
    plan on both join branches and could assign DIFFERENT ids per branch
    (r13 ADVICE fix).  NULL urls never match a join key, so they are kept
    by the anti join (and dropped by ``keep_blocked=True`` — a NULL url is
    not blocked).  ``keep_blocked=True`` returns the blocked rows instead
    (quarantine/audit side)."""
    blocked_urls = (df.select(F.col(url_col).alias("_u")).distinct()
                    .select("_u", F.explode(host_suffixes(F.col("_u")))
                            .alias("_sfx"))
                    .join(blocklist.select(
                        F.lower(F.col("domain")).alias("_sfx")), "_sfx")
                    .select("_u").distinct())
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(blocked_urls,
                   df[url_col] == blocked_urls["_u"], how)


def host_suffixes_sql(expr: str) -> str:
    """DuckDB twin of :func:`host_suffixes` over SQL expression ``expr`` —
    same regexes, same label-boundary suffix construction."""
    rest = f"regexp_replace({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    hostport = f"regexp_extract({rest}, '^([^/?#]+)', 1)"
    host = (f"lower(regexp_replace(regexp_replace({hostport}, '^.*@', ''), "
            f"':[0-9]+$', ''))")
    labels = f"string_split({host}, '.')"
    return (f"list_transform(range(1, len({labels}) + 1), i -> "
            f"array_to_string(list_slice({labels}, i::INT, "
            f"len({labels})), '.'))")


def url_blocked_sql(expr: str, domains: list[str]) -> str:
    """DuckDB twin of :func:`url_blocked` — same literal domain list."""
    dset = "[" + ", ".join(f"'{d.lower()}'" for d in domains) + "]"
    return (f"coalesce(len(list_filter({host_suffixes_sql(expr)}, s -> "
            f"list_contains({dset}, s))) > 0, false)")


# --- sitemap extraction (r13) ----------------------------------------------

#: <loc> entries of a sitemap/sitemap-index document.  CDATA-wrapped and
#: plain forms; the value is group 2.
_SITEMAP_LOC = "(?is)<loc>\\s*(<!\\[CDATA\\[)?\\s*(.*?)\\s*(\\]\\]>)?\\s*</loc>"


def sitemap_locs(xml: Column) -> Column:
    """``array<string>`` of ``<loc>`` URLs in a sitemap or sitemap-index
    XML body — the crawl-frontier DISCOVERY primitive (sitemaps feed the
    frontier; robots.txt gates it).  Handles CDATA-wrapped locs and the
    five XML entities; deliberately regex-scoped like html_to_text (a
    DOM parser adds no value the oracle can pin).  Pure Column
    expression; NULL -> empty array."""
    locs = F.regexp_extract_all(F.coalesce(xml, F.lit("")),
                                F.lit(_SITEMAP_LOC), 2)
    ent = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
           ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&")]
    def decode(v):
        for e, ch in ent:
            v = F.replace(v, F.lit(e), F.lit(ch))
        return v
    return F.filter(F.transform(locs, decode),
                    lambda v: v.rlike("(?i)^https?://"))


def sitemap_locs_sql(expr: str) -> str:
    """DuckDB twin of :func:`sitemap_locs` — same regex, same entity
    decode order (amp last), same scheme filter."""
    rx = _SITEMAP_LOC.replace("'", "''")
    locs = f"regexp_extract_all({expr}, '{rx}', 2)"
    v = "v"
    for e, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", chr(39) * 2), ("&apos;", chr(39) * 2),
                  ("&amp;", "&")]:
        ch_sql = ch if ch != "''" else "''"
        v = f"replace({v}, '{e}', '{ch_sql}')"
    return (f"list_filter(list_transform({locs}, v -> {v}), "
            f"v -> regexp_matches(v, '(?i)^https?://'))")


# --- SURT form (r14) ---------------------------------------------------------

def surt(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) of ``url`` — the
    Common-Crawl/Wayback index key: scheme and userinfo dropped, host
    lowercased and its labels REVERSED comma-joined, non-default port
    kept, then ``)`` + path/query (fragment dropped):
    ``https://www.Example.com:8080/a/b?q=1`` ->
    ``com,example,www:8080)/a/b?q=1``.  Sorting a 100 TB crawl by SURT
    clusters every domain's pages (and its subdomains as a prefix
    range), which is what makes index lookups and per-domain scans
    partition-prunable.  Pure Column expression; NULL stays NULL.

    A pathless URL with a query gets the canonical ``/`` before the
    ``?`` (``http://h?q=1`` -> ``h)/?q=1``), matching the Common-Crawl/
    Wayback SURT form and this module's ``url_path``.  Caveat (kept
    deliberately): ports 80 AND 443 are both dropped regardless of the
    original scheme — an explicit ``http://h:443/`` folds with
    ``https://h/``, which is the fold canonicalization wants here."""
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    hostport = F.regexp_replace(
        F.regexp_extract(rest, r"^([^/?#]+)", 1), "^.*@", "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    port = F.when((port == "") | (port == "80") | (port == "443"),
                  F.lit("")).otherwise(F.concat(F.lit(":"), port))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    tail = F.regexp_replace(
        F.regexp_replace(rest, r"^[^/?#]+", ""), "#.*$", "")
    tail = (F.when(tail == "", F.lit("/"))
            .when(tail.startswith("?"), F.concat(F.lit("/"), tail))
            .otherwise(tail))
    return F.when(url.isNull(), F.lit(None)) \
        .otherwise(F.concat(rev, port, F.lit(")"), tail))


def surt_sql(expr: str) -> str:
    """DuckDB twin of :func:`surt` — same regexes and rules."""
    rest = f"regexp_replace({expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    hostport = (f"regexp_replace(regexp_extract({rest}, "
                f"'^([^/?#]+)', 1), '^.*@', '')")
    host = f"lower(regexp_replace({hostport}, ':[0-9]+$', ''))"
    port_raw = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port = (f"(CASE WHEN {port_raw} IN ('', '80', '443') THEN '' "
            f"ELSE ':' || {port_raw} END)")
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    tail_raw = (f"regexp_replace(regexp_replace({rest}, '^[^/?#]+', ''), "
                f"'#.*$', '')")
    tail = (f"(CASE WHEN {tail_raw} = '' THEN '/' "
            f"WHEN starts_with({tail_raw}, '?') THEN '/' || {tail_raw} "
            f"ELSE {tail_raw} END)")
    return (f"(CASE WHEN {expr} IS NULL THEN NULL "
            f"ELSE {rev} || {port} || ')' || {tail} END)")
