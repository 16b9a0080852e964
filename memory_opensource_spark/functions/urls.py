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
