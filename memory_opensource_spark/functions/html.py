"""HTML -> text extraction for crawl pipelines (round-10).

The stage between WARC "response" records (sources/warc.py) and every
text-side operator this engine ships: strip markup, keep the prose.
Reference analog: none (LLM-data-pipeline family) — this is the
boilerplate-light extraction step CCNet/RefinedWeb run before quality
filtering (a deliberately REGEX-scoPED reading of it: tag/script/comment
removal + entity decode + whitespace normalization, NOT a DOM parser or
readability scorer — those need semantics a SQL twin cannot pin).

``html_to_text`` is a PURE Column expression (a regexp_replace chain —
whole-stage codegen, zero shuffle, no UDF) with the documented rules:

1. ``<script>``/``<style>``/``<noscript>`` elements removed WITH their
   contents (case-insensitive, dotall, non-greedy)
2. HTML comments removed
3. block-level closers/breaks (``<br>``, ``</p>``, ``</div>``,
   ``</h1..6>``, ``</li>``, ``</tr>``, ``</title>``) become newlines, all
   other tags a space
4. the five XML entities + ``&nbsp;`` and numeric ``&#NN;`` for them decode
   (ampersand LAST, so ``&amp;lt;`` decodes to the literal ``&lt;``)
5. horizontal whitespace collapses to one space, 3+ newlines to two,
   result trimmed

``html_to_text_sql`` is the DuckDB twin (same regexes, ``'g'`` flag —
DuckDB's regexp_replace is first-match by default where Spark's is
global), kept in the same module so the two cannot drift; randomized
cross-engine parity is test-pinned like functions/urls.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DROP_BLOCKS = r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1\s*>"
_COMMENTS = r"(?s)<!--.*?-->"
_BLOCK_BREAKS = r"(?i)<(br\s*/?|/p|/div|/h[1-6]|/li|/tr|/title)\s*>"
_ANY_TAG = r"(?s)<[^>]*>"
_ENTITIES = [("&lt;", "<"), ("&#60;", "<"), ("&gt;", ">"), ("&#62;", ">"),
             ("&quot;", '"'), ("&#34;", '"'), ("&#39;", "'"),
             ("&nbsp;", " "), ("&#160;", " "),
             ("&amp;", "&"), ("&#38;", "&")]
# \x0B (vertical tab) is included because the engines DISAGREE on it
# downstream: Java's \s matches VT, RE2's \s does not — normalizing it to
# a space here keeps the later \s-based legs (_NL_RUNS, the final trim)
# engine-identical.
_HSPACE = "[ \\t\\f\\r\\x0B]+"
_NL_RUNS = r"\n\s*\n(\s*\n)+"


# anchor sentinels for the link-marked variant (functions/boilerplate.py
# measures per-line link density from them): non-printing, never produced
# by the extraction itself, stripped by the consumer
LINK_OPEN = "\x01"
LINK_CLOSE = "\x02"
_A_OPEN = r"(?is)<a\b[^>]*>"
_A_CLOSE = r"(?is)</a\s*>"


def html_to_text(html: Column, mark_links: bool = False) -> Column:
    """The documented extraction of ``html`` (module docstring rules).

    ``mark_links=True`` additionally wraps anchor TEXT in the
    LINK_OPEN/LINK_CLOSE sentinels before tags are stripped — the input
    line-level boilerplate pruning needs to score link density
    (functions/boilerplate.py strips the sentinels after scoring).  The
    sentinels are not whitespace, so the normalization legs leave them
    intact."""
    x = F.regexp_replace(html, _DROP_BLOCKS, " ")
    x = F.regexp_replace(x, _COMMENTS, " ")
    x = F.regexp_replace(x, _BLOCK_BREAKS, "\n")
    if mark_links:
        # space-padded like any other tag so that stripping the sentinels
        # reproduces the unmarked output byte-for-byte (test-pinned)
        x = F.regexp_replace(x, _A_OPEN, " " + LINK_OPEN)
        x = F.regexp_replace(x, _A_CLOSE, LINK_CLOSE + " ")
    x = F.regexp_replace(x, _ANY_TAG, " ")
    for ent, ch in _ENTITIES:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    x = F.regexp_replace(x, _HSPACE, " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, _NL_RUNS, "\n\n")
    # trim ALL whitespace (plain trim strips spaces only, in both engines)
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def _q(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal: quotes
    double, backslashes pass through UNCHANGED (DuckDB's standard
    single-quoted strings do no escape processing — doubling them would
    hand RE2 literal-backslash character classes).

    RE2 also rejects Java's ``\\1`` backreference, so the DuckDB twin of
    _DROP_BLOCKS expands the alternation into per-element patterns
    instead (equivalent: the three element names cannot close each
    other's non-greedy match)."""
    return pattern.replace("'", "''")


def html_to_text_sql(expr: str, mark_links: bool = False) -> str:
    """The DuckDB twin of :func:`html_to_text` over SQL expression
    ``expr`` — same rules; block-element removal expands the Java
    backreference into per-element patterns (RE2 has no backreferences),
    which is equivalent because the names cannot nest across each other
    in the non-greedy match."""
    x = expr
    for el in ("script", "style", "noscript"):
        x = (f"regexp_replace({x}, "
             f"'(?is)<{el}\\b[^>]*>.*?</{el}\\s*>', ' ', 'g')")
    x = f"regexp_replace({x}, '{_q(_COMMENTS)}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(_BLOCK_BREAKS)}', chr(10), 'g')"
    if mark_links:
        x = f"regexp_replace({x}, '{_q(_A_OPEN)}', ' ' || chr(1), 'g')"
        x = f"regexp_replace({x}, '{_q(_A_CLOSE)}', chr(2) || ' ', 'g')"
    x = f"regexp_replace({x}, '{_q(_ANY_TAG)}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        x = f"replace({x}, '{ent}', '{lit}')"
    x = f"regexp_replace({x}, '{_q(_HSPACE)}', ' ', 'g')"
    x = f"regexp_replace({x}, ' ?\\n ?', chr(10), 'g')"
    x = (f"regexp_replace({x}, '{_q(_NL_RUNS)}', "
         f"chr(10) || chr(10), 'g')")
    return f"regexp_replace({x}, '^\\s+|\\s+$', '', 'g')"


# --- link extraction (r13) -------------------------------------------------

#: href attribute values in anchor tags: single/double-quoted forms.
#: Capture group 2 is the value.  Case-insensitive, unquoted hrefs are
#: out of scope (rare in the wild, ambiguous to delimit).
_HREF = "(?is)<a\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')"


def extract_links(html: Column, base_url: Column) -> Column:
    """``array<string>`` of outbound ABSOLUTE links of ``html`` — the
    crawl-frontier / link-graph primitive (r13).  Resolution rules
    (documented, deterministic, SQL-mirrorable — NOT a full RFC 3986
    resolver):

    - absolute ``http(s)://...`` hrefs pass through;
    - protocol-relative ``//host/path`` takes ``base_url``'s scheme;
    - root-relative ``/path`` takes ``base_url``'s scheme://host;
    - everything else (relative paths, ``mailto:``, ``javascript:``,
      bare fragments) is DROPPED — resolving them needs path semantics
      the oracle cannot pin byte-for-byte.

    Pure Column expression (regexp_extract_all + transform/filter) —
    scan-side, zero UDF.  NULL html -> empty array."""
    hrefs = F.regexp_extract_all(F.coalesce(html, F.lit("")),
                                 F.lit(_HREF), 1)
    # strip the quoting kept by group 1 (Spark's extract_all takes ONE
    # group index; group 1 includes the quotes)
    vals = F.transform(hrefs, lambda h: F.regexp_replace(
        h, "^[\"']|[\"']$", ""))
    scheme = F.regexp_extract(base_url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://",
                              1)
    origin = F.regexp_extract(base_url,
                              r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    resolved = F.transform(vals, lambda v: F.when(
        v.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), v)
        .when(v.rlike("^//"), F.concat(scheme, F.lit(":"), v))
        .when(v.rlike("^/"), F.concat(origin, v))
        .otherwise(F.lit(None)))
    return F.filter(resolved,
                    lambda v: v.isNotNull() & v.rlike("(?i)^https?://"))


def extract_links_sql(html_expr: str, base_expr: str) -> str:
    """DuckDB twin of :func:`extract_links` — same href regex, same
    resolution rules, same drop set."""
    href_rx = _q(_HREF)
    hrefs = f"regexp_extract_all({html_expr}, '{href_rx}', 1)"
    vals = (f"list_transform({hrefs}, h -> "
            f"regexp_replace(regexp_replace(h, '^[\"'']', ''), "
            f"'[\"'']$', ''))")
    scheme = (f"regexp_extract({base_expr}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)")
    origin = (f"regexp_extract({base_expr}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)")
    resolved = (f"list_transform({vals}, v -> CASE "
                f"WHEN regexp_matches(v, '^[a-zA-Z][a-zA-Z0-9+.-]*://') "
                f"THEN v "
                f"WHEN regexp_matches(v, '^//') THEN {scheme} || ':' || v "
                f"WHEN regexp_matches(v, '^/') THEN {origin} || v "
                f"ELSE NULL END)")
    return (f"list_filter({resolved}, v -> v IS NOT NULL AND "
            f"regexp_matches(v, '(?i)^https?://'))")


# --- anchor-text link extraction (r14) ---------------------------------------

#: whole <a ...>...</a> elements (non-greedy inner; nested anchors are
#: invalid HTML and split at the first close — documented scope).  The
#: inner match is CAPPED at 1000 chars: an unbounded `.*?` backtracks
#: quadratically on hostile pages stuffed with unclosed <a> tags (the
#: CMap-bomb adversarial class, ~30x slower on a 3k-anchor page), and
#: RE2 (the DuckDB twin) has no lookahead to express "until </a>"
#: linearly — the bounded repeat is the one form both engines run fast.
#: Anchors whose inner HTML exceeds the cap are skipped (pathological;
#: anchor TEXT that long carries no crawl-priority signal).
_A_ELEM = ("(?is)<a\\b[^>]*?href\\s*=\\s*(\"[^\"]*\"|'[^']*')"
           "[^>]*>(.{0,1000}?)</a\\s*>")


def extract_links_anchors(html: Column, base_url: Column) -> Column:
    """``array<struct<url string, anchor string>>`` — outbound links
    WITH their anchor text (r14): the crawl-priority / focused-crawl
    signal (anchor words describe the TARGET page; OPIC/focused
    crawlers and anchor-text indexes both key on it).  The href resolves
    by :func:`extract_links`' documented rules (absolute / protocol-
    relative / root-relative; everything else dropped); the anchor is
    the element's inner HTML with tags stripped and whitespace
    collapsed.  Pure Column expression, scan-side, zero UDF; NULL html
    -> empty array."""
    elems = F.regexp_extract_all(F.coalesce(html, F.lit("")),
                                 F.lit(_A_ELEM), 0)
    scheme = F.regexp_extract(base_url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://",
                              1)
    origin = F.regexp_extract(base_url,
                              r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)

    def one(el):
        raw = F.regexp_replace(
            F.regexp_extract(el, _HREF, 1), "^[\"']|[\"']$", "")
        url = (F.when(raw.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), raw)
               .when(raw.rlike("^//"), F.concat(scheme, F.lit(":"), raw))
               .when(raw.rlike("^/"), F.concat(origin, raw))
               .otherwise(F.lit(None)))
        inner = F.regexp_extract(el, _A_ELEM, 2)
        anchor = F.trim(F.regexp_replace(
            F.regexp_replace(inner, _ANY_TAG, " "), r"\s+", " "))
        return F.struct(url.alias("url"), anchor.alias("anchor"))

    pairs = F.transform(elems, one)
    return F.filter(pairs, lambda p: p["url"].isNotNull()
                    & p["url"].rlike("(?i)^https?://"))


def extract_links_anchors_sql(html_expr: str, base_expr: str) -> str:
    """DuckDB twin of :func:`extract_links_anchors` — same regexes."""
    elem_rx = _q(_A_ELEM)
    href_rx = _q(_HREF)
    any_tag = _q(_ANY_TAG)
    elems = f"regexp_extract_all(coalesce({html_expr}, ''), '{elem_rx}', 0)"
    scheme = (f"regexp_extract({base_expr}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)")
    origin = (f"regexp_extract({base_expr}, "
              f"'^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1)")
    raw = (f"regexp_replace(regexp_replace("
           f"regexp_extract(el, '{href_rx}', 1), '^[\"'']', ''), "
           f"'[\"'']$', '')")
    url = (f"CASE WHEN regexp_matches({raw}, "
           f"'^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN {raw} "
           f"WHEN regexp_matches({raw}, '^//') THEN {scheme} || ':' || {raw} "
           f"WHEN regexp_matches({raw}, '^/') THEN {origin} || {raw} "
           f"ELSE NULL END")
    anchor = (f"trim(regexp_replace(regexp_replace("
              f"regexp_extract(el, '{elem_rx}', 2), '{any_tag}', ' ', 'g'),"
              f" '\\s+', ' ', 'g'))")
    pairs = (f"list_transform({elems}, el -> "
             f"{{'url': {url}, 'anchor': {anchor}}})")
    return (f"list_filter({pairs}, p -> p['url'] IS NOT NULL AND "
            f"regexp_matches(p['url'], '(?i)^https?://'))")
