"""Adversarial sweep 18 — hostile inputs against the r15/r16-new code
(CDX capture index, recrawl scheduling, sitemap recursion, SFT render,
DSIR, preference pairs, mixture sampling).  The chat ROWS-frame finding
is pinned in tests/test_chat.py."""

from pyspark.sql import functions as F


def test_cdx_revisits_null_ts_capture(spark):
    """A capture with a NULL ts (malformed record) sorts first; its
    successor must NOT also read as a first capture (lag(ts)-based
    detection double-flagged it — sweep 18)."""
    from memory_opensource_spark.plans.crawl import cdx_revisits
    rows = [("k", None, "d1"), ("k", 2.0, "d1"), ("k", 3.0, "d2")]
    caps = spark.createDataFrame(rows, "urlkey string, ts double, digest string")
    out = {(r["ts"], ): r for r in cdx_revisits(caps).collect()}
    flags = sorted((r["ts"] is None, r["first_capture"], r["revisit"])
                   for r in cdx_revisits(caps).collect())
    # exactly ONE first_capture in the group, and the NULL-ts row is it
    assert flags == [(False, 0, 0), (False, 0, 1), (True, 1, 0)]


def test_cdx_revisits_null_digest_still_guarded(spark):
    """The r15 finding stays fixed: a failed fetch (NULL digest) does
    not make its successor a first capture, nor a revisit."""
    from memory_opensource_spark.plans.crawl import cdx_revisits
    rows = [("k", 1.0, "d1"), ("k", 2.0, None), ("k", 3.0, "d1")]
    caps = spark.createDataFrame(rows, "urlkey string, ts double, digest string")
    out = {r["ts"]: r for r in cdx_revisits(caps).collect()}
    assert out[1.0]["first_capture"] == 1
    assert out[2.0]["first_capture"] == 0
    assert out[3.0]["first_capture"] == 0
    # d1 after NULL is not a revisit (previous capture's digest is NULL)
    assert out[3.0]["revisit"] == 0


def test_sitemap_expand_uncanonical_fetch_urls(spark):
    """A child sitemap stored under an uncanonical fetch URL (default
    port / fragment) must still expand — sweep 18: the fetch-table keys
    are canonicalized before the equi-join."""
    from memory_opensource_spark.plans.crawl import sitemap_expand
    seeds = spark.createDataFrame([("https://a.example/idx.xml",)],
                                  "url string")
    sitemaps = spark.createDataFrame(
        [("https://a.example/idx.xml",
          "<sitemapindex><sitemap><loc>https://a.example/child.xml</loc>"
          "</sitemap></sitemapindex>"),
         # stored under :443 + fragment — canonically the child loc above
         ("https://a.example:443/child.xml#frag",
          "<urlset><url><loc>https://a.example/page1</loc></url></urlset>")],
        "url string, body string")
    out = sitemap_expand(seeds, sitemaps, rounds=3).collect()
    urls = {r["url"]: r["level"] for r in out}
    assert urls == {"https://a.example/page1": 2}


def test_sitemap_expand_duplicate_canonical_bodies_deterministic(spark):
    """Two raw fetch URLs collapsing to one canonical key: the MIN body
    wins (deterministic), and the join does not fan out."""
    from memory_opensource_spark.plans.crawl import sitemap_expand
    seeds = spark.createDataFrame([("https://a.example/m.xml",)],
                                  "url string")
    sitemaps = spark.createDataFrame(
        [("https://a.example/m.xml",
          "<urlset><url><loc>https://a.example/A</loc></url></urlset>"),
         ("https://a.example:443/m.xml",
          "<urlset><url><loc>https://a.example/B</loc></url></urlset>")],
        "url string, body string")
    out = sorted(r["url"] for r in
                 sitemap_expand(seeds, sitemaps, rounds=2).collect())
    # min(body) sorts '<urlset><url><loc>https://a.example/A...' first
    assert out == ["https://a.example/A"]


def test_preference_null_scores_excluded(spark):
    """NULL-scored responses must not be selected as 'rejected' (Spark
    min-struct sorts NULL first; DuckDB ASC sorts it last — sweep 18
    excludes them in both engines)."""
    from memory_opensource_spark.operators.preference import (
        build_preference_pairs)
    rows = [(1, "a", 0.9, 10), (1, "b", 0.2, 11), (1, "u", None, 12)]
    df = spark.createDataFrame(
        rows, "prompt_id long, response string, score double, response_id long")
    out = build_preference_pairs(df).collect()
    assert len(out) == 1
    assert (out[0]["chosen"], out[0]["rejected"]) == ("a", "b")


def test_mixture_zero_budget_empty(spark):
    from memory_opensource_spark.operators.sampling import (
        sample_mixture_temperature)
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "doc_id long, source string")
    assert sample_mixture_temperature(df, "source", budget=0).count() == 0


def test_hard_negatives_arg_guards(spark):
    import pytest
    from memory_opensource_spark.operators.similarity import (
        mine_hard_negatives)
    df = spark.createDataFrame([(1, [1.0], 0)],
                               "vec_id long, embedding array<double>, label int")
    with pytest.raises(ValueError):
        mine_hard_negatives(df, df, k=0)
    with pytest.raises(ValueError):
        mine_hard_negatives(df, df, k=1, overfetch=-1)
