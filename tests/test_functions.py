"""Unit tests for column-level expression builders."""

import math

from pyspark.sql import functions as F

from memory_opensource_spark.functions import decay, ids, text, vector


def test_point_id_matches_python_twin(spark):
    df = spark.createDataFrame([("m1_0",), ("m42_3",), ("abc",)], ["chunk_id"])
    rows = df.select("chunk_id", ids.point_id(F.col("chunk_id")).alias("pid")).collect()
    for r in rows:
        assert r.pid == ids.point_id_py(r.chunk_id), r.chunk_id


def test_chunk_id_algebra(spark):
    df = spark.createDataFrame([("m1_0",), ("m1_12",), ("plain",)], ["cid"])
    out = df.select(
        ids.strip_chunk_suffix(F.col("cid")).alias("stripped"),
        ids.base_id(F.col("cid")).alias("base"),
    ).collect()
    assert [r.stripped for r in out] == ["m1", "m1", "plain"]
    assert [r.base for r in out] == ["m1", "m1", "plain"]


def test_cosine_and_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0], [4.0, 3.0])], ["a", "b"])
    row = df.select(
        vector.cosine(F.col("a"), F.col("b")).alias("cos"),
        vector.norm(vector.l2_normalize(F.col("a"))).alias("unit_norm"),
    ).first()
    assert abs(row.cos - 24.0 / 25.0) < 1e-12
    assert abs(row.unit_norm - 1.0) < 1e-12


def test_quantize_int8_roundtrip(spark):
    df = spark.createDataFrame([([0.5, -1.5, 1.0],)], ["v"])
    s = vector.int8_scale(F.col("v"))
    row = df.select(
        s.alias("scale"),
        vector.quantize_int8(F.col("v")).alias("q"),
        vector.dequantize_int8(vector.quantize_int8(F.col("v"), s), s).alias("dq"),
    ).first()
    # per-vector scaling: max_abs=1.5 -> scale=127/1.5; the max element maps to ±127
    assert abs(row.scale - 127.0 / 1.5) < 1e-12
    assert row.q == [42, -127, 85]
    assert abs(row.dq[0] - 42 / (127.0 / 1.5)) < 1e-9
    assert abs(row.dq[1] - -1.5) < 1e-2


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("The quick  brown fox",)], ["t"])
    row = df.select(
        text.token_count(F.col("t")).alias("n"),
        text.avg_token_len(F.col("t")).alias("avg"),
    ).first()
    assert row.n == 4
    assert abs(row.avg - (3 + 5 + 5 + 3) / 4.0) < 1e-12


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [("the cat is in the house",), ("der hund ist nicht das problem",),
         ("xyzzy qwerty",)],
        ["t"],
    )
    out = [r[0] for r in df.select(text.lang_id(F.col("t"))).collect()]
    assert out == ["en", "de", "und"]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["t"])
    out = [r[0] for r in df.select(text.shingles(F.col("t"))).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]  # short doc -> single truncated shingle


def test_decay_factor_half_life(spark):
    from memory_opensource_spark.functions import decay

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-31 00:00:00")], ["prev", "now"]
    ).select(F.to_timestamp("prev").alias("prev"), F.to_timestamp("now").alias("now"))
    row = df.select(decay.decay_factor(F.col("prev"), F.col("now"), 30.0).alias("d")).first()
    assert abs(row.d - 0.5) < 1e-12


def test_decay_factor_clamps_negative_elapsed(spark):
    """Reference _apply_time_decay clamps dt_days = max(0, ...): a late row
    whose now_ts PRECEDES prev_ts must mean no decay (factor 1.0), never
    0.5^negative > 1 inflating the counter."""
    df = spark.createDataFrame(
        [("2024-02-01 00:00:00", "2024-01-01 00:00:00")], "prev string, now string"
    ).select(F.col("prev").cast("timestamp"), F.col("now").cast("timestamp"))
    row = df.select(decay.decay_factor(F.col("prev"), F.col("now"), 30.0).alias("d")).first()
    assert row.d == 1.0


def test_fused_confidence_clips_every_signal_and_product(spark):
    """Reference _fused_confidence clips EVERY signal and the final product
    to [0,1] (services/memory_management.py:3266-3289): out-of-range inputs
    (tier > 2, engagement > 1, conf > 1, negative latency) must not push the
    fused confidence past 1."""
    df = spark.range(1)
    out = df.select(decay.fused_confidence(
        sim=F.lit(5.0),          # clips to 1
        conf=F.lit(3.0),         # clips to 1
        latency_ms=F.lit(-100.0),  # exp(+0.2) > 1 -> clips to 1
        tier=F.lit(4.0),         # tier/2 = 2 -> clips to 1
        engagement=F.lit(7.0),   # clips to 1
        tokens=F.lit(10_000.0),  # min(...,1) already 1
    ).alias("c")).first()
    assert out.c == 1.0


def test_int8_scale_saturates_tiny_vectors(spark):
    """Reference quantize_int8: scale = 127/max_abs for ANY nonzero max_abs
    (``or 1e-8`` substitutes exact zero only) — a tiny-magnitude vector
    saturates to +-127, preserving direction; a 1e-8 FLOOR would quantize it
    to all-zeros."""
    df = spark.createDataFrame([([1e-12, -1e-12],), ([0.0, 0.0],)],
                               "embedding array<double>")
    out = df.select(
        vector.quantize_int8(F.col("embedding")).alias("q")).collect()
    assert list(out[0].q) == [127, -127]   # saturated, not zeroed
    assert list(out[1].q) == [0, 0]        # zero vector stays zero


def test_bigram_lm_scores_in_domain_text_lower(spark):
    from memory_opensource_spark.functions import lm

    clean = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (10, "the quick dog runs over the brown fox")],
        "doc_id int, text string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox"),          # in-domain: seen bigrams
         (2, "zx qv wk jj"),                  # gibberish: all unseen
         (3, "one"),                          # single token: no bigrams
         (4, "")],                            # empty
        "doc_id int, text string")
    uni, bi, vocab = lm.train_bigram_lm(clean)
    got = {r.id: r for r in lm.nll_score(corpus, uni, bi, vocab).collect()}
    assert set(got) == {1, 2}           # <2-token docs have no score rows
    assert got[1].avg_nll < got[2].avg_nll
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 3


def test_quality_buckets_are_equal_frequency(spark):
    from memory_opensource_spark.functions import lm
    from pyspark.sql import functions as F

    scored = spark.createDataFrame(
        [(i, 10, float(i) / 10) for i in range(9)],
        "id int, n_bigrams int, avg_nll double")
    out = lm.quality_buckets(scored, n_buckets=3)
    counts = {r.bucket: r.n for r in
              out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 3, 2: 3, 3: 3}
    # bucket 1 holds the lowest-nll (highest-quality) ids
    b1 = {r.id for r in out.filter(F.col("bucket") == 1).collect()}
    assert b1 == {0, 1, 2}


def test_quality_buckets_exact_ntile_parity(spark):
    """The distributed range-bucket + offset form must reproduce EXACT
    ntile(n) over (order by nll, id) semantics — including score ties that
    span tile boundaries, N not divisible by n, and N < n (VERDICT r6: the
    global-window form was the one 100x scale-killer)."""
    import random

    from pyspark.sql import Window
    from memory_opensource_spark.functions import lm
    from pyspark.sql import functions as F

    rnd = random.Random(7)
    rows = [(i, 10, float(rnd.choice([0.1, 0.2, 0.2, 0.3, 0.55])))
            for i in range(101)]                    # heavy ties, 101 % 3 != 0
    for n_rows, n_buckets in [(101, 3), (9, 4), (2, 5)]:
        scored = spark.createDataFrame(
            rows[:n_rows], "id int, n_bigrams int, avg_nll double")
        got = {r.id: r.bucket
               for r in lm.quality_buckets(scored, n_buckets).collect()}
        w = Window.orderBy(F.col("avg_nll").asc(), F.col("id").asc())
        want = {r.id: r.b for r in scored.withColumn(
            "b", F.ntile(n_buckets).over(w)).collect()}
        assert got == want, (n_rows, n_buckets)


def test_quality_buckets_plan_has_no_global_window(spark):
    """Scale pin: the returned plan must contain no single-partition exchange
    (the window is partitioned by the range bucket; ranks come from broadcast
    offsets)."""
    from memory_opensource_spark.functions import lm

    scored = spark.createDataFrame(
        [(i, 10, float(i % 13) / 10) for i in range(200)],
        "id int, n_bigrams int, avg_nll double")
    out = lm.quality_buckets(scored, n_buckets=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan  # partitioned window is still how ranks are local


def test_quality_buckets_null_scores_rank_first_not_dropped(spark):
    """Review r7: a NULL score made _rb NULL and the equi-join silently
    dropped the row while n_rows still counted it — every tier mis-sized and
    a document lost.  The window twin (order by nll asc) ranks nulls FIRST,
    so NULL scores must survive into bucket 1."""
    from pyspark.sql import Window
    from memory_opensource_spark.functions import lm

    rows = [(0, 10, None), (1, 10, 0.1), (2, 10, 0.2), (3, 10, 0.3),
            (4, 10, 0.4), (5, 10, 0.5), (6, 10, None), (7, 10, 0.7),
            (8, 10, 0.8)]
    scored = spark.createDataFrame(
        rows, "id int, n_bigrams int, avg_nll double")
    out = lm.quality_buckets(scored, n_buckets=3)
    got = {r.id: r.bucket for r in out.collect()}
    assert len(got) == len(rows)          # nothing dropped
    w = Window.orderBy(F.col("avg_nll").asc(), F.col("id").asc())
    want = {r.id: r.b for r in scored.withColumn(
        "b", F.ntile(3).over(w)).collect()}
    assert got == want
    assert got[0] == 1 and got[6] == 1    # nulls-first -> top tier


def test_quality_buckets_constant_scores_split_by_id_boundaries(spark):
    """r8 (VERDICT r7 watch): a constant-score corpus collapsed every row
    into ONE range bucket — one window task sorting the whole corpus.  With
    composite (score, id) boundaries the tied value splits by id percentiles
    while keeping exact ntile(order by nll, id) semantics."""
    from pyspark.sql import Window
    from memory_opensource_spark.functions import lm
    from pyspark.sql import functions as F

    for rows in (
        [(i, 10, 0.5) for i in range(120)],                 # fully constant
        [(i, 10, 0.5 if i < 110 else float(i)) for i in range(120)],  # 90%+
    ):
        scored = spark.createDataFrame(
            rows, "id int, n_bigrams int, avg_nll double")
        out = lm.quality_buckets(scored, n_buckets=3,
                                 rows_per_bucket=10)        # force many buckets
        got = {r.id: r.bucket for r in out.collect()}
        w = Window.orderBy(F.col("avg_nll").asc(), F.col("id").asc())
        want = {r.id: r.b for r in scored.withColumn(
            "b", F.ntile(3).over(w)).collect()}
        assert got == want


def test_gopher_flags_rule_edges(spark):
    """Gopher A1.1 rules (functions/text.gopher_flags): each rule must trip
    on its crafted violator and the clean doc must pass every threshold."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.text import gopher_flags

    clean = " ".join(
        ["the", "be", "to", "of", "and"] + [f"word{i}" for i in range(60)])
    rows = [
        (1, clean),                                       # passes everything
        (2, "the of short doc"),                          # word_count < 50
        (3, " ".join(["the", "be"] + ["a"] * 60)),        # mean len < 3
        (4, clean + " " + "#" * 1 + " #### ## # # # # # # # #"),  # symbols
        (5, "\n".join(["- bullet line"] * 10) + "\nthe be plain "
            + " ".join(f"w{i}" for i in range(50))),      # bullets > 0.9? 10/12
        (6, " ".join(["the", "be"] + ["123"] * 60)),      # alpha frac < 0.8
        (7, " ".join([f"word{i}" for i in range(60)])),   # no stop words
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    flags = gopher_flags(F.col("text"))
    out = {r.doc_id: r for r in
           df.select("doc_id", *[c.alias(k) for k, c in flags.items()])
           .collect()}
    assert out[1].gopher_pass == 1
    assert out[2].gopher_pass == 0 and out[2].word_count < 50
    assert out[3].gopher_pass == 0 and out[3].mean_word_len < 3.0
    assert out[4].gopher_pass == 0 and out[4].symbol_ratio > 0.1
    assert out[6].gopher_pass == 0 and out[6].alpha_word_frac < 0.8
    assert out[7].gopher_pass == 0 and out[7].stop_word_hits == 0
    # doc 5: 10 of 12 lines are bullets -> frac ~0.833 <= 0.9 so it PASSES
    # the bullet rule; push to 19/20 to trip it
    hot = "\n".join(["* b"] * 19) + "\nthe be " + " ".join(
        f"w{i}" for i in range(50))
    r = (spark.createDataFrame([(8, hot)], "doc_id int, text string")
         .select(*[c.alias(k) for k, c in
                   gopher_flags(F.col("text")).items()]).collect()[0])
    assert r.bullet_line_frac > 0.9 and r.gopher_pass == 0
    # ellipsis rule
    e = "\n".join(["trailing..."] * 5 + ["the be " + " ".join(
        f"w{i}" for i in range(50))])
    r = (spark.createDataFrame([(9, e)], "doc_id int, text string")
         .select(*[c.alias(k) for k, c in
                   gopher_flags(F.col("text")).items()]).collect()[0])
    assert r.ellipsis_line_frac > 0.3 and r.gopher_pass == 0


def test_gopher_repetition_flags_crafted(spark):
    """Repetition table edges: repeated lines trip the count AND char
    fractions; a dominating bigram trips top2_char_frac; clean doc passes."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.queries import QUERIES

    # route through the registered query's column algebra on a crafted frame
    from memory_opensource_spark.functions.text import dup_segment_fractions

    clean = " ".join(f"w{i}" for i in range(30))
    spam_lines = "\n".join(["same line here"] * 5 + [clean])
    spam_gram = " ".join(["ha ha"] * 20 + [clean])
    df = spark.createDataFrame(
        [(1, clean), (2, spam_lines), (3, spam_gram)],
        "doc_id int, text string")
    line_f = dup_segment_fractions(F.col("text"), "\n")
    out = {r.doc_id: r for r in df.select(
        "doc_id", line_f["dup_frac"].alias("dlf"),
        line_f["dup_char_frac"].alias("dlcf")).collect()}
    assert out[1].dlf == 0.0 and out[1].dlcf == 0.0
    assert out[2].dlf == round(4 / 6, 6)       # 4 of 6 lines are repeats
    # 4 repeated 14-char lines over ~180 total chars
    assert 0.25 < out[2].dlcf < 0.4
    # full registered query on a tiny parquet table
    import tempfile, os
    d = tempfile.mkdtemp()
    df.withColumn("source", F.lit("s")).write.mode("overwrite") \
      .parquet(os.path.join(d, "documents.parquet"))
    full = {r.doc_id: r for r in
            QUERIES["gopher_repetition_flags"](spark, d).collect()}
    assert full[1].repetition_pass == 1
    assert full[2].repetition_pass == 0 and full[2].dup_line_frac > 0.3
    assert full[3].repetition_pass == 0 and full[3].top2_char_frac > 0.2


def test_gopher_flags_null_text_is_deterministic(spark):
    """r9 (ADVICE): NULL text must coalesce to '' — without it
    size(split(NULL)) gives word_count -1 (legacy sizeOfNull) and NULL
    ratios, diverging from the DuckDB oracle's coalesce semantics."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.text import gopher_flags

    df = spark.createDataFrame([(1, None), (2, "")],
                               "doc_id int, text string")
    flags = gopher_flags(F.col("text"))
    out = {r.doc_id: r for r in
           df.select("doc_id", *[c.alias(k) for k, c in flags.items()])
           .collect()}
    for i in (1, 2):
        assert out[i].word_count == 0
        assert out[i].gopher_pass == 0
        # every ratio defined (not NULL), and null doc == empty doc
        for f in ("mean_word_len", "symbol_ratio", "bullet_line_frac",
                  "ellipsis_line_frac", "alpha_word_frac",
                  "stop_word_hits"):
            assert getattr(out[i], f) is not None, f
    d1, d2 = out[1].asDict(), out[2].asDict()
    d1.pop("doc_id"), d2.pop("doc_id")
    assert d1 == d2


def test_canonical_url_rules(spark):
    """r10 functions/urls.canonical_url: every documented rule on crafted
    cases, plus the DuckDB twin (canonical_url_sql) on the SAME inputs —
    the two formulations must agree byte-for-byte."""
    import duckdb

    from memory_opensource_spark.functions.urls import (canonical_url,
                                                        canonical_url_sql)

    cases = [
        # scheme/host case + www + default port + fragment
        ("HTTPS://WWW.Example.COM:443/A/b/#frag", "https://example.com/A/b"),
        ("http://Example.com:80/x", "http://example.com/x"),
        # non-default port kept
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        # tracking params dropped, survivors sorted, ? dropped when emptied
        ("https://e.com/p?utm_source=a&b=2&a=1", "https://e.com/p?a=1&b=2"),
        ("https://e.com/p?utm_campaign=x&gclid=1&fbclid=2&ref=h",
         "https://e.com/p"),
        # trailing slash (root path canonicalizes to empty)
        ("https://e.com/", "https://e.com"),
        ("https://e.com/a//", "https://e.com/a"),
        # empty query string / bare ?
        ("https://e.com/a?", "https://e.com/a"),
        # ref as a VALUE is not the ref PARAM
        ("https://e.com/a?xref=1&ref=2", "https://e.com/a?xref=1"),
        # r10 (ADVICE): scheme-less inputs pass through UNCHANGED — the
        # host/path split is ambiguous, so no '://host' mangling
        ("example.com/a", "example.com/a"),
        ("WWW.Example.com/A/#f", "WWW.Example.com/A/#f"),
        ("//example.com/proto-relative", "//example.com/proto-relative"),
        ("mailto:a@b.c", "mailto:a@b.c"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)

    con = duckdb.connect()
    for u, want in cases:
        got_sql = con.execute(
            f"WITH t(url) AS (VALUES (?)) "
            f"SELECT {canonical_url_sql('url')} FROM t", [u]).fetchone()[0]
        assert got_sql == want, (u, got_sql, want)

    # NULL stays NULL on the Spark side
    dfn = spark.createDataFrame([(1, None)], "i int, url string")
    assert dfn.select(canonical_url(F.col("url")).alias("c")) \
              .first().c is None


def test_canonical_url_random_cross_engine_parity(spark):
    """r10: 200 seeded random URLs assembled from adversarial components
    (mixed-case schemes/hosts, www, default + odd ports, empty/deep paths,
    trailing slashes, shuffled tracking + real params, fragments, empty
    segments) — Spark's Column form and DuckDB's SQL twin must agree
    byte-for-byte on every one (Java regex vs RE2 is the risk the fixed
    cases cannot cover)."""
    import random

    import duckdb

    from memory_opensource_spark.functions.urls import (canonical_url,
                                                        canonical_url_sql)

    rnd = random.Random(42)
    # "" exercises the r10 scheme-less passthrough (bare host, no '://');
    # "::/" yields the pathological '://host' form — both must agree
    # across engines too
    schemes = ["http://", "HTTP://", "https://", "HTTPS://", "ftp://",
               "", "://"]
    hosts = ["Example.com", "www.Example.com", "WWW.API.site.ORG",
             "localhost", "a-b.c-d.io"]
    ports = ["", ":80", ":443", ":8080", ":1"]
    paths = ["", "/", "/a", "/a/", "/a/b/c", "/a//b///", "/UPPER/Case"]
    params = ["id=3", "z=9", "a=1", "utm_source=x", "utm_campaign=Y",
              "gclid=abc", "fbclid=2", "ref=h", "xref=1", "b="]
    frags = ["", "#x", "#a/b?c=1"]
    urls = []
    for _ in range(200):
        q = rnd.sample(params, rnd.randint(0, 5))
        urls.append(
            rnd.choice(schemes) + rnd.choice(hosts)
            + rnd.choice(ports) + rnd.choice(paths)
            + ("?" + "&".join(q) if q else "")
            + rnd.choice(frags))
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i int, url string")
    got = {r.i: r.c for r in
           df.select("i", canonical_url(F.col("url")).alias("c")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    want = dict(con.execute(
        f"SELECT i, {canonical_url_sql('url')} FROM t").fetchall())
    bad = [(urls[i], got[i], want[i]) for i in range(200)
           if got[i] != want[i]]
    assert not bad, bad[:5]


def test_html_to_text_rules(spark):
    """r10 functions/html.html_to_text: every documented rule on crafted
    cases, plus the DuckDB twin on the same inputs."""
    import duckdb

    from memory_opensource_spark.functions.html import (html_to_text,
                                                        html_to_text_sql)

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<SCRIPT>var x = '<p>sneaky</p>';</SCRIPT>after", "after"),
        ("<style media='all'>p { x: 1 }</style>kept", "kept"),
        ("<noscript><img src=x></noscript>ok", "ok"),
        ("<!-- note -->a<!-- and\nmore -->b", "a b"),
        ("line1<br>line2<BR/>line3", "line1\nline2\nline3"),
        ("<p>a</p><div>b</div><h2>c</h2>", "a\nb\nc"),
        ("&lt;tag&gt; &amp; &quot;q&quot; &#39;s &nbsp;end",
         "<tag> & \"q\" 's end"),
        ("&amp;lt; stays entity-ish", "&lt; stays entity-ish"),
        ("a   b\t\tc", "a b c"),
        ("a</p>\n\n\n\n<p>b", "a\n\nb"),
        ("plain text no markup", "plain text no markup"),
        ("", ""),
        # r10 (ADVICE): vertical tab — Java's \s matches it, RE2's does
        # not; _HSPACE normalizes it to a space FIRST so the \s-based
        # legs stay engine-identical
        ("a\x0bb", "a b"),
        ("\x0b<p>edge</p>\x0b", "edge"),
        ("x</p>\x0b\n\x0b\n\x0b\n<p>y", "x\n\ny"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i int, h string")
    got = {r.i: r.t for r in
           df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)

    con = duckdb.connect()
    for h, want in cases:
        got_sql = con.execute(
            f"WITH t(h) AS (VALUES (?)) "
            f"SELECT {html_to_text_sql('h')} FROM t", [h]).fetchone()[0]
        assert got_sql == want, (h, got_sql, want)


def test_html_to_text_random_cross_engine_parity(spark):
    """r10: 150 seeded random HTML documents assembled from adversarial
    fragments (nested tags, script/style with angle brackets inside,
    comments, entities, attribute soup, stray '<', whitespace runs) —
    the Spark Column form and the DuckDB twin must agree byte-for-byte."""
    import random

    import duckdb

    from memory_opensource_spark.functions.html import (html_to_text,
                                                        html_to_text_sql)

    rnd = random.Random(9)
    frags = [
        "<p>alpha beta</p>", "<div class='x y'>gamma</div>",
        "<SCRIPT type=text/js>if (a < b) { go('<i>') }</SCRIPT>",
        "<style>h1 > p { k: v }</style>", "<noscript>no js</noscript>",
        "<!-- c1 --><!--c2\nc3-->", "<br>", "<BR />", "<h3>head</h3>",
        "&amp; &lt;x&gt; &nbsp;", "plain words here",
        "  \t spaced \t ", "\n\n\n", "\x0b", "a\x0b\nb",
        "<li>item</li>", "<tr>row</tr>",
        "<a href='u?a=1&amp;b=2'>link</a>", "<img src=x>",
        "<title>t</title>",
    ]
    docs = ["".join(rnd.choice(frags) for _ in range(rnd.randint(1, 12)))
            for _ in range(150)]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(docs)],
                               "i int, h string")
    got = {r.i: r.t for r in
           df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    want = dict(con.execute(
        f"SELECT i, {html_to_text_sql('h')} FROM t").fetchall())
    bad = [(docs[i], got[i], want[i]) for i in range(150)
           if got[i] != want[i]]
    assert not bad, bad[:3]


def test_boilerplate_keep_rules(spark):
    """r11 functions/boilerplate: every documented rule R1-R7 on crafted
    lines, Spark and the DuckDB twin agreeing byte-for-byte on the pruned
    document."""
    import duckdb

    from memory_opensource_spark.functions.boilerplate import (
        prune_lines, prune_lines_sql)

    KEEP = [
        "This is a real paragraph with enough words to keep it here.",
        "Real sentences survive because they carry the function words.",
        "Ok.",                           # short BUT terminal punctuation
        "copyright is a legal concept that the law protects for authors.",
        "- a list item long enough to keep with the usual words present.",
        "IMPORTANT NOTICE ABOUT THE UPCOMING CHANGES TO THE SERVICE WE "
        "ARE ROLLING OUT",               # >10 words: R2 does not fire
    ]
    DROP = [
        "Home",                          # R1
        "About Us",                      # R1
        "CONTACT US NOW",                # R2
        "123",                           # R3 numeric only
        "2024/01/01 12:30",              # R3
        "42 likes",                      # R3 counter
        "- item",                        # R4
        "* nav two",                     # R4
        "wordone wordtwo wordthree wordfour wordfive wordsix",   # R5
        "© 2024 Example Corp",           # R7
        "Copyright 2024 Example Corp All Rights",                # R7
    ]
    doc = "\n".join(KEEP + DROP)
    df = spark.createDataFrame([(doc,)], "t string")
    got = df.select(prune_lines(F.col("t")).alias("p")).first().p
    assert got == "\n".join(KEEP), got
    con = duckdb.connect()
    want = con.execute(
        f"WITH t(t) AS (VALUES (?)) SELECT {prune_lines_sql('t')} FROM t",
        [doc]).fetchone()[0]
    assert want == got

    # R6 link density via the marked form: a nav line of anchors drops,
    # a prose line with one short link survives; sentinels stripped
    marked = ("\x01Home\x02 \x01About\x02 \x01Contact\x02\n"
              "See \x01this page\x02 for the rest of the long prose text.")
    df2 = spark.createDataFrame([(marked,)], "t string")
    got2 = df2.select(prune_lines(F.col("t")).alias("p")).first().p
    assert got2 == "See this page for the rest of the long prose text."
    want2 = con.execute(
        f"WITH t(t) AS (VALUES (?)) SELECT {prune_lines_sql('t')} FROM t",
        [marked]).fetchone()[0]
    assert want2 == got2

    # paragraph breaks survive; runs created by pruning collapse; NULL/''
    doc3 = ("First real paragraph with the needed words in it.\n\nHome\n"
            "About\n\nSecond real paragraph is also kept with more words.")
    got3 = spark.createDataFrame([(doc3,)], "t string") \
        .select(prune_lines(F.col("t")).alias("p")).first().p
    assert got3 == ("First real paragraph with the needed words in it.\n\n"
                    "Second real paragraph is also kept with more words.")
    want3 = con.execute(
        f"WITH t(t) AS (VALUES (?)) SELECT {prune_lines_sql('t')} FROM t",
        [doc3]).fetchone()[0]
    assert want3 == got3
    dfe = spark.createDataFrame([(1, None), (2, "Home")], "i int, t string")
    rows = {r.i: r.p for r in
            dfe.select("i", prune_lines(F.col("t")).alias("p")).collect()}
    assert rows[1] is None and rows[2] == ""
    assert con.execute(
        f"WITH t(t) AS (VALUES (CAST(NULL AS VARCHAR))) "
        f"SELECT {prune_lines_sql('t')} FROM t").fetchone()[0] is None
    assert con.execute(
        f"WITH t(t) AS (VALUES ('Home')) "
        f"SELECT {prune_lines_sql('t')} FROM t").fetchone()[0] == ""


def test_boilerplate_random_cross_engine_parity(spark):
    """r11: 150 seeded random documents assembled from adversarial lines
    (marked anchors, unmatched sentinels, unicode bullets, counters,
    all-caps, numeric soup, real prose, empty runs) — Spark and the
    DuckDB twin must agree byte-for-byte."""
    import random

    import duckdb

    from memory_opensource_spark.functions.boilerplate import (
        prune_lines, prune_lines_sql)

    rnd = random.Random(17)
    lines = [
        "Plain prose with the usual words that are kept in the output.",
        "Home", "ABOUT US", "42 likes", "1,234", "- item",
        "\x01Home\x02 \x01About\x02", "stray \x01 open sentinel",
        "stray close \x02 here", "© 2024 Corp", "(c) 2024 site",
        "The \x01anchor\x02 sits inside a long enough prose sentence here.",
        "• bullet", "‣ b", "> quoted", "", "   ",
        "copyright notice text that runs long enough to not be a footer "
        "because it has many words.",
        "MIXED case LINE with SOME upper words in a longer sentence here.",
        "9999 views", "tokens without stop hits zzz qqq xxx yyy www vvv",
        "Ok.", "Done!", "No?", "x",
    ]
    docs = ["\n".join(rnd.choice(lines)
                      for _ in range(rnd.randint(1, 15)))
            for _ in range(150)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "i int, t string")
    got = {r.i: r.p for r in
           df.select("i", prune_lines(F.col("t")).alias("p")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, t VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    want = dict(con.execute(
        f"SELECT i, {prune_lines_sql('t')} FROM t").fetchall())
    bad = [(docs[i], got[i], want[i]) for i in range(150)
           if got[i] != want[i]]
    assert not bad, bad[:3]


def test_html_marked_strip_equals_unmarked(spark):
    """r11 functions/html: html_to_text(mark_links=True) with sentinels
    stripped must reproduce the unmarked output byte-for-byte (the marked
    form only ADDS link evidence), on crafted + randomized documents; the
    DuckDB twin agrees.  Known, documented exception: whitespace-only
    anchor text leaves extra spaces (sentinels block the run collapse) —
    the generator below avoids it; boilerplate.prune_lines re-collapses
    per line, so the composed stage is unaffected either way."""
    import random

    import duckdb

    from memory_opensource_spark.functions.html import (html_to_text,
                                                        html_to_text_sql)

    rnd = random.Random(23)
    frags = [
        "<a href='/x'>Home</a>", "<p>real prose here</p>",
        "<a class=nav href=y>About Us</a>", "plain words",
        "<div><A HREF='z'>CAPS ANCHOR</A></div>", "<br>",
        "<li><a href=q>item</a></li>", "<!-- c -->",
        "<script>var a = '<a>fake</a>';</script>",
        "text <a href='u'>link text</a> tail", "&amp; x",
    ]
    docs = ["".join(rnd.choice(frags) for _ in range(rnd.randint(1, 10)))
            for _ in range(120)]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(docs)],
                               "i int, h string")
    rows = df.select(
        "i",
        F.replace(F.replace(html_to_text(F.col("h"), mark_links=True),
                            F.lit("\x01"), F.lit("")),
                  F.lit("\x02"), F.lit("")).alias("m"),
        html_to_text(F.col("h")).alias("u")).collect()
    bad = [(docs[r.i], r.m, r.u) for r in rows if r.m != r.u]
    assert not bad, bad[:3]
    # DuckDB marked twin agrees with Spark's marked form
    got = {r.i: r.m for r in df.select(
        "i", html_to_text(F.col("h"), mark_links=True).alias("m")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    want = dict(con.execute(
        f"SELECT i, {html_to_text_sql('h', mark_links=True)} FROM t")
        .fetchall())
    badm = [(docs[i], got[i], want[i]) for i in range(120)
            if got[i] != want[i]]
    assert not badm, badm[:3]


def test_boilerplate_arrow_kernel_matches_column_form(spark):
    """r11: prune_lines_arrow (the crawl-scale Arrow kernel) must be
    byte-identical to the Column form on the full adversarial generator —
    plus NULLs, empty docs, and in-place vs new-column output."""
    import random

    from memory_opensource_spark.functions.boilerplate import (
        prune_lines, prune_lines_arrow)

    rnd = random.Random(29)
    lines = [
        "Plain prose with the usual words that are kept in the output.",
        "Home", "ABOUT US", "42 likes", "1,234", "- item",
        "\x01Home\x02 \x01About\x02", "stray \x01 open sentinel",
        "stray close \x02 here", "© 2024 Corp", "(c) 2024 site",
        "The \x01anchor\x02 sits inside a long enough prose sentence here.",
        "• bullet", "‣ b", "> quoted", "", "   ", "\t tabbed \t",
        "copyright notice text that runs long enough to not be a footer "
        "because it has many words.",
        "MIXED case LINE with SOME upper words in a longer sentence here.",
        "9999 views", "tokens without stop hits zzz qqq xxx yyy www vvv",
        "Ok.", "Done!", "No?", "x", "a  b   c",
    ]
    docs = ["\n".join(rnd.choice(lines)
                      for _ in range(rnd.randint(1, 15)))
            for _ in range(120)] + [None, "", "Home"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "i int, t string")
    col_form = {r.i: r.p for r in
                df.select("i", prune_lines(F.col("t")).alias("p")).collect()}
    kernel = {r.i: r.p for r in
              prune_lines_arrow(
                  df.withColumnRenamed("t", "p"), "p").collect()}
    bad = [(docs[i], col_form[i], kernel[i]) for i in range(len(docs))
           if col_form[i] != kernel[i]]
    assert not bad, bad[:3]
    # new-column mode keeps the original column
    out = prune_lines_arrow(df, "t", out_col="pruned")
    assert out.columns == ["i", "t", "pruned"]
    row = {r.i: r for r in out.collect()}
    assert row[0].t == docs[0] and row[0].pruned == col_form[0]


_LANGID_HELD_OUT = {
    "en": ["My sister bought a new bicycle yesterday because her old one "
           "was broken.",
           "Scientists have discovered a new species of frog in the "
           "mountains.",
           "Please close the window before you leave the office tonight.",
           "The museum opens at nine and the tickets are cheaper on "
           "Sundays.",
           "He could not remember where he had parked the car after the "
           "concert."],
    "de": ["Meine Schwester hat gestern ein neues Fahrrad gekauft, weil "
           "ihr altes kaputt war.",
           "Wissenschaftler haben in den Bergen eine neue Froschart "
           "entdeckt.",
           "Bitte schließe das Fenster, bevor du heute Abend das Büro "
           "verlässt.",
           "Das Museum öffnet um neun Uhr und die Karten sind sonntags "
           "billiger.",
           "Er konnte sich nicht erinnern, wo er nach dem Konzert das "
           "Auto geparkt hatte."],
    "es": ["Mi hermana compró ayer una bicicleta nueva porque la vieja "
           "estaba rota.",
           "Los científicos han descubierto una nueva especie de rana en "
           "las montañas.",
           "Por favor cierra la ventana antes de salir de la oficina "
           "esta noche.",
           "El museo abre a las nueve y las entradas son más baratas los "
           "domingos.",
           "No podía recordar dónde había aparcado el coche después del "
           "concierto."],
    "fr": ["Ma sœur a acheté un nouveau vélo hier parce que son ancien "
           "était cassé.",
           "Les scientifiques ont découvert une nouvelle espèce de "
           "grenouille dans les montagnes.",
           "Ferme la fenêtre avant de quitter le bureau ce soir, s'il te "
           "plaît.",
           "Le musée ouvre à neuf heures et les billets sont moins chers "
           "le dimanche.",
           "Il ne se souvenait plus où il avait garé la voiture après le "
           "concert."],
}


def test_lang_id_ngram_held_out_accuracy_and_parity(spark):
    """r11 functions/langid: char-trigram lang-ID must classify HELD-OUT
    sentences (disjoint from the embedded seed corpora) correctly —
    pinned at 100% on this 20-sentence set — agree byte-for-byte with its
    DuckDB twin, and handle the edges (<3 chars / NULL -> 'und')."""
    import duckdb

    from memory_opensource_spark.functions.langid import (lang_id_ngram,
                                                          lang_id_ngram_sql)

    rows, truth = [], {}
    i = 0
    for lang, sents in _LANGID_HELD_OUT.items():
        for s in sents:
            rows.append((i, s))
            truth[i] = lang
            i += 1
    rows += [(90, "xy"), (91, None), (92, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.lang, r.lang_score)
           for r in lang_id_ngram(df).collect()}
    for d, lang in truth.items():
        assert got[d][0] == lang, (d, got[d], lang)
    for d in (90, 91, 92):
        assert got[d] == ("und", None)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in
            con.execute(lang_id_ngram_sql("t")).fetchall()}
    assert got == want


# Held-out quality snippets: DISJOINT from the functions/quality_clf seed
# corpora (fresh sentences in the same two registers).
_QUALITY_HELD_OUT_HIGH = [
    "the village council agreed to restore the stone footbridge after "
    "engineers confirmed that the arches were still sound despite a "
    "century of floods",
    "during the long drought the farmers shared the remaining well water "
    "and planted barley instead of corn because it needs less rain",
    "the young translator spent two winters comparing the old letters "
    "with the printed edition and found dozens of small differences",
    "a quiet crowd gathered at the station to welcome the team home even "
    "though the match had ended in a narrow defeat",
    "the biology teacher explained how the wetland filters the river "
    "before it reaches the reservoir that supplies the town",
    "after the lecture the students walked to the harbor and watched the "
    "fishing boats unload their catch in the evening light",
    "her first novel described the slow repair of a friendship between "
    "two sisters who had not spoken for twenty years",
    "the archivists photographed every page of the ledger before the "
    "fragile binding was sent away for conservation",
    "when the bakery reopened the whole street smelled of warm bread and "
    "the owner gave the first loaves to his neighbors",
    "the glacier survey showed that the ice had thinned by nearly four "
    "meters since the previous measurement a decade earlier",
]
_QUALITY_HELD_OUT_LOW = [
    "home products services blog faq support careers press contact",
    "buy now best price free shipping limited time offer order today",
    "click here to sign up click here to learn more read more",
    "copyright all rights reserved terms privacy policy cookie settings",
    "casino bonus free spins best slots win big bet now poker online",
    "add to cart quick view wishlist compare checkout my account",
    "cheap hotels cheap flights best deals book now save big today",
    "recent posts popular posts archives categories tags search menu",
    "we use cookies accept cookies manage preferences advertisement",
    "make money fast work from home miracle weight loss pills online",
]


def test_quality_classifier_held_out_accuracy_and_parity(spark):
    """r12 functions/quality_clf: the NB log-odds quality model must
    separate HELD-OUT prose from held-out chaff (pinned 20/20 on this
    set), agree byte-for-byte with its DuckDB twin, and handle the edges
    (NULL / empty / no-letter text -> NULL score, 'unknown')."""
    import duckdb

    from memory_opensource_spark.functions.quality_clf import (
        quality_scores, quality_scores_sql)

    rows, truth = [], {}
    i = 0
    for s in _QUALITY_HELD_OUT_HIGH:
        rows.append((i, s)); truth[i] = "high"; i += 1
    for s in _QUALITY_HELD_OUT_LOW:
        rows.append((i, s)); truth[i] = "low"; i += 1
    rows += [(90, None), (91, ""), (92, "12345 !!! 678"),
             (93, "zzzqq xamb grfx")]   # 93: tokens, none in vocab
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.q_score, r.q_label)
           for r in quality_scores(df).collect()}
    for d, lab in truth.items():
        assert got[d][1] == lab, (d, rows[d], got[d])
    for d in (90, 91, 92):
        assert got[d] == (None, "unknown"), (d, got[d])
    assert got[93][0] is not None   # unseen grams score the floor weight
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in
            con.execute(quality_scores_sql("t")).fetchall()}
    assert got == want


def test_quality_classifier_randomized_cross_engine_parity(spark):
    """Randomized adversarial parity: documents built from a mixed bag of
    seed-vocabulary tokens, unseen tokens, digits, punctuation and accents
    must score IDENTICALLY (round-6 grid) in Spark and the DuckDB twin."""
    import random

    import duckdb

    from memory_opensource_spark.functions.quality_clf import (
        POS_SEED, NEG_SEED, quality_scores, quality_scores_sql)

    rng = random.Random(12)
    bag = (POS_SEED.split()[:60] + NEG_SEED.split()[:60]
           + ["zzz", "qqq", "42", "3.14", "café", "naïve", "¡hola!",
              "(c)", "—", "it's", "A-B", "", " ", "\t"])
    rows = []
    for i in range(150):
        n = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice(bag) for _ in range(n))))
    rows.append((900, None))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.q_score, r.q_label)
           for r in quality_scores(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in
            con.execute(quality_scores_sql("t")).fetchall()}
    assert got == want


def test_url_blocklist_column_and_table_forms_agree(spark):
    """r12 functions/urls: the scan-side literal-list predicate
    (url_blocked) and the join form for blocklist TABLES
    (filter_blocked_urls) must agree on randomized adversarial URLs, both
    must match the DuckDB twin, and the label-boundary rule must hold
    (a listed domain blocks subdomains, never mid-label lookalikes)."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.urls import (
        filter_blocked_urls, url_blocked, url_blocked_sql)

    bl = ["bad.com", "evil.org", "le.com"]
    rng = random.Random(5)
    hosts = ["bad.com", "www.bad.com", "a.b.bad.com", "notbad.com",
             "le.com", "good.le.com", "le.com.example.com", "evil.org",
             "EVIL.ORG", "bad.com.safe.net", "example.com", ""]
    rows = []
    for i in range(120):
        h = rng.choice(hosts)
        scheme = rng.choice(["https://", "http://", ""])
        user = rng.choice(["", "u@", "u:p@"]) if scheme else ""
        port = rng.choice(["", ":443", ":8080"])
        path = rng.choice(["", "/", "/x?q=1", "#f"])
        rows.append((i, f"{scheme}{user}{h}{port}{path}"))
    rows += [(900, None), (901, "https://"), (902, "   ")]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    col_form = {r.doc_id: r.b for r in df.select(
        "doc_id", url_blocked(F.col("url"), bl).alias("b")).collect()}
    blk = spark.createDataFrame([(d,) for d in bl], "domain string")
    kept = {r.doc_id for r in
            filter_blocked_urls(df, blk, "url").collect()}
    blocked = {r.doc_id for r in
               filter_blocked_urls(df, blk, "url",
                                   keep_blocked=True).collect()}
    assert kept | blocked == {r[0] for r in rows}
    assert kept & blocked == set()
    assert blocked == {d for d, b in col_form.items() if b}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT doc_id, {url_blocked_sql('url', bl)} FROM t").fetchall()}
    assert col_form == want
    # label-boundary pins
    pin = spark.createDataFrame(
        [(0, "https://a.bad.com/"), (1, "https://abad.com/"),
         (2, "https://bad.com.x.net/")], "doc_id int, url string")
    got = {r.doc_id: r.b for r in pin.select(
        "doc_id", url_blocked(F.col("url"), bl).alias("b")).collect()}
    assert got == {0: True, 1: False, 2: False}


def test_quality_classifier_arrow_kernel_row_identical(spark):
    """r12: quality_scores_arrow (the crawl-scale kernel) must produce
    ROW-IDENTICAL output to the Column form on randomized adversarial
    docs including NULL/empty/no-letter edges — same integer sums, same
    decimal-HALF_UP rounding Spark's round performs."""
    import random

    from memory_opensource_spark.functions.quality_clf import (
        POS_SEED, NEG_SEED, quality_scores, quality_scores_arrow)

    rng = random.Random(42)
    bag = (POS_SEED.split()[:80] + NEG_SEED.split()[:80]
           + ["zzz", "42", "café", "", "it's", "(c)"])
    rows = [(i, " ".join(rng.choice(bag)
                         for _ in range(rng.randint(0, 60))))
            for i in range(400)]
    rows += [(900, None), (901, ""), (902, "!!! 123")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = {r.doc_id: (r.q_score, r.q_label)
         for r in quality_scores(df).collect()}
    b = {r.doc_id: (r.q_score, r.q_label)
         for r in quality_scores_arrow(df).collect()}
    assert a == b and len(a) == len(rows)


def test_lang_id_ngram_arrow_kernel_row_identical(spark):
    """r12: lang_id_ngram_arrow (packed-trigram numpy kernel) must produce
    ROW-IDENTICAL output to the Column form on randomized mixed-language
    docs including multi-byte text and und-edges — same int64 sums, same
    decimal-HALF_UP rounding, same (score desc, idx asc) argmax."""
    import random

    from memory_opensource_spark.functions.langid import (
        LANG_SEEDS, lang_id_ngram, lang_id_ngram_arrow)

    rng = random.Random(3)
    frags = []
    for s in LANG_SEEDS.values():
        w = s.split()
        frags += [" ".join(w[i:i + 6]) for i in range(0, len(w) - 6, 7)]
    frags += ["zzz qqq", "42 1234", "café naïve étude", "ab", "",
              "日本語のテキスト"]
    rows = [(i, " ".join(rng.choice(frags)
                         for _ in range(rng.randint(0, 5))))
            for i in range(300)] + [(900, None), (901, "xy")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = {r.doc_id: (r.lang, r.lang_score)
         for r in lang_id_ngram(df).collect()}
    b = {r.doc_id: (r.lang, r.lang_score)
         for r in lang_id_ngram_arrow(df).collect()}
    assert a == b and len(a) == len(rows)


def test_bpe_trainer_textbook_and_partition_independent(spark):
    """r12 functions/bpe: the merge loop reproduces the textbook
    low/lower/newest/widest example with deterministic ties, and
    train_bpe over a DataFrame equals the pure-Python loop on the same
    word counts regardless of partition layout."""
    from memory_opensource_spark.functions.bpe import (
        train_bpe, train_bpe_from_counts)

    m = train_bpe_from_counts(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    # (e,s)=9 ties (s,t)=9 and (t,</w>)=9 -> lexicographic asc picks (e,s),
    # then (es,t), then (est,</w>); fourth: (l,o)=7 over (w,</w>)... ties
    # resolved identically by both implementations
    assert m[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]

    rows = [(i, f"alpha beta beta gamma{' delta' * (i % 3)}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    counts: dict = {}
    for _, t in rows:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = train_bpe_from_counts(counts, 30)
    assert train_bpe(df, n_merges=30) == want
    assert train_bpe(df.repartition(7), n_merges=30) == want


def test_bpe_encode_cross_engine_and_reference_parity(spark):
    """The Column-expression encoder, the DuckDB list_reduce twin and a
    naive per-word reference implementation must agree on token counts
    and the full encoded representation (md5), including NULL/empty/
    no-letter edges and case folding."""
    import duckdb
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions import bpe

    merges = bpe.seed_merges(200)
    assert len(merges) == 200
    rows = [(0, "the committee published the annual report"),
            (1, "click here to buy cheap pills now"),
            (2, None), (3, ""), (4, "zzz 123 !!!"), (5, "a"),
            (6, "the THE The tHe"), (7, "x" * 300)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: (r.n, r.h) for r in df.select(
        "doc_id",
        bpe.bpe_token_count(F.col("text"), merges).alias("n"),
        F.md5(bpe.apply_bpe(F.col("text"), merges)).alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: (r[1], r[2]) for r in con.execute(
        f"SELECT doc_id, {bpe.bpe_token_count_sql('text', merges)}, "
        f"md5({bpe.apply_bpe_sql('text', merges)}) FROM t").fetchall()}
    assert got == want

    def py_encode(text):
        out = []
        for w in bpe._words(text or ""):
            syms = list(w) + [bpe.EOW]
            for a, b in merges:
                i = 0
                while i < len(syms) - 1:
                    if syms[i] == a and syms[i + 1] == b:
                        syms[i:i + 2] = [a + b]
                    i += 1
            out.extend(syms)
        return out

    for did, text in rows:
        toks = py_encode(text)
        assert len(toks) == got[did][0], did
        # lossless: stripping subword boundaries reconstructs the words
        joined = "".join(toks).replace(bpe.EOW, " ").strip()
        assert joined == " ".join(bpe._words(text or "")), did


def test_fold_punctuation_unifies_retypeset_duplicates(spark):
    """r12 functions/text.fold_punctuation: a re-typeset copy (curly
    quotes, em-dash, ellipsis, fullwidth, zero-width junk) must hash
    identically to the plain-ASCII original after folding — the pre-dedup
    motivation — and the fold must agree with its DuckDB twin on
    randomized decorated docs."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.text import (
        fold_punctuation, fold_punctuation_sql)

    plain = 'he said "stop" - then left... "fine"'
    fancy = 'he said “stop” — then left… “fine”​'
    df = spark.createDataFrame([(0, plain), (1, fancy)],
                               "doc_id int, text string")
    out = {r.doc_id: r.h for r in df.select(
        "doc_id", F.md5(fold_punctuation(F.col("text"))).alias("h"))
        .collect()}
    assert out[0] == out[1]

    rng = random.Random(9)
    decor = list("‘’“”–—―−… 　​﻿") + \
        [chr(c) for c in range(0xFF01, 0xFF10)] + list("abc '\"-.")
    rows = [(i, "".join(rng.choice(decor) for _ in range(rng.randint(0, 40))))
            for i in range(200)] + [(900, None), (901, "")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.t for r in df.select(
        "doc_id", fold_punctuation(F.col("text")).alias("t")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT doc_id, {fold_punctuation_sql('text')} FROM t")
        .fetchall()}
    assert got == want


def test_robots_parser_groups_and_rules():
    """RFC 9309 core (functions/robots): group selection by most
    specific agent token, comments, empty-Disallow no-op, $-anchor and
    * wildcard preserved into patterns."""
    from memory_opensource_spark.functions.robots import (_pattern_regex,
                                                          parse_robots)

    body = ("# politeness\n"
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Allow: /private/ok\n"
            "Disallow: /tmp*$\n"
            "Disallow:\n"                    # empty = no-op
            "User-agent: special\n"
            "User-agent: extra\n"            # shared group
            "Disallow: /only-special\n")
    star = parse_robots(body, agent="MyCrawler/1.0")
    assert star == [("/private/", False), ("/private/ok", True),
                    ("/tmp*$", False)]
    spec = parse_robots(body, agent="SpecialBot")
    assert spec == [("/only-special", False)]   # longest agent match wins
    extra = parse_robots(body, agent="an-extra-agent")
    assert extra == [("/only-special", False)]  # shared User-agent lines
    assert parse_robots("", agent="x") == []
    assert parse_robots("garbage without colons\n", agent="x") == []
    assert _pattern_regex("/a.b*c$") == r"^/a\.b.*c$"


def test_robots_blocked_specificity_and_determinism(spark):
    """Longest pattern wins, Allow wins ties, absent host allows, NULL
    urls kept; keep_blocked returns the complement."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.robots import (
        robots_blocked, robots_rules_table)

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /\nAllow: /p/\n"),
         ("b.example", "User-agent: *\nDisallow: /x\nAllow: /x\n"),
         ("c.example", "User-agent: other\nDisallow: /\n"),
         # ADVICE r11 (robots.url_path): the authority ends at '/', '?'
         # or '#' — a pathless URL with a query is subject '/?q=...',
         # so query-targeting rules must be able to match it
         ("e.example", "User-agent: *\nDisallow: /?q=\n")],
        "host string, content string")
    rules = robots_rules_table(robots)
    urls = spark.createDataFrame(
        [(1, "https://a.example/p/deep"),    # Allow /p/ beats Disallow /
         (2, "https://a.example/secret"),    # Disallow /
         (3, "https://b.example/xyz"),       # tie -> Allow
         (4, "https://c.example/anything"),  # other agent's group
         (5, "https://d.example/no-robots"),
         (6, None),
         (7, "https://e.example?q=1"),       # pathless query -> '/?q=1'
         (8, "https://e.example"),           # bare authority -> '/'
         (9, "https://e.example/page?q=1")], # rule is a prefix from '/'
        "id long, url string")
    kept = {r.id for r in robots_blocked(urls, rules).collect()}
    assert kept == {1, 3, 4, 5, 6, 8, 9}
    blocked = {r.id for r in
               robots_blocked(urls, rules, keep_blocked=True).collect()}
    assert blocked == {2, 7}


def test_extract_links_resolution_and_pagerank_composition(spark):
    """extract_links resolution rules (absolute pass, root-relative +
    protocol-relative resolve, relative/mailto/fragment drop) and the
    frontier composition: host link graph -> the graph_pagerank loop
    shape (one join + one combinable groupBy per iteration)."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.html import extract_links
    from memory_opensource_spark.functions.urls import url_host

    rows = [
        ("https://a.example/p",
         '<a href="https://b.example/x">1</a><a href="/self">2</a>'
         '<a href="//c.example/y">3</a><a href="rel/p">4</a>'
         '<a href="mailto:m@x">5</a><a href="#f">6</a>'),
        ("https://b.example/p", '<a href="https://c.example/z">1</a>'),
        ("https://c.example/p", '<a href="https://a.example/w">1</a>'),
    ]
    df = spark.createDataFrame(rows, "base string, html string")
    links = df.select(
        url_host(F.col("base")).alias("src"),
        F.explode(extract_links(F.col("html"), F.col("base")))
        .alias("dst_url"))
    edges = links.select("src", url_host(F.col("dst_url")).alias("dst"))
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {("a.example", "b.example"), ("a.example", "a.example"),
                   ("a.example", "c.example"), ("b.example", "c.example"),
                   ("c.example", "a.example")}
    # frontier-priority composition: the graph_pagerank iteration shape
    e = edges.filter(F.col("src") != F.col("dst")).localCheckpoint()
    verts = (e.select(F.col("src").alias("id"))
             .unionByName(e.select(F.col("dst").alias("id"))).distinct())
    outdeg = e.groupBy("src").agg(F.count("*").alias("d"))
    n = verts.count()
    ranks = verts.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(5):
        contribs = (e.join(ranks, e.src == ranks.id).join(outdeg, "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("r") / F.col("d")).alias("m")))
        ranks = (verts.join(contribs, verts.id == contribs.dst, "left")
                 .select(verts.id, (F.lit(0.15 / n) + F.lit(0.85)
                                    * F.coalesce(F.col("m"), F.lit(0.0)))
                         .alias("r")))
    out = {r.id: r.r for r in ranks.collect()}
    assert len(out) == 3 and abs(sum(out.values()) - 1.0) < 1e-6
    # the a->{b,c}, b->c, c->a cycle makes c the top host
    assert max(out, key=out.get) in ("c.example", "a.example")


def test_robots_crawl_delay_and_group_edges():
    """Edge semantics the sweep checked: rules before any User-agent
    line are ignored (RFC: outside a group), CRLF bodies parse, agent
    matching is case-insensitive substring."""
    from memory_opensource_spark.functions.robots import parse_robots

    body = ("Disallow: /orphan\r\n"          # outside any group: ignored
            "User-agent: MegaBot\r\n"
            "Disallow: /m\r\n"
            "User-agent: *\r\n"
            "Disallow: /all\r\n")
    assert parse_robots(body, agent="MegaBot/2.1 (+http://x)") == \
        [("/m", False)]
    assert parse_robots(body, agent="megabot") == [("/m", False)]
    assert parse_robots(body, agent="other") == [("/all", False)]


def test_sitemap_locs_edges(spark):
    """sitemap extraction: CDATA, entities (amp decoded last),
    whitespace trim, case-insensitive tags, non-http(s) locs dropped,
    NULL -> empty."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.urls import sitemap_locs

    xml = ('<sitemapindex><sitemap><loc>https://a.example/s1.xml</loc>'
           '</sitemap></sitemapindex>'
           '<urlset><url><LOC><![CDATA[ https://b.example/p ]]></LOC>'
           '</url><url><loc>https://c.example/?a=1&amp;lt=2</loc></url>'
           '<url><loc>mailto:x@y</loc></url></urlset>')
    df = spark.createDataFrame([(xml,), (None,)], "x string")
    got = [r.l for r in df.select(
        sitemap_locs(F.col("x")).alias("l")).collect()]
    assert got[0] == ["https://a.example/s1.xml", "https://b.example/p",
                      "https://c.example/?a=1&lt=2"]
    assert got[1] == []


def test_extract_links_random_cross_engine_parity(spark):
    """r13: 150 seeded random HTML documents assembled from adversarial
    anchor fragments (quote styles, attribute soup, case, scheme
    variants, protocol/root-relative, droppable schemes, nested text) —
    the Column form and the DuckDB twin must agree element-for-element,
    including resolution against varying base URLs."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.html import (extract_links,
                                                        extract_links_sql)

    rnd = random.Random(13)
    frags = [
        '<a href="https://a.example/x">t</a>',
        "<A HREF='/root/p'>r</A>",
        '<a class="z" href="//cdn.example/c" id=k>c</a>',
        '<a href="HTTP://Up.example/Q">u</a>',
        '<a href="mailto:m@x">m</a>', '<a href="#f">f</a>',
        '<a href="rel/page.html">rel</a>',
        '<a href="javascript:void(0)">j</a>',
        '<a href="/q?a=1&b=2">q</a>', "<a name='no-href'>n</a>",
        "plain text < not a tag", '<a href="">empty</a>',
        '<a   href = "/spaced" >s</a>',
        '<a href="ftp://files.example/f">ftp</a>',
    ]
    bases = ["https://site.example/d/p", "http://h2.example:8080/",
             "https://h3.example"]
    rows = [(i, "".join(rnd.choice(frags)
                        for _ in range(rnd.randint(1, 10))),
             rnd.choice(bases)) for i in range(150)]
    df = spark.createDataFrame(rows, "i int, h string, b string")
    got = {r.i: r.l for r in df.select(
        "i", extract_links(F.col("h"), F.col("b")).alias("l")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, h VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(con.execute(
        f"SELECT i, {extract_links_sql('h', 'b')} FROM t").fetchall())
    bad = [(rows[i], got[i], want[i]) for i in range(150)
           if got[i] != want[i]]
    assert not bad, bad[:3]


def test_sitemap_locs_random_cross_engine_parity(spark):
    """r13: 150 seeded random sitemap bodies (CDATA, entities,
    whitespace, case, index vs urlset, droppable schemes) — Column form
    vs DuckDB twin element-for-element."""
    import random

    import duckdb

    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.urls import (sitemap_locs,
                                                        sitemap_locs_sql)

    rnd = random.Random(29)
    frags = [
        "<loc>https://a.example/p1</loc>",
        "<LOC> https://b.example/p2 </LOC>",
        "<loc><![CDATA[https://c.example/p3?x=1&amp;y=2]]></loc>",
        "<loc>https://d.example/&quot;q&quot;</loc>",
        "<loc>ftp://skip.example</loc>",
        "<loc></loc>", "<loc>   </loc>",
        "<lastmod>2024-01-01</lastmod>", "<priority>0.5</priority>",
        "<loc>HTTPS://CASE.example/UP</loc>",
        "plain <notloc>https://x</notloc> filler",
        "<loc>\nhttps://e.example/m\n</loc>",
    ]
    docs = ["<urlset>" + "".join(rnd.choice(frags)
                                 for _ in range(rnd.randint(1, 10)))
            + "</urlset>" for _ in range(150)]
    df = spark.createDataFrame(list(enumerate(docs)), "i int, x string")
    got = {r.i: r.l for r in df.select(
        "i", sitemap_locs(F.col("x")).alias("l")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    want = dict(con.execute(
        f"SELECT i, {sitemap_locs_sql('x')} FROM t").fetchall())
    bad = [(docs[i], got[i], want[i]) for i in range(150)
           if got[i] != want[i]]
    assert not bad, bad[:3]


def test_extract_links_anchors_random_cross_engine_parity(spark):
    """r14: 120 seeded random HTML documents assembled from adversarial
    anchor fragments (nested tags in anchors, quote mixes, attribute
    soup, mailto/relative drops, protocol-relative, anchors split by
    stray brackets) — the Column form and the DuckDB twin must agree
    element-for-element, and the resolution rules must match
    extract_links' documented set."""
    import random

    import duckdb

    from memory_opensource_spark.functions.html import (
        extract_links_anchors, extract_links_anchors_sql)

    rnd = random.Random(14)
    frags = [
        '<a href="https://a.example/x">plain text</a>',
        "<a href='/rooty'>  padded   <b>bold</b> inner </a>",
        '<a class="z" href="//cdn.example/p" rel=nofollow><i>it</i></a>',
        '<a href="mailto:a@b">mail</a>',
        '<a href="relative/p">rel</a>',
        '<a href="https://q.example/y?a=1&amp;b=2">q &gt; r</a>',
        '<a href="">empty</a>',
        "<p>not a link</p>", "stray < bracket >",
        '<A HREF="HTTPS://UP.example/Z">caps</A>',
        '<a title="x" href=\'https://s.example/t\'>attr first</a>',
        "<a href='/multi'>line\nbroken\tanchor</a>",
    ]
    docs = ["".join(rnd.choice(frags) for _ in range(rnd.randint(1, 10)))
            for _ in range(120)]
    base = "https://base.example/dir/page"
    df = spark.createDataFrame([(i, h) for i, h in enumerate(docs)],
                               "i int, h string")
    got = {r.i: [(p.url, p.anchor) for p in r.p] for r in df.select(
        "i", extract_links_anchors(F.col("h"), F.lit(base)).alias("p"))
        .collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(docs)))
    want = {i: [(p["url"], p["anchor"]) for p in lst] for i, lst in
            con.execute(
                "SELECT i, "
                + extract_links_anchors_sql("h", f"'{base}'")
                + " FROM t").fetchall()}
    bad = [(docs[i], got[i], want[i]) for i in range(120)
           if got[i] != want[i]]
    assert not bad, bad[:2]


def test_surt_rules_and_cross_engine_parity(spark):
    """r14 functions/urls.surt: every documented rule on crafted URLs
    (label reversal, default-port drop, non-default port kept, userinfo
    and scheme dropped, fragment dropped, pathless -> '/'), Spark and
    the DuckDB twin byte-for-byte."""
    import duckdb

    from memory_opensource_spark.functions.urls import surt, surt_sql

    cases = [
        ("https://www.Example.com:8080/a/b?q=1",
         "com,example,www:8080)/a/b?q=1"),
        ("http://u:p@X.org/", "org,x)/"),
        ("https://h.example", "example,h)/"),
        ("example.com/a#frag", "com,example)/a"),
        ("http://h.example:80/x", "example,h)/x"),
        ("https://h.example:443/y?a=1#z", "example,h)/y?a=1"),
        ("https://single/", "single)/"),
        # pathless URL WITH a query: canonical '/' before the '?' (the
        # Common-Crawl/Wayback form, mirroring url_path) — ADVICE r12
        ("http://example.h?q=1", "h,example)/?q=1"),
        ("https://h.example?a=1#frag", "example,h)/?a=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.s for r in df.select(surt(F.col("u")).alias("s")).collect()]
    assert got == [w for _, w in cases]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in cases])
    assert [r[0] for r in con.execute(
        f"SELECT {surt_sql('u')} FROM t").fetchall()] == \
        [w for _, w in cases]
    # prefix property: every subdomain of a domain sorts inside the
    # domain's SURT prefix range
    assert surt_sql  # twin exists
    a = "com,example)"
    assert all(s.startswith("com,example") for s in [
        "com,example)/x", "com,example,www)/y", "com,example,cdn,a)/z"])
    assert a < "com,example,www)/y"   # parent before subdomains


def test_parse_crawl_delay_groups_and_forms():
    """r14 functions/robots.parse_crawl_delay: same group selection as
    parse_robots (most-specific agent), float and int forms, malformed
    and negative values ignored, absent -> None; parse_robots behavior
    unchanged by the refactor."""
    from memory_opensource_spark.functions.robots import (
        parse_crawl_delay, parse_robots)

    body = ("User-agent: *\nCrawl-delay: 2\nDisallow: /a\n"
            "User-agent: mybot\nCrawl-delay: 7.5\nDisallow: /m\n")
    assert parse_crawl_delay(body, agent="MyBot/1.0") == 7.5
    assert parse_crawl_delay(body, agent="other") == 2.0
    assert parse_robots(body, agent="MyBot/1.0") == [("/m", False)]
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: soon\n") is None
    assert parse_crawl_delay("User-agent: *\nCrawl-delay: -3\n") is None
    assert parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None
    assert parse_crawl_delay("") is None
    # outside any group: ignored (the RFC orphan-line rule)
    assert parse_crawl_delay("Crawl-delay: 9\nUser-agent: *\n") is None


def test_politeness_waves_delay_caps(spark):
    """politeness_waves(delays=, wave_seconds=): a declaring host's cap
    is min(per_wave, floor(wave_seconds/delay)) and >= 1; hosts without
    a delay keep per_wave; the two kwargs must travel together."""
    import pytest as _pytest

    from memory_opensource_spark.plans.crawl import politeness_waves

    rows = [("slow.example", f"https://slow.example/p/{i}")
            for i in range(10)]
    rows += [("free.example", f"https://free.example/p/{i}")
             for i in range(10)]
    rows += [("glacial.example", f"https://glacial.example/p/{i}")
             for i in range(4)]
    df = spark.createDataFrame(rows, "host string, url string")
    delays = spark.createDataFrame(
        [("slow.example", 20.0),      # 60/20 -> cap 3
         ("glacial.example", 400.0)], # floor(0.15) -> clamped to 1
        "host string, crawl_delay double")
    out = politeness_waves(df, 5, delays=delays, wave_seconds=60.0)
    by = {}
    for r in out.collect():
        by.setdefault((r.host, r.wave), 0)
        by[(r.host, r.wave)] += 1
    assert [by[("slow.example", w)] for w in range(4)] == [3, 3, 3, 1]
    assert by[("free.example", 0)] == 5 and by[("free.example", 1)] == 5
    assert all(by[("glacial.example", w)] == 1 for w in range(4))
    with _pytest.raises(ValueError, match="go together"):
        politeness_waves(df, 5, delays=delays)
