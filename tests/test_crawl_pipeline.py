"""plans/crawl.crawl_to_training_shards: the one-call batch front-end —
every planted document dies at exactly the stage built to catch it, and
the survivors land in leakage-safe sharded splits."""

import os

from pyspark.sql import functions as F

from memory_opensource_spark.plans.crawl import crawl_to_training_shards
from memory_opensource_spark.sources import warc

PROSE_A = ("the committee published its annual report describing how the "
           "harbor town rebuilt its flood defenses after the storm and "
           "the families returned to their homes before the winter came")
PROSE_B = ("researchers at the university measured the temperature of "
           "the lake every morning for ten years and found that the ice "
           "now melts almost three weeks earlier than before the study")
PROSE_B_NEAR = PROSE_B.replace("ten years", "nine years")
# stopword-rich enough (>= 10%) to survive the boilerplate pruner's
# density rule R5 — the CLASSIFIER must be the stage that kills it
SPAM_F = ("buy cheap pills online and get the best casino bonus codes now "
          "free spins for the slots poker win money fast work from home "
          "miracle weight loss cure cheap flights cheap hotels best deals "
          "book now limited time offer order today free shipping on all "
          "orders click here to sign up now")
GERMAN_G = ("der schnelle braune fuchs springt über den faulen hund "
            "während der regen auf die stille stadt fällt und die leute "
            "durch den alten markt gehen um brot käse und obst zu suchen "
            "weil sie ein gutes abendessen kochen wollen und die kinder "
            "spielen am fluss mit einem kleinen holzboot "
            "the committee published the annual report and the museum "
            "opened a small exhibition about the river trade this year")
EVAL_SENT = ("held out benchmark question about the alpha beta gamma "
             "delta epsilon zeta eta theta sequence")
CONTAM_H = ("some ordinary prose with the usual words and then the alpha "
            "beta gamma delta epsilon zeta eta theta sequence appears "
            "verbatim in the middle of the document for the check to find")


def _page(uri, body):
    html = (f"<html><body><div><a href='/'>Home</a></div><p>{body}</p>"
            f"<div>© 2024 site Corp</div></body></html>")
    head = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n\r\n")
    return (uri, "2024-01-01T00:00:00Z", head + html.encode("utf-8"))


def test_crawl_to_training_shards_end_to_end(spark, tmp_path):
    segs = str(tmp_path / "segs")
    os.makedirs(segs)
    warc.write_warc_records(
        [_page("https://good.org/a", PROSE_A),
         _page("https://good.org/a?utm_source=x", PROSE_A),  # URL dup
         _page("https://good.org/b", PROSE_B),
         _page("https://good.org/b2", PROSE_B),              # exact dup
         _page("https://good.org/c", PROSE_B_NEAR),          # near dup
         _page("https://spam.example/d", PROSE_A),           # blocked
         _page("https://good.org/e", "too short"),           # word gate
         _page("https://good.org/f", SPAM_F),                # quality
         _page("https://good.org/g", GERMAN_G),              # lang
         _page("https://good.org/h", CONTAM_H),              # contaminated
         _page("https://good.org/private/i", PROSE_A)],      # robots
        os.path.join(segs, "seg0.warc"))

    blocklist = spark.createDataFrame([("spam.example",)], "domain string")
    robots = spark.createDataFrame(
        [("good.org", "User-agent: *\nDisallow: /private/\n")],
        "host string, content string")
    toks = EVAL_SENT.lower().split()
    eval_grams = spark.createDataFrame(
        [(" ".join(toks[i:i + 8]),) for i in range(len(toks) - 7)],
        "gram string")

    out = str(tmp_path / "out")
    res = crawl_to_training_shards(
        spark, os.path.join(segs, "*"), out,
        blocklist=blocklist, robots=robots, eval_grams=eval_grams,
        langs=("en",), min_words=5, jaccard_threshold=0.5,
        n_shards=2, fractions={"train": 0.7, "val": 0.3})

    s = res["stages"]
    assert s["read"] == 11
    assert s["blocklist"] == 10       # spam.example dropped
    assert s["robots"] == 9           # /private/ path dropped
    assert s["url_dedup"] == 8        # utm variant folded
    assert s["word_gate"] == 7        # 'too short'
    assert s["quality"] == 6          # SPAM_F -> 'low'
    assert s["lang"] == 5             # German doc -> 'de'
    assert s["exact_dedup"] == 4      # b2 == b text
    assert s["near_dedup"] == 3       # one of b/c dropped
    assert s["decontaminated"] == 2   # contaminated doc h dropped
    assert s["written"] == 2

    # survivors are exactly {a, one of b/c}, readable from the shards
    back = []
    for name, path in res["paths"].items():
        df = spark.read.parquet(path)
        back.extend((name, r.canonical_url, r.text) for r in df.collect())
    urls = {u for _, u, _ in back}
    assert "https://good.org/a" in urls
    assert len(urls & {"https://good.org/b", "https://good.org/c"}) == 1
    assert len(back) == 2
    # leakage-safe: identical content (none left here) would share splits —
    # at minimum the assignment is deterministic across re-runs
    res2 = crawl_to_training_shards(
        spark, os.path.join(segs, "*"), str(tmp_path / "out2"),
        blocklist=blocklist, robots=robots, eval_grams=eval_grams,
        langs=("en",), min_words=5, jaccard_threshold=0.5,
        n_shards=2, fractions={"train": 0.7, "val": 0.3})
    assert res2["stages"] == s


def test_crawl_shards_with_trained_bpe_token_budget(spark, tmp_path):
    """token_budget switches sharding to TRAINED-tokenizer units: a merge
    table is trained on the surviving corpus, every doc is costed with
    bpe_token_count, and shards pack to ~budget tokens in doc_id order —
    verified against a driver-side exact prefix sum over the SAME
    counts."""
    import os

    segs = str(tmp_path / "segs")
    os.makedirs(segs)
    bodies = [(f"https://good.org/p{i}",
               " ".join([PROSE_A, PROSE_B][i % 2].split()[: 20 + 3 * i])
               + f" unique marker token t{i}")
              for i in range(8)]
    warc.write_warc_records([_page(u, b) for u, b in bodies],
                            os.path.join(segs, "seg0.warc"))

    out = str(tmp_path / "out_bpe")
    res = crawl_to_training_shards(
        spark, os.path.join(segs, "*"), out, langs=None, min_words=5,
        jaccard_threshold=0.99, n_shards=2,
        fractions={"train": 1.0}, token_budget=120, n_bpe_merges=50)
    assert len(res["bpe_merges"]) == 50

    df = spark.read.parquet(res["paths"]["train"]) \
        .orderBy("doc_id").collect()
    assert len(df) == 8
    # exact budget semantics: shard = floor(prior tokens / budget)
    prior = 0
    for r in df:
        assert r.shard == prior // 120, (r.doc_id, prior, r.shard)
        assert r.n_bpe_tokens > 0
        prior += r.n_bpe_tokens
    assert df[-1].shard >= 1  # budget actually split the corpus


def test_crawl_frontier_semantics_and_flat_plan(spark):
    """r14 plans/crawl.crawl_frontier: bounded BFS with per-round
    gating — cycles do not loop (seen-set), blocked URLs are never
    fetched AND never reconsidered, dead links (no page) vanish, a
    page reached by two paths keeps its FIRST round, and the
    accumulated result plan is a union of checkpointed leaves with
    ZERO residual joins (lineage stays flat across rounds)."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions.robots import (
        robots_rules_table)
    from memory_opensource_spark.plans.crawl import crawl_frontier

    def pg(url, *links):
        return (url, "<html>" + "".join(
            f'<a href="{x}">l</a>' for x in links) + "</html>")

    A = "https://a.example/start"
    B = "https://a.example/next"
    C = "https://b.example/two"
    D = "https://a.example/private/x"     # robots-blocked
    E = "https://blk.example/spam"        # blocklist-blocked
    G = "https://a.example/deep"
    pages = spark.createDataFrame(
        [pg(A, B, D, E, "https://a.example/dead"),
         pg(B, C, A),                     # cycle back to A
         pg(C, G, B),                     # second path to B (round 1)
         pg(D, G),                        # never fetched: robots
         pg(G)],
        "url string, html string")
    rules = robots_rules_table(spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, content string"))
    seeds = spark.createDataFrame([(A,)], "url string")
    out = crawl_frontier(seeds, pages, rounds=3, rules=rules,
                         blocklist=["blk.example"])
    got = {r.url: r.round for r in out.collect()}
    assert got == {A: 0, B: 1, C: 2, G: 3}
    # D (robots) and E (blocklist) never fetched; dead link absent;
    # the cycle back to A and the round-2 re-link to B do not repeat
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan   # union of checkpointed leaves only
