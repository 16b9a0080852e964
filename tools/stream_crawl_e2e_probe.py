"""Streaming crawl end-to-end at scale (VERDICT r12 task 5): the full
discovery -> fetch -> ingest -> corpus chain run as STREAMS over a
synthetic 600k-page Zipf web, >= 3 micro-batches, with a checkpoint-kill
replay at the end.

Per wave the probe
  1. feeds the fetched pages into ``foreach_batch_frontier_ingest``
     (seen-state dedup, blocklist + robots gating, frontier append),
  2. "fetches" the newly queued URLs by joining the frontier partition
     against the web table,
  3. feeds the fetched pages into ``foreach_batch_crawl_ingest``
     (extract -> prune -> URL dedup -> Bloom decon -> corpus_increment),
and records per-wave wall + state sizes.  Each wave restarts both
streams from their checkpoints (stop/start recovery every wave); after
the last wave both CHECKPOINTS ARE DELETED and every input file is
re-delivered — the at-least-once replay must converge to the same state
row counts (exactly-once), and the replay wall is reported.

Pass criteria: per-wave wall ~flat relative to wave input size (the box
swings 2.5x — compare shapes), state row counts == replay row counts.

Usage: python tools/stream_crawl_e2e_probe.py [n_pages] [n_seeds] [waves]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

_PROSE = ("the quick brown fox jumps over the lazy dog and then keeps "
          "running through the open field while the observers take notes "
          "about the long and winding route that it follows every day")


def main():
    from memory_opensource_spark.functions.robots import robots_rules_table
    from memory_opensource_spark.plans import corpus
    from memory_opensource_spark.plans.ingest import hash_embed_row
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.streaming.pipelines import (
        foreach_batch_crawl_ingest, foreach_batch_frontier_ingest)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_waves = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("stream_crawl_e2e", shuffle_partitions=32)
    root = os.path.join(SCRATCH, "stream_crawl_e2e")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    fstate = os.path.join(root, "frontier_state")
    cstate = os.path.join(root, "corpus_state")
    fstream = os.path.join(root, "frontier_in")
    cstream = os.path.join(root, "crawl_in")
    fck, cck = os.path.join(root, "fck"), os.path.join(root, "cck")
    os.makedirs(fstream)
    os.makedirs(cstream)

    # --- the synthetic web (frontier_probe shape: Zipf hosts, 2 links) ---
    def url_of(num):
        h = (F.when(num % 4 == 0, F.lit("mega.example"))
             .otherwise(F.concat(F.lit("h"), num % 997, F.lit(".example"))))
        return F.concat(F.lit("https://"), h, F.lit("/p/"), num)

    web = (spark.range(n).select(
        F.col("id"),
        url_of(F.col("id")).alias("url"),
        F.concat(
            F.lit("<html><body><p>document "), F.col("id"),
            F.lit(" of the synthetic web where " + _PROSE + "</p>"
                  '<a href="'),
            url_of((F.col("id") * 48271 + 11) % n),
            F.lit('">a</a><a href="'),
            url_of((F.col("id") * 69621 + 7) % n),
            F.lit('">b</a></body></html>')).alias("html"))
        .drop("id").repartition(32).localCheckpoint(eager=True))

    robots = spark.createDataFrame(
        [("mega.example", "User-agent: *\nDisallow: /private/\n"),
         ("h1.example", "User-agent: *\nDisallow: /\n")],
        "host string, content string")
    rules = robots_rules_table(robots).localCheckpoint(eager=True)

    # --- corpus init (hash-embed space) + eval grams ----------------------
    init = [(i, f"seed corpus document {i} " + _PROSE) for i in range(4)]
    corpus.corpus_init(
        spark.createDataFrame(init, "doc_id long, text string"),
        spark.createDataFrame(
            [(i, hash_embed_row(t)) for i, t in init],
            "doc_id long, embedding array<double>"),
        spark.createDataFrame(
            [(k, hash_embed_row(f"centroid {k}")) for k in range(16)],
            "centroid_id int, embedding array<double>"),
        cstate, eps=0.99, jaccard_threshold=0.95)
    held = ("held out benchmark question about the alpha beta gamma delta "
            "epsilon zeta eta theta iota kappa sequence")
    toks = held.split()
    eval_grams = spark.createDataFrame(
        [(" ".join(toks[i:i + 8]),) for i in range(len(toks) - 7)],
        "gram string")

    def emit(df, stream_dir, name):
        """Write df as ONE parquet FILE in the stream dir (the file
        source does not recurse into write.parquet's output dirs)."""
        tmp = os.path.join(root, "tmp_emit")
        shutil.rmtree(tmp, ignore_errors=True)
        df.coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, part),
                   os.path.join(stream_dir, name + ".parquet"))
        shutil.rmtree(tmp)

    def run_frontier(tag):
        stream = (spark.readStream.schema("url string, html string")
                  .option("maxFilesPerTrigger", 1).parquet(fstream))
        q = (foreach_batch_frontier_ingest(
                stream, fstate, fck, rules=rules,
                blocklist=["h2.example"])
             .trigger(availableNow=True).start())
        q.awaitTermination(1200)

    def run_crawl(tag):
        stream = (spark.readStream
                  .schema("target_uri string, text string")
                  .option("maxFilesPerTrigger", 1).parquet(cstream))
        q = (foreach_batch_crawl_ingest(
                stream, cstate, cck, eval_grams, eps=0.99,
                jaccard_threshold=0.95)
             .trigger(availableNow=True).start())
        q.awaitTermination(1200)

    def state_rows():
        out = {}
        for name, p in [("seen_urls", os.path.join(fstate, "seen_urls")),
                        ("frontier", os.path.join(fstate, "frontier")),
                        ("seen_crawl", os.path.join(cstate, "seen_urls")),
                        ("members", os.path.join(cstate, "members")),
                        ("bands", os.path.join(cstate, "bands"))]:
            out[name] = (spark.read.parquet(p).count()
                         if os.path.isdir(p) else 0)
        return out

    # --- wave 0 input: the seed pages -------------------------------------
    seeds = web.filter(
        F.xxhash64("url") % (n // n_seeds) == 1).select("url", "html")
    emit(seeds, fstream, "wave0")

    report = []
    prev_top = -1
    for w in range(n_waves):
        t0 = time.time()
        run_frontier(w)                      # restart-from-checkpoint each wave
        t_frontier = time.time() - t0
        # fetch: THIS wave's newly queued urls (batches after prev_top)
        frontier = spark.read.parquet(os.path.join(fstate, "frontier"))
        queued = frontier.filter(F.col("batch_id") > prev_top)
        prev_top = frontier.agg(F.max("batch_id")).collect()[0][0]
        fetched = (queued.select("url").distinct()
                   .join(web, "url").localCheckpoint(eager=True))
        n_fetched = fetched.count()
        # wave 0 ingests the SEEDS (they were fetched to start the crawl);
        # later waves ingest the pages fetched off the frontier
        to_ingest = seeds if w == 0 else fetched
        # feed BOTH legs: next frontier wave + this wave's crawl ingest
        if w + 1 < n_waves and n_fetched:
            emit(fetched, fstream, f"wave{w + 1}")
        emit(to_ingest.selectExpr("url AS target_uri", "html AS text"),
             cstream, f"wave{w}")
        t0 = time.time()
        run_crawl(w)
        t_crawl = time.time() - t0
        row = {"wave": w, "fetched": n_fetched,
               "wall_frontier_s": round(t_frontier, 1),
               "wall_crawl_s": round(t_crawl, 1),
               **state_rows()}
        report.append(row)
        print(json.dumps(row))

    # --- checkpoint kill: drop BOTH checkpoints, re-deliver everything ----
    before = state_rows()
    shutil.rmtree(fck)
    shutil.rmtree(cck)
    t0 = time.time()
    run_frontier("replay")
    run_crawl("replay")
    replay_wall = round(time.time() - t0, 1)
    after = state_rows()
    print(json.dumps({"replay_wall_s": replay_wall,
                      "state_before": before, "state_after": after,
                      "exactly_once": before == after}))
    assert before == after, "replay grew state — at-least-once leak"


if __name__ == "__main__":
    main()
