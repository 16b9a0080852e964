"""crawl_frontier + politeness_waves at scale (r14): a synthetic 600k-page
web with a Zipf-ish host distribution (one mega-host holding ~25% of all
pages), 1000 seeds, 2 BFS rounds with robots + blocklist gating — the
task-balance evidence the 100 TB claim rests on:

  - per ROUND the plan is one seen anti-join + the broadcast rules join
    + one fetch equi-join; lineage is checkpoint-flat (the registered
    row pins zero residual joins in the result plan);
  - politeness_waves over the final frontier must stay balanced under
    the mega-host (windows partitioned by (host, range-bucket));
  - wall is reported per stage; the box swings 2.5x (PERF.md), so
    compare shapes, not absolute seconds, across runs.

Usage: python tools/frontier_probe.py [n_pages] [seeds] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from memory_opensource_spark.functions.robots import (  # noqa: E402
    robots_rules_table)
from memory_opensource_spark.plans.crawl import (  # noqa: E402
    crawl_frontier, politeness_waves)
from memory_opensource_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("frontier_probe", shuffle_partitions=32)

    # host: id % 4 == 0 -> the mega-host (25% of pages); else 1 of 997
    d = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, F.lit("mega.example"))
        .otherwise(F.concat(F.lit("h"), F.col("id") % 997,
                            F.lit(".example"))).alias("host"),
        ((F.col("id") * 48271 + 11) % n).alias("n1"),
        ((F.col("id") * 69621 + 7) % n).alias("n2"))

    def url_of(host, num):
        return F.concat(F.lit("https://"), host, F.lit("/p/"), num)

    host_of = (F.when(F.col("n1") % 4 == 0, F.lit("mega.example"))
               .otherwise(F.concat(F.lit("h"), F.col("n1") % 997,
                                   F.lit(".example"))))
    host_of2 = (F.when(F.col("n2") % 4 == 0, F.lit("mega.example"))
                .otherwise(F.concat(F.lit("h"), F.col("n2") % 997,
                                    F.lit(".example"))))
    pages = d.select(
        url_of(F.col("host"), F.col("id")).alias("url"),
        F.concat(F.lit('<html><a href="'),
                 url_of(host_of, F.col("n1")),
                 F.lit('">a</a><a href="'),
                 url_of(host_of2, F.col("n2")),
                 F.lit('">b</a></html>')).alias("html")) \
        .repartition(32).localCheckpoint(eager=True)
    seeds = d.filter(F.col("id") % (n // n_seeds) == 1) \
        .select(url_of(F.col("host"), F.col("id")).alias("url"))
    robots = spark.createDataFrame(
        [("mega.example", "User-agent: *\nDisallow: /private/\n"),
         ("h1.example", "User-agent: *\nDisallow: /\n")],
        "host string, content string")
    rules = robots_rules_table(robots).localCheckpoint(eager=True)

    t0 = time.time()
    out = crawl_frontier(seeds, pages, rounds=rounds, rules=rules,
                         blocklist=["h2.example"]).localCheckpoint(True)
    walls = {"frontier": round(time.time() - t0, 1)}
    per_round = {r["round"]: r["n"] for r in
                 out.groupBy("round").agg(F.count("*").alias("n"))
                 .collect()}

    from memory_opensource_spark.functions.urls import url_host
    t0 = time.time()
    waves = politeness_waves(
        out.select(url_host(F.col("url")).alias("host"), "url"), 100)
    wave_stats = (waves.groupBy("host", "wave")
                  .agg(F.count("*").alias("c"))
                  .agg(F.max("c").alias("mx"),
                       F.count("*").alias("host_waves"),
                       F.sum("c").alias("total")).collect()[0])
    walls["waves"] = round(time.time() - t0, 1)

    mega = waves.filter(F.col("host") == "mega.example") \
        .groupBy("wave").count().orderBy("wave").collect()
    print(f"pages={n} seeds={n_seeds} rounds={rounds}")
    print(f"fetched per round: {per_round}")
    print(f"walls: {walls}")
    print(f"waves: max_wave_size={wave_stats['mx']} (cap 100), "
          f"host-waves={wave_stats['host_waves']}, "
          f"rows={wave_stats['total']}")
    print(f"mega-host waves: {len(mega)} "
          f"(sizes head: {[r['count'] for r in mega[:5]]})")
    assert wave_stats["mx"] <= 100, "wave size exceeded per_wave"


if __name__ == "__main__":
    main()
