"""600k response-record crawl-leg probe (round-11, VERDICT r9 task 6):
the shape a real Common Crawl run uses — WARC files carrying raw HTTP
exchanges — pushed through the full front-end:

    write shards (fixture) -> read_warc(response) + header/charset decode
    -> html_to_text(mark_links) -> boilerplate prune -> URL dedup
    -> word-count gate -> quality classifier -> char-trigram lang-ID
    (classifier/lang-ID stages added r12 — the learned filters run on
    gate survivors only, the CCNet/DCLM ordering)

Stage walls + row counts land as one JSON line; the WARC shards are
written ONCE via a distributed kernel (one ~N-doc .warc.gz per input
partition — the Common Crawl segment layout) and reused across runs.

Run tools/pipeline_probe.py first (builds .scratch/pipe_docs_600000).
Usage: python tools/crawl_probe.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.functions import boilerplate as B
    from memory_opensource_spark.functions import html as H
    from memory_opensource_spark.functions import text as T
    from memory_opensource_spark.functions import urls as U
    from memory_opensource_spark.session import get_spark
    from memory_opensource_spark.sources import warc

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    docs_path = os.path.join(SCRATCH, f"pipe_docs_{n_docs}.parquet")
    if not os.path.isdir(docs_path):
        print("run tools/pipeline_probe.py first", file=sys.stderr)
        sys.exit(1)
    warc_dir = os.path.join(SCRATCH, f"crawl_warc_{n_docs}")

    spark = get_spark("crawl-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"n_docs": n_docs}

    if not os.path.isdir(warc_dir) or not os.listdir(warc_dir):
        os.makedirs(warc_dir, exist_ok=True)
        t0 = time.time()

        def write_shard(it):
            # one gzipped WARC per partition — the ~1 GB segment layout,
            # scaled down; executor-side, no driver collect
            import zlib

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            recs = []
            for r in it:
                did = r.doc_id
                body = r.text or ""
                html = (f"<html><head><title>d{did}</title></head><body>"
                        f'<div><a href="/">Home</a> <a href="/a">About</a>'
                        f"</div><p>{body}</p><div>{did % 900} likes</div>"
                        f"<div>© 2024 crawl Corp</div></body></html>")
                head = (b"HTTP/1.1 200 OK\r\n"
                        b"Content-Type: text/html; charset=utf-8\r\n\r\n")
                recs.append((f"https://crawl.example/{did % (n_docs // 2)}",
                             "2024-01-01T00:00:00Z",
                             head + html.encode("utf-8")))
            if recs:
                raw = warc.write_warc_records(recs, "")
                c = zlib.compressobj(6, zlib.DEFLATED, 31)
                data = c.compress(raw) + c.flush()
                with open(os.path.join(warc_dir, f"seg-{pid:05d}.warc.gz"),
                          "wb") as f:
                    f.write(data)
            return iter([])

        spark.read.parquet(docs_path).repartition(32) \
            .rdd.mapPartitions(write_shard).count()
        out["t_write_fixture_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    raw = warc.read_warc(spark, os.path.join(warc_dir, "*"),
                         record_types=("response",))
    pages = raw.select("target_uri", F.col("text").alias("html")) \
        .localCheckpoint(eager=True)
    out["n_pages"] = pages.count()
    out["t_read_decode_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    marked = pages.select(
        "target_uri",
        H.html_to_text(F.col("html"), mark_links=True).alias("pruned"))
    # scale path: the Arrow kernel (byte-identical to the Column form,
    # test-pinned) — the interpreted HOF Column form measured 29 s here
    ex = B.prune_lines_arrow(marked, "pruned").localCheckpoint(eager=True)
    out["n_extracted"] = ex.count()
    out["t_extract_prune_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    canon = ex.select(U.canonical_url(F.col("target_uri"))
                      .alias("canonical_url"), "pruned")
    keep = (canon.groupBy("canonical_url")
            .agg(F.first("pruned").alias("pruned"))
            .localCheckpoint(eager=True))
    out["n_unique_urls"] = keep.count()
    out["t_url_dedup_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_words = F.size(T.tokens(F.col("pruned")))
    gated = keep.filter((n_words >= 3) & (n_words <= 100000))
    out["n_gated"] = gated.count()
    out["t_gate_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # scale path: the Arrow kernel (row-identical to the Column form,
    # test-pinned) — the interpreted bigram HOF measured 21.5 s here
    from memory_opensource_spark.functions.quality_clf import (
        quality_scores_arrow)

    gated_id = gated.select(
        F.xxhash64("canonical_url").alias("doc_id"),
        F.col("pruned").alias("text")).localCheckpoint(eager=True)
    q = quality_scores_arrow(gated_id)
    out["n_quality_high"] = q.filter(F.col("q_label") == "high").count()
    out["t_quality_clf_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    # scale path: packed-trigram numpy kernel (row-identical, test-pinned)
    # — the interpreted per-char substr HOF measured 7.8-12.8 s here
    from memory_opensource_spark.functions.langid import lang_id_ngram_arrow

    lid = lang_id_ngram_arrow(gated_id)
    out["n_lang_en"] = lid.filter(F.col("lang") == "en").count()
    out["t_lang_id_s"] = round(time.time() - t0, 2)

    out["t_total_after_fixture_s"] = round(
        out["t_read_decode_s"] + out["t_extract_prune_s"]
        + out["t_url_dedup_s"] + out["t_gate_s"]
        + out["t_quality_clf_s"] + out["t_lang_id_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
