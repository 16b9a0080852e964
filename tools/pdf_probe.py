"""PDF text-layer extraction throughput probe (r13): build N real PDFs
executor-side from the 600k probe corpus texts (multi-page, mixed
compression/hex/split-stream variants — the oracle row's sweep at
scale), parse them back with extract_pdf_pages, and verify the
round-trip on every row (md5 of the rebuilt page join vs the source
text).  Prints docs/sec for the parse leg — the number a 100 TB
document-ingest sizing starts from (file-level parallelism: N PDFs
spread over executors, no shuffle).

Usage: python tools/pdf_probe.py [n_docs] [mode]   (default 50_000 classic)
mode: classic | cmap (ToUnicode/Differences-encoded fonts, r14) |
      scanned (image-only pages parsed through the ocr_stub seam, r14)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def main():
    from pyspark.sql import functions as F

    from memory_opensource_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "classic"
    src = os.path.join(SCRATCH, "pipe_docs_600000.parquet")
    if not os.path.exists(src):
        print("run tools/pipeline_probe.py first", file=sys.stderr)
        sys.exit(1)

    spark = get_spark("pdf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(src).filter(F.col("doc_id") < n)
            .select("doc_id", "text").repartition(32)
            .localCheckpoint(eager=True))

    def build(batches):
        import pandas as pd

        from memory_opensource_spark.sources.pdf import write_pdf
        for pdf in batches:
            rows = []
            for d, text in zip(pdf["doc_id"], pdf["text"]):
                d, text = int(d), str(text)
                pages = [text[i:i + 120] for i in range(0, len(text), 120)]
                if mode == "cmap":
                    rows.append((d, write_pdf(
                        pages or [""], compress=d % 2 == 0,
                        cmap_font=d % 3 != 1,
                        diff_encoding=d % 3 >= 1
                        and len({c for p in pages for c in p
                                 if c != "\n"}) <= 0xFE)))
                elif mode == "scanned":
                    rows.append((d, write_pdf(
                        pages or [""], compress=d % 2 == 0,
                        scanned=True)))
                else:
                    rows.append((d, write_pdf(
                        pages or [""], compress=d % 2 == 0,
                        hex_strings=d % 5 == 1,
                        split_streams=d % 4 == 0)))
            yield pd.DataFrame(rows, columns=["doc_id", "content"])

    t0 = time.time()
    pdfs = docs.mapInPandas(build, "doc_id long, content binary") \
        .localCheckpoint(eager=True)
    n_built = pdfs.count()
    t_build = time.time() - t0
    total_bytes = pdfs.agg(F.sum(F.length("content"))).first()[0]

    def parse(batches):
        import hashlib

        import pandas as pd

        from memory_opensource_spark.sources.pdf import (extract_pdf_pages,
                                                          ocr_stub)
        ocr = ocr_stub if mode == "scanned" else None
        for pdf in batches:
            rows = []
            for d, content in zip(pdf["doc_id"], pdf["content"]):
                pages = extract_pdf_pages(bytes(content), ocr=ocr)
                joined = "".join(pages)
                rows.append((int(d), len(pages),
                             hashlib.md5(joined.encode()).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "n_pages", "md5"])

    t0 = time.time()
    parsed = pdfs.mapInPandas(parse, "doc_id long, n_pages int, md5 string") \
        .localCheckpoint(eager=True)
    n_parsed = parsed.count()
    t_parse = time.time() - t0

    bad = (parsed.join(docs, "doc_id")
           .filter(F.md5(F.col("text")) != F.col("md5")).count())
    out = {"n_docs": n, "mode": mode, "built": n_built, "parsed": n_parsed,
           "pdf_mb": round(total_bytes / 1e6, 1),
           "build_s": round(t_build, 2), "parse_s": round(t_parse, 2),
           "parse_docs_per_s": round(n_parsed / t_parse),
           "roundtrip_mismatches": bad}
    print(json.dumps(out))
    assert bad == 0, f"{bad} round-trip mismatches"


if __name__ == "__main__":
    main()
