"""Binary-document ingestion (S11 end-to-end): file source -> parse provider ->
hierarchical chunks -> memories.

Mirrors routers/v1/document_routes_v2.py:75 + core/document_processing/*:
uploaded files go to an OCR/parse provider (Reducto/Gemini/PaddleOCR in the
reference — network services), whose pages then flow through the hierarchical
chunker.  Here the provider is a STUB (bytes -> utf-8 text, deterministic) kept
behind the provider-adapter signature; everything Spark-side is production
shaped:

- ``spark.read.format("binaryFile")`` — each file one row {path, content};
  ``spark.sql.files.maxPartitionBytes`` governs blobs/task (decode is CPU-bound);
- parse runs in mapInPandas (Arrow batches of whole files);
- chunking/embedding reuse plans.ingest (pure Column expressions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

PARSED_SCHEMA = StructType([
    StructField("doc_path", StringType()),
    StructField("memory_id", StringType()),
    StructField("content", StringType()),
])


def stub_parse_provider(content: bytes, path: str) -> str:
    """Provider-adapter stand-in (core/document_processing/provider_adapter.py):
    a real adapter would call Reducto/Gemini/PaddleOCR here.  The stub decodes
    utf-8 (deterministic); binary junk degrades to replacement chars rather
    than failing the pipeline — matching the reference's per-file error
    isolation."""
    return content.decode("utf-8", errors="replace")


def read_binary_documents(spark: SparkSession, path: str,
                          glob: str = "*.txt") -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )


def parse_documents(files: DataFrame, provider=stub_parse_provider) -> DataFrame:
    """files: {path, content(binary)} -> {doc_path, memory_id, content(text)}."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            # column-zip, not iterrows: avoids a Series per row
            for path, content in zip(pdf["path"], pdf["content"]):
                text = provider(bytes(content), path)
                name = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                # basename + short FULL-PATH hash: same-named files in
                # different directories must not collide into one memory_id
                # (downstream chunk_id MERGE would silently drop one
                # document — round-5 review finding)
                phash = hashlib.sha256(str(path).encode()).hexdigest()[:8]
                rows.append((path, f"doc_{name}_{phash}", text))
            yield pd.DataFrame(rows, columns=["doc_path", "memory_id", "content"])

    return files.mapInPandas(run, PARSED_SCHEMA)


def ingest_documents(spark: SparkSession, path: str, existing_chunks: DataFrame,
                     dim: int = 64, glob: str = "*.txt") -> dict[str, DataFrame]:
    """The full S11 write path: binary files -> parse -> chunk -> embed ->
    near-dup reuse -> {chunks, reused} (plans.ingest contract)."""
    from ..plans.ingest import ingest

    files = read_binary_documents(spark, path, glob)
    parsed = parse_documents(files)
    return ingest(parsed.select("memory_id", "content"), existing_chunks, dim=dim)


# --- hierarchical chunker (page -> section -> chunk, reference-parity depth) -------

#: header patterns checked in the reference's order; first match wins
#: (core/document_processing/hierarchical_chunker.py:346-388 _detect_header_level)
_HEADER_PATTERNS = [
    (r"^[0-9]+\.\s*[A-Z]", 1),        # 1. Title
    (r"^[0-9]+\.[0-9]+\s*[A-Z]", 2),  # 1.1 Subtitle
    (r"^[A-Z]\.\s*[A-Z]", 3),         # A. Title
    (r"^[IVX]+\.\s*[A-Z]", 4),        # Roman numerals
]
_TITLECASE = r"^[A-Z]\S*(\s+[A-Z]\S*){0,7}$"

#: domain-aware header keywords, checked BEFORE the generic rules when a
#: domain is configured (hierarchical_chunker.py:389-429
#: _detect_domain_header_level; default domain None -> rules never fire).
#: (keyword, level, prefix_only) per domain; substring match unless prefix.
_DOMAIN_HEADERS: dict[str, list[tuple[str, int, bool]]] = {
    "finance": (
        [(k, 1, False) for k in [
            "management's discussion", "md&a", "risk factors",
            "consolidated financial statements", "financial statements",
            "notes to consolidated", "balance sheet", "income statement",
            "cash flows", "results of operations"]]
        + [(k, 2, False) for k in [
            "revenues", "operating expenses", "r&d", "research and development",
            "ebitda", "gross margin", "operating margin", "profit margin"]]
    ),
    "healthcare": (
        [(k, 1, False) for k in ["patient history", "test results", "imaging",
                                 "mri", "ct", "x-ray"]]
        + [(k, 2, False) for k in ["blood test", "labs", "hemoglobin", "cbc",
                                   "panel", "findings", "impression"]]
    ),
    "science": (
        [(k, 1, True) for k in ["abstract", "introduction", "methods",
                                "results", "discussion", "conclusion"]]
        + [(k, 2, False) for k in ["figure", "table", "experiment",
                                   "evaluation", "metrics"]]
    ),
}
#: reference accepts several aliases per domain (:397,:413,:421)
_DOMAIN_ALIASES = {"financial": "finance", "medical": "healthcare",
                   "scientific": "science", "research": "science"}


def _domain_level(line, domain: str | None):
    """Column form of _detect_domain_header_level: level-1 keys first, then
    level-2 (the reference checks lvl1 `any` before lvl2), 0 otherwise."""
    if not domain:
        return F.lit(0)
    rules = _DOMAIN_HEADERS.get(_DOMAIN_ALIASES.get(domain.lower(),
                                                    domain.lower()))
    if not rules:
        return F.lit(0)
    low = F.lower(line)

    def hit(level):
        cond = F.lit(False)
        for k, lvl, prefix in rules:
            if lvl != level:
                continue
            cond = cond | (low.startswith(k) if prefix else low.contains(k))
        return cond

    return F.when(hit(1), F.lit(1)).when(hit(2), F.lit(2)).otherwise(F.lit(0))


def _header_level(line, prev_line, next_line, domain: str | None = None):
    """Column expression mirror of _detect_header_level (:346-388): domain
    keyword rules first (when configured, :350-353), length guard, numbered
    patterns (first match), ALL-CAPS -> 1, title-case with a blank interior
    neighbor -> 2."""
    n_words = F.size(F.split(line, r"\s+"))
    guard = (F.length(line) >= 3) & (F.length(line) <= 200)
    numbered = F.lit(0)
    for pat, lvl in reversed(_HEADER_PATTERNS):
        numbered = F.when(line.rlike(pat), F.lit(lvl)).otherwise(numbered)
    caps = (line == F.upper(line)) & line.rlike("[A-Z]") & (n_words <= 8)
    title = (
        line.rlike(_TITLECASE) & (n_words <= 8)
        & prev_line.isNotNull() & next_line.isNotNull()
        & ((prev_line == "") | (next_line == ""))
    )
    dom = _domain_level(line, domain)
    return (
        F.when(dom > 0, dom)      # domain rules bypass the length guard (:350)
        .when(~guard, F.lit(0))
        .when(numbered > 0, numbered)
        .when(caps, F.lit(1))
        .when(title, F.lit(2))
        .otherwise(F.lit(0))
    )


def hierarchical_chunk(docs: DataFrame, id_col: str = "memory_id",
                       content_col: str = "content",
                       target_chars: int = 120,
                       context_chars: int = 400,
                       domain: str | None = None) -> DataFrame:
    """Page -> section -> chunk hierarchy with parent ids and per-level context
    (core/document_processing/hierarchical_chunker.py:176-998), as one
    DataFrame DAG — per-document windows, no Python in the row path.

    - pages split on form-feed; lines on newline (``_identify_sections_in_page``)
    - header levels via ``_header_level``; each header starts a section, content
      before the first header lands in the implicit level-1 "Page N" section
    - parent = the most recent preceding section (any page) with a LOWER level,
      else the page pseudo-node — provably equal to the reference's
      section-stack rule (:243-294: a level-L push pops depth >= L, leaving the
      most recent lower-level section on top)
    - chunks: section-preserving size buckets — a chunk closes when the running
      character count crosses ``target_chars`` (the distributed, order-stable
      form of the greedy packer at :718-808; boundaries differ only in that the
      greedy form resets its accumulator mid-element)
    - context: up to ``context_chars`` trailing chars of the previous chunk and
      leading chars of the next (extract_element_with_context, :37-135), plus
      the owning section title

    Returns one row per chunk: {memory_id, page_num, section_id, parent_id,
    level, section_title, chunk_id, chunk_index, chunk_content,
    context_before, context_after}.
    """
    mid = F.col(id_col)

    pages = docs.select(
        mid.alias("memory_id"),
        F.posexplode(F.split(F.col(content_col), "\f")).alias("pg", "page_content"),
    ).withColumn("page_num", F.col("pg") + 1)

    wl = Window.partitionBy("memory_id", "page_num").orderBy("lpos")
    lines = (
        pages.select(
            "memory_id", "page_num",
            F.posexplode(F.split("page_content", "\n")).alias("lpos", "raw"),
        )
        .withColumn("line", F.trim("raw"))
        .withColumn("level", _header_level(
            F.col("line"), F.lag("line").over(wl), F.lead("line").over(wl),
            domain=domain))
        .filter(F.col("line") != "")
        .withColumn("sec_ord", F.sum((F.col("level") > 0).cast("int")).over(
            wl.rowsBetween(Window.unboundedPreceding, 0)))
    )
    lines = lines.withColumn(
        "section_id",
        F.concat("memory_id", F.lit("_p"), F.col("page_num").cast("string"),
                 F.lit("_s"), F.col("sec_ord").cast("string")),
    ).withColumn("page_id", F.concat("memory_id", F.lit("_p"),
                                     F.col("page_num").cast("string")))
    # r13 OPT: three consumers (headers, implicit, content) read the line
    # table; without the lineage cut each replays the page/line explodes +
    # the header-detection window.  Row count is bounded by input lines —
    # the same data a single pass already materializes in the shuffle.
    lines = lines.localCheckpoint(eager=False)

    # section frame: explicit header sections + implicit "Page N" level-1 roots
    headers = lines.filter(F.col("level") > 0).select(
        "memory_id", "page_num", "sec_ord", "section_id", "page_id",
        F.col("line").alias("section_title"), "level", "lpos",
    )
    implicit = (
        lines.filter((F.col("level") == 0) & (F.col("sec_ord") == 0))
        .groupBy("memory_id", "page_num", "sec_ord", "section_id", "page_id")
        .agg(F.min("lpos").alias("lpos"))
        .withColumn("section_title",
                    F.concat(F.lit("Page "), F.col("page_num").cast("string")))
        .withColumn("level", F.lit(1))
        .select("memory_id", "page_num", "sec_ord", "section_id", "page_id",
                "section_title", "level", "lpos")
    )
    sections = headers.unionByName(implicit)

    # parent: most recent PRECEDING section with a strictly lower level
    ws = Window.partitionBy("memory_id").orderBy("page_num", "sec_ord")
    wprev = ws.rowsBetween(Window.unboundedPreceding, -1)
    sec = sections.withColumn("gpos", F.row_number().over(ws))
    for l in (1, 2, 3):
        sec = sec.withColumn(
            f"_last{l}",
            F.max(F.when(F.col("level") == l, F.col("gpos"))).over(wprev))
    parent_pos = F.when(F.col("level") == 2, F.col("_last1")) \
        .when(F.col("level") == 3, F.greatest("_last1", "_last2")) \
        .when(F.col("level") == 4, F.greatest("_last1", "_last2", "_last3"))
    # r13 OPT: the parent lookup self-joins this frame (sec ⋈ by_pos);
    # checkpoint after the ranking windows so they run once, not twice
    sec = sec.withColumn("parent_pos", parent_pos).localCheckpoint(eager=False)
    by_pos = sec.select("memory_id", F.col("gpos").alias("parent_pos"),
                        F.col("section_id").alias("parent_section_id"))
    sec = sec.join(by_pos, ["memory_id", "parent_pos"], "left").withColumn(
        "parent_id", F.coalesce("parent_section_id", "page_id")
    ).select("memory_id", "page_num", "sec_ord", "section_id",
             "section_title", "level", "parent_id")

    # chunks: running-length buckets inside each section, order-stable assembly
    wc = Window.partitionBy("memory_id", "page_num", "sec_ord").orderBy("lpos")
    content = (
        lines.filter(F.col("level") == 0)
        .withColumn("cum", F.sum(F.length("line") + 1).over(
            wc.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("chunk_index",
                    F.floor((F.col("cum") - (F.length("line") + 1))
                            / target_chars).cast("int"))
    )
    chunks = (
        content.groupBy("memory_id", "page_num", "sec_ord", "chunk_index")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lpos", "line"))),
                lambda s: s["line"],
            ), "\n").alias("chunk_content"))
    )
    out = chunks.join(sec, ["memory_id", "page_num", "sec_ord"])

    wd = Window.partitionBy("memory_id").orderBy("page_num", "sec_ord", "chunk_index")
    prev_c, next_c = F.lag("chunk_content").over(wd), F.lead("chunk_content").over(wd)
    ctx_before = F.coalesce(
        F.when(F.length(prev_c) > context_chars,
               F.substring(prev_c, -context_chars, context_chars)).otherwise(prev_c),
        F.lit(""))
    ctx_after = F.coalesce(F.substring(next_c, 1, context_chars), F.lit(""))
    return out.select(
        "memory_id", "page_num", "section_id", "parent_id", "level",
        "section_title",
        F.concat("section_id", F.lit("_c"), F.col("chunk_index").cast("string")
                 ).alias("chunk_id"),
        "chunk_index", "chunk_content",
        ctx_before.alias("context_before"), ctx_after.alias("context_after"),
    )
