"""One-call crawl -> training-shards batch pipeline (round-12).

The batch capstone over the crawl family: every stage already exists as
an oracle-gated operator (sources/warc, functions/urls, functions/html,
functions/boilerplate, functions/quality_clf, functions/langid,
operators/dedup, operators/bloom, operators/sampling, sources/writers) —
this module is their documented composition, the batch twin of
streaming/pipelines.foreach_batch_crawl_ingest, ordered the way the
public pipelines (CCNet / RefinedWeb / Gopher / DCLM) order them:

    WARC read -> domain blocklist -> extract + boilerplate prune
    -> URL canonical dedup -> word gate -> learned quality filter
    -> language filter -> exact dedup -> MinHash near-dup
    -> benchmark decontamination -> leakage-safe split -> shard write

Cheapest-first: the string-only stages (blocklist, URL dedup) run before
any per-byte work; the learned filters run on gate survivors; the
quadratic-prone stages (MinHash) run on the already-filtered corpus.
Scale kernels throughout (prune_lines_arrow, quality_scores_arrow,
lang_id_ngram_arrow — each row-identical to its oracle-gated Column
spec, test-pinned in their modules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def crawl_to_training_shards(spark: SparkSession, warc_glob: str,
                             out_dir: str, *,
                             blocklist: DataFrame | None = None,
                             robots: DataFrame | None = None,
                             robots_agent: str = "*",
                             eval_grams: DataFrame | None = None,
                             langs: tuple = ("en",),
                             min_words: int = 50,
                             max_words: int = 100_000,
                             jaccard_threshold: float = 0.5,
                             contamination_n: int = 8,
                             fractions: dict | None = None,
                             n_shards: int = 8,
                             seed: str = "crawl",
                             record_types: tuple = ("response",),
                             token_budget: int | None = None,
                             bpe_merges=None,
                             n_bpe_merges: int = 200) -> dict:
    """Run the full batch front-end (module docstring) and write one
    sharded parquet layout per split under ``out_dir/split=<name>``.

    Policies (each the corresponding operator's documented semantics):
    URL dedup keeps min(text) per canonical URL; ``doc_id =
    xxhash64(canonical_url)``; exact dedup keeps the min doc_id per
    content hash; near-dup pairs drop the larger doc_id (first-come-
    first-kept by id); splits assign by the CONTENT hash, so any
    surviving duplicates of one document can never straddle splits.
    ``langs=None`` skips language filtering; ``eval_grams=None`` skips
    decontamination; ``blocklist=None`` skips the domain gate;
    ``robots`` ({host, content} of fetched robots.txt bodies) adds the
    path-level politeness gate right after the domain gate (r13,
    functions/robots — RFC 9309 core).

    ``token_budget`` switches sharding from hash (document-count
    balanced) to TRAINED-TOKENIZER token budgets — the data-loader
    reality (GPT-3/Megatron corpora are budgeted in tokens of the
    tokenizer that will train on them, and long-document skew makes
    count-balanced and token-balanced shards very different): a BPE
    merge table is trained ON THE SURVIVING CORPUS (functions/bpe
    .train_bpe — one word-count groupBy + a bounded driver merge loop;
    pass ``bpe_merges`` to reuse an existing vocabulary), every
    document is costed by ``bpe_token_count`` (a zero-UDF JVM replace
    fold), and each split packs documents into sequential
    ~``token_budget``-token shards via the distributed exact prefix sum
    (writers.shard_by_token_budget — no single-partition window).

    Returns ``{"stages": {name: rows_after}, "paths": {split: path}}``
    (+ ``"bpe_merges"`` when token budgeting ran) — the stage table is
    the per-run audit trail (each count is one combinable action over
    the current frame)."""
    from ..functions import html as H
    from ..functions import urls as U
    from ..functions.boilerplate import prune_lines_arrow
    from ..functions.langid import lang_id_ngram_arrow
    from ..functions.quality_clf import quality_scores_arrow
    from ..operators import bloom, dedup
    from ..operators.sampling import assign_split_by_group
    from ..sources import warc
    from ..sources.writers import shard_write

    stages: dict[str, int] = {}

    pages = warc.read_warc(spark, warc_glob, record_types=record_types) \
        .select("target_uri", "text")
    stages["read"] = pages.count()

    if blocklist is not None:
        pages = U.filter_blocked_urls(pages, blocklist, "target_uri")
        stages["blocklist"] = pages.count()

    if robots is not None:
        # path-level politeness after the domain gate: robots is a
        # {host, content} table of fetched robots.txt bodies
        from ..functions.robots import robots_blocked, robots_rules_table
        rules = robots_rules_table(robots, agent=robots_agent)
        pages = robots_blocked(pages, rules, url_col="target_uri")
        stages["robots"] = pages.count()

    marked = pages.select(
        "target_uri",
        H.html_to_text(F.col("text"), mark_links=True).alias("pruned"))
    extracted = prune_lines_arrow(marked, "pruned")

    docs = (extracted
            .select(U.canonical_url(F.col("target_uri"))
                    .alias("canonical_url"),
                    F.col("pruned").alias("text"))
            .groupBy("canonical_url")
            .agg(F.min("text").alias("text"))
            .select(F.xxhash64("canonical_url").alias("doc_id"),
                    "canonical_url", "text")
            .localCheckpoint(eager=True))
    stages["url_dedup"] = docs.count()

    from ..functions.text import tokens
    n_words = F.size(tokens(F.col("text")))
    docs = docs.filter((n_words >= min_words) & (n_words <= max_words))
    stages["word_gate"] = docs.count()

    # localCheckpoint after each learned-filter semi-join: without it the
    # Arrow kernels re-execute for every downstream action (the quality
    # kernel would run for the quality count, the lang count AND the
    # exact-dedup checkpoint — 3x the pipeline's most expensive stage;
    # r13 ADVICE fix).  Each checkpoint materializes once and the stage
    # count reads the materialized blocks.
    q = quality_scores_arrow(docs.select("doc_id", "text"))
    docs = docs.join(q.filter(F.col("q_label") == "high")
                     .select("doc_id"), "doc_id", "left_semi") \
        .localCheckpoint(eager=True)
    stages["quality"] = docs.count()

    if langs is not None:
        lid = lang_id_ngram_arrow(docs.select("doc_id", "text"))
        docs = docs.join(
            lid.filter(F.col("lang").isin(list(langs))).select("doc_id"),
            "doc_id", "left_semi") \
            .localCheckpoint(eager=True)
        stages["lang"] = docs.count()

    # exact dedup: min doc_id per content hash (combinable groupBy)
    keep = (docs.select("doc_id", F.md5("text").alias("content_hash"))
            .groupBy("content_hash").agg(F.min("doc_id").alias("doc_id")))
    docs = docs.join(keep.select("doc_id"), "doc_id", "left_semi") \
        .localCheckpoint(eager=True)
    stages["exact_dedup"] = docs.count()

    pairs = dedup.minhash_near_duplicates(
        docs, id_col="doc_id", text_col="text",
        threshold=jaccard_threshold)
    drops = pairs.select(
        F.greatest(F.col("left_id"), F.col("right_id")).alias("doc_id")) \
        .distinct()
    docs = docs.join(drops, "doc_id", "left_anti")
    stages["near_dedup"] = docs.count()

    if eval_grams is not None:
        n_grams = eval_grams.count()
        num_bits, k = bloom.optimal_params(max(1, n_grams))
        bits = bloom.bloom_build(eval_grams, "gram", num_bits, k)
        flags = bloom.ngram_contamination_flags(
            docs, eval_grams.select("gram"), bits, num_bits, k,
            n=contamination_n)
        docs = docs.join(
            flags.filter(F.col("contaminated") == 1).select("doc_id"),
            "doc_id", "left_anti")
        stages["decontaminated"] = docs.count()

    # leakage-safe split: the group key is the CONTENT hash — duplicate
    # families never straddle splits (operators/sampling semantics)
    split = assign_split_by_group(
        docs.withColumn("content_hash", F.md5("text")),
        "content_hash", fractions=fractions).localCheckpoint(eager=True)
    result: dict = {}
    if token_budget is not None:
        from ..functions.bpe import bpe_token_count, train_bpe
        from ..sources.writers import shard_by_token_budget

        merges = (list(bpe_merges) if bpe_merges is not None
                  else train_bpe(split, "text", n_merges=n_bpe_merges))
        result["bpe_merges"] = merges
        costed = split.withColumn(
            "n_bpe_tokens", bpe_token_count(F.col("text"), merges))
    paths = {}
    for name in sorted({r.split for r in
                        split.select("split").distinct().collect()}):
        path = os.path.join(out_dir, f"split={name}")
        if token_budget is not None:
            sharded = shard_by_token_budget(
                costed.filter(F.col("split") == name), token_budget,
                id_col="doc_id", tokens_col="n_bpe_tokens")
            (sharded.select("doc_id", "canonical_url", "text",
                            "n_bpe_tokens", "shard")
             .repartition(max(1, n_shards), F.col("shard"))
             .sortWithinPartitions("shard", "doc_id")
             .write.mode("overwrite").partitionBy("shard").parquet(path))
        else:
            shard_write(split.filter(F.col("split") == name)
                        .select("doc_id", "canonical_url", "text"),
                        path, n_shards, seed)
        paths[name] = path
    stages["written"] = split.count()
    result.update({"stages": stages, "paths": paths})
    return result


def crawl_frontier(seeds: DataFrame, pages: DataFrame, *,
                   rounds: int,
                   rules: DataFrame | None = None,
                   blocklist: list[str] | None = None,
                   url_col: str = "url",
                   html_col: str = "html") -> DataFrame:
    """Bounded-round crawl-frontier expansion (r14, VERDICT r11 task 6):
    the discovery-side analog of G2's bounded path join.  ``seeds``
    ({url}) expand against ``pages`` ({url, html} — what a fetch of url
    returns) for ``rounds`` BFS rounds; each round the frontier's
    outbound links (functions/html.extract_links resolution rules) are
    canonicalized (functions/urls.canonical_url), deduplicated against
    every URL ever CONSIDERED (fetched, blocked or dead — a blocked URL
    is never re-gated), gated by the domain ``blocklist``
    (functions/urls.url_blocked) and the parsed robots ``rules``
    (functions/robots.robots_blocked), and fetched by equi-join against
    ``pages``.  Returns ``{url, round}`` — one row per FETCHED page,
    round = first fetch round (0 = the gated seeds).

    Shape per round (100 TB): one anti-join against the seen set, the
    broadcast robots rules join, and ONE equi-join against ``pages`` —
    the frontier side is the small one (Catalyst broadcasts it under
    AQE once its size is known).  Every round's frontier and the seen
    set are ``localCheckpoint``ed, so lineage does NOT grow with round
    count — the pointer-jumping discipline from
    operators/graph.connected_components; the accumulated result plan
    is a UNION of checkpointed leaves with zero residual joins
    (test-pinned).  Reference analog: the reference has no crawler —
    this is the LLM-data-pipeline discovery stage (sitemap_frontier and
    link_graph are its single-pass legs) feeding
    crawl_to_training_shards."""
    from ..functions.html import extract_links
    from ..functions.robots import robots_blocked
    from ..functions.urls import canonical_url, url_blocked

    def gate(df: DataFrame) -> DataFrame:
        out = df
        if blocklist:
            out = out.filter(~url_blocked(F.col(url_col), blocklist))
        if rules is not None:
            out = robots_blocked(out, rules, url_col=url_col)
        return out

    seen = (seeds.select(canonical_url(F.col(url_col)).alias(url_col))
            .distinct().localCheckpoint(eager=True))
    frontier = (gate(seen)
                .join(pages.select(url_col, html_col), url_col)
                .localCheckpoint(eager=True))
    out = frontier.select(url_col, F.lit(0).alias("round"))
    for r in range(1, rounds + 1):
        cand = (frontier
                .select(F.explode(extract_links(
                    F.col(html_col), F.col(url_col))).alias("_raw"))
                .select(canonical_url(F.col("_raw")).alias(url_col))
                .distinct()
                .join(seen, url_col, "left_anti")
                .localCheckpoint(eager=True))
        # seen is a UNION of already-checkpointed leaves — flat lineage
        # by construction, no checkpoint job of its own needed
        seen = seen.unionByName(cand)
        frontier = (gate(cand)
                    .join(pages.select(url_col, html_col), url_col)
                    .localCheckpoint(eager=True))
        out = out.unionByName(
            frontier.select(url_col, F.lit(r).alias("round")))
    return out


def cdx_index(pages: DataFrame, *, url_col: str = "url",
              payload_col: str = "payload",
              range_shards: int | None = None,
              extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """CDX-style capture index over fetched pages (r15) — the
    Common-Crawl/Wayback lookup layout: one row per capture with
    ``{urlkey, url, digest, length, shard}`` where ``urlkey`` is the
    SURT form (functions/urls.surt — the sort key that clusters a
    domain and its subdomains into one prefix range), ``digest`` the
    sha-256 of the payload (dedup/revisit detection; classic CDX uses
    sha-1, the digest algorithm is a format parameter), ``length`` the
    payload byte length.

    Sharding: the deterministic default assigns ``shard`` by the
    urlkey's first character — coarse but pure-Column (the oracle can
    mirror it) and still prefix-prunable.  ``range_shards=N`` switches
    to the PRODUCTION layout: ``repartitionByRange(N, urlkey)`` —
    Spark samples range boundaries over the sort key exactly like
    zipnum's split file, giving N balanced, binary-searchable shards —
    and records ``spark_partition_id()`` as the shard (boundaries are
    sample-dependent, so this path is for writing real indexes, not
    for the value-hash gate)."""
    from ..functions.urls import surt

    out = pages.select(
        surt(F.col(url_col)).alias("urlkey"),
        F.col(url_col).alias("url"),
        F.sha2(F.col(payload_col).cast("string"), 256).alias("digest"),
        F.octet_length(F.col(payload_col).cast("string")).alias("length"),
        *[F.col(c) for c in extra_cols],
    )
    if range_shards is not None:
        return (out.repartitionByRange(range_shards, "urlkey")
                .withColumn("shard", F.spark_partition_id()))
    return out.withColumn("shard", F.substring("urlkey", 1, 1))


def cdx_revisits(captures: DataFrame, *, key_col: str = "urlkey",
                 ts_col: str = "ts",
                 digest_col: str = "digest") -> DataFrame:
    """Revisit detection over a capture index (r15) — the Wayback/WARC
    ``revisit`` record: a capture whose payload digest equals the
    PREVIOUS capture of the same urlkey is a revisit (the fetcher
    stores a pointer instead of the body — at recrawl cadence this is
    most of a mature crawl's bytes).  Adds ``{revisit, first_capture}``
    (ints).  The comparison is against the immediately preceding
    capture, not the whole history — the WARC profile's
    ``identical-payload-digest`` semantics: A,B,A reads as three stored
    bodies, A,A,B as one revisit.

    Shape: ONE window partitioned by urlkey ordered by ts — safe here
    because a urlkey's group is bounded by its recrawl count (dozens),
    never corpus-sized; the host-skew hazard class does not apply to a
    per-URL key."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(),
                                            F.col(digest_col).asc())
    prev = F.lag(F.col(digest_col)).over(w)
    # first_capture = row_number()==1 — frame-independent previous-ROW
    # existence.  The r15 self-sweep keyed it on lag(ts) ("the non-null
    # order key") so a NULL digest could not fool it, but sweep 18
    # found the symmetric hole: a NULL **ts** capture sorts first and
    # its successor's lag(ts) is NULL, double-flagging first_capture.
    # row_number is fooled by neither.
    return (captures
            .withColumn("revisit",
                        (prev.isNotNull()
                         & (prev == F.col(digest_col))).cast("int"))
            .withColumn("first_capture",
                        (F.row_number().over(w) == 1).cast("int")))


def sitemap_expand(seeds: DataFrame, sitemaps: DataFrame, *,
                   rounds: int,
                   url_col: str = "url",
                   body_col: str = "body") -> DataFrame:
    """Bounded sitemap-index recursion (r15) — sitemap-of-sitemaps, the
    ubiquitous large-site layout: ``seeds`` ({url}) name fetched
    sitemap documents in ``sitemaps`` ({url, body}); each round
    extracts every ``<loc>`` (functions/urls.sitemap_locs),
    canonicalizes, drops anything already CONSIDERED (the
    crawl_frontier seen-set discipline), and splits the rest by one
    equi-join against ``sitemaps``: a loc WITH a fetched body is a
    child sitemap and expands next round; a loc WITHOUT one is a
    frontier LEAF, emitted as ``{url, level}`` (level = discovery
    round).  Mixed indexes (page locs beside child-sitemap locs) fall
    out naturally — classification is by what the fetch table holds,
    exactly how a crawler tells them apart (it fetches the loc and
    looks).  Per-round localCheckpoint keeps lineage flat
    (crawl_frontier's pointer-jumping discipline)."""
    from ..functions.urls import canonical_url, sitemap_locs

    # canonicalize the FETCH TABLE keys too (sweep 18): seeds and
    # extracted locs are canonicalized, so a sitemap stored under an
    # uncanonical fetch URL (trailing default port, fragment…) would
    # otherwise never match the equi-join and silently read as a leaf.
    # Two raw URLs collapsing to one canonical key keep the MIN body —
    # an arbitrary but deterministic pick (dropDuplicates is not).
    # checkpoint the canonical fetch table ONCE (r13 opt): it is joined
    # twice per round (bodies + classification), and without the lineage
    # cut each consumer replays the canonicalize + min-body groupBy
    sitemaps = (sitemaps
                .select(canonical_url(F.col(url_col)).alias(url_col),
                        F.col(body_col))
                .groupBy(url_col).agg(F.min(body_col).alias(body_col))
                .localCheckpoint(eager=False))
    seen = (seeds.select(canonical_url(F.col(url_col)).alias(url_col))
            .distinct().localCheckpoint(eager=False))
    frontier = seen
    out = None
    for level in range(1, rounds + 1):
        bodies = frontier.join(sitemaps.select(url_col, body_col), url_col)
        # ONE left join against the fetch table classifies each new loc
        # (fetched body => child sitemap, else frontier leaf) — replacing
        # the r15 semi-join + anti-join pair — and ONE lazy checkpoint per
        # round keeps lineage flat for its three consumers (seen union,
        # next-round frontier, leaves); the r15 form paid three EAGER
        # checkpoint jobs per round (locs, is_map, leaves), serializing
        # 3*rounds job barriers that carried no information the single
        # tagged table does not (plans/r13/sitemap_index_recursion_*).
        tagged = (bodies
                  .select(F.explode(sitemap_locs(F.col(body_col)))
                          .alias("_raw"))
                  .select(canonical_url(F.col("_raw")).alias(url_col))
                  .distinct()
                  .join(seen, url_col, "left_anti")
                  .join(sitemaps.select(url_col,
                                        F.lit(1).alias("_is_map")),
                        url_col, "left")
                  .localCheckpoint(eager=False))
        seen = seen.unionByName(tagged.select(url_col))
        leaves = (tagged.filter(F.col("_is_map").isNull())
                  .select(url_col, F.lit(level).alias("level")))
        out = leaves if out is None else out.unionByName(leaves)
        frontier = tagged.filter(F.col("_is_map") == 1).select(url_col)
    return out


def recrawl_due(captures: DataFrame, *, now: float,
                base_interval: float, key_col: str = "urlkey",
                ts_col: str = "ts",
                min_interval: float = 1.0) -> DataFrame:
    """Freshness-aware recrawl scheduling (r15) — the Cho &
    Garcia-Molina change-rate discipline: pages that changed often in
    their capture history are revisited sooner, static ones later.

    Per urlkey over its capture history (``captures`` carries the
    :func:`cdx_revisits` flags): ``change_rate`` = changed transitions
    / observed transitions (a capture that is NOT a revisit of its
    predecessor counts as a change; first captures are not
    transitions), ``interval = max(min_interval, base_interval * (1 -
    change_rate) + min_interval * change_rate)`` linearly interpolated
    — a page changing every fetch gets ``min_interval``, a never-
    changing page the full ``base_interval`` — and ``due = 1`` when
    ``now - last_ts >= interval``.  Returns one row per urlkey:
    ``{urlkey, n_captures, change_rate, interval, due}``.

    Shape: ONE combinable groupBy per urlkey (count/sum/max — map-side
    partial), no window, no skew surface: at 100 TB the schedule for a
    billion URLs is a single agg over the capture index."""
    changes = F.sum((1 - F.col("revisit"))
                    * (1 - F.col("first_capture")))
    transitions = F.sum(1 - F.col("first_capture"))
    agg = captures.groupBy(key_col).agg(
        F.count("*").alias("n_captures"),
        F.max(F.col(ts_col)).alias("_last"),
        F.when(transitions > 0, changes / transitions)
        .otherwise(F.lit(0.0)).alias("change_rate"))
    interval = F.greatest(
        F.lit(float(min_interval)),
        F.lit(float(base_interval)) * (1 - F.col("change_rate"))
        + F.lit(float(min_interval)) * F.col("change_rate"))
    return agg.select(
        key_col, "n_captures",
        F.round("change_rate", 6).cast("double").alias("change_rate"),
        F.round(interval, 6).cast("double").alias("interval"),
        (F.lit(float(now)) - F.col("_last") >= interval)
        .cast("int").alias("due"))


def politeness_waves(frontier: DataFrame, per_wave: int, *,
                     host_col: str = "host",
                     url_col: str = "url",
                     delays: DataFrame | None = None,
                     wave_seconds: float | None = None,
                     range_buckets: int = 32,
                     priority_col: str | None = None) -> DataFrame:
    """Per-host politeness scheduling for a fetch frontier (r14): a
    polite crawler fetches at most ``per_wave`` URLs per host per wave,
    so the frontier is partitioned into fetch WAVES — ``wave =
    (per-host rank - 1) // host_cap``, rank ordered by a salted md5 of
    the URL (a deterministic uniform spread, so every wave samples the
    host's URL space instead of draining it in path order).  Adds
    ``{wave}``.

    ``delays`` + ``wave_seconds`` (r14, second leg): when a per-host
    ``{host, crawl_delay}`` table (functions/robots.robots_delays_table
    — the applying group's de-facto Crawl-delay seconds) and the wave's
    wall-clock duration are given, a declaring host's cap becomes
    ``min(per_wave, max(1, floor(wave_seconds / crawl_delay)))`` — a
    host asking for 10 s between fetches gets at most 6 URLs in a 60 s
    wave regardless of ``per_wave``.  Hosts without a declared delay
    keep ``per_wave``.

    ``priority_col`` (r15, third leg): a numeric per-URL crawl priority
    (host in-degree, OPIC score, sitemap freshness…) — higher-priority
    URLs take the EARLIER waves of their host, so a rate-limited crawl
    fetches the frontier's most-linked pages first (the focused-crawl
    discipline).  Rank order becomes (priority DESC, salted-md5 ASC):
    the md5 spread still breaks ties uniformly within a priority level.
    Priorities clamp to [0, 2^29] (the packed rank key reserves 33 bits
    for the md5 tiebreak) — a larger score is saturation, not error.

    Shape (100 TB): the skew-proof exact grouped rank
    (operators/sampling.grouped_exact_ranks — percentile range-buckets
    + broadcast offsets; windows partitioned by (host, bucket), never
    by host alone), so one mega-host (the Zipfian crawl reality:
    wikipedia/github dominate frontiers) never pins a single task; the
    delays table is one broadcast left join.  Complements
    crawl_frontier: rounds bound DEPTH, waves bound PER-HOST RATE
    within a round."""
    from ..operators.sampling import grouped_exact_ranks

    if per_wave < 1:
        raise ValueError(f"per_wave must be >= 1, got {per_wave}")
    if (delays is None) != (wave_seconds is None):
        raise ValueError("delays and wave_seconds go together")
    cols = frontier.columns
    md5l = F.conv(
        F.substring(F.md5(F.concat(F.lit("wave:"), F.col(url_col))), 1, 8),
        16, 10).cast("long")
    if priority_col is not None:
        # pack (priority desc, md5 asc) into ONE ascending long for the
        # range-bucketed rank: -(clamped priority) << 33 keeps the 32-bit
        # md5 strictly inside a priority level (no cross-level collision)
        pri = F.least(
            F.greatest(F.coalesce(F.col(priority_col).cast("long"),
                                  F.lit(0)), F.lit(0)),
            F.lit(1 << 29))
        ordc = (F.lit(0) - pri) * F.lit(1 << 33) + md5l
    else:
        ordc = md5l
    keyed = (frontier
             .withColumn("_g", F.struct(F.col(host_col).alias("k")))
             .withColumn("_ord", ordc))
    ranked = grouped_exact_ranks(keyed, "_ord", url_col,
                                 range_buckets)
    cap = F.lit(per_wave)
    if delays is not None:
        dcap = F.least(
            F.lit(per_wave),
            F.greatest(F.lit(1), F.floor(
                F.lit(float(wave_seconds)) / F.col("crawl_delay"))
                .cast("int")))
        ranked = ranked.join(
            F.broadcast(delays.select(
                F.col("host").alias(host_col), "crawl_delay")),
            host_col, "left")
        cap = F.coalesce(
            F.when(F.col("crawl_delay") > 0, dcap), F.lit(per_wave))
    return ranked.select(
        *cols,
        (((F.col("_rk") - 1) / cap).cast("int")).alias("wave"))
