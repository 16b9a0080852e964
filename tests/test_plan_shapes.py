"""Physical-plan shape guards: the properties PERF.md's audit documents must
hold in CI, not just at review time.  A regression that flips a broadcast join
to SortMergeJoin or drops a top-k into a global sort changes nothing at
fixture scale but everything at 100 TB — these tests fail it immediately."""

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from memory_opensource_spark.queries import QUERIES

    # long conjunct lists truncate scan metadata at the default 100 chars,
    # silently cutting the PushedFilters field out of toString() output
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        df = QUERIES[name](spark, SF_DIR)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.maxMetadataStringLength")


def test_flagship_is_takeordered_no_sortmerge(spark):
    p = _plan(spark, "search_flagship")
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_graph_pattern_broadcasts_node_dims(spark):
    p = _plan(spark, "g1_pattern_match")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
    # the DISTINCT-path dedup must stay a pure-grouping HashAggregate: the
    # old key-subset dropDuplicates aggregated labels with first(), whose
    # string buffer forced SortAggregate — every path row sorted per task
    # (r13 optimization; same row set, the labels are functionally
    # dependent on the endpoint ids)
    assert "SortAggregate" not in p
    assert "HashAggregate" in p


def test_topk_queries_avoid_global_sort(spark):
    for name in ["v2_cosine_topk", "q3_top_orders", "text_top_terms"]:
        p = _plan(spark, name)
        assert "SortMergeJoin" not in p, name
        assert "TakeOrderedAndProject" in p, name


def test_dedup_band_table_stays_jvm_side(spark):
    p = _plan(spark, "dedup_minhash_bands")
    assert "SortMergeJoin" not in p
    for marker in ["ArrowEvalPython", "BatchEvalPython", "MapInPandas"]:
        assert marker not in p, marker


def test_acl_filter_pushes_to_scan(spark):
    import re

    p = _plan(spark, "q1_pricing_summary")
    pushed = re.findall(r"PushedFilters: \[[^\]]*\w", p)
    assert pushed, "expected non-empty PushedFilters at the parquet scan"


def test_spec_pushdown_filters_at_chunk_scan(spark):
    """search_spec_pushdown (denormalized point-payload layout): the F3/F7
    atomic-column predicates must reach PushedFilters on the chunk parquet
    scan, and the pre-top-k pipeline must contain NO join — the only join in
    the whole plan is the post-top-k broadcast fetch of memory rows."""
    import re

    p = _plan(spark, "search_spec_pushdown")
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", p)
    assert any("consent" in s for s in pushed), pushed
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    # everything upstream of the chunk top-k is join-free: the plan prints
    # root-first, so the LAST TakeOrderedAndProject is the pre-fetch chunk
    # top-k (limit=60 overfetch); nothing below it may be a join
    below_topk = p.rsplit("TakeOrderedAndProject", 1)[1]
    assert "(limit=60" in below_topk[:40], below_topk[:200]
    assert "Join" not in below_topk, below_topk[:2000]


def test_mm_metadata_filter_never_reads_blobs(spark):
    """mm_metadata_pruning: filtering media on typed metadata must not read
    the binary payload — ReadSchema on the documents scan excludes `text`
    (which the content bytes derive from), proving blob-column pruning."""
    import re

    p = _plan(spark, "mm_metadata_pruning")
    schemas = re.findall(r"ReadSchema: (\S+)", p)
    assert schemas, p[:500]
    assert all("text" not in s for s in schemas), schemas


def test_salted_join_splits_hot_key_across_partitions(spark):
    """Skew mitigation proof (operators/skew.salted_join): with one key
    owning 50% of the big side, the salted join's shuffle key (key, _salt)
    must spread the hot key over ~`buckets` groups — no single group (and
    so no single shuffle task) carries the whole hot key."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.skew import with_salt

    buckets = 8
    n = 40_000
    big = (spark.range(n)
           .withColumn("key", F.when(F.col("id") % 2 == 0, F.lit(0))
                       .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))))
    salted = with_salt(big, ["id"], buckets)
    sizes = (salted.filter(F.col("key") == 0).groupBy("_salt").count()
             .collect())
    assert len(sizes) == buckets            # the hot key split into 8 groups
    hot_total = n // 2
    # each group is near hot_total/buckets — no group re-concentrates the key
    assert max(r["count"] for r in sizes) < hot_total / buckets * 1.5


def test_bloom_prefilter_stays_jvm_side(spark):
    """r9: contamination_bloom's membership probe must be pure codegen'd
    expressions (element_at + mask tests) — a Python-UDF bloom would drag
    every corpus gram across the Arrow boundary — and the bitmap must ride
    a BROADCAST, never a shuffled join."""
    p = _plan(spark, "contamination_bloom")
    for marker in ["ArrowEvalPython", "BatchEvalPython"]:
        assert marker not in p, marker
    # the bitmap rides a broadcast (one array<long> row)
    assert "Broadcast" in p
    # NOTE deliberately NOT pinned: the refine join may sort-merge — the op
    # exists for eval sets too big to broadcast, and after the bloom filter
    # both refine sides are survivor-bounded, so a shuffled join IS the
    # intended scale shape there.


def test_recluster_remap_kernel_is_scan_side(spark):
    """r10: the corpus_recluster member remap must stay ONE scan-side
    mapInPandas pass — no Exchange (shuffle), no join, no sort.  The r9
    shape paid a members-sized doc_id join per recluster; this pin keeps
    the no-shuffle kernel from regressing."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans.corpus import _remap_members

    members = spark.createDataFrame(
        [(1, 1, 0, 1.0, [1.0, 0.0], 0.5)],
        "doc_id long, near_ok int, cluster_id int, centroid_sim double, "
        "embedding array<double>, assign_margin double")
    out = _remap_members(members, [0, 1], [[1.0, 0.0], [0.0, 1.0]], None)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Sort" not in p
    assert "MapInPandas" in p


def test_url_canonicalization_is_scan_side(spark):
    """r10: canonical_url must stay a pure projection (no UDF node, no
    shuffle before the keep-rule groupBy's single exchange)."""
    p = _plan(spark, "url_canonical_dedup")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2   # partial->final agg of ONE groupBy


def test_html_extract_is_pure_projection(spark):
    """r10: html_text_extract must stay a zero-exchange, zero-UDF scan
    projection (the regexp chain is codegen; no Python eval node)."""
    p = _plan(spark, "html_text_extract")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_warc_ingest_is_one_kernel_no_shuffle(spark):
    """r10: warc_ingest_roundtrip = binaryFile scan + ONE Arrow kernel;
    records must not shuffle between parse and projection."""
    p = _plan(spark, "warc_ingest_roundtrip")
    assert "MapInPandas" in p
    assert "Exchange" not in p


def test_boilerplate_prune_is_pure_projection(spark):
    """r11: boilerplate_prune must stay a zero-exchange, zero-UDF scan
    projection (rules R1-R7 are Column expressions over
    split/filter/transform; no Python eval node)."""
    p = _plan(spark, "boilerplate_prune")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_crawl_mini_prunes_after_url_dedup(spark):
    """r11: crawl_mini's plan must keep the expensive extract+prune
    projection AFTER the URL dedup (one groupBy exchange + the keeper
    semi-join), and the whole chain free of Python eval nodes."""
    p = _plan(spark, "crawl_mini")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "MapInPandas" not in p


def test_keeper_argmax_is_window_free_under_hot_family(spark):
    """keep_best_in_clusters on a pathological hot family (one cluster
    owning 95% of all rows): the per-family argmax must stay TWO
    COMBINABLE groupBys — no Window node anywhere in the plan, so the
    hot cluster partial-aggregates map-side instead of pinning one task
    (the r8 content-key-window lesson applied to the r12 keeper)."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.operators.dedup import (
        keep_best_in_clusters)

    n = 2000
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    # star family: 0 -- i for 95% of ids; the rest singletons
    pairs = spark.range(1, int(n * 0.95)).select(
        F.lit(0).alias("left_id"), F.col("id").alias("right_id"))
    scores = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17).cast("double").alias("q"))
    out = keep_best_in_clusters(docs, pairs, scores, score_col="q")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "keeper argmax regressed to a window"
    rows = out.collect()
    assert len(rows) == n
    fam0 = [r for r in rows if r.cluster_id == 0]
    assert len(fam0) == int(n * 0.95) - 1 + 1  # star members + hub
    assert sum(r.retained for r in fam0) == 1
    # keeper = max q (16), min id among ties inside the family
    best = min(r.doc_id for r in fam0 if r.doc_id % 17 == 16)
    assert all(r.keeper_id == best for r in fam0)


def test_robots_gate_broadcasts_rules_and_link_graph_single_shuffle(spark):
    """r13 plan pins: robots evaluation broadcasts the (stat-less kernel
    output) rules table instead of SortMergeJoining it, never goes
    cartesian, and stays Window-free; the link-graph row is scan-side +
    exactly ONE aggregation exchange.  r13-opt: the gate runs ONE rules
    evaluation (a single rlike'd broadcast join + argmax) with a flag
    join, not the old kept-leg + blocked-leg pair."""
    plan = _plan(spark, "robots_gate")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastHashJoin") == 1  # the rules join, ONCE
    assert plan.count("RLIKE") == 1              # one rules evaluation
    lg = _plan(spark, "link_graph")
    assert "Join" not in lg and "Window" not in lg
    assert lg.count("Exchange") <= 2  # partial+final agg exchanges only


def test_dsir_broadcasts_weights_and_takeordered_topk(spark):
    """r13 plan pins: the m-row bucket-weight table joins the counts
    stream as a BROADCAST (never SortMergeJoin), and the Gumbel top-k is
    TakeOrderedAndProject (per-partition heaps), not a global Sort+Limit."""
    p = _plan(spark, "dsir_importance_resample")
    assert "TakeOrderedAndProject" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_mixture_quota_join_is_broadcast(spark):
    """r13 plan pins: the G-row quota tables broadcast onto the ranked
    row stream; no SortMergeJoin anywhere in either mixture row.

    r13-opt: the shared (count, bounds) group table is lazily
    localCheckpoint'ed, so the STATIC plan carries stat-less LogicalRDD
    sides that Catalyst conservatively SortMergeJoins; what runs is the
    AQE-final plan, where every such join converts to broadcast once the
    G-row table's true size is known — so this pin executes the row (at
    sf0.001) and asserts on the final adaptive plan."""
    from memory_opensource_spark.queries import QUERIES

    for name in ["sample_mixture_temperature", "sample_mixture_unimax"]:
        df = QUERIES[name](spark, SF_DIR)
        df.collect()
        p = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==")[0])
        assert "isFinalPlan=true" in p, name
        assert "SortMergeJoin" not in p, name
        assert "BroadcastHashJoin" in p, name


def test_preference_pairs_single_aggregate_no_window(spark):
    """r13 plan pin: the struct-argmax keeper form — one combinable
    aggregate, zero Window operators (the whole point vs the textbook
    per-prompt row_number)."""
    p = _plan(spark, "dpo_preference_pairs")
    assert "Window" not in p
    assert "SortMergeJoin" not in p


def test_scanline_training_ops_no_shuffle(spark):
    """r16 plan pins: span corruption and ICT pairing are pure scan-side
    projections + bounded explodes — zero exchanges, zero joins, zero
    windows."""
    for name in ["denoise_corruption_spans", "ict_positive_pairs"]:
        p = _plan(spark, name)
        assert "Exchange" not in p, name
        assert "Join" not in p, name
        assert "Window" not in p, name


def test_training_windows_no_single_partition_window(spark):
    """r16 plan pin: the fixed-window stream position comes from the
    range-bucketed prefix machinery — no SinglePartition window spec."""
    p = _plan(spark, "training_windows")
    assert "SinglePartition" not in p
