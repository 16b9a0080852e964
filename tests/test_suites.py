"""Evidence suites (suites.py): uniform-schema projections bundling several
SURVEY §2 components into one driver correctness row."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

UNIFORM_COLS = ["component", "id", "num"]


def _components(df):
    return {r[0] for r in df.select("component").distinct().collect()}


def test_registry_prefix_covers_component_families():
    """The driver verifies the first 50 registrations; that prefix must keep
    one row per component family (the whole point of the suites)."""
    from memory_opensource_spark.queries import QUERIES

    top50 = list(QUERIES)[:50]
    required = [
        "search_flagship", "suite_storage_lifecycle",
        "suite_graph_sinks", "suite_filters",
        "v4_ingest_reuse", "v5_bucketed_pairs",
        "v6_entity_resolution",
        "suite_graph_lookup",
        "g8_schema_driven_merge", "suite_graph_store",
        "r2_stratified_merge",
        "suite_ranking_formulas",
        "suite_stream_windows",
        # round-13: ids_chunk_algebra displaced for the round's flagship
        # new operator (id algebra stays driver-exercised in the flagships)
        "pdf_text_extract", "suite_text_analysis",
        "suite_dedup_family", "ann_ivf_persisted",
        "suite_graph_analytics",
        # round-4 additions (V2-batch moved below fold in their favor:
        # still locally gated, V2 covered by v2_cosine_topk + flagships)
        "search_spec_pushdown", "g15_acl_both_endpoints", "suite_pipeline_ops",
        # round-7 rotation (VERDICT r6 item 4): the four below-fold round-6
        # ops into the driver window, displacing long-green r5-era rows
        # (v9_grouped_points, st2_session_windows, txn_merge_roundtrip,
        # zorder_layout_roundtrip move below fold — still locally gated,
        # semantics unchanged since they were last driver-checked)
        # round-13: ann_pq_rerank and compress_sessions displaced
        # (driver-green r6-r10 / r1-r10) for the round's two other new
        # registrations — every registration holds a driver slot:
        "connector_transpose", "shard_bpe_budget",
        # round-13 rotation (driver r11): omo_export_roundtrip /
        # lm_quality_scores / g14_constraint_when displaced (driver-green
        # r6-r10 / r6-r10 / r3-r10; OMO stays a suite_filters member,
        # quality keeps four window rows, constraints stay exercised via
        # suite_graph_store's G9 leg) for the three r12-late registrations
        # that never held a driver slot:
        "mm_media_meta", "dedup_keep_best_quality", "text_fold_punctuation",
        # round-7 rotation 2: the round's flagship new op into the window
        # (st5_decayed_counter_replay below fold — unchanged for two rounds,
        # streaming family stays windowed via suite_stream_windows)
        "corpus_increment_dedup",
        # round-8 rotation (VERDICT r7 task 3): the four r7-new pipeline ops
        # into the driver window — the span pair also carries the r8
        # skew/rolling-hash rework, so its driver turn re-gates new code.
        # Displaced (v3_scroll_fallback, v8_property_index,
        # g12_related_to_edges, g13_link_to_lookup — all driver-green for
        # multiple rounds, unchanged semantics, families keep >= 2 driver
        # rows) stay locally gated.
        "dedup_span_removal",
        "shard_token_budget",
        # round-8: the oracle-gated composition row (r12_delta_since_watermark
        # displaced — driver-green since r3, delta/watermark behavior stays
        # in suite_stream_windows)
        "pipeline_mini",
        # round-9 rotation (VERDICT r8 task 1): the r8-late rows into the
        # window (s1_fetch_by_ids / v1_chunk_embed / f1_acl_filter displaced
        # — each driver-green for many rounds; S1 fetch and F1 ACL stay
        # driver-exercised inside the flagships, V1 inside v4_ingest_reuse)
        "gopher_quality_flags", "gopher_repetition_flags",
        # round-10 rotation: the two r9-new pipeline ops into the window
        # (v2_cosine_topk / set_ops_semi_anti displaced — both driver-green
        # r1..r9; cosine top-k + threshold stay driver-checked inside both
        # flagships, semi/anti algebra inside storage lifecycle, dedup and
        # id-fetch rows; both stay locally gated at 3 SFs)
        "contamination_bloom", "split_leakage_safe",
        # round-11 rotation (VERDICT r9 task 1): the four r9-new
        # crawl-chain rows into the window (s12_cascade_delete /
        # f9_fallback_relax / r6_rerank / shard_corpus displaced — each
        # driver-green for many rounds, semantics unchanged; delete paths
        # stay driver-checked in suite_storage_lifecycle, sharding in
        # shard_token_budget + pack_sequences; all stay locally gated)
        "warc_ingest_roundtrip", "html_text_extract",
        "url_canonical_dedup", "crawl_mini",
        # round-12 rotation (driver r10): the three r10-new rows into the
        # window (dedup_lines / g2_two_hop_paths / ann_ivf_spill displaced
        # — driver-green for 2/9/5 rounds respectively; line dedup stays
        # driver-checked inside pipeline_mini + suite_dedup_family,
        # bounded paths inside g1 + suite_graph_analytics, IVF
        # multi-assignment inside ann_ivf_persisted + ann_pq_rerank; all
        # three stay locally gated at 3 SFs)
        "boilerplate_prune", "warc_response_extract", "text_lang_id_ngram",
        # round-12 rotation #2: the three r12-new rows into the window
        # (dedup_span_fraction / sample_domain_cap / g7_schema_discovery
        # displaced — driver-green 2/2/8 rounds; span family stays
        # driver-checked via dedup_span_removal + suite_dedup_family +
        # pipeline_mini, sampling via split_leakage_safe + shard rows,
        # graph discovery via the six remaining graph window rows; all
        # three stay locally gated at 3 SFs)
        "quality_classifier", "url_blocklist_filter", "bpe_subword_stats",
        # round-14 rotation (VERDICT r11 task 1): the four r13-late
        # crawl-discovery rows into the window (g1_pattern_match /
        # pack_sequences / dedup_semantic_clusters / mm_feature_search
        # displaced — driver-green r1..r11 / r8..r11 / r6..r11 / r4..r11;
        # G1 match stays driver-checked via g15_acl_both_endpoints +
        # suite_graph_lookup/store, packing via the two shard rows,
        # SemDeDup via v5_bucketed_pairs + v4_ingest_reuse + the dedup
        # suite, multimodal decode via mm_media_meta; all four stay
        # locally gated at 3 SFs)
        "file_type_route", "robots_gate", "link_graph", "sitemap_frontier",
    ]
    missing = [q for q in required if q not in top50]
    assert not missing, f"top-50 evidence window lost: {missing}"
    # the priority list must stay EXACTLY 50 resolvable names — shorter and
    # arbitrary below-fold rows drift up into the driver window; a stale
    # name would silently shrink the curated prefix
    from memory_opensource_spark.queries import _EVIDENCE_PRIORITY

    assert len(_EVIDENCE_PRIORITY) == 50
    stale = [n for n in _EVIDENCE_PRIORITY if n not in QUERIES]
    assert not stale, f"stale priority names: {stale}"


def test_suite_filters_components(spark):
    from memory_opensource_spark.queries import QUERIES

    df = QUERIES["suite_filters"](spark, SF_DIR)
    assert df.columns == UNIFORM_COLS
    assert _components(df) == {
        "F2_array_filter", "F3_custom_metadata_numeric", "F3_map_metadata",
        "F7_omo_safety", "F4_post_fetch", "F5_exclusion",
    }
    # F5: the exclusion list must actually be excluded
    excluded = (df.filter((F.col("component") == "F5_exclusion")
                          & F.col("id").isin("m1", "m5", "m9", "m13")).count())
    assert excluded == 0


def test_suite_storage_lifecycle_facts(spark):
    from memory_opensource_spark.queries import QUERIES

    df = QUERIES["suite_storage_lifecycle"](spark, SF_DIR).cache()
    comps = _components(df)
    assert {"S3_S4_upsert", "S5_point_delete", "S7_S8_batch_store",
            "S13_delete_all", "S14_get", "S15_update_reembed"} <= comps
    # upsert replaced content: every S3/S4 row carries the UPPER(substr) form
    up = df.filter((F.col("component") == "S3_S4_upsert")
                   & (F.col("id") != "__total__"))
    bad = up.filter(~F.split("id", r"\|")[1].rlike("^[A-Z0-9 .,;:!?'\"-]*$")).count()
    assert bad == 0
    # point delete leaves zero copies of m7
    m7 = df.filter((F.col("component") == "S5_point_delete")
                   & (F.col("id") == "m7_present")).select("num").first()[0]
    assert m7 == 0.0
    df.unpersist()


def test_f9_fallback_relax_gating(spark):
    """Strict leg has < 5 hits on the fixture, so the relaxed leg must fire
    and return exactly 5 rows (top-5 recent for the ACL user)."""
    from memory_opensource_spark.queries import QUERIES

    rows = QUERIES["f9_fallback_relax"](spark, SF_DIR).collect()
    stages = {}
    for r in rows:
        stages.setdefault(r["stage"], []).append(r["memory_id"])
    if len(stages.get("strict", [])) < 5:
        assert len(stages.get("relaxed", [])) == 5
    else:
        assert "relaxed" not in stages


def test_suite_wrapped_value_parity(spark):
    """A wrapped member must carry exactly the standalone query's rows —
    spot-check G3 via suite_graph_lookup."""
    from memory_opensource_spark.queries import QUERIES

    suite = QUERIES["suite_graph_lookup"](spark, SF_DIR)
    g3 = QUERIES["g3_node_by_property"](spark, SF_DIR)
    suite_ids = {r[0] for r in
                 suite.filter(F.col("component") == "G3_node_by_property")
                 .select("id").collect()}
    g3_ids = {"|".join([r["node_id"], r["label"], r["prop_name"]])
              for r in g3.collect()}
    assert suite_ids == g3_ids


def test_st5_replay_matches_streaming_fold(spark):
    """The registered batch replay and the SEQUENTIAL per-user fold of the
    actual streaming operator (stateful.ema_sequential_py: +1 per event,
    time decay 0.5^(dt/half_life)) agree — the round-5 rewrite made the
    driver row verify the real algebra instead of a 0.9^ordinal stand-in."""
    from memory_opensource_spark.queries import QUERIES
    from memory_opensource_spark.sources import tables
    from memory_opensource_spark.streaming.stateful import ema_sequential_py

    got = {r["user_id"]: (r["ema"], r["n_events"])
           for r in QUERIES["st5_decayed_counter_replay"](spark, SF_DIR).collect()}
    ev = (tables.load(spark, SF_DIR, "events")
          .select("user_id", F.unix_timestamp("ts").alias("t")).collect())
    ts_by_user: dict = {}
    for r in ev:
        ts_by_user.setdefault(r["user_id"], []).append(int(r["t"]) * 1_000_000)
    for uid, (ema, n) in got.items():
        assert n == len(ts_by_user[uid])
        assert abs(ema_sequential_py(ts_by_user[uid]) - ema) < 1e-4, uid


def test_corpus_profile_hll_within_5pct(spark):
    """The 100 TB path for vocabulary size is approx_count_distinct (HLL++,
    map-side mergeable); it must land within 5% of the exact count the oracle
    checks."""
    from memory_opensource_spark.sources import tables

    docs = tables.load(spark, SF_DIR, "documents")
    from memory_opensource_spark.functions.text import tokens

    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    rows = (toks.groupBy("source")
            .agg(F.countDistinct("t").alias("exact"),
                 F.approx_count_distinct("t", 0.01).alias("approx"))
            .collect())
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.05, r


def test_percentile_sketch_within_tolerance(spark):
    """t-digest-style percentile_approx (mergeable sketch, the 100 TB path)
    must land within 2% of the exact percentile the oracle checks."""
    from memory_opensource_spark.sources import tables

    docs = tables.load(spark, SF_DIR, "documents")
    r = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("exact"),
        F.percentile_approx("n_chars", 0.5, 10000).alias("approx")).first()
    assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.02, r


def test_events_in_sessions_matches_session_counts(spark):
    """The range join's per-session event count must equal the session
    window's own message count (every event lands in exactly one interval)."""
    from memory_opensource_spark.queries import QUERIES

    got = {(r["user_id"], r["session_id"]): r["n_events"]
           for r in QUERIES["events_in_sessions"](spark, SF_DIR).collect()}
    want = {(r["user_id"], r["session_id"]): r["message_count"]
            for r in QUERIES["st2_session_windows"](spark, SF_DIR).collect()}
    assert got == want


def test_suite_member_rowcount_parity(spark):
    """Each wrapped member must contribute exactly its standalone row count —
    guards against a suite projection silently dropping or duplicating rows."""
    from memory_opensource_spark.queries import QUERIES

    pairs = [
        ("suite_ranking_formulas", "R8_tier1", "r8_tier1_ranking"),
        ("suite_dedup_family", "DD_minhash_bands", "dedup_minhash_bands"),
        ("suite_text_analysis", "TXT_lang_id", "text_lang_id"),
        ("suite_graph_analytics", "GA_pagerank", "graph_pagerank"),
    ]
    for suite, comp, member in pairs:
        got = (QUERIES[suite](spark, SF_DIR)
               .filter(F.col("component") == comp).count())
        want = QUERIES[member](spark, SF_DIR).count()
        assert got == want, (suite, comp, got, want)


def test_cms_never_underestimates(spark):
    """Count-min guarantee: estimate >= exact for every queried term, and
    with 4x256 cells on this vocabulary the overestimate stays bounded."""
    from memory_opensource_spark.queries import QUERIES

    rows = QUERIES["text_cms_frequency"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact_freq"], r
