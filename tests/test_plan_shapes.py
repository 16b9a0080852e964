"""Physical-plan shape guards: the properties PERF.md's audit documents must
hold in CI, not just at review time.  A regression that flips a broadcast join
to SortMergeJoin or drops a top-k into a global sort changes nothing at
fixture scale but everything at 100 TB — these tests fail it immediately."""

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name):
    from memory_opensource_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_is_takeordered_no_sortmerge(spark):
    p = _plan(spark, "search_flagship")
    assert "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_graph_pattern_broadcasts_node_dims(spark):
    p = _plan(spark, "g1_pattern_match")
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


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
