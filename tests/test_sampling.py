"""cap_rows_per_group (operators/sampling): exact window-twin parity with no
hot-group window — the Gopher/RefinedWeb per-domain quota."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from memory_opensource_spark.operators.sampling import cap_rows_per_group


def _twin(df, group_col, cap, order_col, id_col="doc_id"):
    w = (Window.partitionBy(group_col)
         .orderBy(F.col(order_col).asc(), F.col(id_col).asc()))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def _key(rows):
    return sorted((r.doc_id, r.g) for r in rows)


def test_cap_matches_window_twin_mixed_quota(spark):
    """Groups under, at, and far over quota; ties on the order key broken by
    id; NULL order values rank first (both forms orderBy asc nulls-first)."""
    rows = []
    for i in range(40):
        rows.append((i, "big", float((i * 7) % 11)))        # heavy ties
    for i in range(40, 43):
        rows.append((i, "small", float(i)))
    for i in range(43, 48):
        rows.append((i, "edge", None))                       # NULL order
    df = spark.createDataFrame(rows, "doc_id long, g string, ord double")
    got = cap_rows_per_group(df, "g", 5, "ord", range_buckets=4)
    want = _twin(df, "g", 5, "ord")
    assert _key(got.collect()) == _key(want.collect())
    # quota respected, under-quota group intact
    sizes = {r.g: r.n for r in got.groupBy("g")
             .agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 5, "small": 3, "edge": 5}


def test_cap_null_group_is_one_group_not_dropped(spark):
    """NULL group keys must behave like the window twin's partitionBy (one
    partition), not vanish through a null-unsafe join."""
    rows = ([(i, None, float(i)) for i in range(8)]
            + [(100 + i, "a", float(i)) for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, g string, ord double")
    got = cap_rows_per_group(df, "g", 4, "ord", range_buckets=3)
    want = _twin(df, "g", 4, "ord")
    assert _key(got.collect()) == _key(want.collect())
    assert got.filter(F.col("g").isNull()).count() == 4


def test_cap_plan_has_no_unbucketed_group_window(spark):
    """Scale pin: the only window is partitioned by (group, range-bucket) —
    a hot domain never lands in one window task; and within-quota groups
    skip ranking entirely (their rows take the semi-join branch)."""
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float((i * 13) % 997))
         for i in range(500)],
        "doc_id long, g string, ord double")
    out = cap_rows_per_group(df, "g", 20, "ord", range_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # the window's partition spec carries BOTH the group struct and _rb
    import re
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines and all("_rb" in ln for ln in win_lines), win_lines


def test_cap_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id long, g string, ord double")
    with pytest.raises(ValueError, match="cap"):
        cap_rows_per_group(df, "g", 0, "ord")


def test_cap_rows_per_group_randomized_window_twin(spark):
    """r10 randomized pin: across seeded random inputs (Zipfian group
    sizes, heavy order ties, NULL groups/orders, caps straddling tie runs)
    cap_rows_per_group must keep EXACTLY the rows row_number() <= cap over
    (partition by group order by order, id) keeps."""
    import random

    from pyspark.sql import Window

    from memory_opensource_spark.operators.sampling import cap_rows_per_group

    for seed, cap in [(1, 3), (2, 1), (3, 7)]:
        rnd = random.Random(seed)
        rows = []
        for i in range(400):
            g = rnd.choice([None, "a", "a", "a", "a", "b", "b", "c"])
            o = rnd.choice([None, 0.0, 1.0, 1.0, 2.0, float(rnd.randint(0, 5))])
            rows.append((i, g, o))
        df = spark.createDataFrame(rows, "doc_id int, grp string, ord double")
        got = {r.doc_id for r in
               cap_rows_per_group(df, "grp", cap, "ord",
                                  id_col="doc_id").collect()}
        w = Window.partitionBy("grp").orderBy(
            F.col("ord").asc_nulls_first(), F.col("doc_id").asc())
        want = {r.doc_id for r in
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= cap).collect()}
        assert got == want, (seed, cap, len(got), len(want))


def test_grouped_prefix_sum_randomized_window_twin(spark):
    """r10 randomized pin: grouped_prefix_sum must equal the exclusive
    running-sum window on seeded random inputs with Zipfian groups, NULL
    groups/values, and a unique order column (its documented contract)."""
    import random

    from pyspark.sql import Window

    from memory_opensource_spark.sources.writers import grouped_prefix_sum

    for seed in (4, 5):
        rnd = random.Random(seed)
        rows = []
        for i in range(300):
            g = rnd.choice([None, "x", "x", "x", "y"])
            v = rnd.choice([None, 0, 1, 5, 100])
            rows.append((i, g, v))
        df = spark.createDataFrame(rows, "oid int, grp string, val int")
        out = grouped_prefix_sum(df, "grp", "oid", "val",
                                 range_partitions=7)
        got = {r.oid: r.prior for r in out.collect()}
        w = (Window.partitionBy("grp").orderBy("oid")
             .rowsBetween(Window.unboundedPreceding, -1))
        want = {r.oid: r.p for r in
                df.withColumn(
                    "p", F.coalesce(F.sum("val").over(w), F.lit(0)))
                .collect()}
        assert got == want, seed


def test_politeness_waves_semantics_and_plan(spark):
    """r14 plans/crawl.politeness_waves: per-host waves of K via the
    skew-proof grouped rank — wave sizes are exactly K until the host
    drains (last wave partial), waves partition each host's URLs, the
    spread is the salted-hash order (not path order), and the plan
    carries no unbucketed per-host window."""
    from pyspark.sql import functions as F

    from memory_opensource_spark.plans.crawl import politeness_waves

    rows = [("hot.example", f"https://hot.example/p/{i}")
            for i in range(105)]
    rows += [("cold.example", f"https://cold.example/p/{i}")
             for i in range(7)]
    df = spark.createDataFrame(rows, "host string, url string")
    out = politeness_waves(df, 10)
    got = out.collect()
    assert len(got) == 112
    by = {}
    for r in got:
        by.setdefault((r.host, r.wave), set()).add(r.url)
    hot_waves = sorted(w for h, w in by if h == "hot.example")
    assert hot_waves == list(range(11))          # 105 urls -> 11 waves
    for w in range(10):
        assert len(by[("hot.example", w)]) == 10
    assert len(by[("hot.example", 10)]) == 5     # partial tail
    assert len(by[("cold.example", 0)]) == 7
    # deterministic across runs
    again = {(r.host, r.url): r.wave
             for r in politeness_waves(df, 10).collect()}
    assert all(again[(r.host, r.url)] == r.wave for r in got)
    # scale pin: every window partitioned by (host-struct, range bucket)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines and all("_rb" in ln for ln in win_lines), win_lines
    with pytest.raises(ValueError, match="per_wave"):
        politeness_waves(df, 0)
