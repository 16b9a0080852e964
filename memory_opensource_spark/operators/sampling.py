"""Group-quota sampling: keep at most ``cap`` rows per group, deterministically.

The per-domain frequency cap every web-scale corpus recipe applies (Gopher
arXiv:2112.11446 §A.1.2 caps documents per domain; RefinedWeb
arXiv:2306.01116 §3.1 dedups and caps crawl hosts): without it, the head of
the Zipfian domain distribution (one forum, one wiki mirror) floods the
training mix.  The selection must be DETERMINISTIC (replays, resumed
pipelines and partition-layout changes must keep the same rows), so "which
cap rows" is defined as the cap smallest by ``(order_col, id_col)`` — pass a
salted hash of the id as ``order_col`` for an unbiased uniform sample, or
a quality score for keep-the-best.

Scale shape — the whole point of this module: the textbook
``row_number() over (partition by group order by ...) <= cap`` puts every
row of a hot domain in ONE window task, and AQE cannot split window
partitions (the same hazard class the r8 span-op rework removed).  Here:

1. per-group counts (map-side-combinable groupBy — the hot domain reduces
   to one partial per map task);
2. groups within quota pass WHOLESALE via an equi-join on the group key
   (AQE-skew-splittable; no per-row ranking work at all — on real corpora
   this is ~all groups);
3. only OVER-quota groups (the Zipfian head — few groups, many rows) get
   ranked, and their rank is computed the quality_buckets way: per-group
   ``percentile_approx`` boundaries of ``order_col`` (one combinable agg,
   one row per over-quota group), ``row_number`` over a window partitioned
   by (group, range-bucket), plus per-(group, bucket) offsets — exact
   rank, no window partition ever holds more than ~|group|/buckets rows.
   Boundary accuracy only affects balance, never which rows are kept.
   The side tables are AQE-sized (no broadcast hints): one row per
   over-quota group each, small on Zipfian data but O(n/cap) on an
   adversarial every-group-just-over input.

NULL group keys form ONE group, exactly like the window twin's
``partitionBy`` would treat them — all keys are carried in a struct
(struct equality is null-safe), so no row is silently dropped through a
null-unsafe equi-join (the r8-sweep bug class found in
shard_by_token_budget).

Caveat (documented, not hidden): a heavily TIED ``order_col`` inside one
over-quota group collapses its range buckets (ties land in one bucket) —
use a near-unique order key (the salted-hash default of the registered
query cannot tie in practice).  Ties are broken by ``id_col`` ASC within a
bucket, so results stay deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_order_stats(df: DataFrame, order_col: str,
                      range_buckets: int = 32) -> DataFrame:
    """ONE combinable groupBy producing everything the quota builders and
    the rank machinery need from the ``_g``-keyed frame: per-group row
    count ``_n`` AND the ``percentile_approx`` range-bucket boundaries
    ``_b`` of ``order_col`` (r13 opt, guide §2.4): computing them in two
    separate aggregations scanned the input twice, and the G-row result
    feeding 4-6 quota subtrees without a checkpoint re-ran the scan+agg
    once PER CONSUMER (the unimax before-plan held 8 parquet scans of the
    same table).  The result is lazily localCheckpoint'ed — it is one row
    per group (domains/languages/hosts: orders of magnitude under the
    corpus by construction), so the materialization is broadcast-sized."""
    probs = [i / range_buckets for i in range(1, range_buckets)]
    return (df.groupBy("_g")
            .agg(F.count("*").alias("_n"),
                 F.percentile_approx(F.col(order_col).cast("double"),
                                     probs, 10_000).alias("_b"))
            .localCheckpoint(eager=False))


def grouped_exact_ranks(df: DataFrame, order_col: str,
                        id_col: str,
                        range_buckets: int = 32,
                        bounds: DataFrame | None = None) -> DataFrame:
    """Exact per-group ``row_number`` by ``(order_col asc, id_col asc)``
    over a frame carrying a ``_g`` struct group key — WITHOUT a
    whole-group window (the skew-proof shape cap_rows_per_group
    established): per-group ``percentile_approx`` boundaries of
    ``order_col`` -> (group, bucket) assignment -> combinable bucket
    counts -> exclusive offsets via a running-sum window over the
    (group, bucket) table (<= ``range_buckets`` rows per partition — a
    module constant, never data-sized) -> a window partitioned by
    (group, BUCKET), never by the group alone.  Adds ``_rk`` (1-based).
    ``order_col`` must be numeric (see cap_rows_per_group's note).

    ``bounds`` (optional): a precomputed ``{_g, _b}`` boundary table
    (:func:`group_order_stats` output) — callers that already aggregate
    the frame per group pass it so the input is scanned once, not twice."""
    from pyspark.sql import Window

    if bounds is None:
        # single-consumer boundary sketch: no count, no checkpoint (the
        # merged+checkpointed group_order_stats form pays only when the
        # caller ALSO needs per-group counts in several subtrees)
        probs = [i / range_buckets for i in range(1, range_buckets)]
        bounds = (df.groupBy("_g")
                  .agg(F.percentile_approx(F.col(order_col).cast("double"),
                                           probs, 10_000).alias("_b")))
    rb = df.join(bounds.select("_g", "_b"), "_g").withColumn(
        "_rb",
        F.aggregate(
            F.coalesce(F.col("_b"), F.array()),
            F.lit(0),
            lambda acc, b: acc + F.coalesce(
                (F.col(order_col).cast("double") > b).cast("int"),
                F.lit(0)))).drop("_b")
    cnts = rb.groupBy("_g", "_rb").agg(F.count("*").alias("_c"))
    offs = (cnts.alias("a")
            .join(cnts.alias("b"),
                  (F.col("a._g") == F.col("b._g"))
                  & (F.col("b._rb") < F.col("a._rb")), "left")
            .groupBy(F.col("a._g").alias("_g"),
                     F.col("a._rb").alias("_rb"))
            .agg(F.coalesce(F.sum("b._c"), F.lit(0)).alias("_off")))
    w = (Window.partitionBy("_g", "_rb")
         .orderBy(F.col(order_col).asc(), F.col(id_col).asc()))
    return (rb.join(offs, ["_g", "_rb"])
            .withColumn("_rk", F.col("_off") + F.row_number().over(w))
            .drop("_rb", "_off"))


def cap_rows_per_group(df: DataFrame, group_col: str, cap: int,
                       order_col: str, id_col: str = "doc_id",
                       range_buckets: int = 32) -> DataFrame:
    """Keep the ``cap`` smallest rows by ``(order_col, id_col)`` in every
    ``group_col`` group.  Returns the surviving input rows (original
    columns).  Exact ``row_number <= cap`` semantics, no hot-group window.

    ``order_col`` must be NUMERIC (the range-bucket machinery casts it to
    double; under ANSI mode a string cast would error) — derive one from a
    string key with ``conv(substring(md5(k), 1, 8), 16, 10)`` like the
    registered query does."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    cols = df.columns
    # struct key: null-safe through every join below
    df = df.withColumn("_g", F.struct(F.col(group_col).alias("k"))) \
           .localCheckpoint(eager=False)   # read by 2-3 branches below
    # one merged (count, percentile-bounds) agg instead of two (r13 opt):
    # the bounds now cover under-quota groups too (same per-group input
    # rows -> same sketch for the over-quota groups the rank consumes)
    stats = group_order_stats(df, order_col, range_buckets)
    under = stats.filter(F.col("_n") <= cap).select("_g")
    over = stats.filter(F.col("_n") > cap).select("_g")
    kept_small = df.join(under, "_g", "left_semi")

    # Zipfian head only: per-group order boundaries -> (group, bucket) ranks.
    # NO broadcast hints below: `over`/`bounds`/`offs` are one row per
    # over-quota group — few on a Zipfian corpus, but an adversarial input
    # (every group just over cap) makes them O(n/cap) rows, so the sizing
    # call belongs to AQE, which broadcasts them when they are in fact small
    hot = df.join(over, "_g", "left_semi")
    ranked = grouped_exact_ranks(hot, order_col, id_col, range_buckets,
                                 bounds=stats)
    kept_hot = ranked.filter(F.col("_rk") <= cap) \
                     .select(*cols, "_g")
    return kept_small.select(*cols, "_g").unionByName(kept_hot).select(*cols)


def assign_split_by_group(df: DataFrame, group_col: str,
                          fractions: dict[str, float] | None = None,
                          salt: str = "split", id_col: str = "doc_id",
                          buckets: int = 1000) -> DataFrame:
    """LEAKAGE-SAFE train/val/test assignment (r9): the split is a pure
    function of a GROUP key, never the row, so every member of a duplicate
    cluster / domain / document family lands in the same split — row-hash
    splitting leaks near-duplicates of training rows into eval, the classic
    contamination-by-construction bug (the reason Lee et al. 2021 measure
    eval overlap after dedup).

    ``fractions`` maps split name -> fraction (default 80/10/10
    train/val/test; must sum to ~1).  Assignment: salted md5 of the group
    key -> bucket in [0, buckets) -> cumulative-fraction ranges, the same
    hash recipe as the registered domain-cap query, so the DuckDB oracle
    reproduces it bit-for-bit.  Deterministic under replay/partition
    changes; scan-side only (the group key must already ride the row — for
    dedup-cluster splitting, join the canonical id on first).  Adds
    ``split``; drops nothing.  A NULL group key hashes to a NULL bucket and
    falls through every range test to the LAST split name — deterministic,
    but feed canonical (non-NULL) keys if that lumping matters."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                          F.col(group_col).cast("string"))),
                           1, 8), 16, 10).cast("long") % buckets)
    expr, acc = None, 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn("split", expr)


def _ordered_frame(df, salt: str, id_col: str, group_col: str):
    """``df`` + the ``_g`` struct group key and the salted-md5 ``_ord``
    order key — the shared frame the stats agg and the rank both read."""
    return (df.withColumn(
                "_g", F.struct(F.col(group_col).alias("k")))
            .withColumn(
                "_ord",
                F.conv(F.substring(
                    F.md5(F.concat(F.lit(salt + ":"),
                                   F.col(id_col).cast("string"))),
                    1, 8), 16, 10).cast("long")))


def _select_quota_smallest(ordered, quotas, id_col: str,
                           range_buckets: int, cols,
                           stats=None,
                           prefilter_margin: float | None = None):
    """Shared mixture tail: per-group ``_quota`` smallest rows by the
    salted-md5 order key.  EXACT regardless of ``prefilter_margin``:

    With a margin set, a hash-threshold prefilter shrinks the exact-rank
    input first: ``_ord`` is a salted md5 — UNIFORM on [0, 2^32) by
    construction — so the per-group candidate threshold needs no
    quantile estimate at all: ``t_g = 2^32 * min(1, (margin * quota_g
    + 64) / n_g)`` (the +64 absolute cushion covers small-quota
    binomial variance).  Any threshold whose candidate set holds
    >= quota rows is a SUFFICIENT superset (by counting, the quota-th
    smallest value is <= t), so an unlucky hash draw can only cost
    performance, never correctness: groups whose candidate count falls
    short of their quota — or with quota >= group size — bypass the
    prefilter WHOLESALE into the rank (deficit fallback).
    Equal-to-threshold rows are kept (<=), so boundary ties cannot drop
    a candidate.  ``prefilter_margin=None`` (the DEFAULT) ranks everything;
    results are identical either way (test-pinned).

    MEASURED, not assumed (PERF.md round-16): on this box the
    prefilter LOSES — 51.7 s vs 9.2 s at 600k/200-group/100k-budget —
    because the branch point forces an eager localCheckpoint of the
    ordered table (a full write+read on shared disk) plus three extra
    aggregation stages, which swamp the saved rank work.  It is kept
    as an opt-in for regimes where the trade reverses (very large
    groups, small sampling ratios, fast local storage).

    ``ordered`` is the :func:`_ordered_frame` output; ``stats`` the
    caller's :func:`group_order_stats` table (count + bounds in one agg
    — the r13 scan-sharing rework), required when a prefilter margin or
    the bounds reuse is wanted."""
    bounds = stats
    if prefilter_margin is not None:
        ordered = ordered.localCheckpoint(eager=False)
        frac = F.least(
            F.lit(1.0),
            (F.lit(float(prefilter_margin)) * F.col("_quota") + 64)
            / F.col("_n"))
        thr = (stats.join(F.broadcast(quotas), "_g")
               .select("_g",
                       F.ceil(F.lit(float(2 ** 32)) * frac)
                       .cast("long").alias("_thr")))
        cand = (ordered.join(F.broadcast(thr), "_g")
                .filter(F.col("_ord") <= F.col("_thr")).drop("_thr"))
        ccnt = cand.groupBy("_g").agg(F.count("*").alias("_cn"))
        ok = (ccnt.join(F.broadcast(quotas), "_g")
              .filter(F.col("_cn") >= F.col("_quota")).select("_g"))
        # groups passing the sufficiency check rank only candidates;
        # deficit groups rank wholesale
        rank_in = (cand.join(ok, "_g", "left_semi")
                   .unionByName(ordered.join(ok, "_g", "left_anti")))
        # the prefiltered stream is a per-group SUBSET of the stats
        # input: its bucket boundaries must be re-sketched
        bounds = None
    else:
        rank_in = ordered
    ranked = grouped_exact_ranks(rank_in, "_ord", id_col, range_buckets,
                                 bounds=bounds)
    return (ranked.join(F.broadcast(quotas), "_g")
            .filter(F.col("_rk") <= F.col("_quota"))
            .select(*cols))


def sample_mixture_temperature(df: DataFrame, group_col: str, budget: int,
                               alpha: float = 0.7, salt: str = "mix",
                               id_col: str = "doc_id",
                               range_buckets: int = 32,
                               prefilter_margin: float | None = None
                               ) -> DataFrame:
    """Temperature-based mixture sampling (r13) — the domain/language
    reweighting step every multi-source pretraining corpus runs: group g
    with n_g rows gets a quota proportional to n_g^alpha (alpha < 1
    upsamples the tail, the multilingual temperature-sampling rule of
    XLM-R arXiv:1911.02116 §3.1 and the GPT-3 mixture table
    arXiv:2005.14165 §2.2), apportioned EXACTLY by largest-remainder
    (Hamilton) so quotas sum to ``budget``, then capped at n_g — one
    round, no redistribution of capped seats (UniMax arXiv:2304.09151
    is the redistributing variant; compose by re-running on the
    leftover budget if needed).

    Selection within a group = the quota smallest by salted-md5 hash of
    ``id_col`` (the unbiased deterministic uniform of cap_rows_per_group),
    ranked with grouped_exact_ranks — no whole-group window, skew-proof.

    Scale shape: the quota table is ONE ROW PER GROUP (domains/languages
    — thousands at most, by construction orders of magnitude under the
    corpus), so its remainder-ranking window is a broadcast-sized sort,
    and the row-level work is one scan + the range-bucket rank machinery.

    EXACT-ARITHMETIC apportionment (sweep 18): the naive form floors
    ``budget * pow(n_g, alpha) / SUM(pow(n_h, alpha))`` — but a uniform
    corpus puts every share EXACTLY on an integer, and a float SUM is
    re-association-nondeterministic (DuckDB's parallel aggregation
    flipped the oracle between 100 and 120 rows run-to-run; Spark's
    partition-order sums carry the same hazard).  So pow() is evaluated
    ONCE per group and micro-rounded to an int64 weight
    ``w_g = round(1000 * n_g^alpha)``, and everything downstream —
    ``X = SUM(w)``, ``p = budget * w_g``, ``base = (p - p % X) / X``,
    remainder ranking on the exact integer ``p % X`` — is 128-bit
    integer math (decimal(38,0) / HUGEINT): bit-identical across runs,
    partitionings, and engines.  The only float left is the single
    pow() per group (a 1-ulp flip lands on the 1e-3 weight grid only at
    a .0005 boundary — the dsir.py risk class, pinned at 3 SFs).

    Returns the selected input rows (original columns)."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    cols = df.columns
    from pyspark.sql import Window

    ordered = _ordered_frame(df, salt, id_col, group_col)
    # ONE scan produces counts AND rank boundaries; the checkpointed
    # G-row table feeds every quota subtree below (r13 opt — the before
    # plan re-ran the scan+agg once per consumer)
    gstats = group_order_stats(ordered, "_ord", range_buckets)
    sizes = gstats.select("_g", "_n")
    dec = "decimal(38,0)"
    wcol = F.round(F.lit(1000.0)
                   * F.pow(F.col("_n"), F.lit(alpha))).cast(dec)
    sizes = sizes.withColumn("_w", wcol)
    tot = sizes.agg(F.sum("_w").cast(dec).alias("_X"))
    share = (sizes.crossJoin(F.broadcast(tot))
             .withColumn("_p", F.lit(budget).cast(dec) * F.col("_w"))
             .withColumn("_rem", F.col("_p") % F.col("_X"))
             # (p - p % X) is divisible by X, so the decimal division
             # is exact — a // without needing one
             .withColumn("_base",
                         ((F.col("_p") - F.col("_rem")) / F.col("_X"))
                         .cast("long")))
    # largest-remainder seats: the window runs over the G-row group table
    deficit = (share.agg((F.lit(budget) - F.sum("_base")).alias("_d")))
    w = Window.orderBy(F.col("_rem").desc(), F.col("_g.k").asc_nulls_last())
    quotas = (share.withColumn("_rr", F.row_number().over(w))
              .crossJoin(F.broadcast(deficit))
              .select("_g",
                      F.least(
                          F.col("_n"),
                          F.col("_base")
                          + (F.col("_rr") <= F.col("_d")).cast("long"))
                      .alias("_quota")))
    return _select_quota_smallest(ordered, quotas, id_col, range_buckets,
                                  cols, stats=gstats,
                                  prefilter_margin=prefilter_margin)


def sample_mixture_unimax(df: DataFrame, group_col: str, budget: int,
                          epochs_cap: float = 1.0, salt: str = "unimax",
                          id_col: str = "doc_id",
                          range_buckets: int = 32,
                          prefilter_margin: float | None = None
                          ) -> DataFrame:
    """UniMax mixture sampling (r13) — the budget-capped UNIFORM
    apportionment of arXiv:2304.09151: spread ``budget`` rows evenly
    across groups, but never take more than ``capacity_g =
    floor(n_g * epochs_cap)`` from a group (the paper's per-language
    epoch cap against low-resource overfitting); capacity freed by small
    groups WATERFILLS into the rest — the redistribution
    :func:`sample_mixture_temperature` deliberately omits.

    Exact integer waterfill over the G-row group table (same
    float-sum-free discipline as the temperature sampler's sweep-18
    fix): sort groups by capacity ascending with prefix sums; group i
    (1-based, L = groups remaining at i) saturates iff
    ``c_i * (L) <= B - prefix_{i-1}`` — a prefix property under the
    ascending sort — taking ``c_i``; the unsaturated rest split the
    leftover R evenly, ``R // L'`` each, the first ``R %% L'`` by group
    key ascending getting one extra.  Every quantity is int64; the only
    float is ``epochs_cap`` scaling (floor of one multiply).

    Selection within a group = quota smallest by salted-md5 hash of
    ``id_col`` (the repo's deterministic uniform).  Windows run over the
    G-row table only.  Returns the selected input rows."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if epochs_cap <= 0:
        raise ValueError(f"epochs_cap must be > 0, got {epochs_cap}")
    cols = df.columns
    from pyspark.sql import Window

    ordered = _ordered_frame(df, salt, id_col, group_col)
    gstats = group_order_stats(ordered, "_ord", range_buckets)
    sizes = gstats.select("_g", "_n").withColumn(
        "_c", F.floor(F.col("_n") * F.lit(float(epochs_cap))).cast("long"))
    ws = Window.orderBy(F.col("_c").asc(), F.col("_g.k").asc_nulls_last())
    g_tot = sizes.agg(F.count("*").alias("_ng"))
    ranked = (sizes
              .withColumn("_i", F.row_number().over(ws))
              .withColumn("_pfx", F.sum("_c").over(
                  ws.rowsBetween(Window.unboundedPreceding,
                                 Window.currentRow)))
              .crossJoin(F.broadcast(g_tot)))
    # saturated prefix: c_i * (G - i + 1) <= B - prefix_{i-1}
    ranked = ranked.withColumn(
        "_sat",
        (F.col("_c") * (F.col("_ng") - F.col("_i") + 1)
         <= F.lit(budget) - (F.col("_pfx") - F.col("_c"))).cast("int"))
    stats = ranked.agg(
        F.sum("_sat").alias("_S"),
        F.sum(F.col("_sat") * F.col("_c")).alias("_used"))
    ranked = ranked.crossJoin(F.broadcast(stats))
    lprime = F.col("_ng") - F.col("_S")
    leftover = F.lit(budget) - F.coalesce(F.col("_used"), F.lit(0))
    # greatest(.., 1) denominator: when every group saturates the ELSE
    # branch is never SELECTED but vectorized engines still EVALUATE it
    # — an unguarded /0 is an ANSI error (same guard mirrored in the
    # oracle's CASE)
    safe_l = F.greatest(lprime, F.lit(1))
    fair = F.when(lprime > 0, F.floor(leftover / safe_l)).otherwise(0) \
        .cast("long")
    n_extra = F.when(lprime > 0, leftover % safe_l).otherwise(0)
    # rank among the UNSATURATED by group key asc for the +1 seats
    wk = Window.partitionBy("_sat").orderBy(F.col("_g.k").asc_nulls_last())
    ranked = ranked.withColumn("_ki", F.row_number().over(wk))
    quotas = ranked.select(
        "_g",
        F.when(F.col("_sat") == 1, F.col("_c"))
         .otherwise(F.least(
             F.col("_c"),
             fair + (F.col("_ki") <= n_extra).cast("long")))
        .alias("_quota"))
    return _select_quota_smallest(ordered, quotas, id_col, range_buckets,
                                  cols, stats=gstats,
                                  prefilter_margin=prefilter_margin)


def sample_weighted_k(df: DataFrame, k: int, weight_col: str,
                      salt: str = "esr", id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact k (r13) — the
    Efraimidis-Spirakis reservoir rule ("Weighted random sampling with a
    reservoir", IPL 2006): every row draws a uniform u and keeps key
    ``u^(1/w)``; the k largest keys are a weighted sample without
    replacement.  The exact-k complement of the Bernoulli
    quality-weighted row (keep-probability sampling cannot hit a target
    size).  Computed in the log domain (``ln(u)/w`` — same order,
    no pow underflow on tiny weights) with the repo's deterministic
    salted-md5 uniform, so replays and partition layouts cannot move
    the sample.

    Rows with NULL or non-positive weight are EXCLUDED (a zero weight
    is never drawn; negative is a caller bug, refused by filter rather
    than silently flipping the key's sign).

    Shape: scan-side key + TakeOrderedAndProject — no shuffle, no
    window, no collect.  Returns {id_col, weight_col, es_key} sorted by
    key DESC."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = ((F.conv(F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col(id_col).cast("string"))),
            1, 15), 16, 10).cast("double") + 0.5) / float(16 ** 15))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (df.filter(F.col(weight_col).isNotNull()
                      & (F.col(weight_col) > 0))
            .select(F.col(id_col), F.col(weight_col),
                    F.round(key, 6).cast("double").alias("es_key"))
            .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
            .limit(k))
