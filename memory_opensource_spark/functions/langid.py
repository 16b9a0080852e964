"""Character-n-gram language identification (round-11, VERDICT r9 task 8)
— the fastText/Cavnar-Trenkle-style upgrade over the token-stopword
heuristic (functions/text.lang_id): per-language character TRIGRAM
profiles with additive-smoothed log-probability weights, scored as an
average log-likelihood per gram.  Catches inflected/figure-heavy text the
10-word stopword lists miss, and costs one explode + one broadcast join +
one combinable groupBy — scan-parallel at 100 TB.

The profiles are DETERMINISTIC: trained at import from the seed corpora
embedded below (public-domain-style sample prose written for this module,
a few sentences per language), truncated to the TOP_GRAMS most frequent
trigrams per language, weights rounded to 6 dp.  Both engines consume the
SAME literal weight table (a broadcast DataFrame on the Spark side, a
VALUES CTE in the DuckDB twin), so cross-engine parity is exact up to the
documented round-6 score grid.

Score of doc d for language L over its char trigrams g_1..g_n:

    score(d, L) = round( (Σ_i w_L(g_i)  +  miss_i · floor_L) / (n·10⁶), 6)

where w_L = round(10⁶·log10((count+1) / (total+V))) from the seed profile
and floor_L = round(10⁶·log10(1 / (total+V))) is the unseen-gram penalty
— MICRO-INTEGER weights, so the per-language sum is exact int64
arithmetic and ORDER-FREE: a float-weight sum differs between engines in
the last ulp depending on aggregation order, which flips the 6-dp
rounding on grid-boundary scores (observed at sf0.01 before this form).
Verdict = argmax score, ties broken by language-list order, docs with no
trigrams (len < 3) -> 'und'.
"""

from __future__ import annotations

import math
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOP_GRAMS = 300

# Seed corpora: ordinary prose, written for this module (a few sentences
# per language — enough for trigram statistics, tiny enough to embed).
LANG_SEEDS: dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog while the rain "
           "keeps falling on the quiet town and people walk through the "
           "old market looking for bread cheese and fresh fruit because "
           "they want to cook a good dinner for their friends this "
           "evening and the children play near the river with a small "
           "wooden boat that their grandfather made many years ago when "
           "he was still a young carpenter in the village"),
    "de": ("der schnelle braune fuchs springt über den faulen hund "
           "während der regen auf die stille stadt fällt und die leute "
           "durch den alten markt gehen um brot käse und frisches obst "
           "zu suchen weil sie ein gutes abendessen für ihre freunde "
           "kochen wollen und die kinder spielen am fluss mit einem "
           "kleinen holzboot das ihr großvater vor vielen jahren gebaut "
           "hat als er noch ein junger tischler im dorf war"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso "
           "mientras la lluvia cae sobre la ciudad tranquila y la gente "
           "camina por el viejo mercado buscando pan queso y fruta "
           "fresca porque quieren cocinar una buena cena para sus "
           "amigos esta noche y los niños juegan cerca del río con un "
           "pequeño barco de madera que su abuelo construyó hace muchos "
           "años cuando todavía era un joven carpintero del pueblo"),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux "
           "pendant que la pluie tombe sur la ville tranquille et les "
           "gens marchent dans le vieux marché en cherchant du pain du "
           "fromage et des fruits frais parce qu'ils veulent cuisiner un "
           "bon dîner pour leurs amis ce soir et les enfants jouent près "
           "de la rivière avec un petit bateau en bois que leur grand "
           "père a construit il y a de nombreuses années"),
}


def _trigrams(text: str) -> list[str]:
    t = text.lower()
    return [t[i:i + 3] for i in range(len(t) - 2)]


@lru_cache(maxsize=1)
def profiles() -> tuple[list[tuple[str, str, int]],
                        list[tuple[str, int, int]]]:
    """(weights, langs): weights = [(gram, lang, w_micro)] for the
    TOP_GRAMS most frequent trigrams per language (count desc, gram asc —
    fully deterministic), langs = [(lang, idx, floor_micro)].  Weights are
    micro-integers (10⁶·log10-prob, rounded) so both engines sum exact
    int64 values (module docstring)."""
    weights: list[tuple[str, str, int]] = []
    langs: list[tuple[str, int, int]] = []
    for idx, (lang, seed) in enumerate(sorted(LANG_SEEDS.items())):
        counts: dict[str, int] = {}
        for g in _trigrams(seed):
            counts[g] = counts.get(g, 0) + 1
        total = sum(counts.values())
        vocab = len(counts)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for g, c in top[:TOP_GRAMS]:
            weights.append(
                (g, lang,
                 round(1e6 * math.log10((c + 1) / (total + vocab)))))
        langs.append(
            (lang, idx, round(1e6 * math.log10(1.0 / (total + vocab)))))
    return weights, langs


def lang_id_ngram(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """{id_col, lang, lang_score} per input row (module formula).  Shape:
    one explode over char trigrams, one broadcast join against the
    literal profile table, two combinable groupBys — no UDF, no window."""
    spark = df.sparkSession
    weights, langs = profiles()
    wdf = spark.createDataFrame(weights, "gram string, lang string, w long")
    ldf = spark.createDataFrame(langs, "lang string, idx int, floor long")

    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.length(t) - 2
    grams = F.when(n >= 1, F.transform(
        F.sequence(F.lit(1), n),
        lambda i: t.substr(i, F.lit(3)))).otherwise(
        F.array().cast("array<string>"))
    ex = (df.select(F.col(id_col), grams.alias("_gs"))
          .select(id_col, F.size("_gs").alias("n_grams"),
                  F.explode_outer("_gs").alias("gram")))
    hits = (ex.join(F.broadcast(wdf), "gram")
            .groupBy(id_col, "lang")
            .agg(F.sum("w").alias("w_sum"),
                 F.count("*").alias("n_hit")))
    base = df.select(F.col(id_col), F.coalesce(F.size(grams), F.lit(0))
                     .alias("n_grams"))
    scored = (base.crossJoin(F.broadcast(ldf))
              .join(hits, [id_col, "lang"], "left")
              .select(
                  F.col(id_col), "lang", "idx", "n_grams",
                  F.when(
                      F.col("n_grams") > 0,
                      F.round(
                          (F.coalesce(F.col("w_sum"), F.lit(0))
                           + (F.col("n_grams")
                              - F.coalesce(F.col("n_hit"), F.lit(0)))
                           * F.col("floor")).cast("double")
                          / (F.col("n_grams").cast("double") * 1e6), 6))
                  .otherwise(F.lit(None).cast("double")).alias("score")))
    best = (scored.groupBy(id_col)
            .agg(F.max(F.struct(
                F.col("score"), (-F.col("idx")).alias("ni"),
                F.col("lang"))).alias("_b"),
                F.max("n_grams").alias("_n")))
    return best.select(
        F.col(id_col),
        F.when(F.col("_n") > 0, F.col("_b.lang")).otherwise("und")
         .alias("lang"),
        F.when(F.col("_n") > 0, F.col("_b.score"))
         .otherwise(F.lit(None).cast("double")).alias("lang_score"))


def lang_id_ngram_sql(table: str, id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """The DuckDB twin of :func:`lang_id_ngram` over ``table`` — the SAME
    literal weight/floor values (from :func:`profiles`) as VALUES CTEs,
    mirrored formula, ROW_NUMBER argmax with the same (score desc, idx
    asc) order.  Kept in this module so the two cannot drift."""
    weights, langs = profiles()
    wvals = ", ".join(f"('{g.replace(chr(39), chr(39)*2)}', '{la}', {w})"
                      for g, la, w in weights)
    lvals = ", ".join(f"('{la}', {i}, {fl})" for la, i, fl in langs)
    return f"""WITH w(gram, lang, w) AS (VALUES {wvals}),
l(lang, idx, fl) AS (VALUES {lvals}),
src AS (
  SELECT {id_col} AS id, lower(coalesce({text_col}, '')) AS t FROM {table}
),
base AS (
  SELECT id, greatest(length(t) - 2, 0)::BIGINT AS n_grams, t FROM src
),
ex AS (
  SELECT id, unnest(list_transform(range(1, greatest(length(t) - 2, 0) + 1),
                                   i -> substr(t, i::INT, 3))) AS gram
  FROM src
),
hits AS (
  SELECT e.id, w.lang, SUM(w.w)::BIGINT AS w_sum, COUNT(*) AS n_hit
  FROM ex e JOIN w ON w.gram = e.gram GROUP BY e.id, w.lang
),
scored AS (
  SELECT b.id, l.lang, l.idx, b.n_grams,
         (CASE WHEN b.n_grams > 0 THEN
            round((coalesce(h.w_sum, 0)
                   + (b.n_grams - coalesce(h.n_hit, 0)) * l.fl)::DOUBLE
                  / (b.n_grams * 1000000.0), 6)
          ELSE NULL END) AS score
  FROM base b CROSS JOIN l
  LEFT JOIN hits h ON h.id = b.id AND h.lang = l.lang
),
ranked AS (
  SELECT id, lang, n_grams, score,
         ROW_NUMBER() OVER (PARTITION BY id
                            ORDER BY score DESC, idx ASC) AS rn
  FROM scored
)
SELECT id AS {id_col},
       (CASE WHEN n_grams > 0 THEN lang ELSE 'und' END) AS lang,
       (CASE WHEN n_grams > 0 THEN score ELSE NULL END) AS lang_score
FROM ranked WHERE rn = 1"""


def lang_id_ngram_arrow(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Arrow-kernel twin of :func:`lang_id_ngram` for crawl-scale paths
    (r12, the quality_scores_arrow pattern): the Column form's trigram
    ``transform`` lambda is INTERPRETED (one substr per character), the
    dominant stage cost at 600k docs.  This kernel packs each trigram into
    one int64 (three 21-bit codepoints) with vectorized numpy shifts,
    counts uniques per doc, and sums the micro-integer weights per
    language — the same exact int64 arithmetic, with decimal HALF_UP
    rounding (what Spark's ``round`` performs) and the same
    (score desc, idx asc) argmax.  Row-identical output is test-pinned;
    the Column form stays the spec the DuckDB oracle mirrors."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd

    weights, langs = profiles()
    n_lang = len(langs)

    def gid(g: str) -> int:
        a, b, c = (ord(ch) for ch in g)
        return (a << 42) | (b << 21) | c

    # per-language weight dicts keyed by the packed trigram id
    wmaps: list[dict] = [dict() for _ in range(n_lang)]
    idx_of = {la: i for la, i, _ in langs}
    floors = np.array([fl for _, _, fl in langs], dtype=np.int64)
    names = [la for la, _, _ in langs]
    for g, la, w in weights:
        wmaps[idx_of[la]][gid(g)] = w
    q6 = Decimal("0.000001")

    def _one(text):
        if text is None:
            return "und", None
        t = text.lower()
        n = len(t) - 2
        if n < 1:
            return "und", None
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) \
            .astype(np.int64)
        tri = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
        uniq, counts = np.unique(tri, return_counts=True)
        best_s, best_i = None, -1
        for li in range(n_lang):
            wm = wmaps[li]
            w_sum = 0
            n_hit = 0
            for u, c in zip(uniq.tolist(), counts.tolist()):
                w = wm.get(u)
                if w is not None:
                    w_sum += w * c
                    n_hit += c
            total = w_sum + (n - n_hit) * int(floors[li])
            x = total / (n * 1e6)
            s = float(Decimal(repr(x)).quantize(q6, ROUND_HALF_UP))
            if best_s is None or s > best_s:
                best_s, best_i = s, li
        return names[best_i], best_s

    def kern(batches):
        for pdf in batches:
            scored = [_one(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {id_col: pdf[id_col],
                 "lang": [la for la, _ in scored],
                 "lang_score": pd.array([s for _, s in scored],
                                        dtype="float64")})

    id_type = next(f.dataType.simpleString() for f in df.schema.fields
                   if f.name == id_col)
    return df.mapInPandas(
        kern, f"`{id_col}` {id_type}, lang string, lang_score double")
