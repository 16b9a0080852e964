"""r13 OPT: tables.load supplies the parquet FOOTER schema (pyarrow, cached)
instead of paying Spark's ~80 ms schema-inference job per call.  These tests
pin the substitution's safety contract:

- the explicit schema is IDENTICAL to what Spark would infer, for every
  fixture table (incl. the tz-less-timestamp -> TIMESTAMP_NTZ fixup);
- INT96 timestamps (Spark's own parquet timestamp encoding, present in any
  round-tripped events copy) force the inference FALLBACK — the arrow view
  cannot distinguish them from INT64 NANOS, which must map to BIGINT;
- the cache is keyed on mtime, so a rewritten file is re-read.
"""
import os
import shutil
import tempfile

from tests.conftest import SF_DIR


def test_footer_schema_matches_inference_all_tables(spark):
    from memory_opensource_spark.sources import tables

    for name in tables.ALL_TABLES:
        path = f"{SF_DIR}/{name}.parquet"
        sch = tables._footer_schema(path)
        assert sch is not None, name
        inferred = spark.read.parquet(path).schema
        assert sch == inferred, (
            f"{name}: footer schema {sch} != inferred {inferred}")


def test_int96_roundtrip_falls_back_to_inference(spark):
    from memory_opensource_spark.sources import tables

    ev = tables.load(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    try:
        # Spark's default parquet timestamp encoding is INT96; ts here is
        # TIMESTAMP after read_events_parquet normalization
        ev.limit(50).coalesce(1).write.mode("overwrite").parquet(f"{d}/ev96")
        assert tables._footer_schema(f"{d}/ev96") is None
        # and the events reader still round-trips values through the
        # fallback path (dtype normalized to the session timestamp)
        back = tables.read_events_parquet(spark, f"{d}/ev96")
        assert dict(back.dtypes)["ts"] == "timestamp"
        assert back.count() == 50
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_cache_invalidated_on_rewrite(spark):
    from pyspark.sql import types as T

    from memory_opensource_spark.sources import tables

    d = tempfile.mkdtemp()
    try:
        p = f"{d}/t.parquet"
        spark.range(5).selectExpr("id AS a").write.parquet(p)
        s1 = tables._footer_schema(p)
        assert [f.name for f in s1.fields] == ["a"]
        shutil.rmtree(p)
        spark.range(5).selectExpr("id AS b", "id AS c").write.parquet(p)
        # force a distinct mtime even on coarse-grained filesystems
        part = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))[0]
        os.utime(os.path.join(p, part), (0, 0))
        s2 = tables._footer_schema(p)
        assert [f.name for f in s2.fields] == ["b", "c"]
        assert isinstance(s2.fields[0].dataType, T.LongType)
    finally:
        shutil.rmtree(d, ignore_errors=True)
