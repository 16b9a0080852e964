"""Multi-format source layer: parquet / JSON-lines / CSV must yield identical
DataFrames for the same logical table."""

import shutil
import tempfile

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    rows = df.select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                     .alias("ts_s"), "user_id", "event_type",
                     F.round("value", 6).alias("value")).collect()
    return sorted(tuple(r) for r in rows)


def test_json_and_csv_match_parquet(spark):
    from memory_opensource_spark.sources import formats, tables

    ev = tables.load(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    try:
        (ev.coalesce(1).write.mode("overwrite")
         .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
         .json(f"{d}/ev_json"))
        (ev.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
         .coalesce(1).write.mode("overwrite").option("header", "true")
         .csv(f"{d}/ev_csv"))

        want = _canon(ev)
        got_json = _canon(formats.read_table(spark, f"{d}/ev_json", "events", "json"))
        got_csv = _canon(formats.read_table(spark, f"{d}/ev_csv", "events", "csv"))
        assert got_json == want
        assert got_csv == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_schema_is_explicit_not_inferred(spark):
    """JSON reads must use the declared schema (no inference pass)."""
    from memory_opensource_spark.sources import formats

    d = tempfile.mkdtemp()
    try:
        spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 5, "retrieval", 1.5, "{}")],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.to_timestamp("ts")).write.json(f"{d}/j")
        df = formats.read_table(spark, f"{d}/j", "events", "json")
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "timestamp", "bigint", "string", "double", "string"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_parquet_events_read_from_noncanonical_path(spark):
    """ADVICE r4: read_table(fmt='parquet') must honor the CALLER'S path — a
    round-tripped/compacted events parquet at a non-fixture basename reads
    correctly (ts normalized), instead of silently rerouting to
    {dir}/events.parquet."""
    from memory_opensource_spark.sources import formats, tables

    ev = tables.load(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    try:
        # round-trip writes TIMESTAMP(US) parquet under a non-canonical name;
        # no file named events.parquet exists in d
        ev.limit(500).coalesce(1).write.mode("overwrite").parquet(f"{d}/ev_compacted")
        got = formats.read_table(spark, f"{d}/ev_compacted", "events", "parquet")
        assert got.count() == 500
        assert dict(got.dtypes)["ts"] == "timestamp"
        want = _canon(ev.limit(500))
        assert _canon(got) == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
