"""Multi-format source layer: the engine's tables can arrive as parquet
(the driver fixtures), JSON-lines (the reference's API payload shape —
routers/v1 request bodies), or CSV exports.  One entry point normalizes all
three to identical DataFrames so every downstream operator is
format-agnostic.

Scale notes: JSON/CSV are splittable line formats — scans parallelize like
parquet scans but lose column pruning and predicate pushdown, so the loader
applies an explicit schema (never inference at 100 TB: schema inference is a
full extra pass) and projects immediately.  Landing zone -> parquet/Delta
compaction (writers.compact) remains the recommended first hop.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: explicit schemas per table (JSON/CSV have no embedded types)
SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
}


def read_table(spark: SparkSession, path: str, name: str,
               fmt: str = "parquet") -> DataFrame:
    """Read one logical table from ``path`` in the given format, normalized to
    the canonical column order/types regardless of on-disk format."""
    if fmt == "parquet":
        if name == "events":
            # events parquet may carry TIMESTAMP(NANOS), and once nanosAsLong
            # is set anywhere in the session a raw read surfaces ts as BIGINT
            # nanoseconds — the blind TimestampType cast below would interpret
            # those as seconds (silent corruption).  The shared sniff reads
            # the CALLER'S path (not the canonical fixture path) and
            # normalizes either on-disk variant to microsecond TIMESTAMP.
            from .tables import read_events_parquet

            return read_events_parquet(spark, path)
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.schema(SCHEMAS[name]).json(path)
    elif fmt == "csv":
        df = (spark.read.schema(SCHEMAS[name])
              .option("header", "true")
              .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .csv(path))
    else:
        raise ValueError(f"unsupported format: {fmt}")
    cols = [f.name for f in SCHEMAS[name].fields] if name in SCHEMAS else df.columns
    return df.select(*[F.col(c).cast(dict(
        (f.name, f.dataType) for f in SCHEMAS[name].fields)[c]) if name in SCHEMAS
        else F.col(c) for c in cols])
