"""Local replica of the driver's correctness harness.

Runs every queries() entry at the given sf, runs the oracle SQL in DuckDB on the
same parquet, and compares row count, column names, and an order-insensitive
value hash (columns sorted by name, floats rounded).  Usage:

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


class CanonicalizerHazard(Exception):
    """Raised when an output column would crash or flake the driver's
    precision-sensitive canonicalizer (arrays -> unhashable; timestamp-typed
    columns -> representation-sensitive; int64-vs-float64 dtype drift ->
    hash-distinct even when numerically equal).  The st2 rounds-1/3/4 red was
    the third class: DuckDB types SUM(integer) — windowed OR grouped — as
    HUGEINT, which pandas materializes as float64 (verified on this
    container's duckdb 1.0.0), while Spark emits int64; Python's 3.0 == 3
    hid it here until normalize became dtype-tagged."""


def _tag_cell(v):
    """Canonical per-cell encoding that keeps int and float DISTINCT (the
    driver's value hash distinguishes 3 from 3.0; a plain tuple compare does
    not).  Floats are rounded to 6 places before tagging; NaN/None collapse
    to one null sentinel per kind so ordering stays total."""
    import math

    import numpy as np

    if v is None:
        return ("_", "null")
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "nan")
        return ("f", round(f, 6))
    return ("s", str(v))


def normalize(df, strict=True):
    """pandas DF -> canonical sorted record list for order-insensitive compare.

    ``strict`` replicates the DRIVER's canonicalizer, which does NOT tuple-ize
    list cells (it crashes on them: ``unhashable type: 'list'``) and whose value
    hash is sensitive to sub-second timestamp components.  Any query output
    violating either rule fails here so it can never reach the driver red.
    """
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            has_seq = df[c].apply(lambda v: isinstance(v, (list, tuple, np.ndarray, dict))).any()
            if has_seq and strict:
                raise CanonicalizerHazard(
                    f"column {c!r} contains array/map values — the driver "
                    "canonicalizer crashes on these; project with array_join/to_json"
                )
            if has_seq:
                df[c] = df[c].apply(
                    lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
                )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            if strict:
                # Timestamp-typed outputs are representation-sensitive in the
                # driver's canonicalizer (Spark datetime64 vs DuckDB TIMESTAMP
                # materialization details), and the r4 st2 diagnosis showed how
                # easily a dtype mismatch hides behind Python equality.  House
                # rule stays: emit epoch BIGINT (unix_timestamp /
                # floor(epoch())::BIGINT) or formatted varchar on BOTH sides.
                # (NB: the proven hash-red class is int64-vs-float64 dtype
                # drift — see _tag_cell — not whole-second timestamps; r12 was
                # driver-green with a timestamp column in r3.)
                raise CanonicalizerHazard(
                    f"column {c!r} is timestamp-typed — emit epoch BIGINT "
                    "(unix_timestamp / floor(epoch())::BIGINT) or varchar on "
                    "both sides instead"
                )
            df[c] = df[c].astype("datetime64[us]")
    recs = [tuple(_tag_cell(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(recs, key=repr)


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-fidelity mode: the REAL driver builds a bare SparkSession
        # (no engine configs — different broadcast threshold, arrow flag,
        # timezone), so periodically re-gate under the session the grade is
        # actually computed with
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from memory_opensource_spark.session import get_spark

        spark = get_spark("check", shuffle_partitions=8)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    passed = failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failed += 1
            continue
        if name not in oracles:
            try:
                normalize(sdf.copy())
                note = ""
            except CanonicalizerHazard as e:
                note = f" [hazard if oracle added: {e}]"
            print(f"OK?  {name}: rows-only check, {len(sdf)} rows ({time.time()-t0:.1f}s){note}")
            passed += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            failed += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            failed += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failed += 1
            continue
        try:
            s, o = normalize(sdf), normalize(odf)
        except CanonicalizerHazard as e:
            print(f"FAIL {name}: canonicalizer hazard: {e}")
            failed += 1
            continue
        if s != o:
            ndiff = sum(1 for a, b in zip(s, o) if a != b)
            print(f"FAIL {name}: values differ ({ndiff}/{len(s)} rows)")
            for a, b in list(zip(s, o))[:200]:
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    break
            failed += 1
            continue
        print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
        passed += 1

    print(f"\n{passed} passed, {failed} failed")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
