"""TxnTable: snapshot isolation, optimistic concurrency, MERGE file skipping,
time travel, change feed — the flag-gated transactional tier of SURVEY §1.5
(the reference's point-write transactions; at production scale this protocol
is Delta/Iceberg, see PERF.md round-5 section)."""

import os

import pytest
from pyspark.sql import functions as F

from memory_opensource_spark.sources.txn import ConcurrentWriteError, TxnTable


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), keys=["memory_id"])
    base = spark.createDataFrame(
        [(f"m{i:04d}", i, "base") for i in range(100)],
        "memory_id string, n int, tag string",
    )
    # two files with DISJOINT key ranges so merge can prove skipping
    lo = base.filter(F.col("memory_id") < "m0050").coalesce(1)
    hi = base.filter(F.col("memory_id") >= "m0050").coalesce(1)
    t.overwrite(lo)
    t.append(hi)
    return t


def test_read_reflects_both_commits(table):
    assert table.read().count() == 100
    assert table.current_version() == 1


def test_merge_replaces_and_inserts(table):
    inc = table.spark.createDataFrame(
        [("m0007", 700, "patched"), ("m9999", 1, "new")],
        "memory_id string, n int, tag string",
    )
    table.merge(inc)
    out = {r.memory_id: (r.n, r.tag) for r in table.read().collect()}
    assert len(out) == 101
    assert out["m0007"] == (700, "patched")
    assert out["m9999"] == (1, "new")
    assert out["m0008"] == (8, "base")


def test_merge_skips_files_outside_key_range(table):
    # incoming touches only the low file's range -> the high file must be
    # carried by reference, not rewritten
    inc = table.spark.createDataFrame(
        [("m0001", -1, "x")], "memory_id string, n int, tag string"
    )
    hit, miss = table.matched_files(inc)
    assert len(hit) == 1 and len(miss) == 1
    before = table._read_manifest(table.current_version())["files"]
    untouched_rel = miss[0]
    table.merge(inc)
    after = table._read_manifest(table.current_version())["files"]
    assert untouched_rel in after  # same physical file, moved by reference
    assert after[untouched_rel] == before[untouched_rel]
    assert table.read().filter(F.col("memory_id") == "m0001").first().n == -1
    assert table.read().count() == 100


def test_optimistic_concurrency_one_writer_wins(table):
    v = table.current_version()
    inc_a = table.spark.createDataFrame(
        [("m0001", 1, "a")], "memory_id string, n int, tag string"
    )
    inc_b = table.spark.createDataFrame(
        [("m0002", 2, "b")], "memory_id string, n int, tag string"
    )
    # simulate a race: prepare B's files against snapshot v, commit A first
    files_b = table._write_data_files(inc_b)
    table.merge(inc_a)  # A wins v+1
    with pytest.raises(ConcurrentWriteError):
        table._commit(v, files_b, added=sorted(files_b))
    # loser retries on the fresh snapshot and succeeds
    table.merge(inc_b)
    out = {r.memory_id: r.tag for r in table.read().collect()}
    assert out["m0001"] == "a" and out["m0002"] == "b"


def test_snapshot_isolation_and_time_travel(table):
    v1 = table.current_version()
    pinned = table.read(v1)  # reader pins the old snapshot
    inc = table.spark.createDataFrame(
        [("m0000", 999, "v2")], "memory_id string, n int, tag string"
    )
    table.merge(inc)
    # the pinned plan still reads v1's files (immutable, never deleted)
    assert pinned.filter(F.col("memory_id") == "m0000").first().n == 0
    assert table.read(v1).filter(F.col("memory_id") == "m0000").first().n == 0
    assert table.read().filter(F.col("memory_id") == "m0000").first().n == 999


def test_uncommitted_files_invisible(table, spark):
    n0 = table.read().count()
    orphan = spark.createDataFrame(
        [("zzz", 0, "orphan")], "memory_id string, n int, tag string"
    )
    table._write_data_files(orphan)  # written but never committed
    assert table.read().count() == n0  # manifest-listed reads only


def test_change_feed_reads_only_added_files(table):
    v = table.current_version()
    # both incoming keys inside the low file's range, so range-skipping
    # leaves the high file out of the rewrite AND out of the feed
    inc = table.spark.createDataFrame(
        [("m0003", 33, "cdf"), ("m0049x", 1, "cdf")],
        "memory_id string, n int, tag string",
    )
    table.merge(inc)
    ch = table.changes(v)
    got = {r.memory_id for r in ch.collect()}
    # EXACTLY the incoming rows: kept rows of the rewritten file stage
    # separately and are never recorded as 'added'
    assert got == {"m0003", "m0049x"}
    assert ch.count() == 2


def test_delete_where(table):
    table.delete_where(F.col("memory_id") < "m0010")
    assert table.read().count() == 90


def test_engine_versioned_save_load(spark, tmp_path):
    """save(txn=True) commits a snapshot per table; a later save makes a new
    version; load(version=0) time-travels the whole engine state back."""
    from memory_opensource_spark.api import MemoryEngine
    from memory_opensource_spark.operators.predicate import AclContext

    eng = MemoryEngine(spark, dim=16)
    eng.add_memory_batch([
        {"memory_id": "m1", "content": "first snapshot content", "user_id": "u"},
        {"memory_id": "m2", "content": "totally different words", "user_id": "u"},
    ])
    d = str(tmp_path / "store")
    eng.save(d, txn=True)
    eng.delete_memory("m1")
    eng.save(d, txn=True)

    cur = MemoryEngine(spark, dim=16)
    cur.load(d, txn=True)
    assert cur.get_memory("m1") is None and cur.get_memory("m2") is not None

    old = MemoryEngine(spark, dim=16)
    old.load(d, txn=True, version=0)
    assert old.get_memory("m1") is not None
    hits = old.search("first snapshot", ctx=AclContext(user_id="u"),
                      score_threshold=0.0).collect()
    assert hits and hits[0].memory_id == "m1"


def test_compact_preserves_data_and_history(table):
    v_before = table.current_version()
    n_before = table.read().count()
    v_new = table.compact(target_files=1)
    assert v_new == v_before + 1
    assert table.read().count() == n_before
    manifest = table._read_manifest(v_new)
    assert len(manifest["files"]) == 1
    assert manifest["added"] == []          # no logical change -> empty feed
    assert table.changes(v_before).count() == 0
    # old snapshot still readable (files immutable)
    assert table.read(v_before).count() == n_before
    # a writer who prepared against the pre-compaction snapshot conflicts
    inc = table.spark.createDataFrame(
        [("m0000", 5, "late")], "memory_id string, n int, tag string"
    )
    files = table._write_data_files(inc)
    with pytest.raises(ConcurrentWriteError):
        table._commit(v_before, files, added=sorted(files))


def test_merge_with_retry_recovers_from_conflicts(table, monkeypatch):
    """First two commit attempts collide (simulated); the OCC loop re-reads
    the fresh snapshot each time and lands the merge."""
    real_commit = table._commit
    fails = {"n": 2}

    def flaky_commit(expected, files, added):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise ConcurrentWriteError("simulated race")
        return real_commit(expected, files, added)

    monkeypatch.setattr(table, "_commit", flaky_commit)
    inc = table.spark.createDataFrame(
        [("m0001", 42, "retried")], "memory_id string, n int, tag string"
    )
    v = table.merge_with_retry(inc)
    assert v == table.current_version()
    assert table.read().filter(F.col("memory_id") == "m0001").first().n == 42

    # exhausting attempts surfaces the error
    fails["n"] = 99
    with pytest.raises(ConcurrentWriteError):
        table.merge_with_retry(inc, max_attempts=3)


def test_vacuum_drops_orphans_and_expired_versions(table, spark):
    # create an orphan (crashed writer: files written, never committed)
    orphan = spark.createDataFrame(
        [("zzz", 0, "orphan")], "memory_id string, n int, tag string"
    )
    table._write_data_files(orphan)
    # advance a few versions
    for i in range(3):
        table.merge(spark.createDataFrame(
            [(f"m{i:04d}", 1000 + i, "v")], "memory_id string, n int, tag string"))
    current = table.current_version()
    n_rows = table.read().count()

    # DEFAULT retention spares everything just written — an unreferenced
    # staging dir may belong to an IN-FLIGHT writer whose commit is pending
    # (the Delta VACUUM age guard); only manifests expire
    fresh_stats = table.vacuum(keep_versions=2)
    assert fresh_stats["dropped_files"] == 0

    stats = table.vacuum(keep_versions=2, retention_seconds=0)
    assert stats["dropped_files"] > 0          # now the orphan goes away

    # current and previous snapshots still read clean
    assert table.read().count() == n_rows
    assert table.read(current - 1).count() > 0
    # expired time travel fails loudly (manifest gone), not with a bad scan
    with pytest.raises(FileNotFoundError):
        table.read(0)
    # every file the retained manifests reference still exists
    for v in (current - 1, current):
        for rel in table._read_manifest(v)["files"]:
            assert os.path.exists(os.path.join(table.path, "data", rel))
    # a later vacuum with a WIDER window must clamp to what exists, not crash
    # on the manifests the first vacuum already removed
    again = table.vacuum(keep_versions=10, retention_seconds=0)
    assert again["dropped_manifests"] == 0
    assert table.read().count() == n_rows


def test_changes_includes_pre_compaction_adds(table, spark):
    """A CDC consumer must receive rows added at v+1 even when a LATER
    compaction rewrote the layout — the feed delivers changes as of their
    commit, not as of the current file set."""
    v = table.current_version()
    inc = spark.createDataFrame(
        [("m0003", 33, "cdf")], "memory_id string, n int, tag string")
    table.merge(inc)
    table.compact(target_files=1)
    got = {r.memory_id for r in table.changes(v).filter(F.col("tag") == "cdf").collect()}
    assert got == {"m0003"}


def test_changes_expired_by_vacuum_fails_loudly(table, spark):
    v0 = 0
    for i in range(3):
        table.merge(spark.createDataFrame(
            [(f"m{i:04d}", i, "w")], "memory_id string, n int, tag string"))
    table.vacuum(keep_versions=1, retention_seconds=0)
    with pytest.raises(ValueError, match="resync"):
        table.changes(v0)


def test_compact_zorder_of_emptied_table_is_noop(table):
    table.delete_where(F.lit(True))
    v = table.compact(target_files=1, zorder=["memory_id"])  # must not crash
    assert v == table.current_version()
    manifest = table._read_manifest(v)
    assert sum(s["rows"] for s in manifest["files"].values()) == 0


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL/Delta DELETE only removes rows where the predicate is TRUE; rows
    where it evaluates NULL (n IS NULL under ``n > 5``) must be KEPT."""
    t = TxnTable(spark, str(tmp_path / "nulls"), keys=["memory_id"])
    t.overwrite(spark.createDataFrame(
        [("a", 1), ("b", 10), ("c", None)], "memory_id string, n int"))
    t.delete_where(F.col("n") > 5)
    got = {r.memory_id for r in t.read().collect()}
    assert got == {"a", "c"}  # b deleted; NULL-n row c survives


def test_changes_on_fully_deleted_table_is_empty_feed(table):
    """delete_where(lit(True)) leaves an empty snapshot; changes() must
    return an empty feed with the table schema, not FileNotFoundError."""
    v = table.current_version()
    table.delete_where(F.lit(True))
    ch = table.changes(v)
    assert ch.count() == 0
    assert set(ch.columns) == {"memory_id", "n", "tag"}
    # and a plain read of the emptied table is EMPTY, not missing
    cur = table.read()
    assert cur.count() == 0 and set(cur.columns) == {"memory_id", "n", "tag"}


def test_timestamp_merge_keys_commit_and_skip(spark, tmp_path):
    """Footer min/max for timestamp keys are datetime objects — the manifest
    must store them JSON-safe (isoformat) and range-skipping must still work
    (lexicographic isoformat order == chronological order)."""
    import datetime

    # Spark's default INT96 timestamps carry no footer stats (conservative
    # no-skip, no crash); TIMESTAMP_MICROS produces real datetime min/max —
    # the exact objects that used to blow up json.dump in _commit
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        t = TxnTable(spark, str(tmp_path / "ts"), keys=["ts"])
        mk = lambda d: datetime.datetime(2026, 1, d, 12, 0, 0)
        lo = spark.createDataFrame([(mk(d), f"r{d}") for d in range(1, 10)],
                                   "ts timestamp, v string").coalesce(1)
        hi = spark.createDataFrame([(mk(d), f"r{d}") for d in range(20, 28)],
                                   "ts timestamp, v string").coalesce(1)
        t.overwrite(lo)  # first commit on a timestamp key must not TypeError
        t.append(hi)
        manifest = t._read_manifest(t.current_version())
        assert any(s["minmax"].get("ts") for s in manifest["files"].values())
        inc = spark.createDataFrame([(mk(2), "patched")],
                                    "ts timestamp, v string")
        hit, miss = t.matched_files(inc)
        assert len(hit) == 1 and len(miss) == 1  # high file skipped by range
        t.merge(inc)
        out = {r.v for r in t.read().collect()}
        assert "patched" in out and "r2" not in out and len(out) == 17
    finally:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
