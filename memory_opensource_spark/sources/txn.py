"""Transactional parquet tables: versioned manifests + optimistic concurrency.

SURVEY §1.5 maps the reference's transactional point-writes (counter bumps,
node upserts — e.g. memory/memory_graph.py's storage-client update paths) to
``MERGE INTO`` on a transactional table format.  The engine's default sinks
(`writers.upsert_parquet`) are plain parquet — correct single-writer
semantics, no isolation.  This module is the behind-a-flag transactional
tier: the same mechanism Delta Lake / Iceberg use, reduced to its core so it
runs on any filesystem with no extra jars:

- **Versioned manifests.** A table is ``data/*.parquet`` plus
  ``_manifests/v{N}.json`` listing exactly the files visible at version N
  (with per-file row counts and per-file MIN/MAX stats for the merge keys,
  read from parquet footers via pyarrow).  Readers list ONE manifest — never
  the directory — so a half-written data file is invisible until committed.
- **Snapshot isolation.** A reader pins a version; concurrent commits create
  new versions and never mutate old files (data files are immutable once
  committed; only manifests advance).  Time travel = read an old manifest.
- **Optimistic concurrency.** Commit = write manifest to a temp name, then
  ``os.link`` it to ``v{N+1}.json`` — hard-link creation is atomic and fails
  if the target exists, so exactly one of two racing writers wins;
  the loser gets ``ConcurrentWriteError`` and retries on the new snapshot.
  (On S3 the same protocol runs on conditional PUT / a commit service; this
  is precisely what the Delta transaction log does.)
- **MERGE with file skipping.** ``merge(incoming, keys)`` rewrites ONLY the
  files whose footer [min,max] key range can contain an incoming key; every
  other file is carried into the new version untouched — the file-level
  skipping that makes MERGE sub-linear in table size.
- **Change feed.** Each manifest records which files it added; ``changes(v)``
  reads just the files added after version v — the CDF analog that replaces
  R12's full-scan ``updated_at > watermark`` filter at scale.

This is deliberately a minimal core: single-table transactions, last-writer
-wins conflict detection at whole-table granularity (Delta's finer
conflict rules — disjoint-file concurrent MERGEs both succeeding — layer on
the same primitive).  The oracle-facing write path stays plain parquet.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(Exception):
    """Another writer committed this version first; re-read and retry."""


def _stats_for_file(path: str, keys: list[str]) -> dict:
    """Per-file MIN/MAX for each merge key + row count, from the parquet
    footer (no data read) — the skipping index stored in the manifest."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    stats: dict = {"rows": md.num_rows, "minmax": {}}
    name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    for k in keys:
        if k not in name_to_idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(name_to_idx[k]).statistics
            if s is None or not s.has_min_max:
                lo = hi = None
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            lo_j, hi_j = _json_safe(lo), _json_safe(hi)
            if lo_j is not None and hi_j is not None:
                stats["minmax"][k] = [lo_j, hi_j]
            # else: stats not JSON-representable for this key type -> omit,
            # so the file is conservatively treated as unskippable rather
            # than crashing the first commit deep inside json.dump
    return stats


def _json_safe(v):
    """Normalize a parquet-footer min/max value to a JSON-serializable type
    that still compares correctly against incoming bounds: bytes->str,
    datetime/date->isoformat string (lexicographic order == chronological),
    Decimal->float.  Returns None for types with no order-preserving JSON
    form (the caller then skips stats for that key — conservative, correct)."""
    import datetime
    import decimal

    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        # normalize to UTC-naive so footer stats (pyarrow: tz-aware UTC for
        # TIMESTAMP_MICROS) and incoming bounds compare in ONE zone; a mixed
        # "+00:00"-suffixed vs naive isoformat pair mis-orders at equality,
        # which could wrongly SKIP a file containing the merge key
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return None


class TxnTable:
    """A transactional parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path.rstrip("/")
        self.keys = keys
        os.makedirs(os.path.join(self.path, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)

    # ---- manifest plumbing ------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "_manifests", f"v{version}.json")

    def current_version(self) -> int:
        """Highest committed version; -1 for an empty table."""
        d = os.path.join(self.path, "_manifests")
        versions = [int(f[1:-5]) for f in os.listdir(d)
                    if f.startswith("v") and f.endswith(".json")]
        return max(versions, default=-1)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def _commit(self, expected_version: int, files: dict, added: list[str],
                schema_json: str | None = None) -> int:
        """Atomically publish ``expected_version + 1``.  Hard-link creation is
        the CAS: it fails with EEXIST when a racing writer already committed
        that version — no filesystem in POSIX overwrites an existing link."""
        new_version = expected_version + 1
        if schema_json is None and expected_version >= 0:
            # carry the schema forward so EVERY manifest can answer "what is
            # this table's schema" even when its file list is empty
            schema_json = self._read_manifest(expected_version).get("schema")
        manifest = {"version": new_version, "files": files, "added": added,
                    "keys": self.keys, "schema": schema_json}
        tmp = os.path.join(self.path, "_manifests", f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, self._manifest_path(new_version))
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {new_version} was committed by another writer"
            ) from None
        finally:
            os.unlink(tmp)
        return new_version

    def _write_data_files(self, df: DataFrame) -> dict:
        """Write df as immutable uniquely-named parquet files; return
        {relative_name: stats}.  Files are invisible until a manifest commits
        them (readers never list the data dir)."""
        staging = os.path.join(self.path, "data", f"txn-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        out = {}
        for fn in os.listdir(staging):
            if not fn.endswith(".parquet"):
                continue
            rel = f"{os.path.basename(staging)}/{fn}"
            out[rel] = _stats_for_file(os.path.join(staging, fn), self.keys)
        return out

    def _session_utc(self, v):
        """Tag a naive datetime from a Spark collect with the session
        timezone so _json_safe lands it in the same UTC-naive form the
        parquet footer stats are stored in."""
        import datetime

        if isinstance(v, datetime.datetime) and v.tzinfo is None:
            try:
                from zoneinfo import ZoneInfo

                tz = self.spark.conf.get("spark.sql.session.timeZone")
                return v.replace(tzinfo=ZoneInfo(tz))
            except Exception:
                return v  # unknown zone: compare as-is (best effort)
        return v

    # ---- public surface ---------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel with ``version``).  Lists one manifest,
        never the directory: uncommitted files are invisible."""
        v = self.current_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"{self.path}: no committed version")
        manifest = self._read_manifest(v)
        files = [os.path.join(self.path, "data", rel)
                 for rel in manifest["files"]]
        if not files:
            # a fully-deleted table is EMPTY, not missing: return zero rows
            # with the recorded schema (manifests carry the schema forward)
            schema_json = manifest.get("schema")
            if schema_json:
                from pyspark.sql.types import StructType

                return self.spark.createDataFrame(
                    [], StructType.fromJson(json.loads(schema_json)))
            raise FileNotFoundError(f"{self.path}: version {v} is empty")
        return self.spark.read.parquet(*files)

    def overwrite(self, df: DataFrame) -> int:
        """Replace the table contents (CREATE OR REPLACE)."""
        expected = self.current_version()
        new_files = self._write_data_files(df)
        return self._commit(expected, new_files, added=sorted(new_files),
                            schema_json=df.schema.json())

    def append(self, df: DataFrame) -> int:
        expected = self.current_version()
        new_files = self._write_data_files(df)
        if expected >= 0:
            files = {**self._read_manifest(expected)["files"], **new_files}
        else:
            files = new_files
        return self._commit(expected, files, added=sorted(new_files),
                            schema_json=df.schema.json() if expected < 0 else None)

    def matched_files(self, incoming: DataFrame,
                      version: int | None = None) -> tuple[list[str], list[str]]:
        """Partition the snapshot's files into (must-rewrite, untouched) by
        footer-stats intersection with the incoming key ranges — the skipping
        decision, exposed for tests/PERF evidence."""
        v = self.current_version() if version is None else version
        manifest = self._read_manifest(v)
        bounds = incoming.agg(
            *[f for k in self.keys
              for f in (F.min(k).alias(f"lo_{k}"), F.max(k).alias(f"hi_{k}"))]
        ).first()
        hit, miss = [], []
        for rel, stats in manifest["files"].items():
            mm = stats.get("minmax", {})
            possible = True
            for k in self.keys:
                if k not in mm:
                    continue  # no stats -> cannot skip this file on k
                # stats are stored JSON-safe (datetime -> UTC-naive isoformat
                # etc.); normalize the incoming bounds the same way so the
                # range comparison stays apples-to-apples.  Spark returns
                # timestamp aggregates as naive datetimes in the SESSION
                # timezone — localize before the UTC normalization.
                lo = _json_safe(self._session_utc(bounds[f"lo_{k}"]))
                hi = _json_safe(self._session_utc(bounds[f"hi_{k}"]))
                if (lo is None) != (bounds[f"lo_{k}"] is None):
                    continue  # un-normalizable type: cannot skip on k
                if lo is None:
                    possible = False  # empty incoming matches nothing
                    break
                if hi < mm[k][0] or lo > mm[k][1]:
                    possible = False
                    break
            (hit if possible else miss).append(rel)
        return hit, miss

    def merge(self, incoming: DataFrame) -> int:
        """MERGE INTO semantics (api._merge's contract): rows matching on
        ``keys`` are replaced by incoming, the rest kept, new keys inserted.
        Only files whose key range can contain an incoming key are read and
        rewritten; untouched files move to the new version by reference.
        Raises ConcurrentWriteError if another writer commits first (caller
        retries on the fresh snapshot — optimistic concurrency)."""
        expected = self.current_version()
        if expected < 0:
            return self.overwrite(incoming)
        manifest = self._read_manifest(expected)
        hit, miss = self.matched_files(incoming, expected)
        files = {rel: manifest["files"][rel] for rel in miss}
        # kept (unchanged) rows and incoming rows go to SEPARATE staging dirs
        # so the change feed records only the incoming files as 'added' — a
        # 1-row merge into a 1M-row file must not replay 1M rows to CDC
        # consumers (round-5 review finding)
        if hit:
            hit_df = self.spark.read.parquet(
                *[os.path.join(self.path, "data", rel) for rel in hit]
            )
            kept = hit_df.join(incoming.select(*self.keys).distinct(),
                               self.keys, "left_anti")
            files.update(self._write_data_files(kept))
        inc_files = self._write_data_files(incoming)
        files.update(inc_files)
        return self._commit(expected, files, added=sorted(inc_files))

    def merge_with_retry(self, incoming: DataFrame, max_attempts: int = 5) -> int:
        """The standard OCC loop: on ConcurrentWriteError re-read the fresh
        snapshot and re-apply the merge (idempotent: keyed replacement), up
        to ``max_attempts``.  This is what every Delta writer does under the
        hood; exposed so callers get last-writer-wins-per-key without
        hand-rolling the loop."""
        last: ConcurrentWriteError | None = None
        for _ in range(max_attempts):
            try:
                return self.merge(incoming)
            except ConcurrentWriteError as e:
                last = e
        raise last  # type: ignore[misc]

    def delete_where(self, pred) -> int:
        """Filtered delete (S13's shape at scale): rewrite only files that may
        contain matching rows — here conservatively all files, unless the
        predicate is key-range expressible; kept simple on purpose.

        SQL/Delta DELETE semantics: only rows where the predicate evaluates
        TRUE are deleted — rows where it evaluates NULL (e.g. ``n > 5`` on a
        NULL ``n``) are KEPT.  A bare ``filter(~pred)`` would drop them."""
        expected = self.current_version()
        cur = self.read(expected)
        remaining = cur.filter(~F.coalesce(pred, F.lit(False)))
        new_files = self._write_data_files(remaining)
        return self._commit(expected, new_files, added=sorted(new_files))

    def compact(self, target_files: int = 8, zorder: list[str] | None = None) -> int:
        """OPTIMIZE analog: rewrite the current snapshot into ``target_files``
        files (optionally Z-ordered — ``OPTIMIZE ZORDER BY``), committed as a
        new version under the same CAS, so readers of older snapshots are
        untouched and a concurrent writer conflicts cleanly instead of
        racing the rewrite.  Run after streaming ingest has accumulated
        small files; returns the new version."""
        expected = self.current_version()
        cur = self.read(expected)
        if zorder:
            from .writers import _zvalue

            cur = (cur.select("*", _zvalue(cur, zorder).alias("__z"))
                   .repartitionByRange(target_files, F.col("__z"))
                   .sortWithinPartitions("__z")
                   .drop("__z"))
        else:
            cur = cur.coalesce(target_files)
        new_files = self._write_data_files(cur)
        # a compaction adds no logical rows: 'added' stays empty so the
        # change feed does not replay the whole table
        return self._commit(expected, new_files, added=[])

    def vacuum(self, keep_versions: int = 2,
               retention_seconds: float = 3600.0) -> dict:
        """GC (Delta VACUUM analog): delete data files referenced by NO
        retained manifest — orphans from crashed writers (written, never
        committed) and files only reachable from expired versions.  Keeps the
        newest ``keep_versions`` manifests; time travel within the retention
        window keeps working, older versions stop being readable (their
        manifests are removed so a read fails loudly rather than reading a
        half-GC'd file set).  Returns counts for observability.

        ``retention_seconds``: unreferenced files YOUNGER than this are
        spared — they may belong to an IN-FLIGHT writer that has staged its
        data but not yet committed (the same age guard as Delta's VACUUM
        retention window; without it, a concurrent vacuum could delete files
        whose commit then succeeds, publishing a manifest of dead paths)."""
        import time

        current = self.current_version()
        # clamp to what actually exists: a previous vacuum may have removed
        # older manifests already
        existing = sorted(
            int(f[1:-5]) for f in os.listdir(os.path.join(self.path, "_manifests"))
            if f.startswith("v") and f.endswith(".json"))
        earliest = existing[0] if existing else 0
        keep_from = max(earliest, current - keep_versions + 1)
        retained: set[str] = set()
        for v in range(keep_from, current + 1):
            retained.update(self._read_manifest(v)["files"])
        now = time.time()

        def _expendable(p: str) -> bool:
            try:
                return now - os.path.getmtime(p) >= retention_seconds
            except OSError:
                return False

        dropped_files = dropped_manifests = 0
        data_root = os.path.join(self.path, "data")
        for sub in os.listdir(data_root):
            subdir = os.path.join(data_root, sub)
            referenced = any(rel.startswith(f"{sub}/") for rel in retained)
            if not referenced and _expendable(subdir):
                # whole staging dir unreferenced AND past retention (crashed
                # writer / expired version): remove it incl. _SUCCESS markers
                import shutil

                dropped_files += sum(1 for fn in os.listdir(subdir)
                                     if fn.endswith(".parquet"))
                shutil.rmtree(subdir)
                continue
            for fn in os.listdir(subdir):
                rel = f"{sub}/{fn}"
                full = os.path.join(subdir, fn)
                if (fn.endswith(".parquet") and rel not in retained
                        and _expendable(full)):
                    os.unlink(full)
                    dropped_files += 1
        for v in range(earliest, keep_from):
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.unlink(p)
                dropped_manifests += 1
        return {"dropped_files": dropped_files,
                "dropped_manifests": dropped_manifests,
                "retained_files": len(retained)}

    def changes(self, since_version: int) -> DataFrame:
        """Change feed: rows ADDED after ``since_version`` (files referenced
        by later manifests' ``added`` lists; compactions record ``added=[]``
        so layout rewrites never replay).  R12's delta-since-watermark reads
        this instead of scanning the full table — I/O proportional to the
        change volume, not the table.

        Added files are read even when a LATER commit superseded them — a
        CDC consumer must see every change as of its commit, including rows
        later replaced (the earlier filter-to-live silently dropped all rows
        added before a subsequent compaction).  A watermark older than the
        vacuum retention raises ``ValueError`` (feed expired, resync) rather
        than returning a silently incomplete feed."""
        current = self.current_version()
        added: list[str] = []
        for v in range(since_version + 1, current + 1):
            try:
                added.extend(self._read_manifest(v)["added"])
            except FileNotFoundError:
                raise ValueError(
                    f"change feed expired: version {v} was vacuumed; "
                    "full resync required"
                ) from None
        paths = [os.path.join(self.path, "data", rel) for rel in added]
        missing = [p for p in paths if not os.path.exists(p)]
        if missing:
            raise ValueError(
                f"change feed expired: {len(missing)} added file(s) were "
                "vacuumed; full resync required"
            )
        if not paths:
            return self._empty_df(current)
        return self.spark.read.parquet(*paths)

    def _empty_df(self, version: int) -> DataFrame:
        """Zero-row DataFrame with the table's schema — works even when the
        snapshot's file list is empty (e.g. after ``delete_where(lit(True))``),
        where delegating to ``read()`` would raise FileNotFoundError."""
        schema_json = self._read_manifest(version).get("schema")
        if schema_json:
            from pyspark.sql.types import StructType

            return self.spark.createDataFrame(
                [], StructType.fromJson(json.loads(schema_json)))
        return self.read(version).limit(0)  # pre-schema manifest: best effort
