"""Transactional parquet table with a Delta-style commit log.

The reference gets atomic upsert/delete from SQLite transactions
(reference memory/storage/sqlite.py:75-108). The plain-parquet
write-audit-publish dance in streaming/expiry.py is correct for a SINGLE
writer; this module closes the multi-writer gap with the publicly-documented
lakehouse commit protocol (Delta's optimistic concurrency / Iceberg's
atomic metadata swap — no Delta jars exist in this environment, so the
protocol is implemented directly on POSIX):

- Data lives in immutable uuid-named directories of parquet part files;
  a table VERSION is a JSON commit file listing its live directories.
- Commits are numbered ``_txn/NNNNNN.json`` and published with an atomic
  ``os.link`` of a fully-written temp file — creation either wins or raises
  EEXIST, so exactly one writer owns each version (the same
  put-if-absent primitive Delta requires of its log store).
- Writers are optimistic: read latest version → write NEW data dirs
  (copy-on-write; unaffected dirs carry over untouched) → try to publish
  version+1 → on conflict, recompute against the winner's state and retry.
  Lost updates are impossible; writers never block readers.
- Readers are snapshot-isolated for free: a version's file set is immutable,
  so a reader holding version N is unaffected by later commits (until
  vacuum drops superseded dirs).
- A crash before publish leaves ORPHAN data dirs and an unchanged table;
  ``vacuum()`` removes anything no commit references. No rename dance, no
  recovery step on the read path.

Scale notes (100 TB): tables are RANGE-PARTITIONED into ~1M-row key-range
directories at create()/compact() (r15, note 136), and upsert prunes the
rewrite set by exact key OWNERSHIP — updates route to the directory whose
recorded range holds them and only directories with a non-empty routed slice
rewrite, each as its own slice, so the layout survives and keeps pruning
(min/max-interval pruning alone collapses under scattered batches). For
write-heavy workloads whose batches scatter across every range — where even
exact CoW routing rewrites most of the table — ``upsert(mode="mor")`` is
merge-on-read: the batch lands as one O(batch) delta directory and ``read()``
resolves last-writer-wins through a per-key window over commit sequence
numbers (the Hudi MoR / Delta deletion-vector trade: cheap writes, one
window on reads, ``compact()`` folds back to window-free storage). Extra
``stat_cols`` (e.g. expires_at) record per-directory min/max so
``delete_where`` can skip directories a range predicate provably misses
(zone maps on the sweep column); ``delete_where`` otherwise locates affected
directories with one predicate scan (what Delta does absent stats on the
predicate columns) and rewrites them per-directory.

Log compaction (new r8): every ``checkpoint_interval`` commits the winning
writer also publishes ``_txn/NNNNNN.checkpoint.json`` — the full table
state at that version (each commit here already carries full state, so the
checkpoint is a durable copy outside the cleanable window) — and refreshes
the ``_txn/_last_checkpoint`` hint (atomic ``os.replace``; a hint exactly
as in Delta, never the source of truth). ``clean_log()`` then removes
commit JSONs (and drain markers) older than the newest checkpoint,
bounding the log at O(checkpoint_interval + recent) files instead of
O(versions). Readers of cleaned versions fall back to that version's
checkpoint when one exists; older snapshots are gone — the documented
log-retention trade every lakehouse makes. Versions with UNdrained events
are never cleaned (exactly-once delivery survives compaction).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_LOG_DIR = "_txn"

#: copy-on-write rewrite quantum: tables are range-split into directories of
#: ~this many rows at create()/compact() so upserts rewrite key-range slices,
#: not the table (note 136: create() wrote ONE dir, so every upsert batch
#: overlapped it and rewrote all 10M rows — 4 full rewrites per bench arm)
_TARGET_DIR_ROWS = 1_000_000

#: above this many accumulated delta rows the MoR read's broadcast anti-join
#: would ship too large a key set to every executor — fall back to the full
#: union window (and compact() soon: deltas that size have outgrown the tier)
_MOR_BROADCAST_MAX_KEYS = 5_000_000


def _commit_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _LOG_DIR, f"{version:06d}.json")


def _checkpoint_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _LOG_DIR, f"{version:06d}.checkpoint.json")


class TxnTable:
    """Handle to a transactional table rooted at ``path``.

    ``key_col`` is the upsert identity column (string-typed in the memory
    store; any orderable type works — range pruning falls back to
    assume-overlap when values aren't safely comparable driver-side).
    ``stat_cols`` are extra columns whose per-directory min/max ride each
    commit (zone maps); ``delete_where(..., skip_dir=...)`` prunes on them.
    ``checkpoint_interval`` controls how often a winning writer also
    publishes a checkpoint (every Nth version; Delta's default is 10).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str = "key",
        *,
        stat_cols: tuple[str, ...] = (),
        checkpoint_interval: int = 10,
    ):
        if checkpoint_interval < 1:
            raise ValueError(f"checkpoint_interval must be >= 1, got {checkpoint_interval}")
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.stat_cols = tuple(stat_cols)
        self.checkpoint_interval = checkpoint_interval

    # ---------------------------------------------------------------- log

    def version(self) -> int:
        """Latest committed version, -1 if the table doesn't exist yet.
        The _last_checkpoint hint floors the answer when older commit files
        have been cleaned (the listing itself stays authoritative — the hint
        is refreshed non-atomically with publication, exactly like Delta)."""
        log = os.path.join(self.path, _LOG_DIR)
        if not os.path.isdir(log):
            return -1
        versions = [
            int(name[:6])
            for name in os.listdir(log)
            if name.endswith(".json") and name[:6].isdigit()
        ]
        return max(max(versions, default=-1), self._checkpoint_hint())

    def _checkpoint_hint(self) -> int:
        try:
            with open(os.path.join(self.path, _LOG_DIR, "_last_checkpoint")) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError, json.JSONDecodeError):
            return -1

    def _read_commit(self, version: int) -> dict:
        """Commit content for ``version`` — from its commit file, or from its
        checkpoint when clean_log() has truncated the commit away. A version
        with neither is outside the retention window."""
        try:
            with open(_commit_path(self.path, version)) as f:
                return json.load(f)
        except FileNotFoundError:
            try:
                with open(_checkpoint_path(self.path, version)) as f:
                    return json.load(f)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"version {version} of {self.path} is outside the log "
                    "retention window (cleaned without a checkpoint)"
                ) from None

    def _try_publish(self, version: int, commit: dict) -> bool:
        """Atomically publish ``commit`` as ``version``. True on win, False
        if a concurrent writer owns this version. The temp file is fully
        written and fsynced BEFORE the link, so a reader can never observe a
        partial commit. The winner also writes the version's checkpoint when
        the interval divides it — checkpointing is single-writer by
        construction (only the publish winner does it), so no second
        put-if-absent dance is needed."""
        os.makedirs(os.path.join(self.path, _LOG_DIR), exist_ok=True)
        tmp = os.path.join(self.path, _LOG_DIR, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(commit, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _commit_path(self.path, version))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        if version > 0 and version % self.checkpoint_interval == 0:
            self._write_checkpoint(version, commit)
        return True

    def _write_checkpoint(self, version: int, commit: dict) -> None:
        """Durable full-state copy + _last_checkpoint hint. Both writes are
        crash-safe: the checkpoint goes through the same fsync+link publish
        (idempotent — EEXIST means an earlier attempt finished), the hint
        through write-then-os.replace (atomic on POSIX; a stale hint is
        harmless — version() max-es it with the listing)."""
        tmp = os.path.join(self.path, _LOG_DIR, f".ckpt-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(commit, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _checkpoint_path(self.path, version))
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
        hint_tmp = os.path.join(self.path, _LOG_DIR, f".hint-{uuid.uuid4().hex}.json")
        with open(hint_tmp, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(hint_tmp, os.path.join(self.path, _LOG_DIR, "_last_checkpoint"))

    def clean_log(self) -> list[int]:
        """Remove commit JSONs (and their drain markers) strictly older than
        the newest checkpoint; returns the cleaned version numbers. A version
        whose commit carries UNdrained events is never cleaned — and neither
        is anything older (drain_events replays in version order, so cleaning
        past an undrained commit would break exactly-once delivery).

        Bounds the log dir at O(interval + commits-since-checkpoint) files.
        Production note: Delta gates cleaning on a time-based retention
        window; the floor logic is the same."""
        floor = self._checkpoint_hint()
        cleaned: list[int] = []
        for v in range(floor):
            cpath = _commit_path(self.path, v)
            if not os.path.exists(cpath):
                continue
            with open(cpath) as f:
                c = json.load(f)
            marker = os.path.join(self.path, _LOG_DIR, f"{v:06d}.drained")
            if c.get("events") and not os.path.exists(marker):
                break  # undrained events: stop — order-preserving retention
            os.unlink(cpath)
            if os.path.exists(marker):
                os.unlink(marker)
            cleaned.append(v)
        return cleaned

    # --------------------------------------------------------------- data

    def _write_data_dir(self, df: DataFrame) -> tuple[str, dict]:
        """Write one immutable data directory; returns (dir_name, stats).
        Stats carry the key range for upsert pruning (None when the range
        isn't driver-comparable, e.g. non-ASCII strings — see _overlaps) and
        a min/max zone map per configured stat column — all from ONE agg
        pass over the freshly-written files."""
        name = f"d-{uuid.uuid4().hex}"
        df.write.parquet(os.path.join(self.path, name))
        written = self.spark.read.parquet(os.path.join(self.path, name))
        aggs = [
            F.min(self.key_col).alias("lo"),
            F.max(self.key_col).alias("hi"),
            F.count("*").alias("n"),
        ]
        for c in self.stat_cols:
            # Timestamp stats are recorded as EPOCH MICROS, not datetimes:
            # driver-side collection converts TimestampType through the
            # driver OS timezone (naive local datetimes), so an ISO-string
            # zone map written east of UTC would read AHEAD of a UTC `now`
            # and wrongly skip directories holding already-expired rows.
            # unix_micros is computed JVM-side from the internal epoch value
            # — no conversion anywhere, comparable against any wall clock.
            col = F.col(c)
            dt = written.schema[c].dataType
            if isinstance(dt, TimestampNTZType):
                col = F.unix_micros(col.cast("timestamp"))
            elif isinstance(dt, TimestampType):
                col = F.unix_micros(col)
            aggs.append(F.min(col).alias(f"_lo_{c}"))
            aggs.append(F.max(col).alias(f"_hi_{c}"))
        row = written.agg(*aggs).first()
        stats = {"lo": _portable(row["lo"]), "hi": _portable(row["hi"]), "n": row["n"]}
        if self.stat_cols:
            stats["stats"] = {
                c: {
                    "lo": _portable_stat(row[f"_lo_{c}"]),
                    "hi": _portable_stat(row[f"_hi_{c}"]),
                }
                for c in self.stat_cols
            }
        return name, stats

    def _write_range_dirs(self, df: DataFrame, n_dirs: int) -> list[dict]:
        """Write ``df`` as ``n_dirs`` RANGE-PARTITIONED data directories —
        the structural fix for note 136's full-table copy-on-write
        (VERDICT r14 next-round #4, the Delta file-pruning shape): one
        container ``d-<uuid>`` holding ``_rb=K`` subdirectories, each a
        contiguous key range, each committed as its OWN live entry with its
        own key-range stats. A later upsert whose batch spans a narrow key
        range then overlaps (and rewrites) only the matching range dirs
        instead of one table-spanning directory.

        One shuffle (repartitionByRange on the key — AQE never coalesces an
        explicit partition count, so spark_partition_id() is the stable
        range ordinal), one write, and ONE read-back agg grouped by ``_rb``
        for every subdirectory's stats. The ``_rb`` column lives only in
        the directory LAYOUT (partitionBy), never in the parquet files, so
        reading a leaf subdir directly yields the plain table schema.
        Returns the commit ``live`` entries (possibly fewer than n_dirs if
        range partitions came out empty)."""
        tagged = df.repartitionByRange(n_dirs, F.col(self.key_col)).withColumn(
            "_rb", F.spark_partition_id()
        )
        return self._write_tagged_dirs(tagged, df)

    def _write_tagged_dirs(self, tagged: DataFrame, untagged: DataFrame) -> list[dict]:
        """Write an ``_rb``-tagged frame as one container of per-tag
        subdirectory entries (see _write_range_dirs; ``untagged`` is the
        schema-bearing fallback frame for the all-empty case). The tag
        column lands in the directory layout only, never the files."""
        name = f"d-{uuid.uuid4().hex}"
        container = os.path.join(self.path, name)
        tagged.write.partitionBy("_rb").parquet(container)
        if not any(e.startswith("_rb=") for e in os.listdir(container)):
            # empty frame: partitionBy produced no range subdirs — fall back
            # to one flat (schema-bearing) dir so read() can still bind
            import shutil

            shutil.rmtree(container, ignore_errors=True)
            flat_name, flat_stats = self._write_data_dir(untagged)
            return [{"dir": flat_name, **flat_stats}]
        written = self.spark.read.parquet(container)  # _rb inferred from layout
        aggs = [
            F.min(self.key_col).alias("lo"),
            F.max(self.key_col).alias("hi"),
            F.count("*").alias("n"),
        ]
        for c in self.stat_cols:
            col = F.col(c)
            dt = written.schema[c].dataType
            if isinstance(dt, TimestampNTZType):
                col = F.unix_micros(col.cast("timestamp"))
            elif isinstance(dt, TimestampType):
                col = F.unix_micros(col)
            aggs.append(F.min(col).alias(f"_lo_{c}"))
            aggs.append(F.max(col).alias(f"_hi_{c}"))
        rows = written.groupBy("_rb").agg(*aggs).collect()
        entries = []
        for row in sorted(rows, key=lambda r: r["_rb"]):
            stats = {"lo": _portable(row["lo"]), "hi": _portable(row["hi"]), "n": row["n"]}
            if self.stat_cols:
                stats["stats"] = {
                    c: {
                        "lo": _portable_stat(row[f"_lo_{c}"]),
                        "hi": _portable_stat(row[f"_hi_{c}"]),
                    }
                    for c in self.stat_cols
                }
            entries.append({"dir": f"{name}/_rb={row['_rb']}", **stats})
        return entries

    @staticmethod
    def _disjoint_ranges(dirs: list[dict]) -> bool:
        """True when every entry has a driver-comparable key range and the
        ranges are pairwise disjoint — the precondition for per-directory
        slice rewrites (a key must be routable to exactly ONE directory).
        put_if_absent appends arbitrary-range dirs, so the layout can lose
        this property between compactions; callers fall back to the
        merge-into-one path then."""
        if any(d.get("lo") is None or d.get("hi") is None for d in dirs):
            return False
        ordered = sorted(dirs, key=lambda d: d["lo"])
        return all(
            ordered[i]["hi"] < ordered[i + 1]["lo"] for i in range(len(ordered) - 1)
        )

    @staticmethod
    def _auto_n_dirs(n_rows: int) -> int:
        """Range-dir count from table size: ~1M rows per directory (the
        copy-on-write rewrite quantum), capped so the per-commit stats list
        stays a trivially small JSON."""
        return max(1, min(256, (n_rows + _TARGET_DIR_ROWS - 1) // _TARGET_DIR_ROWS))

    def _read_dirs(self, dirs: list[str]) -> DataFrame:
        return self.spark.read.parquet(*[os.path.join(self.path, d) for d in dirs])

    def read(self, version: int | None = None) -> DataFrame:
        v = self.version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no committed version at {self.path}")
        live = self._read_commit(v)["live"]
        if not live:
            raise ValueError(f"version {v} of {self.path} has no data directories")
        delta_dirs = [d for d in live if d.get("delta")]
        if not delta_dirs:
            return self._read_dirs([d["dir"] for d in live])
        # Merge-on-read resolution, O(delta) not O(table): while delta dirs
        # exist, every non-delta copy of a delta key is provably OLDER than
        # every delta copy (cow upserts and deletes absorb deltas before
        # touching base dirs; put_if_absent only inserts keys absent from
        # EVERY dir), and non-delta dirs never share a key among
        # themselves. So the snapshot is: base rows whose key is NOT in the
        # delta key set (a broadcast anti-join — the 10M-row side never
        # shuffles), plus the per-key latest delta row by commit sequence
        # (a window over only the delta rows). The full-union window runs
        # only when the accumulated deltas are too big to broadcast —
        # which is the signal to compact() anyway.
        cow = self._read_dirs([d["dir"] for d in live if not d.get("delta")])
        dx = None
        for d in delta_dirs:
            part = self._read_dirs([d["dir"]]).withColumn(
                "_seq", F.lit(int(d.get("v", 0)))
            )
            dx = part if dx is None else dx.unionByName(part)
        w = Window.partitionBy(self.key_col).orderBy(F.col("_seq").desc())
        latest = (
            dx.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
        n_delta = sum(int(d.get("n", 0)) for d in delta_dirs)
        if n_delta <= _MOR_BROADCAST_MAX_KEYS:
            dkeys = dx.select(self.key_col).distinct()
            return cow.join(
                F.broadcast(dkeys), self.key_col, "left_anti"
            ).unionByName(latest)
        base = cow.withColumn("_seq", F.lit(-1)).unionByName(
            dx
        )
        return (
            base.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )

    # ------------------------------------------------------------- writes

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_col: str = "key",
        *,
        stat_cols: tuple[str, ...] = (),
        checkpoint_interval: int = 10,
        n_dirs: int | None = None,
    ) -> "TxnTable":
        """Create the table as version 0. Fails if version 0 already exists.

        ``n_dirs=None`` (default) sizes the range-directory count from the
        row count (~1M rows per dir — see _write_range_dirs); pass an
        explicit count to override, or 1 to force the legacy single-dir
        layout. The sizing count is one extra job at create time — ETL,
        paid once."""
        t = cls(spark, path, key_col, stat_cols=stat_cols, checkpoint_interval=checkpoint_interval)
        os.makedirs(path, exist_ok=True)
        k = t._auto_n_dirs(df.count()) if n_dirs is None else max(1, n_dirs)
        if k == 1:
            name, stats = t._write_data_dir(df)
            live = [{"dir": name, **stats}]
        else:
            live = t._write_range_dirs(df, k)
        if not t._try_publish(0, {"version": 0, "op": "create", "live": live}):
            raise FileExistsError(f"table already created at {path}")
        return t

    def upsert(self, updates: DataFrame, *, mode: str = "cow") -> int:
        """Last-writer-wins keyed upsert (the MERGE substitution for
        operators/memory.py:upsert_by_key) as one ACID commit.

        mode="cow" (default) is copy-on-write: only directories that
        actually OWN an update key are rewritten; everything else carries
        over by reference. When the live directories' ranges are pairwise
        DISJOINT (the _write_range_dirs layout), ownership is exact — each
        update routes to the directory whose key range holds it
        (gap/out-of-range keys, provably absent from every live dir, go to
        the nearest range) and only directories with a NON-EMPTY routed
        slice rewrite, each as its own slice, so the range structure
        SURVIVES the upsert and keeps pruning (note 136: one merged dir
        would re-coalesce the table after the first wide batch; and
        min/max-interval pruning alone collapses under a batch with
        scattered keys, whose [lo, hi] envelope covers everything).
        Overlapping-range layouts (e.g. after put_if_absent appends) fall
        back to interval pruning + merge-into-one; compact() restores the
        range layout. Optimistic retry on version conflict — the retry
        recomputes against the winner's live set, so no update is lost.

        mode="mor" is merge-on-read (the Hudi/Delta-deletion-vector shape
        for write-heavy key-scattered workloads, where even exact CoW
        routing rewrites most of the table): the deduped batch lands as ONE
        new delta directory — O(batch), no base read, no rewrite — and
        ``read()`` resolves last-writer-wins lazily via a per-key window
        over the commit sequence number each directory carries. Reads pay
        one extra window while deltas exist; ``compact()`` resolves them
        back to pure range-partitioned storage, and ``delete_where``
        auto-compacts first (a delete against shadowed copies would
        otherwise resurrect older values — correctness over speed on the
        rare path).
        """
        from ..operators.memory import upsert_by_key

        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        u_row = updates.agg(
            F.min(self.key_col).alias("lo"), F.max(self.key_col).alias("hi")
        ).first()
        u_lo, u_hi = _portable(u_row["lo"]), _portable(u_row["hi"])
        if u_lo is None and u_row["lo"] is None:
            return self.version()  # empty update batch: nothing to commit
        while True:
            v = self.version()
            live = self._read_commit(v)["live"]
            if mode == "mor":
                fresh = updates.where(
                    F.col(self.key_col).isNotNull()
                ).dropDuplicates([self.key_col])
                name, stats = self._write_data_dir(fresh)
                commit = {
                    "version": v + 1,
                    "op": "upsert_mor",
                    "live": live + [{"dir": name, **stats, "v": v + 1, "delta": True}],
                }
                if self._try_publish(v + 1, commit):
                    return v + 1
                continue  # conflict: orphan dir (vacuum reclaims); retry
            if any(d.get("delta") for d in live):
                # a CoW merge resolves copies with upsert_by_key's
                # (_prio, updated_at) ordering, which need not match commit
                # order for shadowed delta keys — absorb the deltas first
                # (compact folds them via the seq-ordered read window) so
                # commit-order LWW is exact, then rewrite pure-CoW dirs.
                # This is also what keeps the O(delta) read fast path's
                # older-than-every-delta invariant true.
                self.compact()
                continue
            if len(live) > 1 and self._disjoint_ranges(live):
                ordered = sorted(live, key=lambda d: d["lo"])
                # rb = index of the greatest range-lo ≤ key (-1 below every
                # range): an existing key lands on its owning dir exactly
                # (disjoint sorted ranges). Exact OWNERSHIP pruning: only
                # dirs whose routed slice contains an IN-RANGE key (lo_i ≤
                # key ≤ hi_i — a true update) are rewritten, each merged
                # with its full slice; a scattered batch whose [u_lo, u_hi]
                # interval spans the table still rewrites only the dirs
                # holding one of its keys. Slices made ONLY of gap /
                # out-of-range keys (pure inserts, provably absent from
                # every live dir) append as their OWN new dirs — no read,
                # no rewrite — and stay disjoint by construction: an rb=i
                # gap slice lies strictly inside (hi_i, lo_{i+1}), and the
                # rb=-1 slice strictly below lo_0. A mixed slice rides the
                # rewrite and extends its dir's range without crossing the
                # next lo, so disjointness survives every shape.
                key = F.col(self.key_col)
                rb = F.when(key < F.lit(ordered[0]["lo"]), F.lit(-1)).otherwise(F.lit(0))
                for i, d in enumerate(ordered[1:], start=1):
                    rb = F.when(key >= F.lit(d["lo"]), F.lit(i)).otherwise(rb)
                inr = F.lit(False)
                for i, d in enumerate(ordered):
                    inr = F.when(
                        F.col("_rb") == i, key <= F.lit(d["hi"])
                    ).otherwise(inr)
                tagged_updates = updates.withColumn("_rb", rb).withColumn("_inr", inr)
                slice_rows = (
                    tagged_updates.groupBy("_rb")
                    .agg(F.max("_inr").alias("any_inr"))
                    .collect()
                )
                hit_rbs = sorted(r["_rb"] for r in slice_rows if r["any_inr"])
                gap_rbs = sorted(r["_rb"] for r in slice_rows if not r["any_inr"])
                hit = [ordered[i] for i in hit_rbs]
                carry = [d for d in live if d not in hit]
                entries = []
                if hit_rbs:
                    base = None
                    for i in hit_rbs:
                        part = self._read_dirs([ordered[i]["dir"]]).withColumn(
                            "_rb", F.lit(i)
                        )
                        base = part if base is None else base.unionByName(part)
                    merged = upsert_by_key(
                        base,
                        tagged_updates.where(F.col("_rb").isin(hit_rbs)).drop("_inr"),
                    )
                    entries += self._write_tagged_dirs(
                        merged.repartition(len(hit_rbs), F.col("_rb")),
                        merged.drop("_rb"),
                    )
                if gap_rbs:
                    inserts = (
                        tagged_updates.where(F.col("_rb").isin(gap_rbs))
                        .drop("_inr")
                        .dropDuplicates([self.key_col])
                    )
                    entries += self._write_tagged_dirs(
                        inserts.repartition(len(gap_rbs), F.col("_rb")),
                        inserts.drop("_rb"),
                    )
            else:
                hit = [d for d in live if _overlaps(d, u_lo, u_hi)]
                carry = [d for d in live if d not in hit]
                base = self._read_dirs([d["dir"] for d in hit]) if hit else updates.limit(0)
                merged = upsert_by_key(base, updates)
                name, stats = self._write_data_dir(merged)
                entries = [{"dir": name, **stats}]
            for e in entries:
                e["v"] = v + 1
            commit = {
                "version": v + 1,
                "op": "upsert",
                "live": carry + entries,
            }
            if self._try_publish(v + 1, commit):
                return v + 1
            # conflict: a concurrent writer won this version — the new data
            # dir is now an orphan (vacuum reclaims it); recompute and retry

    def put_if_absent(self, updates: DataFrame) -> tuple[int, DataFrame]:
        """First-writer-wins keyed insert as one ACID commit: only rows whose
        key is NOT already present land; returns ``(version, inserted_df)``
        where ``inserted_df`` reads back exactly the committed rows (empty
        when every key was already taken — the version is then the one that
        proved it). The arbitration primitive for racing admitters (VERDICT
        r8 next-round #3): two writers inserting the same key produce
        EXACTLY ONE insertion, and the loser's returned frame excludes it —
        the loser thereby LEARNS the key was taken, which last-writer-wins
        `upsert` cannot tell it.

        Optimistic retry on version conflict, same as upsert: the retry
        re-filters against the winner's live set, so the check-then-insert
        is atomic at commit granularity. Batch-internal duplicate keys are
        collapsed arbitrarily (dropDuplicates) — pre-dedup the batch when
        which-copy-wins matters. NULL-key rows are DROPPED, never inserted
        (a NULL can't be arbitrated: the anti-join existence check never
        matches it, so it would re-insert on every call). No directory is rewritten: the insert is
        a pure live-set append, so concurrent put_if_absent writers never
        invalidate each other's data files, only force a re-filter."""
        import shutil

        while True:
            v = self.version()
            if v < 0:
                raise FileNotFoundError(
                    f"no committed version at {self.path} — create() the table first"
                )
            live = self._read_commit(v)["live"]
            existing = self._read_dirs([d["dir"] for d in live])
            # NULL keys are rejected outright: the left_anti existence check
            # can never match a NULL (SQL null equality), so a NULL-key row
            # would be treated as fresh and re-inserted on EVERY call —
            # breaking the exactly-one-insertion arbitration contract
            # (ADVICE r9). A keyed table has no meaningful NULL key anyway.
            fresh = (
                updates.where(F.col(self.key_col).isNotNull())
                .dropDuplicates([self.key_col])
                .join(existing.select(self.key_col), self.key_col, "left_anti")
            )
            name, stats = self._write_data_dir(fresh)
            if stats["n"] == 0:
                # nothing new to insert — drop the empty uncommitted dir
                # (ours alone, never referenced) and report version v
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
                return v, updates.limit(0)
            commit = {
                "version": v + 1,
                "op": "insert_if_absent",
                "live": live + [{"dir": name, **stats, "v": v + 1}],
            }
            if self._try_publish(v + 1, commit):
                return v + 1, self._read_dirs([name])
            # conflict: orphan dir (vacuum reclaims); recompute and retry

    def delete_where(self, condition: Column | str, events_of=None, skip_dir=None) -> tuple[int, int]:
        """Delete matching rows in one ACID commit (the DELETE-WHERE
        substitution for the expiry sweep). Returns (new_version, n_deleted);
        commits nothing when no row matches.

        Only directories that actually CONTAIN matching rows are rewritten
        (one predicate scan locates them — what Delta does when file stats
        can't answer the predicate); the rest carry over by reference.

        ``events_of`` (optional, ``matching_rows_df -> events_df``) builds an
        events frame that rides the SAME commit in an events directory — the
        transactional substitute for expiry.py's staged-rename dance. It is
        invoked INSIDE the optimistic-retry loop over the exact snapshot the
        commit deletes from, so events always agree with the deleted rows
        even when a concurrent writer forces a retry. A crash before publish
        shows neither the delete nor the events; after publish, both.
        drain_events() delivers them exactly-once downstream.

        ``skip_dir`` (optional, ``dir_commit_entry -> bool``) is the zone-map
        fast path: return True when the directory's recorded stats PROVE no
        row matches — that directory is neither scanned nor rewritten. The
        callable must be conservative (missing stats ⇒ False);
        ``expired_skipper`` builds the one the TTL sweep needs.
        """
        cond = F.expr(condition) if isinstance(condition, str) else condition
        while True:
            v = self.version()
            live = self._read_commit(v)["live"]
            if any(d.get("delta") for d in live):
                # deleting from shadowed copies would RESURRECT older
                # values (dropping the newest copy of a key re-exposes the
                # CoW row beneath it in the read window), so merge-on-read
                # deltas are compacted away first and the delete proceeds
                # on pure-CoW dirs — correctness over speed on the rarer
                # path (the MoR trade: cheap upserts, deferred resolution)
                self.compact()
                continue
            hit, n_deleted = [], 0
            for d in live:
                if skip_dir is not None and skip_dir(d):
                    continue
                n = self._read_dirs([d["dir"]]).where(cond).count()
                if n:
                    hit.append(d)
                    n_deleted += n
            if not hit:
                return v, 0
            carry = [d for d in live if d not in hit]
            hit_df = self._read_dirs([d["dir"] for d in hit])
            if len(hit) > 1:
                # per-dir rewrite (no key routing needed — a delete never
                # moves rows between dirs), so the range layout survives
                # the sweep instead of coalescing into one table-spanning
                # dir (note 136); empty survivors simply drop out of the
                # container, and the all-empty case falls back to one flat
                # schema-bearing dir inside _write_tagged_dirs
                base = None
                for i, d in enumerate(hit):
                    part = self._read_dirs([d["dir"]]).withColumn("_rb", F.lit(i))
                    base = part if base is None else base.unionByName(part)
                remaining = base.where(~cond)
                entries = self._write_tagged_dirs(
                    remaining.repartition(len(hit), F.col("_rb")),
                    remaining.drop("_rb"),
                )
            else:
                name, stats = self._write_data_dir(hit_df.where(~cond))
                entries = [{"dir": name, **stats}]
            for e in entries:
                e["v"] = v + 1
            commit = {
                "version": v + 1,
                "op": "delete",
                # the (possibly empty) rewrite dir always stays live so
                # read() of this version still has a schema to bind to
                "live": carry + entries,
            }
            if events_of is not None:
                ename = f"e-{uuid.uuid4().hex}"
                events_of(hit_df.where(cond)).write.parquet(os.path.join(self.path, ename))
                commit["events"] = ename
            if self._try_publish(v + 1, commit):
                return v + 1, n_deleted

    def compact(self) -> int:
        """Merge all live data directories into one — the OPTIMIZE step of
        the lifecycle. Every upsert adds a directory, and at scale the
        accumulation IS the small-file problem: each write's range-stat scan
        and each read's file listing grow with dir count. Compaction is an
        ordinary commit (op="compact", same optimistic publish), so it
        coexists safely with concurrent writers — a conflict just retries —
        and superseded dirs stay on disk for snapshot readers until
        vacuum(keep_from_version=...) reclaims them. No-op at ≤1 live dir.

        Production note: Delta's OPTIMIZE bin-packs to a target file size
        instead of one-dir-total and can run incrementally; same commit
        mechanics, finer packing policy.
        """
        while True:
            v = self.version()
            live = self._read_commit(v)["live"]
            if len(live) <= 1 and not any(d.get("delta") for d in live):
                return v
            # read(v) resolves merge-on-read deltas (per-key latest by
            # commit seq), so compacting a delta-bearing table folds the
            # shadowed copies away and returns it to window-free reads
            merged = self.read(v)
            # re-split to the auto range layout (sized from the commit's own
            # per-dir counts — no extra job), restoring per-range pruning
            # that put_if_absent appends / wide upserts may have degraded
            k = self._auto_n_dirs(sum(d.get("n", 0) for d in live))
            if k == 1:
                name, stats = self._write_data_dir(merged)
                entries = [{"dir": name, **stats}]
            else:
                entries = self._write_range_dirs(merged, k)
            for e in entries:
                e["v"] = v + 1
            if self._try_publish(
                v + 1, {"version": v + 1, "op": "compact", "live": entries}
            ):
                return v + 1

    # ------------------------------------------------------------ hygiene

    def vacuum(self, keep_from_version: int | None = None) -> list[str]:
        """Remove data/event directories referenced by NO commit (orphans
        from crashed or conflicted writes) and, when ``keep_from_version``
        is set, directories referenced ONLY by commits older than it
        (superseded snapshots readers no longer pin). Returns removed names.

        Production note: Delta gates this on a retention window (time since
        supersession) rather than a version floor; the reclamation logic is
        the same."""
        import shutil

        latest = self.version()
        if latest < 0:
            return []
        # orphan-only mode keeps anything ANY commit references; a version
        # floor additionally drops dirs only older commits reference
        floor = 0 if keep_from_version is None else keep_from_version
        referenced: set[str] = set()
        for v in range(floor, latest + 1):
            try:
                c = self._read_commit(v)
            except FileNotFoundError:
                # cleaned version: its live dirs either carry over into newer
                # commits (full-state "live" lists) or are legitimately dead
                continue
            # range-layout entries are container subpaths (d-xxx/_rb=K):
            # reference the top-level container — removal is all-or-nothing
            # per container, so a container with ANY live subdir survives
            # (its superseded sibling subdirs are reclaimed at the next
            # compact+vacuum cycle)
            referenced.update(d["dir"].split("/", 1)[0] for d in c["live"])
            if c.get("events"):
                referenced.add(c["events"])
        removed = []
        for name in os.listdir(self.path):
            if name == _LOG_DIR or name in referenced:
                continue
            if not (name.startswith("d-") or name.startswith("e-")):
                continue
            shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)
            removed.append(name)
        return removed


def _portable(value) -> str | None:
    """Key-range stat safe to compare in the driver: ASCII strings compare
    identically in Python and the JVM; anything else → None (assume
    overlap — correctness over pruning)."""
    if isinstance(value, str) and value.isascii():
        return value
    return None


def _portable_stat(value):
    """Zone-map stat value, JSON-serializable and driver-comparable:
    numbers as-is, datetimes/dates as ISO strings (lexicographic order ==
    temporal order for a uniform UTC layout), ASCII strings as-is; anything
    else → None (the skipper must then refuse to prune)."""
    import datetime as _dt

    if isinstance(value, bool):
        return None
    if isinstance(value, (int, float)):
        return value
    if isinstance(value, (_dt.datetime, _dt.date)):
        return value.isoformat()
    if isinstance(value, str) and value.isascii():
        return value
    return None


def expired_skipper(col: str, now):
    """Zone-map skipper for the TTL sweep's ``{col} IS NOT NULL AND {col} <=
    now`` predicate: a directory is provably match-free when its recorded
    minimum is strictly AFTER now (min/max ignore NULLs, and NULL rows never
    match the predicate, so an all-null or missing-stat directory simply
    isn't skippable).

    Timestamp zone maps are EPOCH MICROS (see _write_data_dir), so the
    comparison is pure integer arithmetic with no timezone anywhere: ``now``
    (a datetime — naive means UTC, the sweep's convention) is converted to
    epoch micros explicitly via a UTC attach, never through the driver OS
    timezone. A directory whose stats predate the numeric format (legacy
    ISO strings) is NOT skippable — those strings were rendered in the
    writing driver's local timezone, and comparing them against a UTC now
    is the mixed-timezone bug this function refuses to reintroduce; the
    directory simply gets scanned (correctness over pruning)."""
    import datetime as _dt

    if isinstance(now, _dt.datetime):
        aware = now if now.tzinfo is not None else now.replace(tzinfo=_dt.timezone.utc)
        now_us = int(aware.timestamp() * 1_000_000)
    elif isinstance(now, (int, float)):
        now_us = int(now)
    else:
        raise TypeError(f"now must be a datetime or epoch micros, got {type(now)!r}")

    def skip(d: dict) -> bool:
        s = (d.get("stats") or {}).get(col) or {}
        lo = s.get("lo")
        return (
            lo is not None
            and isinstance(lo, (int, float))
            and not isinstance(lo, bool)
            and int(lo) > now_us
        )

    return skip


def _overlaps(d: dict, u_lo: str | None, u_hi: str | None) -> bool:
    """Conservative range overlap: any missing bound ⇒ overlap (a wrongly
    pruned directory would leave a stale duplicate key — never acceptable)."""
    if None in (d.get("lo"), d.get("hi"), u_lo, u_hi):
        return True
    return not (d["hi"] < u_lo or u_hi < d["lo"])


def drain_events(table: TxnTable, events_dir: str, *, up_to_version: int | None = None) -> int:
    """Deliver committed event directories into ``events_dir`` exactly once.

    Each commit's events move part-file-by-part-file with atomic renames
    (same filesystem required, as in streaming/expiry.py), then the version
    is sealed with a ``NNNNNN.drained`` marker published via the same
    atomic-link primitive — a crash mid-drain re-runs only unsealed
    versions, and part names embed uuids so re-renaming is collision-free.
    Returns the number of versions drained."""
    latest = table.version() if up_to_version is None else up_to_version
    drained = 0
    for v in range(latest + 1):
        marker = os.path.join(table.path, _LOG_DIR, f"{v:06d}.drained")
        if os.path.exists(marker):
            continue
        try:
            c = table._read_commit(v)
        except FileNotFoundError:
            # clean_log() only removes drained-or-eventless versions, so a
            # missing commit has nothing left to deliver
            continue
        ename = c.get("events")
        if ename:
            pending = os.path.join(table.path, ename)
            os.makedirs(events_dir, exist_ok=True)
            if os.path.isdir(pending):
                for part in os.listdir(pending):
                    if part.endswith(".parquet") and not part.startswith((".", "_")):
                        try:
                            os.rename(os.path.join(pending, part), os.path.join(events_dir, part))
                        except FileNotFoundError:
                            # a CONCURRENT drainer moved this part between our
                            # listdir and rename — the destination name is
                            # identical, so exactly-once delivery holds; skip
                            pass
            drained += 1
        # unique tmp per caller (like _try_publish): a SHARED tmp path would
        # let one drainer's unlink yank the file from under another's link
        tmp = f"{marker}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            f.write("")
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, marker)
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
    return drained
