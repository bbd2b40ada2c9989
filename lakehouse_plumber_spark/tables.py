"""Managed table store: Delta Lake when available, parquet + atomic swap otherwise.

The reference targets Delta tables via DLT (`dp.create_streaming_table`,
`DeltaTable.merge` in the quarantine template). delta-spark is not on this
image's classpath, so the store abstracts the format:

- ``DeltaTableStore``  — used automatically when `import delta` succeeds; MERGE
  is a real ACID Delta merge, appends are transactional (the 100 TB path).
- ``ParquetTableStore``— same logical semantics on plain parquet: appends are
  new files in the table directory; merge/overwrite rewrite to a shadow
  directory then atomically rename. Single-writer semantics only — good for
  local correctness; swap in Delta/Iceberg for concurrent production writes.

Scale notes: appends never rewrite existing data; merges shuffle on the merge
keys only (join keys are the partitioning pivot); `partition_columns` are
honored on write so partition pruning works on read.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only when delta-spark is installed
    from delta.tables import DeltaTable  # noqa: F401

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    HAVE_DELTA = False


class ConcurrentWriterError(RuntimeError):
    """A second writer tried to update a persisted incremental index while
    another writer holds its lock (see ParquetTableStore.writer_lock)."""


def _write_sort_cols(
    partition_columns: Optional[list[str]], order_within_files: list[str]
) -> list[str]:
    """Task-sort columns for a clustered write: a partitionBy() writer
    REQUIRES task rows ordered by the partition columns and inserts its own
    (unstable) sort when they aren't — which would silently destroy the
    cluster ordering. Sorting by (partition_cols + cluster_cols) satisfies
    the writer's requirement, so it skips its sort and the within-file
    cluster order survives."""
    pre = list(partition_columns or [])
    return pre + [c for c in order_within_files if c not in pre]


def _safe_name(name: str) -> str:
    return name.replace(".", "/")


def adaptive_bucket_count(
    approx_rows: int,
    rows_per_bucket: int = 2_000_000,
    lo: int = 8,
    hi: int = 4096,
) -> int:
    """Pick a hash-bucket count for a keyed table from its initial size.

    Power of two in [lo, hi], sized so a bucket holds ~rows_per_bucket rows:
    big enough that a typical batch touches a strict subset of buckets (pruned
    merges stay pruned at 100 TB), small enough that tiny tables don't shatter
    into thousands of near-empty files. The chosen count is persisted in the
    table meta at creation and MUST stay fixed for the table's lifetime —
    pruning is only sound against the stored layout.
    """
    need = max(1, -(-max(0, approx_rows) // rows_per_bucket))
    return max(lo, min(hi, 1 << (need - 1).bit_length()))


@dataclass
class ParquetTableStore:
    """Parquet-backed managed tables rooted at ``root``.

    Table identity is the reference's 3-part `catalog.schema.table` name
    (src/lhp/generators/write/streaming_table.py:69-71) mapped to a directory
    `root/catalog/schema/table`.
    """

    spark: SparkSession
    root: str
    _schemas: dict = field(default_factory=dict)

    # I/O format for the data plane; methods that differ between backends
    # ONLY in the storage format go through this (DeltaTableStore overrides
    # it and inherits those bodies unchanged)
    FMT = "parquet"

    def path(self, name: str) -> str:
        return os.path.join(self.root, _safe_name(name))

    def _heal_interrupted_swap(self, name: str) -> None:
        """Complete an `overwrite` whose process died between its two
        commit renames (target→backup, then shadow→target): that window
        leaves NO table dir at all, and `exists() == False` would make an
        incremental caller silently recreate an empty index and miss every
        cross-batch duplicate against the stranded history.

        Safe because of the write ordering: the shadow is only ever
        renamed after its write job completed (Spark's `_SUCCESS` marker
        proves completion), so target-missing + backup-present means the
        newest marker-bearing shadow is the finished new table — finish
        the rename it started.  If no completed shadow survives, restore
        the backup (the old data) instead.  Shadows are never touched
        while the target exists: one may belong to a LIVE overwrite in
        another process.  Idempotent and crash-tolerant itself: renames
        that lose a race to another healer surface as OSError and are
        re-checked against the target."""
        target = self.path(name)
        if os.path.isdir(target):
            return
        parent, base = os.path.split(target)
        if not os.path.isdir(parent):
            return
        backups = sorted(
            (d for d in os.listdir(parent) if d.startswith(base + "__old_")),
            key=lambda d: os.path.getmtime(os.path.join(parent, d)),
        )
        if not backups:
            return
        shadows = sorted(
            (
                d
                for d in os.listdir(parent)
                if d.startswith(base + "__swap_")
                and os.path.exists(os.path.join(parent, d, "_SUCCESS"))
            ),
            key=lambda d: os.path.getmtime(os.path.join(parent, d)),
        )
        src = shadows[-1] if shadows else backups[-1]
        try:
            os.rename(os.path.join(parent, src), target)
        except OSError:
            if not os.path.isdir(target):
                raise
        import logging

        logging.getLogger(__name__).warning(
            "healed interrupted overwrite of %s (completed the swap from "
            "%s)", name, src,
        )
        for d in backups:
            p = os.path.join(parent, d)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)

    def exists(self, name: str) -> bool:
        self._heal_interrupted_swap(name)
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        self._heal_interrupted_swap(name)
        return self.spark.read.format(self.FMT).load(self.path(name))

    def read_stream(self, name: str) -> DataFrame:
        schema = self.read(name).schema
        # Persistent marker: a parquet FileStreamSource checkpoint tracks
        # processed file PATHS, so once ANY run consumes this table as a
        # stream, a compaction (which renames every data file) would make
        # every checkpointed consumer re-ingest the table in full. compact()
        # refuses such tables; the marker lives in the meta sidecar, outside
        # the table dir, so it survives rewrites.
        if not self.get_meta(name, "streaming_consumed"):
            self.set_meta(name, "streaming_consumed", True)
        return self.spark.readStream.schema(schema).parquet(self.path(name))

    def create_if_not_exists(
        self,
        name: str,
        schema=None,
        partition_columns: Optional[list[str]] = None,
        table_properties: Optional[dict] = None,
        comment: Optional[str] = None,
    ) -> None:
        if self.exists(name):
            return
        if schema is not None:
            empty = self.spark.createDataFrame([], schema)
            self.overwrite(name, empty, partition_columns=partition_columns)
        else:
            os.makedirs(self.path(name), exist_ok=True)

    def append(
        self,
        name: str,
        df: DataFrame,
        partition_columns: Optional[list[str]] = None,
        order_within_files: Optional[list[str]] = None,
    ) -> None:
        if not self.exists(name):
            # route table creation through overwrite: it guarantees a
            # schema-bearing file even for zero-row frames (a partitioned/
            # multi-task empty write emits no parquet footer) without
            # probing isEmpty(), which would evaluate the frame once extra
            self.overwrite(
                name, df, partition_columns=partition_columns,
                order_within_files=order_within_files,
            )
            return
        if partition_columns and not self._partition_columns_on_disk(name):
            # the table exists but has no key=value dirs: either the
            # zero-row placeholder overwrite's fallback leaves behind (an
            # empty partitioned write emits no files, so it writes one
            # unpartitioned schema-bearing file), or a genuinely
            # unpartitioned table.  Appending partition dirs beside a root
            # data file is an undefined mixed layout (current Spark
            # happens to read it; other readers raise 'Conflicting
            # directory structures'), so: replace an empty placeholder
            # with the real partitioned write, refuse loudly otherwise.
            if self.read(name).isEmpty():
                self.overwrite(
                    name, df, partition_columns=partition_columns,
                    order_within_files=order_within_files,
                )
                return
            raise ValueError(
                f"append to {name!r} with partition_columns="
                f"{partition_columns} but the table on disk is "
                "unpartitioned and non-empty — a mixed root-file/"
                "partition-dir layout is not portable; rewrite the table "
                "with overwrite(partition_columns=...) first"
            )
        out = df
        if order_within_files:
            out = out.sortWithinPartitions(
                *_write_sort_cols(partition_columns, order_within_files)
            )
        w = out.write.format(self.FMT).mode("append")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.save(self.path(name))

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_columns: Optional[list[str]] = None,
        order_within_files: Optional[list[str]] = None,
    ) -> None:
        """Atomic overwrite: write to shadow dir, swap, drop the old data.

        With Delta this is a single transactional overwrite; here the rename is
        the commit point. ``order_within_files`` sorts rows inside each write
        task AFTER the partition co-location shuffle (cluster_columns layout —
        applied last so the repartition cannot undo it).

        Zero-row results need a schema-bearing file (a partitioned/multi-task
        empty write emits no parquet footer at all), but probing df.isEmpty()
        up front would evaluate the WHOLE query once extra — for an MV refresh
        or CDC rebuild that doubles the compute. Instead: write first, and
        only if the shadow dir came out file-less rewrite it as one empty
        single-task file (the second write runs on a known-empty frame, so the
        slow path costs nothing).
        """
        target = self.path(name)
        shadow = f"{target}__swap_{uuid.uuid4().hex[:8]}"
        out = df
        if partition_columns:
            from pyspark.sql import functions as F

            out = out.repartition(*[F.col(c) for c in partition_columns])
        if order_within_files:
            out = out.sortWithinPartitions(
                *_write_sort_cols(partition_columns, order_within_files)
            )
        w = out.write.mode("overwrite")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.parquet(shadow)
        if not any(
            f.endswith(".parquet") for _, _, fs in os.walk(shadow) for f in fs
        ):
            self.spark.createDataFrame([], df.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(shadow)
        backup = f"{target}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(target):
            os.rename(target, backup)
        os.rename(shadow, target)
        if os.path.isdir(backup):
            shutil.rmtree(backup, ignore_errors=True)
        # invalidate cached file listings for THIS path only — clearCache()
        # here would drop every cached relation in the session (including
        # in-flight persisted frames and unrelated tables' file indexes)
        self.spark.catalog.refreshByPath(target)

    def overwrite_partitions(
        self, name: str, df: DataFrame, partition_columns: list[str]
    ) -> None:
        """Rewrite only the partitions present in `df` (dynamic partition
        overwrite) — the parquet equivalent of a partition-scoped MERGE.

        Partitions of the table not represented in `df` are untouched on
        disk: work scales with the affected partitions, not the table size.
        """
        from pyspark.sql import functions as F

        # co-locate each partition's rows before the write: without this every
        # task writes a file per partition value it holds (tasks x partitions
        # small files); with it, one-or-few files per partition
        df = df.repartition(*[F.col(c) for c in partition_columns])
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_columns)
            .parquet(self.path(name))
        )
        self.spark.catalog.refreshByPath(self.path(name))

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)
        # a dropped table has no files any checkpoint has seen, so the
        # streaming-consumer marker must not outlive it — otherwise a
        # rebuilt table is permanently refused compaction. The REST of the
        # sidecar (CDF, versions, cdc meta) deliberately survives: stale
        # markers there are real operational traps the engine must handle
        # (see test_incremental_mv's epoch-marker replay test).
        if self.get_meta(name, "streaming_consumed"):
            self.set_meta(name, "streaming_consumed", False)

    def _data_file_count(self, name: str) -> int:
        n = 0
        for _, _, fs in os.walk(self.path(name)):
            n += sum(1 for f in fs if f.endswith(".parquet"))
        return n

    def _partition_columns_on_disk(self, name: str) -> list[str]:
        """Partition layout inferred from the key=value directory chain."""
        cols: list[str] = []
        probe = self.path(name)
        while os.path.isdir(probe):
            subs = [
                d for d in os.listdir(probe)
                if "=" in d and os.path.isdir(os.path.join(probe, d))
            ]
            if not subs:
                break
            cols.append(subs[0].split("=", 1)[0])
            probe = os.path.join(probe, subs[0])
        return cols

    def compact(
        self,
        name: str,
        target_rows_per_file: int = 4_000_000,
        order_within_files: Optional[list[str]] = None,
        force: bool = False,
        morton: bool = False,
    ) -> dict:
        """Small-file compaction — the parquet analogue of Delta ``OPTIMIZE``
        (the reference delegates this to the platform; an executing engine
        must own it).

        Streaming appends and partition-scoped merges accumulate a file per
        micro-batch per partition; at scale the FILE COUNT, not the byte
        count, becomes the scan bottleneck (one task per file, a footer read
        per file, ever-slower listings). Rewrites the table through the same
        atomic shadow-swap as ``overwrite`` — readers see old or new, never
        a mix — preserving the on-disk partition layout (rows co-located one
        task per partition value) or, for unpartitioned tables, sized to
        ``target_rows_per_file``. Content is byte-identical, so nothing is
        logged to the change feed and table meta is untouched (both live
        outside the table dir).

        FILE IDENTITY is not preserved, though: every data file gets a new
        name, and a parquet FileStreamSource checkpoint tracks processed
        file paths — a checkpointed streaming consumer of a compacted table
        would re-ingest it in full (Delta OPTIMIZE sidesteps this with
        dataChange=false; a parquet directory has no equivalent). Tables
        ever read via ``read_stream`` are therefore refused unless
        ``force=True`` (ADVICE r4 high).

        Holds ``writer_lock(name)`` for the read→rewrite (r14): compacting
        a persisted incremental index while a locked operator appends to
        it would drop the in-flight append from the rewritten table — the
        compaction refuses instead (and vice versa).  DeltaTableStore's
        override needs no lock: Delta OPTIMIZE is transactional.
        """
        if not force and self.get_meta(name, "streaming_consumed"):
            raise ValueError(
                f"refusing to compact {name!r}: the table has been read as a "
                "stream, and compaction renames every data file, which would "
                "make checkpointed streaming consumers re-ingest it in full; "
                "pass force=True only if all consumer checkpoints are reset"
            )
        with self.writer_lock(name, owner="compact"):
            return self._compact_locked(
                name, target_rows_per_file, order_within_files, morton
            )

    def _compact_locked(
        self,
        name: str,
        target_rows_per_file: int,
        order_within_files: Optional[list[str]],
        morton: bool,
    ) -> dict:
        before = self._data_file_count(name)
        part_cols = self._partition_columns_on_disk(name)
        df = self.read(name)
        # order_within_files re-establishes the cluster layout
        # (sort-within-files -> parquet min/max footer stats keep giving
        # readers data skipping): a compaction that interleaved rows would
        # silently destroy it. overwrite applies it after its co-location
        # shuffle, so the repartition cannot undo the sort.
        # `morton` (cluster_by_auto tables): rebuild the interleaved-key
        # range layout instead, so multi-column skipping survives the
        # rewrite — the parquet analogue of re-running OPTIMIZE ZORDER.
        # On a partitioned table the partition dirs already own their key;
        # morton degrades to within-partition lexicographic ordering there
        # (the range re-shuffle would fight the partition co-location).
        if part_cols:
            self.overwrite(
                name, df, partition_columns=part_cols,
                order_within_files=order_within_files,
            )
        elif morton and order_within_files and len(order_within_files) >= 2:
            from lakehouse_plumber_spark.functions.zorder import morton_layout

            rows = df.count()
            nfiles = max(1, -(-rows // target_rows_per_file))
            self.overwrite(name, morton_layout(df, order_within_files, nfiles))
        else:
            rows = df.count()
            nfiles = max(1, -(-rows // target_rows_per_file))
            self.overwrite(
                name, df.repartition(nfiles), order_within_files=order_within_files
            )
        return {
            "files_before": before,
            "files_after": self._data_file_count(name),
            "partition_columns": part_cols,
        }

    # ------------------------------------------------------------------
    # Change data feed emulation (Delta CDF: readChangeFeed /
    # delta.enableChangeDataFeed). Writers append change rows tagged with
    # _change_type/_commit_version/_commit_timestamp under <table>/__cdf/;
    # readers filter by starting/ending version. With a Delta store these
    # map 1:1 onto the real CDF (reference quarantine recycle reads CDF:
    # src/lhp/templates/transform/data_quality_quarantine.py.j2:135-177).
    # ------------------------------------------------------------------

    def _cdf_dir(self, name: str) -> str:
        return os.path.join(self.root, "_cdf", _safe_name(name))

    def current_version(self, name: str) -> int:
        """Latest committed change version, or -1 when no changes were logged."""
        vf = os.path.join(self._cdf_dir(name), "_version")
        if not os.path.exists(vf):
            return -1
        with open(vf) as f:
            return int(f.read().strip() or -1)

    def next_version(self, name: str) -> int:
        os.makedirs(self._cdf_dir(name), exist_ok=True)
        nxt = self.current_version(name) + 1
        with open(os.path.join(self._cdf_dir(name), "_version"), "w") as f:
            f.write(str(nxt))
        return nxt

    def log_changes(self, name: str, df: DataFrame, change_type: str, version: Optional[int] = None) -> int:
        """Append change rows of one type for one commit.

        The feed is laid out partitioned by `_commit_version` so that
        version-bounded reads (`read_changes(starting_version=N)`) are
        partition-pruned scans — consumers pay for the commits they read, not
        for the table's full change history (Delta CDF gives the same property
        via its commit log).
        """
        from pyspark.sql import functions as F

        if version is None:
            version = self.next_version(name)
        out = (
            df.withColumn("_change_type", F.lit(change_type))
            .withColumn("_commit_version", F.lit(version).cast("long"))
            .withColumn("_commit_timestamp", F.current_timestamp())
        )
        out.write.format(self.FMT).mode("append").partitionBy(
            "_commit_version"
        ).save(os.path.join(self._cdf_dir(name), "data"))
        return version

    def read_changes(
        self,
        name: str,
        starting_version: int = 0,
        ending_version: Optional[int] = None,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        p = os.path.join(self._cdf_dir(name), "data")
        df = self.spark.read.format(self.FMT).load(p)
        # partition column: normalize to long, filters below prune partitions
        df = df.withColumn("_commit_version", F.col("_commit_version").cast("long"))
        df = df.filter(F.col("_commit_version") >= starting_version)
        if ending_version is not None:
            df = df.filter(F.col("_commit_version") <= ending_version)
        return df

    def prune_changes(self, name: str, up_to_version: int) -> int:
        """Drop change-feed partitions with `_commit_version <= up_to_version`
        (CDF retention / log compaction). Returns the number of commits
        removed. Only safe once every consumer has checkpointed past
        `up_to_version`."""
        p = os.path.join(self._cdf_dir(name), "data")
        removed = 0
        if not os.path.isdir(p):
            return removed
        for d in os.listdir(p):
            if d.startswith("_commit_version="):
                try:
                    v = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if v <= up_to_version:
                    shutil.rmtree(os.path.join(p, d), ignore_errors=True)
                    removed += 1
        if removed:
            # invalidate cached file listings for the CDF dir only — a
            # session-wide clearCache() would evict every unrelated cached
            # table/plan in the session (same fix as overwrite/append above)
            self.spark.catalog.refreshByPath(p)
        return removed

    def has_changes(self, name: str) -> bool:
        """True when the feed holds at least one non-empty commit (an empty
        change set bumps the version but writes no partition directory)."""
        p = os.path.join(self._cdf_dir(name), "data")
        return os.path.isdir(p) and any(
            d.startswith("_commit_version=") for d in os.listdir(p)
        )

    def set_meta(self, name: str, key: str, value) -> None:
        """Tiny per-table metadata sidecar (e.g. the CDC bucket count, which
        must stay fixed for the table's lifetime for pruning to be sound)."""
        import json

        d = self._cdf_dir(name)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, "_meta.json")
        meta = {}
        if os.path.exists(p):
            with open(p) as f:
                meta = json.load(f)
        meta[key] = value
        with open(p, "w") as f:
            json.dump(meta, f)

    def get_meta(self, name: str, key: str, default=None):
        import json

        p = os.path.join(self._cdf_dir(name), "_meta.json")
        if not os.path.exists(p):
            return default
        with open(p) as f:
            return json.load(f).get(key, default)

    def checkpoint_dir(self, *parts: str) -> str:
        p = os.path.join(self.root, "_checkpoints", *[_safe_name(x) for x in parts])
        os.makedirs(p, exist_ok=True)
        return p

    def _lock_path(self, name: str) -> str:
        # beside the table dir, not inside it (a reader's file listing and
        # compact()'s rewrite must never see it as data)
        return self.path(name) + ".__lhp_writer_lock"

    def writer_lock(self, name: str, owner: str = "writer"):
        """Single-writer mutex for a read-probe-append sequence keyed on
        table `name` — the CONCURRENT-WRITERS CONTRACT for the persisted
        incremental indexes (r14, VERDICT r13 item #4): a second writer
        REFUSES with `ConcurrentWriterError` instead of silently racing.

        Why refusal rather than serialization or merging: two concurrent
        `incremental_dedup_batch` calls each probe the index BEFORE the
        other's append lands, so a near-dup pair split across the two
        batches is missed by BOTH — a semantic divergence from the
        one-shot oracle that no per-table write transactionality (even
        Delta's) repairs, because the race is read-vs-append across a
        MULTI-table sequence.  On plain parquet the race is also physical:
        two Spark write jobs sharing one `_temporary` staging dir can
        delete each other's in-flight task files.

        Mechanics: `open(O_CREAT|O_EXCL)` on a sidecar lock file — atomic
        on POSIX local/NFS filesystems.  The lock records pid/host/owner;
        a lock whose pid is dead ON THE SAME HOST is stale (the holder
        crashed before its `finally`) and is stolen with a warning — the
        crashed attempt's partial state is exactly what `retry=True`
        recovers.  The steal itself is an atomic `os.rename` to a
        pid-unique name — two writers that both observe the same dead
        holder race the rename, exactly one wins, and the loser falls
        back to the normal create-exclusive path against the winner's
        fresh lock (an unlink-based steal would let the loser delete the
        winner's NEW lock and leave both believing they hold it).  A lock
        from ANOTHER host is never stolen (no liveness signal); the error
        names the holder and the file to remove after verifying that
        writer is gone.  On object stores without atomic
        create-exclusive, swap in DeltaTableStore and its transactional
        log instead of relying on this file.
        """
        import contextlib
        import json as _json
        import socket

        store = self

        @contextlib.contextmanager
        def _cm():
            lp = store._lock_path(name)
            os.makedirs(os.path.dirname(lp), exist_ok=True)
            me = {
                "pid": os.getpid(), "host": socket.gethostname(),
                "owner": owner, "ts": time.time(),
            }
            for attempt in (0, 1):
                try:
                    fd = os.open(lp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    with os.fdopen(fd, "w") as f:
                        _json.dump(me, f)
                    break
                except FileExistsError:
                    try:
                        with open(lp) as f:
                            holder = _json.load(f)
                    except FileNotFoundError:
                        if attempt == 0:
                            # holder released between our failed create
                            # and this read — retry the create once
                            continue
                        holder = {}
                    except Exception:
                        holder = {}
                    same_host = holder.get("host") == me["host"]
                    pid = holder.get("pid")
                    alive = False
                    if same_host and isinstance(pid, int):
                        try:
                            os.kill(pid, 0)
                            alive = True
                        except ProcessLookupError:
                            alive = False
                        except PermissionError:
                            alive = True
                    if same_host and not alive and attempt == 0:
                        import logging

                        logging.getLogger(__name__).warning(
                            "stealing stale writer lock %s (holder pid %s "
                            "is dead); if that writer crashed mid-append, "
                            "re-run with retry=True", lp, pid,
                        )
                        # atomic steal: exactly one of N concurrent
                        # stealers wins this rename; losers retry the
                        # create and refuse against the winner's lock
                        stale = f"{lp}.stale.{me['pid']}"
                        try:
                            os.rename(lp, stale)
                        except FileNotFoundError:
                            pass  # another stealer won (or holder exited)
                        else:
                            with contextlib.suppress(FileNotFoundError):
                                os.remove(stale)
                        continue
                    raise ConcurrentWriterError(
                        f"table {name!r} already has an active writer "
                        f"(owner={holder.get('owner')!r} pid={pid} "
                        f"host={holder.get('host')!r}); concurrent "
                        "appends to a persisted incremental index would "
                        "silently miss cross-batch pairs — serialize the "
                        f"writers. If that writer is dead, remove {lp} "
                        "and re-run with retry=True."
                    )
            try:
                yield
            finally:
                with contextlib.suppress(FileNotFoundError):
                    os.remove(lp)

        return _cm()


@dataclass
class DeltaTableStore(ParquetTableStore):
    """Delta-OSS-backed store: the production path the parquet store emulates.

    Same interface and logical semantics as ``ParquetTableStore``; every
    hand-rolled mechanism maps onto the native Delta feature it imitates
    (reference targets exactly these via DLT templates, e.g.
    src/lhp/templates/transform/data_quality_quarantine.py.j2:39-177):

    - shadow-dir atomic swap        -> transactional ``mode("overwrite")``
    - dynamic-partition overwrite   -> native ``partitionOverwriteMode=dynamic``
    - ``compact()`` shadow rewrite  -> ``OPTIMIZE`` (``dataChange=false``, so
      streaming checkpoints survive: no ``streaming_consumed`` refusal needed)
    - keyed upsert via bucket rewrite -> ``DeltaTable.merge`` (``merge_keyed``)
    - parquet ``__cdf`` feed dirs   -> a Delta feed table (ACID appends), or
      the target's own ``readChangeFeed`` via ``read_table_changes``
    - ``prune_changes`` rmtree      -> transactional ``DELETE`` on the feed

    The change-feed COLUMNS are identical in both stores by construction
    (``_change_type``/``_commit_version``/``_commit_timestamp`` are Delta
    CDF's own schema), so operators never branch on the backend. The tiny
    ``_meta.json``/``_version`` sidecars are shared with the base class:
    they are driver-local control-plane state, not data.

    Requires ``delta-spark`` on the classpath AND a session built with the
    Delta SQL extension + catalog; ``new_store`` selects this class
    automatically when both hold. Not installable on this image — covered by
    tests/test_delta_store.py, which skips without ``import delta``.
    """

    FMT = "delta"

    # -- data plane -----------------------------------------------------

    def exists(self, name: str) -> bool:  # pragma: no cover - needs delta
        from delta.tables import DeltaTable

        return DeltaTable.isDeltaTable(self.spark, self.path(name))

    def read_stream(self, name: str) -> DataFrame:  # pragma: no cover
        # Delta streaming checkpoints track LOG VERSIONS, not file paths, so
        # compaction (dataChange=false) never invalidates them — the
        # parquet store's streaming_consumed marker is unnecessary here.
        return self.spark.readStream.format(self.FMT).load(self.path(name))

    # read / append / log_changes / read_changes are inherited: they differ
    # from the parquet store only in FMT. A Delta append is transactional
    # even for empty frames, so the base append's create-via-overwrite
    # routing is merely unnecessary, not wrong.

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_columns: Optional[list[str]] = None,
        order_within_files: Optional[list[str]] = None,
    ) -> None:  # pragma: no cover - needs delta
        # single transactional commit: readers see old or new, never a mix,
        # and zero-row frames are fine (the commit log carries the schema),
        # so neither the shadow swap nor the empty-footer rewrite is needed
        out = df
        if partition_columns:
            from pyspark.sql import functions as F

            out = out.repartition(*[F.col(c) for c in partition_columns])
        if order_within_files:
            out = out.sortWithinPartitions(
                *_write_sort_cols(partition_columns, order_within_files)
            )
        w = out.write.format(self.FMT).mode("overwrite").option("overwriteSchema", "true")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.save(self.path(name))

    def overwrite_partitions(
        self, name: str, df: DataFrame, partition_columns: list[str]
    ) -> None:  # pragma: no cover - needs delta
        from pyspark.sql import functions as F

        df = df.repartition(*[F.col(c) for c in partition_columns])
        (
            df.write.format(self.FMT)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_columns)
            .save(self.path(name))
        )

    def merge_keyed(
        self,
        name: str,
        updates: DataFrame,
        keys: list[str],
        delete_on: Optional[str] = None,
    ) -> None:  # pragma: no cover - needs delta
        """Keyed upsert via a real ACID ``DeltaTable.merge`` — the native
        form of the bucket-pruned rewrite the parquet CDC writer hand-rolls
        (operators/cdc.py). Work scales with the files holding matched keys
        (Delta data skipping on the join keys), as bucket pruning does."""
        from delta.tables import DeltaTable
        from pyspark.sql import functions as F

        if not self.exists(name):
            # first write: delete-marked rows must not materialize as live
            # data (the merge below would route them to whenMatchedDelete;
            # with no target they simply have nothing to delete). NULL
            # delete conditions mean "not a delete" on the merge path
            # (whenMatchedDelete only fires on TRUE), so coalesce to FALSE
            # here too — a bare ~expr would drop NULL-condition rows.
            if delete_on:
                updates = updates.alias("s").filter(
                    ~F.coalesce(F.expr(delete_on), F.lit(False))
                )
            self.append(name, updates)
            return
        tgt = DeltaTable.forPath(self.spark, self.path(name))
        cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        m = tgt.alias("t").merge(updates.alias("s"), cond)
        if delete_on:
            m = m.whenMatchedDelete(condition=delete_on)
        m.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()

    def compact(
        self,
        name: str,
        target_rows_per_file: int = 4_000_000,
        order_within_files: Optional[list[str]] = None,
        force: bool = False,
        morton: bool = False,
    ) -> dict:  # pragma: no cover - needs delta
        """Native ``OPTIMIZE``: rewrites small files with ``dataChange=false``
        so streaming consumers' checkpoints stay valid — no refusal path.
        ``morton`` is accepted for signature parity; ``executeZOrderBy``
        already IS the multi-column interleaved layout."""
        from delta.tables import DeltaTable

        before = self._data_file_count(name)
        tgt = DeltaTable.forPath(self.spark, self.path(name))
        if order_within_files:
            tgt.optimize().executeZOrderBy(*order_within_files)
        else:
            tgt.optimize().executeCompaction()
        return {
            "files_before": before,
            "files_after": self._data_file_count(name),
            "partition_columns": self._partition_columns_on_disk(name),
        }

    def _data_file_count(self, name: str) -> int:  # pragma: no cover
        # live files only: parquet files under a Delta dir include
        # tombstoned (vacuum-pending) ones, so ask the snapshot instead
        from delta.tables import DeltaTable

        tgt = DeltaTable.forPath(self.spark, self.path(name))
        return int(tgt.detail().select("numFiles").head()[0])

    # -- change feed ----------------------------------------------------
    # log_changes / read_changes are inherited via FMT: engine-computed
    # change rows land in a Delta FEED table (ACID appends; safe under
    # concurrent writers where the parquet feed is single-writer), with
    # Delta CDF's exact column schema. has_changes / prune_changes ARE
    # overridden: a Delta DELETE leaves tombstoned files on disk until
    # VACUUM, so directory listings lie about logical content.

    def read_table_changes(
        self,
        name: str,
        starting_version: int = 0,
        ending_version: Optional[int] = None,
    ) -> DataFrame:  # pragma: no cover - needs delta
        """The REAL Delta CDF of the target table (requires the table to have
        ``delta.enableChangeDataFeed=true``): what ``read_changes`` emulates,
        for tables written through ``merge_keyed``/``overwrite`` rather than
        explicit ``log_changes``."""
        r = (
            self.spark.read.format(self.FMT)
            .option("readChangeFeed", "true")
            .option("startingVersion", starting_version)
        )
        if ending_version is not None:
            r = r.option("endingVersion", ending_version)
        return r.load(self.path(name))

    def prune_changes(self, name: str, up_to_version: int) -> int:  # pragma: no cover
        from delta.tables import DeltaTable
        from pyspark.sql import functions as F

        p = os.path.join(self._cdf_dir(name), "data")
        if not os.path.isdir(p):
            return 0
        feed = DeltaTable.forPath(self.spark, p)
        removed = (
            feed.toDF()
            .filter(F.col("_commit_version") <= up_to_version)
            .select("_commit_version")
            .distinct()
            .count()
        )
        if removed:
            # transactional partition-aligned DELETE (drops whole files:
            # the feed is partitioned by _commit_version); physical removal
            # follows the table's VACUUM retention policy
            feed.delete(F.col("_commit_version") <= up_to_version)
        return removed

    def has_changes(self, name: str) -> bool:  # pragma: no cover - needs delta
        p = os.path.join(self._cdf_dir(name), "data")
        if not os.path.isdir(p):
            return False
        return not self.spark.read.format(self.FMT).load(p).isEmpty()


def new_store(spark: SparkSession, root: Optional[str] = None) -> ParquetTableStore:
    """Build the best available store: Delta when `import delta` succeeds and
    the session has the Delta extension loaded (override with
    LHP_STORE=parquet|delta), parquet + atomic swap otherwise."""
    if root is None:
        root = os.path.join(
            os.environ.get("LHP_SPARK_WAREHOUSE", "/tmp/lhp_spark_warehouse"),
            f"run_{int(time.time())}_{uuid.uuid4().hex[:6]}",
        )
    os.makedirs(root, exist_ok=True)
    choice = os.environ.get("LHP_STORE", "").lower()
    if choice == "parquet":
        return ParquetTableStore(spark=spark, root=root)
    if choice == "delta":
        # an explicit override the environment cannot honor must fail loudly
        # — silently handing back shadow-swap parquet while the user expects
        # ACID Delta semantics is the worst of both worlds
        if not HAVE_DELTA:
            raise RuntimeError(
                "LHP_STORE=delta but delta-spark is not importable; install "
                "delta-spark and build the session with the Delta SQL "
                "extension, or unset LHP_STORE"
            )
        if not _delta_session_ready(spark):
            # the package imports but the running session lacks the Delta
            # SQL extension — the store would hand back raw planner errors
            # on first use; fail here with the actionable message instead
            raise RuntimeError(
                "LHP_STORE=delta but the SparkSession was not built with "
                "io.delta.sql.DeltaSparkSessionExtension "
                "(spark.sql.extensions); rebuild the session with the "
                "Delta extension and catalog, or unset LHP_STORE"
            )
        return DeltaTableStore(spark=spark, root=root)  # pragma: no cover
    if HAVE_DELTA and _delta_session_ready(spark):
        return DeltaTableStore(spark=spark, root=root)  # pragma: no cover
    return ParquetTableStore(spark=spark, root=root)


def _delta_session_ready(spark: SparkSession) -> bool:
    """True when the session was built with the Delta SQL extension — having
    the Python package alone is not enough to plan a delta scan."""
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:  # pragma: no cover
        return False
    return "DeltaSparkSessionExtension" in exts
