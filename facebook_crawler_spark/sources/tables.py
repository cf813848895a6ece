"""Ledgered parquet tables — the Iceberg-semantics storage shim (SURVEY.md R1).

No Iceberg runtime jar ships with this container's PySpark, so this shim
preserves exactly the Iceberg properties the engine relies on and nothing
more:

- **atomic commits**: a commit = write data files to a fresh directory,
  then atomically rename a version manifest into place. Readers either see
  the whole commit or none of it; a killed writer leaves only orphan data
  dirs that no manifest references.
- **snapshot ids**: each commit bumps an integer version; `read(version=)`
  is time travel.
- **append / overwrite** terms match Iceberg's.

On a real cluster this file is replaced by `df.writeTo("cat.db.t")` with an
Iceberg catalog; every call site goes through this API so the swap is
mechanical.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class Table:
    def __init__(self, path: str):
        self.path = path
        self._commits = os.path.join(path, "_commits")
        os.makedirs(self._commits, exist_ok=True)

    # -- commit protocol ----------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._commits, f"v{version:08d}.json")

    def current_version(self) -> int:
        versions = [
            int(f[1:9]) for f in os.listdir(self._commits) if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def _read_manifest(self, version: int) -> list[str]:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)["data_dirs"]

    def _commit(
        self,
        data_dirs: list[str],
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        version = self.current_version() + 1
        tmp = os.path.join(self._commits, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "data_dirs": data_dirs,
                    "meta": meta or {},
                    "partition_by": partition_by or [],
                },
                fh,
            )
        os.rename(tmp, self._manifest_path(version))  # the atomic commit point
        return version

    def _partition_by(self, version: int | None = None) -> list[str]:
        v = self.current_version() if version is None else version
        if v == 0:
            return []
        with open(self._manifest_path(v)) as fh:
            return json.load(fh).get("partition_by") or []

    def commit_meta(self, version: int | None = None) -> dict:
        """Commit metadata (Iceberg snapshot-summary analog), e.g. the crawl
        round a host_state overwrite belongs to — lets a resumed round pin
        its input to the pre-round snapshot."""
        v = self.current_version() if version is None else version
        if v == 0:
            return {}
        with open(self._manifest_path(v)) as fh:
            return json.load(fh).get("meta") or {}

    # -- write --------------------------------------------------------------
    def _write_data(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        d = os.path.join(self.path, f"data-{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(d)
        return d

    @staticmethod
    def _has_parts(d: str) -> bool:
        """True iff the write produced any parquet part file (recursive —
        partitionBy nests parts under key=value subdirectories)."""
        for _, _, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    # data dir of the most recent append on THIS Table handle (None when the
    # append was an empty no-op or no append ran yet): lets a caller read
    # back exactly the rows it just committed without re-deriving their plan
    # or scanning the whole table (the crawl round's stats projection).
    last_appended_dir: str | None = None

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Append a commit; a write that produced no parquet part files
        (empty DataFrame, AQE-coalesced to zero partitions) is a no-op —
        committing a part-less dir would poison every subsequent read with
        an unable-to-infer-schema failure.

        `partition_by` (the Iceberg partition-transform analog — e.g. a
        bucket column): every commit of a table must use the SAME
        partition spec; `read` then unions per-commit scans so Hive-style
        partition discovery works per directory (one scan over mixed
        roots raises CONFLICTING_DIRECTORY_STRUCTURES), and filters on
        the partition column push into every child scan as
        PartitionFilters."""
        cur = self.current_version()
        if cur:
            prev_pb = self._partition_by(cur)
            if prev_pb != (partition_by or []):
                raise ValueError(
                    f"table {self.path}: partition_by {partition_by or []} "
                    f"differs from committed spec {prev_pb}"
                )
        new_dir = self._write_data(df, partition_by)
        if not self._has_parts(new_dir):
            shutil.rmtree(new_dir, ignore_errors=True)
            self.last_appended_dir = None
            return cur
        prev = self._read_manifest(cur) if cur else []
        self.last_appended_dir = new_dir
        return self._commit(prev + [new_dir], partition_by=partition_by)

    def overwrite(
        self,
        df: DataFrame,
        meta: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        new_dir = self._write_data(df, partition_by)
        if not self._has_parts(new_dir):
            # Same part-less hazard as append(), but an overwrite cannot be
            # skipped (init_empty routes through here and the commit must
            # exist): rewrite as a single partition, which always emits one
            # schema-carrying part file even for an empty DataFrame.
            shutil.rmtree(new_dir, ignore_errors=True)
            new_dir = self._write_data(df.repartition(1), partition_by)
            if partition_by and not self._has_parts(new_dir):
                # the dynamic partition writer emits files only for keys it
                # sees — an EMPTY partitioned overwrite cannot produce a
                # schema-carrying commit, and committing it would poison
                # reads; partitioned tables must be seeded with rows
                shutil.rmtree(new_dir, ignore_errors=True)
                raise ValueError(
                    f"table {self.path}: empty partitioned overwrite has no "
                    "schema to commit"
                )
        return self._commit([new_dir], meta=meta, partition_by=partition_by)

    def init_empty(self, df_schema_source: DataFrame) -> int:
        """Commit an empty snapshot with the given schema."""
        return self.overwrite(df_schema_source.limit(0))

    # -- read ---------------------------------------------------------------
    def exists(self) -> bool:
        return self.current_version() > 0

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        v = self.current_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"table {self.path} has no commits")
        dirs = self._read_manifest(v)
        if not dirs:
            raise FileNotFoundError(f"table {self.path} v{v} is empty-manifest")
        if self._partition_by(v) and len(dirs) > 1:
            # per-commit scans unioned: partition discovery is per root, and
            # a filter above the Union pushes into every child scan (so
            # partition pruning works commit-by-commit). Plan width grows
            # with the commit count — real Iceberg collapses this to one
            # metadata-pruned scan; on the shim, compact periodically if
            # the union gets wide.
            from functools import reduce

            return reduce(DataFrame.unionByName, (spark.read.parquet(d) for d in dirs))
        return spark.read.parquet(*dirs)

    def data_dir_count(self, version: int | None = None) -> int:
        """Number of data directories the given (default: current) snapshot
        references — the width of the union `read` builds for a partitioned
        table, and the root count of a plain multi-dir scan."""
        v = self.current_version() if version is None else version
        return len(self._read_manifest(v)) if v else 0

    def compact(self, spark: SparkSession) -> int:
        """Iceberg `rewrite_data_files` analog: rewrite the CURRENT
        snapshot's rows into a single data directory and commit it as a new
        version (same rows, same partition spec — physical layout only).
        Bounds the union width / root count that grows with append count;
        real Iceberg makes this unnecessary for planning (one
        metadata-pruned scan regardless of commit count) but still runs it
        for small-file compaction. Old versions stay readable (time travel
        intact) until `expire_versions` reclaims them; a crash mid-compact
        leaves at worst an orphan data dir no manifest references."""
        v = self.current_version()
        if self.data_dir_count(v) <= 1:
            return v
        pb = self._partition_by(v)
        return self.overwrite(
            self.read(spark, version=v),
            meta={"compacted_from": v},
            partition_by=pb or None,
        )

    def expire_versions(self, keep_last: int = 1) -> int:
        """Iceberg `expire_snapshots` analog (S8 staging GC): delete version
        manifests older than the newest `keep_last`, then remove data dirs
        no surviving manifest references. Returns bytes-free count of
        removed data dirs."""
        current = self.current_version()
        keep = {v for v in range(max(1, current - keep_last + 1), current + 1)}
        all_versions = [
            int(f[1:9]) for f in os.listdir(self._commits) if f.startswith("v") and f.endswith(".json")
        ]
        live_dirs: set[str] = set()
        for v in keep:
            live_dirs.update(self._read_manifest(v))
        removed = 0
        for v in all_versions:
            if v not in keep:
                for d in self._read_manifest(v):
                    if d not in live_dirs and os.path.isdir(d):
                        shutil.rmtree(d, ignore_errors=True)
                        removed += 1
                os.remove(self._manifest_path(v))
        return removed

    def drop(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
