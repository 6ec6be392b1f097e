"""Transactional multi-table snapshot sink — a Delta-style commit log
on plain parquet (SURVEY §7.4 risk 5, closed transactionally).

`sinks/locking.py` serializes concurrent same-partition writers with an
advisory lock; this module removes the need for serialization at all:
a whole four-table snapshot load is ONE atomic commit, and readers are
snapshot-isolated. The design is the published Delta Lake protocol
(Armbrust et al., VLDB 2020, "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores") reduced to what the snapshot
warehouse needs, hand-rolled because the runtime has no Delta/Iceberg
package:

- **Log**: `<base>/_txn_log/<version 20d>.json`, one record per
  commit. A commit names the `(target_repository, snapshot_date)`
  partition it replaces and, per table, the immutable data files it
  adds. Data files live under `<base>/data/<table>/<txid>/` — each
  transaction writes into its own directory, so nothing is ever
  renamed or overwritten.
- **Atomic commit (CAS)**: the record is staged to a temp file and
  published with `os.link(tmp, <version>.json)` — hard-link creation
  is atomic-and-exclusive on POSIX and HDFS; on S3-like stores the
  same step is a conditional `PUT If-None-Match` (or a DynamoDB-style
  commit service, as Delta documents). Losing the race raises
  `FileExistsError` → the writer re-reads the log and retries with the
  next version number.
- **Optimistic concurrency**: blind partition overwrites (the
  snapshot-load case) rebase and retry safely — last committed writer
  wins WHOLESALE, so the warehouse never holds a torn mix of two
  writers' tables. Read-modify-write callers pass
  ``require_read_version`` and get `WriteConflict` if any intervening
  commit touched their partition.
- **Snapshot isolation / time travel**: `read(..., version=V)` replays
  the log prefix ≤ V to a live-file set; data files are immutable, so
  a reader holding a version never sees a concurrent writer. The log
  IS the file listing — at 100 TB a reader plans from a few KB of
  JSON instead of a multi-million-object directory listing (the core
  object-store win the Delta paper measures).
- **exists()** is pure log metadata — no filesystem scan at all,
  strictly better than the partition-pruned parquet probe of
  `snapshot.snapshot_exists` (reference probe: main.py:552-601).
- **vacuum()** deletes orphaned staging dirs (crashed writers) and
  data files referenced only by commits superseded more than
  `retain_versions` ago — the bounded-history trade Delta's VACUUM
  makes; time travel further back than retention raises on read.

At scale the per-commit JSON stays KB-sized (file lists, not row
data), the CAS hot spot is one tiny object per snapshot load (loads
are minutes, commits are milliseconds), and checkpointing the replay
(Delta's `_last_checkpoint`) is a mechanical extension when logs grow
past ~10⁴ commits.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshot import stamp

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"


class WriteConflict(RuntimeError):
    """Another commit touched this partition after our read version."""


def _pkey(repo: str, snapshot_date: str | _dt.date) -> str:
    if isinstance(snapshot_date, _dt.date):
        snapshot_date = snapshot_date.isoformat()
    return f"{repo}\x00{snapshot_date}"


class TxnSnapshotSink:
    """ACID multi-table snapshot warehouse rooted at ``base_dir``."""

    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.log_dir = os.path.join(base_dir, _LOG_DIR)
        os.makedirs(self.log_dir, exist_ok=True)

    # ------------------------------------------------------------- log

    def _version_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.log_dir):
            stem, ext = os.path.splitext(name)
            if ext == ".json" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else -1

    def commits(self, upto: int | None = None) -> list[dict]:
        out = []
        for v in self.versions():
            if upto is not None and v > upto:
                break
            with open(self._version_path(v)) as f:
                out.append(json.load(f))
        return out

    def history(self) -> list[dict]:
        """Audit trail, newest first (Delta's DESCRIBE HISTORY analog)."""
        return list(reversed(self.commits()))

    def _try_commit(self, record: dict, version: int) -> bool:
        """Atomically publish ``record`` as ``version``; False if lost."""
        record = {**record, "version": version}
        tmp = os.path.join(self.log_dir, f".tmp-{record['txid']}-{version}")
        with open(tmp, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._version_path(version))  # the CAS
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    # ----------------------------------------------------------- write

    def load(
        self,
        tables: dict[str, DataFrame],
        repo: str,
        snapshot_date: str | _dt.date,
        max_retries: int = 20,
        require_read_version: int | None = None,
    ) -> int:
        """Atomically replace one `(repo, snapshot_date)` snapshot with
        ``tables``. Returns the committed version.

        Data is staged first (the expensive, conflict-free part — every
        transaction writes its own immutable directory), then the
        commit record race is decided by a millisecond CAS. Blind
        overwrites rebase and retry on a lost race; pass
        ``require_read_version`` to instead fail with `WriteConflict`
        if anyone touched the partition since that version
        (read-modify-write protection).
        """
        txid = uuid.uuid4().hex
        if isinstance(snapshot_date, _dt.date):
            snapshot_date = snapshot_date.isoformat()
        added: dict[str, list[str]] = {}
        for name, df in tables.items():
            stage_rel = os.path.join(_DATA_DIR, name, txid)
            stage_abs = os.path.join(self.base_dir, stage_rel)
            stamp(df, repo, snapshot_date).write.parquet(stage_abs)
            added[name] = sorted(
                os.path.join(stage_rel, f)
                for f in os.listdir(stage_abs)
                if f.endswith(".parquet")
            )
        record = {
            "txid": txid,
            "op": "overwrite",
            "partition": {
                "target_repository": repo,
                "snapshot_date": snapshot_date,
            },
            "tables": added,
            "ts_ms": int(time.time() * 1000),
        }
        for _ in range(max_retries):
            current = self.latest_version()
            if require_read_version is not None and current != require_read_version:
                for c in self.commits():
                    if (
                        c["version"] > require_read_version
                        and _pkey(
                            c["partition"]["target_repository"],
                            c["partition"]["snapshot_date"],
                        )
                        == _pkey(repo, snapshot_date)
                    ):
                        self._abort_staging(txid, tables)
                        raise WriteConflict(
                            f"partition ({repo}, {snapshot_date}) changed at "
                            f"version {c['version']} > read version "
                            f"{require_read_version}"
                        )
                require_read_version = current  # foreign partitions only
            if self._try_commit(record, current + 1):
                return current + 1
        self._abort_staging(txid, tables)
        raise RuntimeError(f"lost the commit race {max_retries} times")

    def _abort_staging(self, txid: str, tables: dict[str, DataFrame]) -> None:
        for name in tables:
            shutil.rmtree(
                os.path.join(self.base_dir, _DATA_DIR, name, txid),
                ignore_errors=True,
            )

    # ------------------------------------------------------------ read

    def _live_files(
        self, upto: int | None = None
    ) -> dict[str, dict[str, list[str]]]:
        """Replay the log: {table: {partition_key: [files]}}."""
        live: dict[str, dict[str, list[str]]] = {}
        for c in self.commits(upto=upto):
            key = _pkey(
                c["partition"]["target_repository"],
                c["partition"]["snapshot_date"],
            )
            for table, files in c["tables"].items():
                live.setdefault(table, {})[key] = list(files)
        return live

    def read(
        self,
        spark: SparkSession,
        table: str,
        repo: str | None = None,
        snapshot_date: str | _dt.date | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read, optionally time-traveled to
        ``version`` and pruned (via the LOG, not directory listing) to
        one partition."""
        live = self._live_files(upto=version)
        if table not in live:
            raise ValueError(
                f"table {table!r} has no committed data"
                + (f" at version {version}" if version is not None else "")
            )
        parts = live[table]
        if repo is not None and snapshot_date is not None:
            files = parts.get(_pkey(repo, snapshot_date), [])
            if not files:  # partition absent at this version → empty frame
                any_files = next(iter(parts.values()))
                schema = spark.read.parquet(
                    *[os.path.join(self.base_dir, f) for f in any_files]
                ).schema
                return spark.createDataFrame([], schema)
        else:
            files = [f for fs in parts.values() for f in fs]
        df = spark.read.parquet(*[os.path.join(self.base_dir, f) for f in files])
        if repo is not None:
            df = df.where(F.col("target_repository") == repo)
        if snapshot_date is not None:
            if isinstance(snapshot_date, _dt.date):
                snapshot_date = snapshot_date.isoformat()
            df = df.where(F.col("snapshot_date") == F.lit(snapshot_date).cast("date"))
        return df

    def exists(
        self,
        repo: str,
        snapshot_date: str | _dt.date,
        version: int | None = None,
    ) -> bool:
        """Existence probe from log metadata alone — zero data I/O."""
        key = _pkey(repo, snapshot_date)
        return any(
            key in parts for parts in self._live_files(upto=version).values()
        )

    # ---------------------------------------------------------- vacuum

    def vacuum(self, retain_versions: int = 10) -> list[str]:
        """Remove unreachable data: staging dirs never committed
        (crashed/aborted writers) and files superseded more than
        ``retain_versions`` commits ago. Returns removed paths.

        Time travel to versions older than the retention horizon may
        fail after a vacuum — the same contract as Delta's VACUUM.
        """
        latest = self.latest_version()
        horizon = latest - retain_versions
        referenced_recent: set[str] = set()
        # Every version in (horizon, latest] must stay readable, so keep
        # (a) all files added after the horizon and (b) the live set AT
        # the horizon (older adds still visible when replaying to any
        # retained version).
        if horizon >= 0:
            for parts in self._live_files(upto=horizon).values():
                for fs in parts.values():
                    referenced_recent.update(fs)
        for c in self.commits():
            if c["version"] > horizon:
                for files in c["tables"].values():
                    referenced_recent.update(files)
        removed: list[str] = []
        data_root = os.path.join(self.base_dir, _DATA_DIR)
        if not os.path.isdir(data_root):
            return removed
        for table in os.listdir(data_root):
            tdir = os.path.join(data_root, table)
            for txdir in os.listdir(tdir):
                rel = os.path.join(_DATA_DIR, table, txdir)
                keep = any(
                    f.startswith(rel + os.sep) for f in referenced_recent
                )
                if not keep:
                    shutil.rmtree(os.path.join(tdir, txdir), ignore_errors=True)
                    removed.append(rel)
        return removed
