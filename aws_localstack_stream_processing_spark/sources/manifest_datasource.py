"""Manifest-backed lake source — S5's event-driven discovery at scale.

The reference discovers new lake objects by S3 ``ObjectCreated``
notifications delivered through SQS (app.ts:434-438): consumers learn
about files from an append-only NOTIFICATION LOG, never by listing the
bucket. The engine's file-stream path (:mod:`..streaming.source`)
replaces that hop with directory listing, which is the known bottleneck
at 100× file counts (a 100 TB lake is millions of objects; listing per
micro-batch is O(all files), a manifest read is O(new entries)).

This module closes that gap with the manifest pattern every production
table format uses (Spark's own ``FileStreamSink`` ``_spark_metadata``,
Delta/Iceberg commit logs):

* **Writers append commit files.** :func:`append_manifest` records the
  parquet files a batch produced as a numbered JSON commit under
  ``<lake>/_manifest/`` (atomic tmp+rename; commit numbers are the
  streaming batch ids, so a replayed batch overwrites ITS OWN commit —
  idempotent by construction).
* **Readers plan from the manifest.** ``format("manifest_lake")`` reads
  commit files in numeric order and assigns global row sequence numbers
  over the manifest's APPEND order — not lexicographic filename order —
  so consumed offsets are stable by construction: a late-landing object
  whose name sorts early cannot shift them (the failure mode the
  firehose listing source must fingerprint against).
* **Planning is metadata-only.** Row counts ride inside the commit
  entries (written once by the producer), so micro-batch planning reads
  zero parquet footers and no directory listing; executors open only the
  (file, row-group) pairs overlapping their assigned range.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .firehose_datasource import _RangePartition, _split

_MANIFEST_DIR = "_manifest"


def manifest_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, _MANIFEST_DIR)


def append_manifest(
    lake_dir: str, files: list[str], commit_id: int | None = None
) -> int:
    """Record ``files`` (paths under the lake) as one manifest commit.

    ``commit_id=None`` allocates the next number; streaming writers pass
    their batch id so a replayed batch atomically overwrites its own
    commit instead of double-publishing. Row counts are captured here,
    once, from the parquet footers — readers never touch metadata.

    Auto-allocation is concurrency-safe: the commit file is claimed with
    an exclusive-create (``O_EXCL``), so two concurrent writers that race
    to the same next id cannot clobber each other — the loser retries
    with the following id. An *explicit* ``commit_id`` still uses
    ``os.replace`` on purpose: that path is the streaming replay
    (epoch-owned batch ids, single writer per id by Spark's commit
    protocol), where overwrite-on-replay is the idempotence mechanism."""
    import pyarrow.parquet as pq

    mdir = manifest_dir(lake_dir)
    os.makedirs(mdir, exist_ok=True)
    entries = []
    for f in files:
        rel = os.path.relpath(os.path.abspath(f), os.path.abspath(lake_dir))
        entries.append({"path": rel, "rows": pq.ParquetFile(f).metadata.num_rows})
    payload = json.dumps(entries)
    if commit_id is not None:
        out = os.path.join(mdir, f"{commit_id:010d}.json")
        tmp = f"{out}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(payload)
        os.replace(tmp, out)
        return commit_id
    next_id = max(
        (
            int(f.split(".", 1)[0])
            for f in os.listdir(mdir)
            if f.split(".", 1)[0].isdigit() and f.endswith(".json")
        ),
        default=-1,
    ) + 1
    # full payload goes to a tmp file first; os.link() then publishes it
    # atomically AND exclusively — readers never observe a partial commit,
    # and a concurrent writer racing to the same id loses loudly. The tmp
    # name carries the thread id too: two threads of one driver process
    # appending concurrently must not clobber each other's payload.
    import threading

    tmp = os.path.join(
        mdir, f".alloc.tmp.{os.getpid()}.{threading.get_ident()}"
    )
    with open(tmp, "w") as fh:
        fh.write(payload)
    try:
        while True:
            out = os.path.join(mdir, f"{next_id:010d}.json")
            try:
                os.link(tmp, out)
            except FileExistsError:
                next_id += 1  # lost the race — claim the following id
                continue
            except OSError as exc:
                # filesystem without hard links (network/FAT mounts):
                # O_EXCL open is the same exclusive-claim primitive,
                # minus the readers-see-full-payload guarantee hard
                # links give for free — acceptable on such mounts.
                # Only the errnos that mean "links unsupported here" may
                # take this weaker path; any other OSError (ENOSPC, EIO,
                # …) must surface, not silently downgrade the atomic
                # readers-never-see-partial-commit guarantee (ADVICE r8).
                import errno

                _NO_HARDLINK = {
                    errno.EPERM,
                    errno.EOPNOTSUPP,
                    getattr(errno, "ENOTSUP", errno.EOPNOTSUPP),
                    errno.EXDEV,
                    errno.EMLINK,
                    errno.ENOSYS,  # link() unimplemented on this mount
                }
                if exc.errno not in _NO_HARDLINK:
                    raise
                if exc.errno == errno.EPERM:
                    # EPERM is ambiguous: some filesystems use it for
                    # "links unsupported", but it also covers genuine
                    # permission denials — make the downgrade visible
                    # so a real permission problem isn't silently
                    # absorbed by the weaker O_EXCL path (ADVICE r10).
                    import warnings

                    warnings.warn(
                        "manifest commit: os.link() EPERM — falling back "
                        "to O_EXCL claim; if this mount supports hard "
                        "links, check directory permissions",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                try:
                    fd = os.open(out, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
                except FileExistsError:
                    next_id += 1
                    continue
                with os.fdopen(fd, "w") as ofh:
                    ofh.write(payload)
            return next_id
    finally:
        os.unlink(tmp)


def read_manifest(lake_dir: str) -> list[tuple[str, int, int]]:
    """``[(abs_file, global_row_offset, n_rows)]`` in manifest append
    order (commit number, then entry order within the commit)."""
    mdir = manifest_dir(lake_dir)
    if not os.path.isdir(mdir):
        return []
    commits = sorted(
        (int(f.split(".", 1)[0]), f)
        for f in os.listdir(mdir)
        if f.split(".", 1)[0].isdigit() and f.endswith(".json")
    )
    plan: list[tuple[str, int, int]] = []
    off = 0
    for _, fname in commits:
        with open(os.path.join(mdir, fname)) as fh:
            for e in json.load(fh):
                plan.append((os.path.join(lake_dir, e["path"]), off, e["rows"]))
                off += e["rows"]
    return plan


def _read_span(path: str, lo: int, hi: int) -> Iterator:
    """Arrow batches for local row range [lo, hi) of one file — only the
    overlapping row groups are read (same pruning shape as the firehose
    source, without the DirectPut envelope)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    groups: list[int] = []
    first_off = 0
    off = 0
    for i in range(pf.metadata.num_row_groups):
        n = pf.metadata.row_group(i).num_rows
        if off < hi and off + n > lo:
            if not groups:
                first_off = off
            groups.append(i)
        off += n
    if not groups:
        return
    table = pf.read_row_groups(groups).slice(lo - first_off, hi - lo)
    yield from table.to_batches()


def _read_rows(lake_dir: str, start: int, end: int) -> Iterator:
    for f, off, n in read_manifest(lake_dir):
        if off < end and off + n > start:
            yield from _read_span(f, max(start, off) - off, min(end, off + n) - off)


def _source_path(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("manifest_lake: the 'path' option is required")
    return path


class _ManifestBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = _source_path(options)
        self._parts = int(options.get("numpartitions", 8))

    def partitions(self) -> list[InputPartition]:
        total = sum(n for _, _, n in read_manifest(self._path))
        return _split(0, total, self._parts)

    def read(self, partition: _RangePartition) -> Iterator:
        return _read_rows(self._path, partition.start, partition.end)


class _ManifestStreamReader(DataSourceStreamReader):
    """Row-sequence offsets over the manifest. Append-only commit order
    makes offsets stable with NO fingerprint guard: commit n+1 can only
    add rows after commit n's, wherever its files' names sort."""

    def __init__(self, options: dict):
        self._path = _source_path(options)
        self._parts = int(options.get("numpartitions", 8))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        return {"seq": sum(n for _, _, n in read_manifest(self._path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return _split(int(start["seq"]), int(end["seq"]), self._parts)

    def read(self, partition: _RangePartition) -> Iterator:
        return _read_rows(self._path, partition.start, partition.end)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class ManifestLakeDataSource(DataSource):
    """``format("manifest_lake")`` — read a lake through its commit
    manifest (batch or streaming); no directory listing anywhere."""

    @classmethod
    def name(cls) -> str:
        return "manifest_lake"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        import pyarrow.parquet as pq

        plan = read_manifest(_source_path(self.options))
        if not plan:
            raise ValueError(
                "manifest_lake: empty or missing manifest — write data with "
                "append_manifest/run_ingest_stream_manifest first"
            )
        return from_arrow_schema(pq.ParquetFile(plan[0][0]).schema_arrow)

    def reader(self, schema) -> DataSourceReader:
        return _ManifestBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ManifestStreamReader(self.options)


def register_manifest_source(spark) -> None:
    from .firehose_datasource import _register

    _register(spark, ManifestLakeDataSource)
