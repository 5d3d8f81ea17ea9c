"""MiniLog as a native Spark DataSource (Spark 4 Python DataSource API).

acid.py gives MiniLog tables a Python-object read surface
(``MiniLogTable(...).read()``); this module gives them the SPARK-NATIVE
one::

    spark.dataSource.register(MiniLogDataSource)
    spark.read.format("minilog").option("version", 3).load(path)
    spark.readStream.format("minilog").load(path)      # tail the log

Why this matters at 100 TB: the DataSource boundary is what makes the
format consumable by ANYTHING that speaks Spark — SQL (``CREATE TABLE
... USING minilog``), other teams' jobs, Structured Streaming — without
importing this repo's Python API. The implementation stays thin on
purpose: all transaction semantics live in the commit log + acid.py
fold; the source only (a) resolves a snapshot to a file list on the
driver and (b) reads those immutable parquet files on executors via
Arrow (one ``InputPartition`` per data file, so Spark schedules them
like any other scan).

The STREAMING reader tails the commit log with log versions as offsets
— exactly Delta's streaming-source design: ``latestOffset`` = current
table version, a micro-batch (start, end] reads the files ADDED by
those commits. Non-append commits (merge/delete/optimize rewrites)
FAIL the stream by default — replaying a rewrite as appends would
duplicate rows — matching Delta's contract; ``ignoreChanges=true``
opts into Delta's same caveat (rewritten files re-emitted in full).

Capability honesty: the Python DataSource API (4.1) gives no
filter/column pushdown hooks, so a predicate read through this surface
scans every live file of the snapshot (parquet row-group pruning still
applies inside each file). When log-stats skipping matters, read
through ``MiniLogTable.read(prune=...)`` — the file list is pruned
BEFORE Spark sees it. Schema evolution IS honored: every partition
projects its file to the snapshot's log schema (null-filling columns a
pre-evolution file lacks) before emitting Arrow batches.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..acid import MiniLogTable, NoSuchVersion

@dataclass
class _FilePartition(InputPartition):
    path: str
    #: (name, ddl_type) pairs of the snapshot schema, None = file schema
    schema: Optional[tuple]


def _ddl(schema: list[dict]) -> str:
    return ", ".join(f"`{c['name']}` {c['type']}" for c in schema)


def _arrow_type(ddl: str):
    """Spark simpleString type -> Arrow type, context-free (executors
    have no SparkContext, so pyspark's DDL parser is unavailable there).
    Covers the types MiniLog tables carry; unknown types raise with the
    offending name so the gap is explicit, never silent."""
    import pyarrow as pa

    t = ddl.strip().lower()
    scalars = {
        "tinyint": pa.int8(),
        "smallint": pa.int16(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "bigint": pa.int64(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if t in scalars:
        return scalars[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    if t.startswith("array<") and t.endswith(">"):
        return pa.list_(_arrow_type(t[len("array<") : -1]))
    raise TypeError(f"minilog source: unsupported column type {ddl!r}")


def _read_file_arrow(part: _FilePartition):
    """Executor-side: one immutable parquet file -> Arrow batches
    projected to the log schema (null-fill for pre-evolution files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(part.path)
    if part.schema is not None:
        fields = [
            pa.field(name, _arrow_type(ddl)) for name, ddl in part.schema
        ]
        cols = []
        for field in fields:
            if field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:  # pre-evolution file: null-fill
                cols.append(pa.nulls(table.num_rows, type=field.type))
        table = pa.table(cols, schema=pa.schema(fields))
    yield from table.to_batches(max_chunksize=8192)


class _MiniLogBatchReader(DataSourceReader):
    def __init__(self, path: str, options: dict) -> None:
        self._path = path
        self._options = options

    def partitions(self):
        tbl = _handle(self._path)
        version = self._options.get("version")
        snap = tbl.snapshot(int(version) if version is not None else None)
        schema = (
            tuple((c["name"], c["type"]) for c in snap.schema)
            if snap.schema
            else None
        )
        return [
            _FilePartition(os.path.join(self._path, f.file), schema)
            for f in snap.files
        ] or [_FilePartition("", schema)]

    def read(self, partition: _FilePartition):
        if not partition.path:  # empty table: schema-only
            return iter(())
        return _read_file_arrow(partition)


class _MiniLogStreamReader(DataSourceStreamReader):
    """Commit-log tailing: offsets are log versions (Delta's design)."""

    def __init__(self, path: str, options: dict) -> None:
        self._path = path
        self._ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        # tail from the table's beginning: a bootstrap consumer sees
        # every commit exactly once
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": _handle(self._path).version}

    def partitions(self, start: dict, end: dict):
        tbl = _handle(self._path)
        snap = tbl.snapshot(end["version"]) if end["version"] >= 0 else None
        schema = (
            tuple((c["name"], c["type"]) for c in snap.schema)
            if snap and snap.schema
            else None
        )
        parts: list[_FilePartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            entry = tbl._read_entry(v)
            removes = [
                a for a in entry["actions"] if a["type"] == "remove"
            ]
            if removes and not self._ignore_changes:
                raise RuntimeError(
                    f"minilog stream: commit {v} "
                    f"({entry['operation']}) rewrites data files; "
                    "streaming a rewrite as appends would duplicate "
                    "rows. Set ignoreChanges=true to accept re-emitted "
                    "files (Delta's contract), or start a fresh stream "
                    "from the current snapshot."
                )
            for a in entry["actions"]:
                if a["type"] == "add":
                    parts.append(
                        _FilePartition(
                            os.path.join(self._path, a["file"]), schema
                        )
                    )
        return parts or [_FilePartition("", schema)]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return _read_file_arrow(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the query's own checkpoint

    def stop(self) -> None:
        pass


def _handle(path: str) -> MiniLogTable:
    """Log-fold-only handle (no SparkSession needed on this side)."""
    return MiniLogTable.fold_only(path)


class MiniLogDataSource(DataSource):
    """``spark.read.format("minilog")`` / ``spark.readStream.format(...)``.

    Options: ``path`` (required), ``version`` (batch time travel),
    ``ignoreChanges`` (stream rewrites re-emitted instead of failing).
    """

    @classmethod
    def name(cls) -> str:
        return "minilog"

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("minilog: .load(path) or option('path') required")
        return p

    def schema(self) -> str:
        tbl = _handle(self._path())
        version = self.options.get("version")
        try:
            snap = tbl.snapshot(
                int(version) if version is not None else None
            )
        except NoSuchVersion:
            raise
        if snap.schema:
            return _ddl(snap.schema)
        if snap.files:  # pre-schema-tracking table: ask parquet
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            sch = pq.read_schema(
                os.path.join(self._path(), snap.files[0].file)
            )
            return from_arrow_schema(sch)
        raise NoSuchVersion("empty minilog table has no schema")

    def reader(self, schema) -> _MiniLogBatchReader:
        return _MiniLogBatchReader(self._path(), dict(self.options))

    def streamReader(self, schema) -> _MiniLogStreamReader:
        opts = {k.lower(): v for k, v in dict(self.options).items()}
        return _MiniLogStreamReader(self._path(), opts)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    from ..session import session_cache

    cache = session_cache(spark, "minilog_dsv2")
    if not cache.get("registered"):
        spark.dataSource.register(MiniLogDataSource)
        cache["registered"] = True
