"""Batch write-back: materialize a DataFrame as a document collection.

The reference is read-only (its transaction manager rejects writes,
src/mongo_transaction_manager.cpp) — but a curation pipeline needs its
outputs to become collections again, so this is a NEW, Spark-first
sink surface:

- **Parquet backends**: ``df.write.parquet`` into the collection's
  directory layout (``<root>/<coll>.parquet/`` of part files) — fully
  distributed, no driver materialization; the backend reads the
  directory back as one collection (file+row-group partitioned).
- **JSONL backends**: rows encoded as extended JSON (``$date`` /
  ``$numberDecimal`` / ``$binary``, the dialect ``backends/jsonl.py``
  decodes) and written distributed via ``df.write.text``.
- **Memory backend**: driver-side insert (bounded — tests/small dims).
- **Pymongo backend**: ``foreachPartition`` inserts, one client per
  executor partition (the backend pickles by connection string).

Every path round-trips: write → attach/scan → same documents.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODES = ("overwrite", "append", "error")


def _extended_json_col(df: DataFrame):
    """Build the extended-JSON line column: typed values get the wrapper
    documents the JSONL reader decodes (``decode_extended``). Top-level
    columns only — nested struct internals pass through ``to_json``
    as-is. NULL fields are omitted by ``to_json``, which reads back as
    missing — the same thing for document schema inference."""
    fields = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            wrapped = F.when(
                c.isNotNull(),
                F.struct(
                    F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias("$date")
                ),
            )
        elif isinstance(f.dataType, T.DateType):
            wrapped = F.when(
                c.isNotNull(),
                F.struct(F.date_format(c, "yyyy-MM-dd'T'00:00:00'Z'").alias("$date")),
            )
        elif isinstance(f.dataType, T.DecimalType):
            wrapped = F.when(
                c.isNotNull(),
                F.struct(c.cast("string").alias("$numberDecimal")),
            )
        elif isinstance(f.dataType, T.BinaryType):
            wrapped = F.when(
                c.isNotNull(),
                F.struct(F.struct(F.base64(c).alias("base64")).alias("$binary")),
            )
        else:
            wrapped = c
        fields.append(wrapped.alias(f.name))
    return F.to_json(F.struct(*fields))


def write_collection(
    df: DataFrame,
    backend,
    db: str,
    coll: str,
    mode: str = "overwrite",
    max_driver_rows: int = 1_000_000,
    distributed: bool = True,
) -> None:
    """Write ``df`` as collection ``db.coll`` of ``backend``.

    ``mode``: "overwrite" replaces the collection, "append" adds
    documents, "error" fails if the collection exists.
    ``max_driver_rows`` bounds the driver-side paths (memory backend,
    and the mongo path with ``distributed=False``); the file-backed and
    distributed-mongo paths are unbounded.
    ``distributed=False`` routes the mongo path through a single
    driver-side cursor (small writes, in-process fakes) instead of
    ``foreachPartition``.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    kind = type(backend).__name__
    if kind == "ParquetBackend":
        _write_parquet(df, backend, db, coll, mode)
    elif kind == "JsonlBackend":
        _write_jsonl(df, backend, db, coll, mode)
    elif kind == "MemoryBackend":
        _write_memory(df, backend, db, coll, mode, max_driver_rows)
    elif hasattr(backend, "connection_string"):
        _write_mongo(df, backend, db, coll, mode, distributed, max_driver_rows)
    else:
        raise TypeError(f"no write support for backend {kind}")


def compact_collection(
    spark,
    backend,
    db: str,
    coll: str,
    target_file_mb: int = 128,
    layout_cols: list[str] | None = None,
) -> int:
    """Rewrite a directory-layout parquet collection into ~``target_file_mb``
    sized files; returns the new file count.

    The small-file problem is the standard failure mode of incremental
    100 TB ingestion: thousands of KB-scale part files per collection
    turn every scan into per-file open/footer overhead and starve
    row-group pruning. Compaction = read → repartition to
    ``ceil(total_bytes / target)`` → write to a sibling temp dir → swap
    (two directory renames — no data copy; concurrent readers holding
    old file handles finish against the unlinked files on POSIX).

    ``layout_cols`` additionally Z-orders the rewrite
    (``ops.partitioning.zorder_layout``) so compaction doubles as a
    multi-column clustering pass, the ``OPTIMIZE ... ZORDER BY`` shape.

    Single-file collections are already maximally compact → no-op,
    returns 1.
    """
    if type(backend).__name__ != "ParquetBackend":
        raise TypeError("compact_collection supports parquet backends only")
    if db != backend.db_name:
        raise KeyError(f"backend serves db {backend.db_name!r}, not {db!r}")
    import shutil

    target = backend._path(coll)
    tmp_new = target + ".__compact_tmp__"
    tmp_old = target + ".__compact_old__"
    # Crash recovery from a prior interrupted run BEFORE anything else
    # (including the existence checks — after a crash between the two
    # renames, the ONLY copy of the data may live under tmp_old): restore
    # it if the live dir is missing, discard it if the swap completed.
    # A stale tmp_new is always safe to discard (it is never the only
    # copy until the first rename succeeds).
    if os.path.exists(tmp_old):
        if not os.path.exists(target):
            os.rename(tmp_old, target)
        else:
            shutil.rmtree(tmp_old)
    if os.path.exists(tmp_new):
        shutil.rmtree(tmp_new)
    if os.path.isfile(target):
        return 1
    if not os.path.isdir(target):
        raise FileNotFoundError(f"no such collection: {target}")
    total = sum(
        os.path.getsize(os.path.join(target, f))
        for f in os.listdir(target)
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(target)
    if layout_cols:
        from duckdb_mongo_spark.ops.partitioning import zorder_layout

        out = zorder_layout(df, layout_cols, n_files=n_files)
    else:
        out = df.repartition(n_files)
    try:
        out.write.mode("overwrite").parquet(tmp_new)
        os.rename(target, tmp_old)
        os.rename(tmp_new, target)
    except BaseException:
        # failed before the swap completed: roll back so the collection
        # stays readable and the temp dirs don't poison the next run
        if not os.path.exists(target) and os.path.exists(tmp_old):
            os.rename(tmp_old, target)
        shutil.rmtree(tmp_new, ignore_errors=True)
        raise
    shutil.rmtree(tmp_old)
    if hasattr(backend, "clear_cache"):
        backend.clear_cache()
    return sum(1 for f in os.listdir(target) if f.endswith(".parquet"))


def _check_exists(exists: bool, mode: str, target: str) -> bool:
    """Returns True when the write should proceed into a fresh target."""
    if exists and mode == "error":
        raise FileExistsError(f"collection exists: {target}")
    return not exists or mode == "overwrite"


def _write_parquet(df, backend, db, coll, mode):
    if db != backend.db_name:
        raise KeyError(f"backend serves db {backend.db_name!r}, not {db!r}")
    target = backend._path(coll)
    if os.path.isfile(target):
        # single-file collection: Spark cannot write into a file path
        if mode == "error":
            raise FileExistsError(f"collection exists: {target}")
        if mode == "append":
            raise ValueError(
                "cannot append to a single-file collection; rewrite it as a "
                "directory layout first (write_collection mode='overwrite')"
            )
        os.remove(target)
    elif os.path.isdir(target) and mode == "error":
        raise FileExistsError(f"collection exists: {target}")
    df.write.mode("append" if mode == "append" else "overwrite").parquet(target)


def _write_jsonl(df, backend, db, coll, mode):
    target = os.path.join(backend.root, db, coll)
    single = target + ".jsonl"
    if os.path.exists(single):
        if mode == "error":
            raise FileExistsError(f"collection exists: {single}")
        if mode == "append":
            raise ValueError(
                "cannot append to a single-file collection; rewrite it as a "
                "directory layout first (write_collection mode='overwrite')"
            )
        os.remove(single)
    elif os.path.isdir(target) and mode == "error":
        raise FileExistsError(f"collection exists: {target}")
    lines = df.select(_extended_json_col(df).alias("value"))
    lines.write.mode("append" if mode == "append" else "overwrite").text(target)
    # the JSONL reader globs *.jsonl part files; Spark's text writer
    # emits part-*.txt — a driver-side metadata rename, not a data copy
    for f in os.listdir(target):
        if f.startswith("part-") and f.endswith(".txt"):
            os.rename(
                os.path.join(target, f),
                os.path.join(target, f[:-4] + ".jsonl"),
            )


def _write_memory(df, backend, db, coll, mode, max_driver_rows):
    rows = df.limit(max_driver_rows + 1).collect()
    if len(rows) > max_driver_rows:
        raise ValueError(
            f"memory backend write exceeds max_driver_rows={max_driver_rows}; "
            "use a file-backed or mongo backend for large collections"
        )
    exists = coll in backend.list_collections(db)
    if exists and mode == "error":
        raise FileExistsError(f"collection exists: {db}.{coll}")
    if exists and mode == "overwrite":
        backend.drop_collection(db, coll)
    backend.create_collection(db, coll)
    backend.insert_many(db, coll, [r.asDict(recursive=True) for r in rows])


def _write_mongo(df, backend, db, coll, mode, distributed, max_driver_rows):
    exists = coll in backend.list_collections(db)
    if exists and mode == "error":
        raise FileExistsError(f"collection exists: {db}.{coll}")
    if exists and mode == "overwrite":
        backend.client[db][coll].drop()

    def insert_rows(rows):
        batch = []
        for r in rows:
            batch.append(r.asDict(recursive=True))
            if len(batch) >= 1000:
                backend.client[db][coll].insert_many(batch)
                batch = []
        if batch:
            backend.client[db][coll].insert_many(batch)

    if distributed:
        # backend pickles by connection string; each executor partition
        # opens its own client (reference parity: the extension's writes
        # would go through mongocxx bulk inserts the same way)
        df.foreachPartition(insert_rows)
    else:
        # driver-side single cursor: bounded small writes / in-process
        # fakes whose state lives in this process
        it = df.limit(max_driver_rows + 1).toLocalIterator()
        n = 0
        batch = []
        for r in it:
            n += 1
            if n > max_driver_rows:
                raise ValueError(
                    f"driver-side mongo write exceeds max_driver_rows="
                    f"{max_driver_rows}; use distributed=True"
                )
            batch.append(r)
            if len(batch) >= 1000:
                insert_rows(batch)
                batch = []
        if batch:
            insert_rows(batch)
