"""Parquet document backend: a directory of ``<coll>.parquet`` entries
viewed as one document database (rows = documents).

A collection is either a single file ``<root>/<coll>.parquet`` or a
DIRECTORY ``<root>/<coll>.parquet/`` of part files — exactly what
``df.write.parquet`` produces, so Spark-written outputs round-trip as
collections (``sinks.write_collection``). This is how the driver's
/root/testdata tables are exposed to the federation layer for
end-to-end tests. Scale design: partitions map to (file, row-group)
chunks, so executors read disjoint byte ranges with pyarrow directly —
no driver materialization, same shape as a real distributed scan; a
100 TB dataset is thousands of part files, not one.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from duckdb_mongo_spark.backends.base import DocumentBackend, ScanPartition


class _NotArrowExpressible(Exception):
    """Filter uses MQL the arrow path can't express — fall back to rows."""


def _arrow_col(name: str, id_field: str | None):
    import pyarrow.compute as pc

    if name == "_id" and id_field:
        name = id_field
    if "." in name or name.startswith("$"):
        raise _NotArrowExpressible(name)
    return pc.field(name)


def _arrow_value(v):
    from duckdb_mongo_spark.bsonlike import ObjectId

    if isinstance(v, ObjectId):
        return str(v)
    if isinstance(v, (dict, list)):
        raise _NotArrowExpressible("container value")
    return v


def _mql_to_arrow_expr(filt: dict, id_field: str | None):
    """Compile an MQL find-filter to a pyarrow compute Expression."""
    expr = None

    def conj(e):
        nonlocal expr
        expr = e if expr is None else (expr & e)

    for key, cond in filt.items():
        if key == "$and":
            for sub in cond:
                conj(_mql_to_arrow_expr(sub, id_field))
            continue
        if key == "$or":
            sub_exprs = [_mql_to_arrow_expr(s, id_field) for s in cond]
            acc = sub_exprs[0]
            for s in sub_exprs[1:]:
                acc = acc | s
            conj(acc)
            continue
        if key.startswith("$"):
            raise _NotArrowExpressible(key)
        col = _arrow_col(key, id_field)
        if cond is None:
            conj(col.is_null())
        elif isinstance(cond, dict) and all(str(k).startswith("$") for k in cond):
            for op, arg in cond.items():
                if op == "$eq":
                    conj(col.is_null() if arg is None else (col == _arrow_value(arg)))
                elif op == "$ne":
                    # MQL $ne matches null/missing values too
                    conj(
                        ~col.is_null()
                        if arg is None
                        else ((col != _arrow_value(arg)) | col.is_null())
                    )
                elif op == "$lt":
                    conj(col < _arrow_value(arg))
                elif op == "$lte":
                    conj(col <= _arrow_value(arg))
                elif op == "$gt":
                    conj(col > _arrow_value(arg))
                elif op == "$gte":
                    conj(col >= _arrow_value(arg))
                elif op == "$in":
                    conj(col.isin([_arrow_value(x) for x in arg]))
                else:
                    raise _NotArrowExpressible(op)
        elif isinstance(cond, (dict, list)):
            raise _NotArrowExpressible("container equality")
        else:
            conj(col == _arrow_value(cond))
    if expr is None:
        raise _NotArrowExpressible("empty filter")
    return expr


def _filter_columns(filt: dict, id_field: str | None) -> set[str]:
    cols: set[str] = set()
    for key, cond in filt.items():
        if key in ("$and", "$or"):
            for sub in cond:
                cols |= _filter_columns(sub, id_field)
        elif not key.startswith("$"):
            cols.add(id_field if (key == "_id" and id_field) else key)
    return cols


class ParquetBackend(DocumentBackend):
    dense_documents = True  # to_pylist emits every column, None when unset

    def __init__(self, root: str, db_name: str = "main", id_field: str | None = None):
        """``id_field``: column whose value doubles as the document ``_id``
        (parquet rows have no natural ObjectId; TopN-on-_id pushdown and
        `_id`-range partitioning need a key)."""
        self.root = root
        self.db_name = db_name
        self.id_field = id_field

    def _path(self, coll):
        return os.path.join(self.root, f"{coll}.parquet")

    def _files(self, coll) -> list[str]:
        """Physical part files of a collection, in name order (the head
        of the first file is the head of the collection — the __schema
        sentinel contract). Spark writer markers (_SUCCESS, dotfiles)
        are skipped."""
        path = self._path(coll)
        if os.path.isdir(path):
            return [
                os.path.join(path, f)
                for f in sorted(os.listdir(path))
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        return [path] if os.path.exists(path) else []

    def list_databases(self):
        return [self.db_name]

    def list_collections(self, db):
        if db != self.db_name or not os.path.isdir(self.root):
            return []
        return sorted(f[:-8] for f in os.listdir(self.root) if f.endswith(".parquet"))

    def _table_rows(self, path, row_groups=None) -> Iterator[dict]:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        groups = list(row_groups) if row_groups is not None else list(range(pf.num_row_groups))
        for batch in pf.iter_batches(batch_size=4096, row_groups=groups):
            for row in batch.to_pylist():
                if self.id_field and "_id" not in row and self.id_field in row:
                    row["_id"] = row[self.id_field]
                yield row

    def iter_documents(self, db, coll) -> Iterator[dict]:
        files = self._files(coll)
        if db != self.db_name or not files:
            raise KeyError(f"no such collection: {db}.{coll}")

        def gen():
            for path in files:
                yield from self._table_rows(path)

        return gen()

    def partitions(self, db, coll, n):
        import pyarrow.parquet as pq

        files = self._files(coll)
        if len(files) == 1:
            # single-file layout: split by row group (original format)
            num_groups = pq.ParquetFile(files[0]).num_row_groups
            if num_groups <= 1:
                return [ScanPartition(db, coll, 0, 1, {"row_groups": None})]
            n = max(1, min(n, num_groups))
            parts = []
            for i in range(n):
                rgs = [g for g in range(num_groups) if g % n == i]
                parts.append(ScanPartition(db, coll, i, n, {"row_groups": rgs}))
            return parts
        # directory layout: units are (file, row_group) chunks,
        # round-robined over n partitions
        units = []
        for path in files:
            for g in range(pq.ParquetFile(path).num_row_groups):
                units.append((path, g))
        if not units:
            return [ScanPartition(db, coll, 0, 1, {"chunks": []})]
        n = max(1, min(n, len(units)))
        parts = []
        for i in range(n):
            mine = units[i::n]
            chunks = {}
            for path, g in mine:
                chunks.setdefault(path, []).append(g)
            parts.append(
                ScanPartition(db, coll, i, n, {"chunks": sorted(chunks.items())})
            )
        return parts

    def read_partition(self, part) -> Iterator[dict]:
        chunks = part.extra.get("chunks")
        if chunks is not None:
            def gen():
                for path, rgs in chunks:
                    yield from self._table_rows(path, rgs)

            return gen()
        rgs = part.extra.get("row_groups")
        return self._table_rows(self._path(part.coll), rgs)

    # -- Arrow fast path ----------------------------------------------------
    # Simple find()-shape scans never touch per-row Python: the MQL filter
    # compiles to a pyarrow compute expression, the row-group read prunes
    # to the needed columns, and type normalization is a vectorized cast.
    # This is the engine's columnar-source scan design point (the 100 TB
    # path); non-expressible filters fall back to the row interpreter.

    def distinct_values(self, db, coll, column, filter=None, cap=None) -> list:
        """Vectorized build-side key fetch (A11): one-column pyarrow read
        with the pushed filter compiled to a compute Expression, then
        ``unique`` — no per-document Python. Falls back to the streaming
        base implementation for non-arrow-expressible filters or columns
        absent from the file (dotted paths)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        src = self.id_field if (column == "_id" and self.id_field) else column
        try:
            expr = _mql_to_arrow_expr(filter, self.id_field) if filter else None
        except _NotArrowExpressible:
            return super().distinct_values(db, coll, column, filter, cap)
        files = self._files(coll)
        if not files:
            return []
        head_cols = set(pq.ParquetFile(files[0]).schema_arrow.names)
        if src not in head_cols:
            return super().distinct_values(db, coll, column, filter, cap)
        needed = {src}
        if filter:
            needed |= _filter_columns(filter, self.id_field) & head_cols
        id_col = "_id" if "_id" in head_cols else self.id_field
        if id_col and id_col in head_cols and self._has_schema_doc(db, coll):
            t = pq.ParquetFile(files[0]).schema_arrow.field(id_col).type
            import pyarrow as _pa

            if _pa.types.is_string(t) or _pa.types.is_large_string(t):
                sentinel_free = (pc.field(id_col) != "__schema") | pc.field(id_col).is_null()
                expr = sentinel_free if expr is None else (expr & sentinel_free)
                needed.add(id_col)
        out: set = set()
        for path in files:
            pf = pq.ParquetFile(path)
            for rg in range(pf.num_row_groups):
                table = pf.read_row_group(rg, columns=sorted(needed))
                if expr is not None:
                    table = table.filter(expr)
                vals = pc.unique(table.column(src).combine_chunks())
                out.update(v for v in vals.to_pylist() if v is not None)
                if cap is not None and len(out) > cap:
                    return list(out)
        return list(out)

    def arrow_scan(self, db, coll, part, filter_doc, out_fields, limit=None):
        """Yield pyarrow RecordBatches matching the scan, or None when the
        filter is outside the arrow-expressible dialect.

        out_fields: list of (name, arrow_type, source_column|None).
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            expr = _mql_to_arrow_expr(filter_doc, self.id_field) if filter_doc else None
        except _NotArrowExpressible:
            return None
        files = self._files(coll)
        if not files:
            return iter(())
        head = pq.ParquetFile(files[0])
        head_cols = set(head.schema_arrow.names)
        # exclude the __schema sentinel document (the interpreted scan
        # path filters it in datasource._docs_for; the arrow path must
        # agree or a schema-carrying collection gains a phantom row)
        id_col = "_id" if "_id" in head_cols else self.id_field
        sentinel_col = None
        if id_col and id_col in head_cols and self._has_schema_doc(db, coll):
            import pyarrow as _pa
            import pyarrow.compute as pc

            t = head.schema_arrow.field(id_col).type
            if _pa.types.is_string(t) or _pa.types.is_large_string(t):
                sentinel_col = id_col
                # keep null-id rows: Arrow != yields null for null input
                # and Table.filter drops null-mask rows (the interpreted
                # path keeps them)
                sentinel_free = (pc.field(id_col) != "__schema") | (
                    pc.field(id_col).is_null()
                )
                expr = sentinel_free if expr is None else (expr & sentinel_free)
        for _name, atype, src in out_fields:
            if not src or src not in head_cols:
                continue
            file_t = head.schema_arrow.field(src).type
            if file_t == atype:
                continue
            try:
                # compile-time castability probe on an empty array: a
                # struct column declared VARCHAR (the flatten path's
                # JSON-rendered parent, FIXTURES.md users.address) has no
                # arrow cast — without this probe the generator raised
                # ArrowNotImplementedError inside the Spark task instead
                # of falling back to the interpreted row path (part files
                # share the writer's schema, so probing the head file
                # covers the collection)
                pa.nulls(0, file_t).cast(atype, safe=False)
            except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                return None
        # (file, row_groups|None) chunks for this partition
        extra = part.extra if part is not None and part.extra else None
        if extra and extra.get("chunks") is not None:
            chunk_list = list(extra["chunks"])
        elif extra and extra.get("row_groups") is not None:
            chunk_list = [(files[0], extra["row_groups"])]
        else:
            chunk_list = [(p, None) for p in files]

        def gen():
            remaining = limit
            for path, rgs in chunk_list:
                pf = head if path == files[0] else pq.ParquetFile(path)
                file_cols = set(pf.schema_arrow.names)
                needed = {s for _, _, s in out_fields if s and s in file_cols}
                if filter_doc:
                    needed |= _filter_columns(filter_doc, self.id_field) & file_cols
                if sentinel_col and sentinel_col in file_cols:
                    needed.add(sentinel_col)
                groups = list(rgs) if rgs is not None else list(range(pf.num_row_groups))
                for rg in groups:
                    if remaining is not None and remaining <= 0:
                        return
                    table = pf.read_row_group(rg, columns=sorted(needed))
                    if expr is not None:
                        table = table.filter(expr)
                    if remaining is not None:
                        table = table.slice(0, remaining)
                        remaining -= table.num_rows
                    if table.num_rows == 0:
                        continue
                    cols = []
                    for name, atype, src in out_fields:
                        if src and src in file_cols:
                            col = table.column(src)
                            if col.type != atype:
                                col = col.cast(atype, safe=False)
                            cols.append(col.combine_chunks())
                        else:
                            cols.append(pa.nulls(table.num_rows, atype))
                    out = pa.table(
                        cols,
                        schema=pa.schema([pa.field(n, t) for n, t, _ in out_fields]),
                    )
                    from duckdb_mongo_spark.datasource import ARROW_BATCH_ROWS

                    yield from out.to_batches(max_chunksize=ARROW_BATCH_ROWS)

        return gen()

    def native_spark_paths(self, db, coll):
        """Capability probe for ``MongoFrame._try_native_df`` (r12): the
        physical parquet paths of a collection that Spark's OWN reader
        can scan directly. A local columnar collection needs no
        document-protocol detour — the native FileScan gives vectorized
        decode, whole-stage codegen, and Catalyst filter pushdown /
        column pruning for free, and a grouped aggregate becomes
        Spark's distributed partial agg instead of the single-stream
        ``$group`` interpreter. Returns None when the collection does
        not exist (caller falls back to the engine scan paths)."""
        if db != self.db_name:
            return None
        files = self._files(coll)
        return files or None

    def _stream_head(self, coll, n):
        """First n rows via small arrow batches (no row-group materialize)."""
        import pyarrow.parquet as pq

        out = []
        for path in self._files(coll):
            pf = pq.ParquetFile(path)
            for batch in pf.iter_batches(batch_size=min(n, 1024)):
                for row in batch.to_pylist():
                    if self.id_field and "_id" not in row and self.id_field in row:
                        row["_id"] = row[self.id_field]
                    out.append(row)
                    if len(out) >= n:
                        return out
        return out

    def sample(self, db, coll, n, seed=42):
        """Schema-inference sampling without a full materialize: stream the
        first n rows (parquet rows are synthetic/uniform; the $sample
        randomness the reference needs for skewed real collections is
        preserved in the base/Pymongo backends)."""
        return self._stream_head(coll, n)

    def find_schema_doc(self, db, coll, probe_limit=1000):
        """Head probe for the ``__schema`` sentinel. CONTRACT: the
        sentinel must sit within the first ``probe_limit`` rows of the
        file (writers place it first); a sentinel past the probe window
        is treated as a data row."""
        for doc in self._stream_head(coll, probe_limit):
            if doc.get("_id") == "__schema":
                return doc
        return None

    def _has_schema_doc(self, db, coll) -> bool:
        """Cached one-shot head probe for the __schema sentinel doc —
        shared by the count fast path (which must subtract it) and the
        arrow fast path (which must filter it out); collections without
        a sentinel skip the filter and the forced id-column read.

        The cache is keyed on (path, mtime, size) so a parquet file
        rewritten while this backend instance lives (sentinel added or
        removed — likely now that the entry-level scan cache keeps
        backends alive across queries) invalidates the probe instead of
        serving a stale off-by-one to count()/arrow_scan."""
        import os

        files = self._files(coll)
        probe = files[0] if files else self._path(coll)
        try:
            st = os.stat(probe)
            key = (probe, st.st_mtime_ns, st.st_size, len(files))
        except OSError:
            key = (probe, None, None, len(files))
        if not hasattr(self, "_schema_doc_probe"):
            self._schema_doc_probe = {}
        if key not in self._schema_doc_probe:
            self._schema_doc_probe[key] = (
                self.find_schema_doc(db, coll) is not None
            )
        return self._schema_doc_probe[key]

    def fast_count(self, db, coll):
        if db != self.db_name or not self._files(coll):
            return None
        return self.count(db, coll)

    def fingerprint(self, db, coll):
        import os

        try:
            files = self._files(coll)
        except Exception:
            return None
        if not files:
            return None
        return tuple(
            (p, os.path.getsize(p), os.path.getmtime(p)) for p in sorted(files)
        )

    def count(self, db, coll, filter=None):
        if filter:
            return super().count(db, coll, filter)
        import pyarrow.parquet as pq

        n = sum(pq.ParquetFile(p).metadata.num_rows for p in self._files(coll))
        # metadata counts include the __schema sentinel doc when the
        # collection carries one — the interpreted scan path excludes it,
        # so the fast path must agree
        return n - 1 if self._has_schema_doc(db, coll) else n
