"""mongo_scan — direct table-function entry point (reference EP2,
``SELECT * FROM mongo_scan('conn','db','coll', ...)``,
src/mongo_table_function.cpp:75-172).

Unlike the attached-catalog path, the schema is re-resolved per call
(the reference documents the same: direct mongo_scan has no cache,
README.md:566).
"""

from __future__ import annotations

from duckdb_mongo_spark.catalog import backend_for
from duckdb_mongo_spark.frame import MongoFrame
from duckdb_mongo_spark.schema.infer import resolve_schema


def infer_collection_schema(conn, db: str, coll: str, sample_size: int = 100, seed: int = 42):
    """Engine-level ``infer_schema(collection, sample_size)`` helper."""
    backend, _ = backend_for(conn)
    return resolve_schema(backend, db, coll, sample_size=sample_size, seed=seed)


def mongo_scan(
    spark,
    conn,
    db: str,
    coll: str,
    filter: dict | None = None,
    pipeline: list | None = None,
    columns: dict | None = None,
    sample_size: int = 100,
    schema_mode: str = "PERMISSIVE",
    num_partitions: int = 0,  # 0 = auto (session defaultParallelism)
    secret: str | None = None,
    search_index: dict | None = None,
) -> MongoFrame:
    """Scan one collection; returns a MongoFrame (lazy, pushdown-capable).

    Parameters mirror the reference table function: ``filter`` is a raw
    MQL filter merged into the pushed ``$match`` (A23), ``pipeline`` a
    full aggregation pipeline that switches the scan to aggregate()
    (A24), ``columns`` the user-declared schema (tier 1), ``schema_mode``
    PERMISSIVE / DROPMALFORMED / FAILFAST.

    ``search_index`` (r10) supplies the public Atlas search-index
    definition JSON (or ``{index_name: definition}``) that a live
    server would hold server-side — it pins per-path analyzers, token/
    autocomplete/geo coverage and synonym mappings for the pipeline's
    leading ``$search``/``$searchMeta`` stage (``mql/search_index``).
    Synonym source collections resolve from this scan's database.
    """
    backend, _ = backend_for(conn, secret=secret)
    if search_index is not None:
        from duckdb_mongo_spark.mql.search_index import attach_search_index

        if pipeline is None:
            raise ValueError(
                "search_index= requires a pipeline starting with "
                "$search or $searchMeta")
        pipeline = attach_search_index(
            pipeline, search_index,
            lambda c: backend.iter_documents(db, c))
    if pipeline is not None and columns is None:
        # Shape-changing pipelines ($group/$count/$lookup/$unwind/...):
        # the reference requires an explicit `columns` schema here
        # (mongo_table_function.cpp:324-326 — it always binds the BASE
        # collection's schema). We keep that priority (columns wins)
        # but additionally infer from the pipeline's OWN output when no
        # schema is given: one bounded sample aggregation (`$limit`
        # appended — pure truncation, safe after any stage). Falls back
        # to the collection schema when the pipeline yields nothing.
        from duckdb_mongo_spark.schema.infer import SCHEMA_DOC_ID, infer_schema_from_docs

        # Exclude the __schema sentinel doc BEFORE the user pipeline runs,
        # mirroring datasource._result_docs' sentinel_free prefix: otherwise
        # aggregates ingest the sentinel's type-name strings ($max returning
        # 'double') and _id-dropping stages ($project {_id:0}, $group,
        # $replaceRoot) defeat infer_schema_from_docs' post-filter.
        sentinel_free = [{"$match": {"_id": {"$ne": SCHEMA_DOC_ID}}}]
        head_op = next(iter(pipeline[0])) if (
            pipeline and isinstance(pipeline[0], dict) and pipeline[0]
        ) else None
        if head_op in (
            "$vectorSearch", "$search", "$geoNear", "$searchMeta"
        ) and not getattr(backend, "is_remote", False):
            # Search-headed pipelines: run inference over a bounded PREFIX
            # of the collection, not the whole thing — these stages add the
            # same fields/metadata to every doc, so a prefix sample yields
            # the same output shape while keeping inference O(sample) on a
            # local backend (execution itself takes the distributed routed
            # path in frame._try_routed_pipeline). $searchMeta belongs here
            # too (r14): its one output doc has the spec-determined shape
            # ({"count": ...} / flattened facet columns) regardless of
            # which rows fed it, so a prefix infers the identical schema —
            # while the else-branch would interpret the WHOLE collection
            # driver-side just to shape that one doc (measured ~40 s on a
            # 500k-doc corpus vs ~0.1 s via the prefix).
            import itertools

            from duckdb_mongo_spark.mql.interpreter import run_pipeline

            prefix = [
                d
                for d in itertools.islice(
                    backend.iter_documents(db, coll), sample_size * 10
                )
                if d.get("_id") != SCHEMA_DOC_ID
            ]
            sample_docs = run_pipeline(
                prefix,
                list(pipeline) + [{"$limit": sample_size}],
                collections=lambda c: backend.iter_documents(db, c),
            )
            if head_op == "$searchMeta" and any(
                isinstance(f, dict)
                and not f.get("buckets", True)  # empty list, not absent
                for doc in sample_docs
                for f in (doc.get("facet") or {}).values()
            ):
                # A facet the prefix matched NO values for yields empty
                # buckets, whose element type cannot be inferred — only
                # the full run shapes it. Rare (the prefix must miss
                # every faceted value); the O(collection) cost of the
                # else-branch applies only here.
                sample_docs = None
        else:
            sample_docs = None
        if sample_docs is None:
            from duckdb_mongo_spark.datasource import (
                guard_single_stream_aggregate,
            )
            from duckdb_mongo_spark.pushdown.planner import (
                _pipeline_parallelizable,
            )

            if not _pipeline_parallelizable(pipeline):
                # shape-changing pipelines interpret the whole collection
                # for inference (and again at execution): apply the
                # single-stream size guard here so oversized collections
                # fail at scan build, not mid-query
                guard_single_stream_aggregate(backend, db, coll)
            sample_docs = list(
                backend.aggregate(
                    db, coll, sentinel_free + list(pipeline) + [{"$limit": sample_size}]
                )
            )
        if sample_docs:
            schema = infer_schema_from_docs(
                sample_docs, force_id=False, source="pipeline-inferred"
            )
        else:
            schema = resolve_schema(backend, db, coll, sample_size=sample_size)
    else:
        schema = resolve_schema(backend, db, coll, columns=columns, sample_size=sample_size)
    return MongoFrame(
        spark=spark,
        backend=backend,
        db=db,
        coll=coll,
        schema=schema,
        schema_mode=str(schema_mode).upper(),
        num_partitions=num_partitions,
        manual_filter=filter,
        manual_pipeline=pipeline,
    )
