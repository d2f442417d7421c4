"""Scan planner: decides find() vs aggregate() and builds pipelines.

Spark-side analog of the reference's optimizer extension + scan init
(src/mongo_optimizer.cpp:312-642 TopN/aggregate rewrites,
src/mongo_table_function.cpp:174-603 projection/limit/init):

- projection doc: needed columns only, parent/child dotted-path collapse,
  ``_id`` always included (A4)
- LIMIT → cursor limit / ``$limit`` (A16)
- ``ORDER BY _id [ASC|DESC] LIMIT n`` → ``[$match?, $sort, $limit]`` (A17)
- COUNT/SUM/MIN/MAX/AVG + GROUP BY over direct column refs →
  ``$group`` + ``$project`` with ``__aggN`` aliases (A18-A21), guarded by
  the reference's negative space (A22): expressions inside aggregates,
  DISTINCT, enforcement modes → stay in Spark
- COUNT(*) on empty match → single row 0 (A18 fast-path contract)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from duckdb_mongo_spark.pushdown.filters import merge_match
from duckdb_mongo_spark.schema.infer import CollectionSchema, FieldSpec

SUPPORTED_AGGS = {"count_star", "count", "sum", "min", "max", "avg"}


@dataclass
class AggSpec:
    op: str          # count_star | count | sum | min | max | avg
    column: str | None
    alias: str


@dataclass
class ScanSpec:
    """Everything the engine decided to push to the source."""

    db: str
    coll: str
    schema: CollectionSchema
    match: dict | None = None            # compiled find-filter / $match
    projection: list[str] | None = None  # flattened column names to fetch
    limit: int | None = None
    order_by_id: int | None = None       # +1 / -1, only with limit (TopN)
    group_keys: list[str] | None = None
    aggs: list[AggSpec] | None = None
    manual_filter: dict | None = None    # user `filter :=` param (A23)
    manual_pipeline: list | None = None  # user `pipeline :=` param (A24)
    schema_mode: str = "PERMISSIVE"


@dataclass
class PlannedScan:
    method: str                          # "find" | "aggregate"
    filter: dict | None = None
    projection_doc: dict | None = None
    limit: int | None = None
    pipeline: list | None = None
    output_schema: CollectionSchema | None = None
    count_empty_to_zero: str | None = None   # alias of lone $count agg
    parallelizable: bool = True          # pipeline safe to run per-partition?


def build_projection(columns: list[str], schema: CollectionSchema) -> dict:
    """Collapse parent/child dotted paths and always include _id (A4)."""
    fmap = schema.field_map()
    paths: list[str] = []
    for name in columns:
        spec = fmap.get(name)
        paths.append(spec.mongo_path if spec else name)
    # parent/child collapse: if both "address" and "address.city" are
    # needed, fetching "address" covers the child
    keep: list[str] = []
    for p in sorted(set(paths)):
        if not any(p != q and p.startswith(q + ".") for q in paths):
            keep.append(p)
    doc = {p: 1 for p in keep}
    doc["_id"] = 1
    return doc


def _agg_result_field(agg: AggSpec, schema: CollectionSchema) -> FieldSpec:
    """Aggregate result typing (reference preserves engine aggregate types,
    src/mongo_optimizer.cpp:589): COUNT→BIGINT, AVG→DOUBLE, SUM/MIN/MAX
    follow the input column type — except integer SUM, which widens to
    HUGEINT (Decimal(38,0)) exactly like DuckDB's SUM(BIGINT)→HUGEINT:
    at 100 TB a BIGINT accumulator of cent-scaled money overflows
    silently, so the pushed result type must carry the 128-bit width."""
    if agg.op in ("count_star", "count"):
        return FieldSpec(agg.alias, "BIGINT", agg.alias)
    fmap = schema.field_map()
    src = fmap.get(agg.column)
    src_t = src.type if src else "DOUBLE"
    if agg.op == "avg":
        return FieldSpec(agg.alias, "DOUBLE", agg.alias)
    if agg.op == "sum":
        return FieldSpec(agg.alias, "DOUBLE" if src_t == "DOUBLE" else "HUGEINT", agg.alias)
    return FieldSpec(agg.alias, src_t if isinstance(src_t, str) else "VARCHAR", agg.alias)


def can_push_aggregate(spec: ScanSpec) -> bool:
    """Aggregate-pushdown guards (A22 + enforcement guard A26/optimizer
    :488-492: explicit-schema enforcement disables aggregate pushdown)."""
    if spec.aggs is None:
        return False
    if spec.schema.source != "inferred" and spec.schema_mode != "PERMISSIVE":
        return False
    for a in spec.aggs:
        if a.op not in SUPPORTED_AGGS:
            return False
        if a.op != "count_star" and a.column is None:
            return False
    return True


def plan_scan(spec: ScanSpec) -> PlannedScan:
    fmap = spec.schema.field_map()
    match = merge_match(spec.manual_filter, spec.match)

    if spec.manual_pipeline is not None:
        pipeline = list(spec.manual_pipeline)
        if match:
            pipeline = [{"$match": match}] + pipeline
        return PlannedScan(
            method="aggregate",
            pipeline=pipeline,
            output_schema=spec.schema,
            parallelizable=_pipeline_parallelizable(pipeline),
        )

    if spec.aggs is not None and can_push_aggregate(spec):
        pipeline: list = []
        if match:
            pipeline.append({"$match": match})
        keys = spec.group_keys or []
        out_fields: list[FieldSpec] = []
        if not keys and len(spec.aggs) == 1 and spec.aggs[0].op == "count_star":
            # ungrouped COUNT(*) → $count fast path (A18)
            alias = spec.aggs[0].alias
            pipeline.append({"$count": alias})
            return PlannedScan(
                method="aggregate",
                pipeline=pipeline,
                output_schema=CollectionSchema(
                    fields=[FieldSpec(alias, "BIGINT", alias)], source="pipeline"
                ),
                count_empty_to_zero=alias,
                parallelizable=False,
            )
        gid = None
        if keys:
            gid = {f"k{i}": "$" + (fmap[k].mongo_path if k in fmap else k)
                   for i, k in enumerate(keys)}
        group_doc: dict = {"_id": gid}
        proj_doc: dict = {"_id": 0}
        for i, k in enumerate(keys):
            proj_doc[k] = f"$_id.k{i}"
            out_fields.append(fmap.get(k) or FieldSpec(k, "VARCHAR", k))
        for i, agg in enumerate(spec.aggs):
            internal = f"__agg{i}"
            path = "$" + (fmap[agg.column].mongo_path if agg.column in fmap else agg.column) \
                if agg.column else None
            if agg.op == "count_star":
                group_doc[internal] = {"$sum": 1}
            elif agg.op == "count":
                group_doc[internal] = {
                    "$sum": {"$cond": [{"$ne": [path, None]}, 1, 0]}
                }
            else:
                group_doc[internal] = {"$" + agg.op: path}
            proj_doc[agg.alias] = f"${internal}"
            out_fields.append(_agg_result_field(agg, spec.schema))
        pipeline.append({"$group": group_doc})
        pipeline.append({"$project": proj_doc})
        return PlannedScan(
            method="aggregate",
            pipeline=pipeline,
            output_schema=CollectionSchema(fields=out_fields, source="pipeline"),
            parallelizable=False,
        )

    out_schema = spec.schema
    if spec.projection is not None:
        fields = [f for f in spec.schema.fields if f.name in set(spec.projection) or f.name == "_id"]
        out_schema = CollectionSchema(
            fields=fields,
            objectid_columns=spec.schema.objectid_columns,
            source=spec.schema.source,
        )

    if spec.order_by_id is not None and spec.limit is not None:
        # TopN on _id (A17)
        pipeline = []
        if match:
            pipeline.append({"$match": match})
        pipeline.append({"$sort": {"_id": spec.order_by_id}})
        pipeline.append({"$limit": spec.limit})
        if spec.projection is not None:
            pipeline.append({"$project": build_projection(spec.projection, spec.schema)})
        return PlannedScan(
            method="aggregate",
            pipeline=pipeline,
            output_schema=out_schema,
            parallelizable=False,
        )

    projection_doc = None
    if spec.projection is not None:
        # enforcement requires fetching every schema column
        # (mongo_table_function.cpp:531-550)
        if not (spec.schema.source != "inferred" and spec.schema_mode != "PERMISSIVE"):
            projection_doc = build_projection(spec.projection, spec.schema)
    return PlannedScan(
        method="find",
        filter=match,
        projection_doc=projection_doc,
        limit=spec.limit,
        output_schema=out_schema,
    )


def _pipeline_parallelizable(pipeline: list) -> bool:
    """A pipeline is safe to run independently per partition iff it is
    record-wise ($match/$project/$addFields/$unwind only)."""
    record_wise = {"$match", "$project", "$addFields", "$set", "$unwind"}
    return all(next(iter(st)) in record_wise for st in pipeline)
