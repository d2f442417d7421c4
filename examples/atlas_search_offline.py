"""Run Atlas `$search` pipelines offline, at Spark scale.

The reference engine ships `$search` pipelines verbatim to a live
server whose INDEX DEFINITION decides matching. This engine evaluates
the same pipelines locally/distributed: supply the public Atlas
index-definition JSON via ``search_index=`` and the semantics a live
index would pin (per-path analyzers, autocomplete grams, token
normalizers, synonyms) hold here — routed through JVM codegen + Arrow
kernels wherever the shape allows, falling back to the bit-exact
interpreter (never a silent approximation) otherwise. Run:

    python examples/atlas_search_offline.py

Demonstrates: BM25 text with an index analyzer, synonym expansion from
a synonyms collection, autocomplete with minGrams + diacritic folding,
full Lucene-RegExp regex (automaton operators included), and
`$searchMeta` facets.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PRODUCTS = [
    {"_id": 1, "name": "Café Grinder Pro", "desc": "burr grinder for espresso",
     "category": "kitchen", "sku": "KG-1001", "stock": 14},
    {"_id": 2, "name": "Auto Brewer", "desc": "automatic car-friendly coffee brewer",
     "category": "kitchen", "sku": "KB-0930", "stock": 3},
    {"_id": 3, "name": "Road Atlas", "desc": "maps for automobile travel",
     "category": "books", "sku": "BK-0042", "stock": 55},
    {"_id": 4, "name": "Cafeteria Tray", "desc": "stackable serving tray",
     "category": "kitchen", "sku": "KT-2201", "stock": 120},
]

SYNONYMS = [
    {"_id": 1, "mappingType": "equivalent",
     "synonyms": ["car", "automobile", "auto"]},
]

INDEX = {
    "mappings": {
        "dynamic": True,
        "fields": {
            "name": [{"type": "string"}, {"type": "autocomplete",
                                          "minGrams": 3}],
            "desc": {"type": "string"},
            "sku": {"type": "token"},
        },
    },
    "synonyms": [{"name": "vehicles", "analyzer": "lucene.standard",
                  "source": {"collection": "synonyms"}}],
}


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import duckdb_mongo_spark as dms
    from duckdb_mongo_spark.backends import ParquetBackend

    spark = dms.get_spark("atlas_search_offline")
    d = tempfile.mkdtemp(prefix="atlas_search_")
    pq.write_table(pa.table({k: [p[k] for p in PRODUCTS]
                             for k in PRODUCTS[0]}),
                   os.path.join(d, "products.parquet"))
    pq.write_table(pa.table({k: [s[k] for s in SYNONYMS]
                             for k in SYNONYMS[0]}),
                   os.path.join(d, "synonyms.parquet"))
    be = ParquetBackend(d, db_name="shop")

    def search(title, pipeline):
        mf = dms.mongo_scan(spark, be, "shop", "products",
                            pipeline=pipeline, search_index=INDEX)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        print(f"\n== {title}  [{mf.last_exec_path}]")
        for r in rows:
            print("  ", r)
        return rows

    # 1. BM25 text relevance (distributed scoring + top-k)
    search("text: 'coffee grinder'", [
        {"$search": {"text": {"query": "coffee grinder", "path": "desc"}}},
        {"$limit": 3},
        {"$project": {"name": 1, "score": {"$meta": "searchScore"}}},
    ])

    # 2. synonyms resolved from the scan's own database: 'car' expands
    #    to automobile/auto per the equivalent mapping
    search("text: 'car' with synonyms", [
        {"$search": {"text": {"query": "car", "path": "desc",
                              "synonyms": "vehicles"}}},
        {"$limit": 5},
        {"$project": {"name": 1, "desc": 1}},
    ])

    # 3. autocomplete: minGrams=3 enforced, café folds to cafe
    search("autocomplete: 'caf'", [
        {"$search": {"autocomplete": {"query": "caf", "path": "name"}}},
        {"$limit": 5},
        {"$project": {"name": 1}},
    ])

    # 4. full Lucene RegExp over the token-typed sku — including the
    #    automaton operators (& intersection, <n-m> numeric interval)
    search("regex: kitchen skus numbered 900-1100", [
        {"$search": {"regex": {"query": "K.-<0900-1100>", "path": "sku"}}},
        {"$limit": 5},
        {"$project": {"name": 1, "sku": 1}},
    ])

    # 5. $searchMeta facets: category breakdown of the text matches
    search("$searchMeta facet over 'tray grinder brewer'", [
        {"$searchMeta": {"facet": {
            "operator": {"text": {"query": "tray grinder brewer",
                                  "path": "desc"}},
            "facets": {"by_category": {"type": "string",
                                       "path": "category"}},
        }}},
    ])

    # 6. (r11) persistent statistics index: build once, then routed
    #    text queries skip the per-query corpus-statistics pass — the
    #    local stand-in for the server-side Lucene index state
    from duckdb_mongo_spark.ops import text_index

    text_index.build_text_stats_index(spark, be, "shop", "products",
                                      paths=["desc"], search_index=INDEX)
    h0 = text_index.hit_count
    search("text: 'coffee grinder' (statistics-sidecar hit)", [
        {"$search": {"text": {"query": "coffee grinder", "path": "desc"}}},
        {"$limit": 3},
        {"$project": {"name": 1, "score": {"$meta": "searchScore"}}},
    ])
    assert text_index.hit_count > h0, "expected a sidecar hit"
    print("   (corpus-statistics pass served from the sidecar)")

    print("\nAll pipelines executed against the supplied Atlas index "
          "definition — no server required.")


if __name__ == "__main__":
    main()
