"""Durable BM25 corpus-statistics sidecar for routed ``$search`` text
scoring (r11).

In the reference, ``$search`` ships to the server verbatim and Lucene's
inverted index already HOLDS the corpus statistics every BM25 score
needs — document count, per-field total token length, per-term document
frequency (reference README.md pipeline passthrough; the index lives
server-side). Locally the routed text path recomputed those statistics
per query with a full engine-scan aggregate pass
(``frame._route_search_text`` pass 1) — correct, but a per-query
federation tax that SCALE.md's r10 decomposition measured at ~40% of the
sf10 ``search_text_topk`` wall time. This module is the local stand-in
for that server-side index state: a versioned on-disk sidecar per
(collection fingerprint, path, analyzer), sharing the
``ops/vector_index.py`` commit protocol (immutable ``v-*`` version dirs,
atomic ``CURRENT`` pointer, superseded-version GC), so a query reads
N/total_len from a tiny ``meta.json`` and the per-term document
frequencies from a term-range-sorted parquet term dictionary with
predicate pushdown — no corpus pass at all.

Invalidation is by construction: the sidecar key includes the backend's
collection fingerprint (file paths + sizes + mtimes for parquet), so a
rewritten corpus misses and the query falls back to the live statistics
pass (cold path unchanged). Backends without a durable fingerprint (the
wire fake, in-memory backends) keep the whole term dictionary in the
process cache instead of on disk — bounded by ``_MEM_TERMS_CAP``.

Scale notes (100 TB): the build is two bounded-shuffle jobs — one
aggregate row for the summary, one ``groupBy(term)`` for the dictionary
(vocabulary-sized output, written ``repartitionByRange(term)`` +
sorted-within-partitions so every file covers a term range). Query-time
lookup reads only the row groups whose [min, max] term range covers a
query term (pyarrow dataset filter against parquet row-group
statistics) — a handful of KB per query regardless of corpus size. No
resident driver memory scales with the corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import functions as F

# the engine-contract tokenizer (mql/search._analyze) IS lucene.standard
CONTRACT_ANALYZER_KEY = "lucene.standard"

_META_VERSION = 1

# a non-durable (no-fingerprint) backend keeps its term dictionary in
# process memory; beyond this vocabulary size we refuse rather than
# silently hold an unbounded dict on the driver
_MEM_TERMS_CAP = 1_000_000

_CACHE: dict = {}
build_count = 0  # test introspection: sidecar builds
load_count = 0   # ... durable loads from disk
hit_count = 0    # ... query-time stats served from a handle


def _stats_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_TEXT_STATS_DIR",
        os.path.join(tempfile.gettempdir(), "spark_graft_text_stats"))


def _cache_key(backend, db, coll, mongo_path, analyzer_key):
    fp = None
    fingerprint = getattr(backend, "fingerprint", None)
    if callable(fingerprint):
        try:
            fp = fingerprint(db, coll)
        except Exception:
            fp = None
    ident = fp if fp is not None else id(backend)
    return (type(backend).__name__, ident, db, coll, mongo_path,
            analyzer_key)


def _sidecar_dir(key) -> str:
    return os.path.join(
        _stats_root(),
        hashlib.sha1(repr(key).encode()).hexdigest()[:24])


@dataclass
class TextStatsIndex:
    """One committed (collection, path, analyzer) statistics handle."""

    n_docs: int
    total_len: int
    multibyte: bool
    analyzer_key: str
    mongo_path: str
    terms_dir: str | None = None   # durable: term-dictionary parquet dir
    mem_dfs: dict | None = None    # non-durable: full in-memory dict
    sidecar: str | None = None

    def term_dfs(self, terms) -> dict:
        """Document frequency for each requested term (absent -> 0).
        Durable handles read only the parquet row groups whose term
        range covers a query term; the per-query read is bounded by the
        query's term count, never the vocabulary."""
        terms = list(dict.fromkeys(terms))
        out = {t: 0 for t in terms}
        if not terms:
            return out
        if self.mem_dfs is not None:
            for t in terms:
                out[t] = int(self.mem_dfs.get(t, 0))
            return out
        import pyarrow.dataset as ds

        dset = ds.dataset(self.terms_dir, format="parquet")
        tbl = dset.to_table(filter=ds.field("term").isin(terms))
        for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            out[t] = int(d)
        return out


def clear_text_stats_cache() -> int:
    """Drop every in-memory handle (wired into ``catalog.clear_cache()``
    — the reference's all-or-nothing metadata invalidation,
    src/mongo_clear_cache.cpp). Durable sidecars stay on disk: the next
    query reloads by fingerprint without rebuilding."""
    n = len(_CACHE)
    _CACHE.clear()
    return n


def drop_text_stats_sidecars() -> int:
    """Delete every durable sidecar under the stats root (and the
    in-memory handles). Returns the number of sidecar dirs removed."""
    import shutil

    root = _stats_root()
    n = 0
    if os.path.isdir(root):
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                n += 1
    clear_text_stats_cache()
    return n


def _load_sidecar(key, sdir) -> TextStatsIndex | None:
    from duckdb_mongo_spark.ops.vector_index import _current_version_dir

    global load_count
    vdir = _current_version_dir(sdir)
    if vdir is None:
        return None
    try:
        with open(os.path.join(vdir, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("version") != _META_VERSION:
            return None
        idx = TextStatsIndex(
            n_docs=int(meta["n_docs"]), total_len=int(meta["total_len"]),
            multibyte=bool(meta["multibyte"]),
            analyzer_key=meta["analyzer_key"],
            mongo_path=meta["mongo_path"],
            terms_dir=os.path.join(vdir, "terms"), sidecar=vdir,
        )
    except Exception:
        return None
    _CACHE[key] = idx
    load_count += 1
    return idx


def cached_stats(backend, db, coll, mongo_path,
                 analyzer_key) -> TextStatsIndex | None:
    """Query-time fetch: in-memory handle, else a committed durable
    sidecar for the CURRENT collection fingerprint. Never builds —
    building is an explicit index operation (``build_text_stats_index``),
    so the cold query path is unchanged."""
    global hit_count
    if os.environ.get("SPARK_GRAFT_TEXT_STATS_DISABLE"):
        return None  # benchmarking kill switch: force the live pass
    key = _cache_key(backend, db, coll, mongo_path, analyzer_key)
    idx = _CACHE.get(key)
    if idx is None and key[1] is not None and not isinstance(key[1], int):
        idx = _load_sidecar(key, _sidecar_dir(key))
    if idx is not None:
        hit_count += 1
    return idx


def _tokens_df(bdf, fs, analyze_fn):
    """``(raw column, __toks array<string>)`` via one Arrow-batched
    mapInPandas pass with the oracle's own analyzer fn — the statistics
    are then token-identical to both execution paths by construction
    (the JVM fast path equals the oracle on pure-ASCII text, and the
    recorded ``multibyte`` flag routes multibyte corpora to the Arrow
    pass at query time)."""
    from pyspark.sql import types as T

    from duckdb_mongo_spark.schema.types import is_list

    src = bdf.select(fs.name)  # column pruning: the scan reads one path
    islist = bool(is_list(fs.type))
    out_schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("__toks", T.ArrayType(T.StringType()))])

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            if islist:
                out["__toks"] = [
                    [t for el in (v if v is not None else [])
                     for t in analyze_fn(el)]
                    for v in pdf[fs.name]]
            else:
                out["__toks"] = [analyze_fn(v) for v in pdf[fs.name]]
            yield out

    return src.mapInPandas(kernel, schema=out_schema)


def _nonascii_flag(fs):
    from duckdb_mongo_spark.schema.types import is_list

    raw = (F.coalesce(F.array_join(F.col(fs.name), ""), F.lit(""))
           if is_list(fs.type) else F.coalesce(F.col(fs.name), F.lit("")))
    return F.max(
        F.when(F.octet_length(raw) != F.length(raw), 1).otherwise(0))


def build_path_stats(backend, db, coll, bdf, fs, analyze_fn,
                     analyzer_key) -> TextStatsIndex:
    """Build (or rebuild) the statistics sidecar for one collection
    path under one analyzer. ``bdf`` must be the UNFILTERED base scan —
    N and the frequencies describe the whole corpus, exactly what the
    live pass aggregates."""
    from duckdb_mongo_spark.ops.vector_index import (
        _commit_version,
        _current_version_dir,
        _gc_stale_versions,
    )

    global build_count
    key = _cache_key(backend, db, coll, fs.mongo_path, analyzer_key)
    tdf = _tokens_df(bdf, fs, analyze_fn)
    row = tdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("__toks")).alias("total"),
        _nonascii_flag(fs).alias("mb"),
    ).collect()[0]
    n_docs = int(row["n"] or 0)
    total_len = int(row["total"] or 0)
    multibyte = bool(row["mb"])
    terms = (
        tdf.select(F.explode(F.array_distinct("__toks")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    )

    durable = key[1] is not None and not isinstance(key[1], int)
    if not durable:
        rows = terms.limit(_MEM_TERMS_CAP + 1).collect()
        if len(rows) > _MEM_TERMS_CAP:
            raise ValueError(
                f"text stats for {coll}.{fs.mongo_path}: vocabulary "
                f"exceeds {_MEM_TERMS_CAP} terms and the backend has no "
                "durable fingerprint for an on-disk sidecar")
        idx = TextStatsIndex(
            n_docs=n_docs, total_len=total_len, multibyte=multibyte,
            analyzer_key=analyzer_key, mongo_path=fs.mongo_path,
            mem_dfs={r["term"]: int(r["df"]) for r in rows})
        _CACHE[key] = idx
        build_count += 1
        return idx

    sdir = _sidecar_dir(key)
    vname = f"v-{uuid.uuid4().hex[:16]}"
    vdir = os.path.join(sdir, vname)
    os.makedirs(vdir, exist_ok=True)
    # one file per ~250k docs of corpus (vocabulary grows sublinearly);
    # range-partitioned + sorted so every file/row-group covers one term
    # range and query-time isin() pushdown prunes to a handful of pages
    nparts = max(1, min(256, (n_docs // 250_000) + 1))
    (terms.repartitionByRange(nparts, "term")
     .sortWithinPartitions("term")
     .write.mode("overwrite").parquet(os.path.join(vdir, "terms")))
    meta = {"version": _META_VERSION, "n_docs": n_docs,
            "total_len": total_len, "multibyte": multibyte,
            "analyzer_key": analyzer_key, "mongo_path": fs.mongo_path}
    with open(os.path.join(vdir, "meta.json"), "w") as f:
        json.dump(meta, f)  # last file within the version dir
    prev = _current_version_dir(sdir)
    _commit_version(sdir, vname)
    _gc_stale_versions(sdir, keep={vname} | (
        {os.path.basename(prev)} if prev else set()))
    idx = TextStatsIndex(
        n_docs=n_docs, total_len=total_len, multibyte=multibyte,
        analyzer_key=analyzer_key, mongo_path=fs.mongo_path,
        terms_dir=os.path.join(vdir, "terms"), sidecar=vdir)
    _CACHE[key] = idx
    build_count += 1
    return idx


def build_text_stats_index(spark, backend, db: str, coll: str,
                           paths: list[str] | None = None,
                           search_index: dict | None = None,
                           columns: dict | None = None) -> dict:
    """The user-facing "create search index" verb: build statistics
    sidecars for the given collection paths (default: every string /
    list-of-string field). With ``search_index=`` (the same Atlas
    index-definition JSON ``mongo_scan`` accepts) each path's sidecar
    is keyed and tokenized by that path's INDEX analyzer, matching what
    the routed query path will consult; without it, the engine-contract
    analyzer (``lucene.standard``). Returns ``{mongo_path:
    TextStatsIndex}``. Rebuilds are cheap no-ops when the committed
    sidecar already matches the collection fingerprint."""
    from duckdb_mongo_spark.frame import MongoFrame
    from duckdb_mongo_spark.mql.search import _analyze
    from duckdb_mongo_spark.schema.infer import resolve_schema
    from duckdb_mongo_spark.schema.types import is_list

    schema = resolve_schema(backend, db, coll, columns=columns)
    fm = {f.mongo_path: f for f in schema.fields}
    if paths is None:
        paths = [f.mongo_path for f in schema.fields
                 if f.type == "VARCHAR"
                 or (is_list(f.type) and f.type[1] == "VARCHAR")]
    index = None
    if search_index is not None:
        from duckdb_mongo_spark.mql.search_index import SearchIndex

        if isinstance(search_index, SearchIndex):
            index = search_index
        else:
            # synonym mappings are query-side rewrites with no bearing
            # on corpus tokenization — strip them so the build API does
            # not demand a synonym-collection resolver
            index = SearchIndex({k: v for k, v in search_index.items()
                                 if k != "synonyms"})
    bdf = None
    out = {}
    for path in paths:
        fs = fm.get(path)
        if fs is None or (fs.type != "VARCHAR" and not (
                is_list(fs.type) and fs.type[1] == "VARCHAR")):
            raise ValueError(
                f"build_text_stats_index: {path!r} is not a string path "
                f"of {db}.{coll}")
        if index is not None:
            names = index.text_analyzer_names(path)
            if names is None:
                raise ValueError(
                    f"build_text_stats_index: {path!r} has no string "
                    "coverage under the supplied search index definition")
            an_name = names[0]
            analyze_fn = index._analyzer_fn(an_name)
            akey = index.analyzer_key(an_name)
        else:
            analyze_fn, akey = _analyze, CONTRACT_ANALYZER_KEY
        existing = cached_stats(backend, db, coll, path, akey)
        if existing is not None:
            out[path] = existing
            continue
        if bdf is None:
            bdf = MongoFrame(spark=spark, backend=backend, db=db,
                             coll=coll, schema=schema).df()
        out[path] = build_path_stats(
            backend, db, coll, bdf, fs, analyze_fn, akey)
    return out
