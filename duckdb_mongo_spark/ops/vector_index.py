"""Per-collection IVF(-PQ) vector index for approximate ``$vectorSearch``.

Atlas ``$vectorSearch`` is ANN by contract — ``numCandidates`` < corpus
means the server consults an index and considers only a candidate
subset. The reference ships the stage verbatim to the server
(/root/reference/src/mongo_table_function.cpp); on local backends this
module supplies the index the server would have had:

- **Coarse quantizer** (the ``ivf_index`` stance, ``ops/similarity.py``):
  seeded KMeans fit on a bounded deterministic sample, then ONE
  distributed assignment pass adds a ``__cell`` column. The assigned
  DataFrame is persisted (MEMORY_AND_DISK) and cached per
  (backend, db, coll, path, dim, data-fingerprint) — queries after the
  first touch only their probed cells. At 100 TB the persisted frame is
  the in-session analog of a written index sidecar table; the build is
  one pass, the same cost contract as building any secondary index.
- **PQ codes sidecar** (``pq_train``/``pq_encode`` reuse): for
  high-dimension vectors (>= SPARK_GRAFT_PQ_MIN_DIM, default 128) a
  narrow (id, __cell, code m-bytes, __norm) table is built alongside.
  Query-time ADC preselect scans only this sidecar for the probed
  cells, takes the top ``numCandidates`` ids, and broadcast-joins the
  (<= 10k by Atlas contract) winners back to full rows. For small
  dimensions the JVM exact scorer is cheaper than an Arrow round-trip,
  so the sidecar is skipped — measured stance, not a guess: ADC costs
  m byte-gathers/row in Python vs d fused multiplies/row in whole-stage
  codegen, and the break-even is well above d=64.
- **Exact re-rank**: candidates are always re-scored with the SAME JVM
  score expression as the exact path, so ``{$meta: "vectorSearchScore"}``
  is the true Atlas score formula — approximation only decides WHICH
  rows are considered, never what a score means.

Recall contract: probing accumulates estimated cell sizes (KMeans
sample cluster sizes scaled to the corpus) until >= numCandidates, so
recall rises monotonically with numCandidates, reaching exactness when
numCandidates >= corpus (the frame layer short-circuits that case to
the exact scorer before any index is built or consulted).
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _fit_sample() -> int:
    return int(os.environ.get("SPARK_GRAFT_IVF_FIT_SAMPLE", "100000"))


def _pq_min_dim() -> int:
    return int(os.environ.get("SPARK_GRAFT_PQ_MIN_DIM", "128"))


def _adc_factor() -> float:
    return float(os.environ.get("SPARK_GRAFT_ANN_ADC_FACTOR", "4"))

_CACHE: dict = {}
build_count = 0  # test introspection: how many indexes were built


@dataclass
class CollectionVectorIndex:
    centroids: object          # np.ndarray (k, d)
    est_sizes: object          # np.ndarray (k,) corpus-scaled cell sizes
    corpus_n: int              # valid vectors in the collection
    assigned: DataFrame        # persisted: base columns + __cell
    vec_name: str
    d: int
    id_name: str | None
    family: str = "cos"        # "cos": spherical cells; "l2": raw cells
    codes: DataFrame | None = None   # persisted sidecar: id, __cell, code, __norm
    codebooks: list | None = None
    extra: dict = field(default_factory=dict)


def _cache_key(backend, db, coll, mongo_path, d, family):
    fp = None
    fingerprint = getattr(backend, "fingerprint", None)
    if callable(fingerprint):
        try:
            fp = fingerprint(db, coll)
        except Exception:
            fp = None
    ident = fp if fp is not None else id(backend)
    return (type(backend).__name__, ident, db, coll, mongo_path, d, family)


def cached_index(backend, db, coll, mongo_path, d, family):
    """Cache peek — lets callers skip building the base scan frame when
    the index already exists (fingerprint re-checked, so stale file
    versions miss)."""
    return _CACHE.get(_cache_key(backend, db, coll, mongo_path, d, family))


def clear_vector_index_cache() -> int:
    """Drop every cached collection index (unpersisting its frames).
    Wired into ``catalog.clear_cache()`` — the reference's all-or-nothing
    invalidation stance (src/mongo_clear_cache.cpp)."""
    n = len(_CACHE)
    for idx in _CACHE.values():
        for df in (idx.assigned, idx.codes):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
    _CACHE.clear()
    return n


def _valid_vectors(bdf: DataFrame, vec_name: str, d: int):
    """Rows the exact scorer could ever return: non-null vector of the
    query's dimension with no null elements (null elements score NULL
    and are excluded by the exact path, so dropping them from the index
    changes nothing)."""
    vec = F.col(vec_name).cast("array<double>")
    return bdf.where(
        F.col(vec_name).isNotNull()
        & (F.size(F.col(vec_name)) == d)
        & ~F.exists(vec, lambda x: x.isNull())
    )


def get_collection_vector_index(
    backend, db, coll, bdf: DataFrame, vec_name: str, mongo_path: str,
    d: int, id_name: str | None, family: str = "cos", seed: int = 42,
) -> CollectionVectorIndex:
    """Build-or-fetch the IVF(-PQ) index for one collection vector path.
    ``bdf`` must be the UNFILTERED base scan (query filters are applied
    to candidates at probe time, never baked into the index).

    ``family`` picks the cell geometry: "cos" trains cells on
    NORMALIZED vectors (cosine neighborhoods are L2 neighborhoods on
    the unit sphere, |a-b|^2 = 2 - 2cos — raw-vector cells would group
    by magnitude, not direction), "l2" on raw vectors (euclidean
    similarity). Zero-norm vectors are excluded from a "cos" index —
    they score a constant 0.5 under cosine, so recall can only miss
    ties. dotProduct queries use the "cos" family: cells capture
    direction and the exact re-rank restores magnitude — extreme norm
    variance degrades recall, a documented MIPS-on-IVF limitation."""
    global build_count
    key = _cache_key(backend, db, coll, mongo_path, d, family)
    idx = _CACHE.get(key)
    if idx is not None:
        return idx

    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.storagelevel import StorageLevel

    valid = _valid_vectors(bdf, vec_name, d)
    vec = F.col(vec_name).cast("array<double>")
    if family == "cos":
        nrm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
        valid = valid.where(nrm > 0.0)
        feat_arr = F.transform(vec, lambda x: x / nrm)
    else:
        feat_arr = vec
    feat = valid.withColumn("__features", array_to_vector(feat_arr))
    # bounded deterministic-ish sample (orderBy the id column when the
    # schema has one — same stance as ivf_index's orderBy(c_id))
    sample_src = feat.select("__features")
    if id_name is not None and id_name in bdf.columns:
        sample_src = (feat.orderBy(id_name).limit(_fit_sample())
                      .select("__features"))
    else:
        sample_src = sample_src.limit(_fit_sample())
    n_fit = sample_src.count()
    if n_fit == 0:
        raise ValueError("vector index: no valid vectors to fit")
    k_env = os.environ.get("SPARK_GRAFT_IVF_CENTROIDS")
    k = int(k_env) if k_env else max(1, min(1024, round(math.sqrt(n_fit) * 2)))
    k = min(k, n_fit)
    model = KMeans(k=k, seed=seed, featuresCol="__features",
                   predictionCol="__cell").fit(sample_src)
    centroids = np.asarray([list(c) for c in model.clusterCenters()],
                           dtype=np.float64)
    fit_sizes = np.asarray(model.summary.clusterSizes, dtype=np.float64)

    assigned = model.transform(feat).drop("__features").persist(
        StorageLevel.MEMORY_AND_DISK)
    corpus_n = assigned.count()  # one distributed job; materializes the persist
    est_sizes = fit_sizes / max(1.0, float(n_fit)) * float(corpus_n)

    codes = codebooks = None
    if d >= _pq_min_dim() and id_name is not None and id_name in bdf.columns:
        from duckdb_mongo_spark.ops.similarity import pq_encode, pq_train

        # ~8 dims per subspace (FAISS-typical granularity): 32 one-byte
        # codes for d=256 — recall-measured in tests/test_vector_ann.py.
        # "cos" family codes NORMALIZED vectors: IP-ADC against them is
        # |q|*cos — monotonic in cosine with no norm correction, and PQ
        # distortion stops scaling with vector magnitude spread.
        # dotProduct restores magnitude via the stored __norm.
        m = max(1, min(64, d // 8))
        code_src = valid
        code_vec = vec_name
        if family == "cos":
            code_src = valid.withColumn("__nvec", feat_arr)
            code_vec = "__nvec"
        codebooks = pq_train(code_src, m=m, c_id=id_name, c_vec=code_vec,
                             seed=seed, fit_sample_size=_fit_sample())
        norms = assigned.select(
            F.col(id_name).alias("__pk"), F.col("__cell"),
            F.sqrt(F.aggregate(vec, F.lit(0.0),
                               lambda acc, x: acc + x * x)).alias("__norm"))
        codes = (
            pq_encode(code_src, codebooks, c_id=id_name, c_vec=code_vec)
            .withColumnRenamed(id_name, "__pk")
            .join(norms, "__pk")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        codes.count()

    idx = CollectionVectorIndex(
        centroids=centroids, est_sizes=est_sizes, corpus_n=corpus_n,
        assigned=assigned, vec_name=vec_name, d=d, id_name=id_name,
        family=family, codes=codes, codebooks=codebooks,
    )
    _CACHE[key] = idx
    build_count += 1
    return idx


def probe_cells(index: CollectionVectorIndex, qv, num_candidates: int):
    """Rank cells by L2 distance of the query to each centroid (k-means
    cells are L2-Voronoi — an inner-product probe would favor large-norm
    centroids, ops/similarity.py ivf_pq_topk) and accumulate estimated
    sizes until >= num_candidates. The query is normalized first for
    "cos"-family indexes (the cells live on the unit sphere). Returns
    (cells, est_probed); cells is None when every cell would be probed
    (no pruning value)."""
    import numpy as np

    q = np.asarray([float(x) for x in qv], dtype=np.float64)
    if index.family == "cos":
        qn = float(np.sqrt((q * q).sum()))
        if qn > 0:
            q = q / qn
    c = index.centroids
    dist = (c * c).sum(1) - 2.0 * (c @ q)
    order = np.lexsort((np.arange(len(c)), dist))
    cum = np.cumsum(index.est_sizes[order])
    n_cells = int(np.searchsorted(cum, float(num_candidates)) + 1)
    if n_cells >= len(c):
        return None, float(index.corpus_n)
    cells = [int(x) for x in order[:n_cells]]
    return cells, float(cum[n_cells - 1])


def adc_preselect(index: CollectionVectorIndex, cells, qv,
                  similarity: str, num_candidates: int) -> DataFrame | None:
    """PQ asymmetric-distance preselect over the narrow codes sidecar:
    score only (id, code) rows of the probed cells, keep the top
    ``num_candidates`` ids under the query's similarity ordering.
    Returns a 1-column (__pk) DataFrame (broadcast-class, <= 10k by the
    Atlas limit contract) or None when the sidecar doesn't exist.

    "cos"-family codes hold NORMALIZED vectors, so the IP partial sum is
    |q|*cos — already monotonic in cosine; dotProduct multiplies the
    stored exact ``__norm`` back in; "l2" codes hold raw vectors and use
    the L2 expansion. The survivors are exact re-ranked by the caller,
    so ADC error can only cost recall, never score fidelity."""
    if index.codes is None or index.codebooks is None:
        return None
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cb = [np.asarray(c, dtype=np.float64) for c in index.codebooks]
    bounds = np.cumsum([0] + [c.shape[1] for c in cb])
    q = np.asarray([float(x) for x in qv], dtype=np.float64)
    want_l2 = similarity == "euclidean"
    lut = np.zeros((len(cb), max(c.shape[0] for c in cb)))
    for j, c in enumerate(cb):
        qs = q[bounds[j]:bounds[j + 1]]
        if want_l2:
            lut[j, : c.shape[0]] = ((qs * qs).sum()
                                    - 2.0 * (c @ qs)
                                    + (c * c).sum(1))
        else:
            lut[j, : c.shape[0]] = c @ qs

    src = index.codes
    if cells is not None:
        src = src.where(F.col("__cell").isin(cells))
    pk_type = src.schema["__pk"].dataType
    out_schema = T.StructType([
        T.StructField("__pk", pk_type),
        T.StructField("__adc", T.DoubleType()),
    ])
    m = len(cb)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            code_mat = np.frombuffer(
                b"".join(pdf["code"]), dtype=np.uint8).reshape(len(pdf), m)
            s = np.zeros(len(pdf))
            for j in range(m):
                s += lut[j, code_mat[:, j]]
            if similarity == "dotProduct":
                s = s * pdf["__norm"].to_numpy()
            yield pd.DataFrame({"__pk": pdf["__pk"], "__adc": s})

    scored = src.select("__pk", "code", "__norm").mapInPandas(
        kernel, schema=out_schema)
    order = F.col("__adc").asc() if want_l2 else F.col("__adc").desc()
    return scored.orderBy(order).limit(num_candidates).select("__pk")


# ---------------------------------------------------------------------------
# Mongo-filter -> Spark Column translation (conservative subset)
# ---------------------------------------------------------------------------

_SCALARS = (int, float, str, bool, type(None))
_NUMERIC_TYPES = ("DOUBLE", "BIGINT", "INTEGER", "INT", "FLOAT",
                  "SMALLINT", "TINYINT", "HUGEINT")


def _lit_compat(fs, v) -> bool:
    """Literal/column type compatibility — a mismatched comparison in
    mongod matches NOTHING (type bracketing), while Spark would CAST and
    can throw (e.g. 'a' vs BIGINT). Incompatible pairs are rejected so
    the caller falls back to the exact path's interpreted filter."""
    t = getattr(fs, "type", None)
    if not isinstance(t, str):
        return False
    if isinstance(v, bool):
        return t == "BOOLEAN"
    if isinstance(v, (int, float)):
        return t in _NUMERIC_TYPES
    if isinstance(v, str):
        return t == "VARCHAR"
    return False


def translate_match_filter(flt, fields_by_path: dict) -> "F.Column | None":
    """Translate a ``$vectorSearch`` pre-filter ($match semantics) to a
    Spark Column over the flattened schema. ``fields_by_path`` maps
    dotted document paths to schema field specs (``.name`` flattened
    column, ``.type`` engine type). Supports the shapes Atlas
    vector-index filters allow (equality / range / in over scalar
    fields, $and/$or) with mongod's missing-field semantics
    (absent == null in the flattened row: $ne/$nin match it, $eq/ranges
    don't) and mongod's type bracketing (a literal whose type cannot
    match the column's falls outside the subset — Spark's implicit cast
    would diverge or throw). Returns None for anything outside the
    subset — the caller then keeps the exact path, where the filter is
    pushed into the scan and interpreted with full MQL semantics."""
    if not isinstance(flt, dict):
        return None
    conjuncts = []
    for key, val in flt.items():
        if key == "$and" or key == "$or":
            if not isinstance(val, list) or not val:
                return None
            parts = [translate_match_filter(v, fields_by_path) for v in val]
            if any(p is None for p in parts):
                return None
            acc = parts[0]
            for p in parts[1:]:
                acc = (acc & p) if key == "$and" else (acc | p)
            conjuncts.append(acc)
            continue
        if key.startswith("$"):
            return None
        fs = fields_by_path.get(key)
        if fs is None or not isinstance(getattr(fs, "type", None), str):
            return None  # unknown path / non-scalar column — exact path
        col = F.col(fs.name)
        if isinstance(val, dict):
            for op, v in val.items():
                c = _translate_op(fs, col, op, v)
                if c is None:
                    return None
                conjuncts.append(c)
        elif val is None:
            conjuncts.append(col.isNull())
        elif isinstance(val, _SCALARS):
            if not _lit_compat(fs, val):
                return None
            conjuncts.append(col == F.lit(val))
        else:
            return None
    if not conjuncts:
        return None
    acc = conjuncts[0]
    for c in conjuncts[1:]:
        acc = acc & c
    return acc


def _translate_op(fs, col, op, v):
    if op in ("$gt", "$gte", "$lt", "$lte"):
        if isinstance(v, bool) or not _lit_compat(fs, v) \
                or not isinstance(v, (int, float, str)):
            return None
        return {"$gt": col > F.lit(v), "$gte": col >= F.lit(v),
                "$lt": col < F.lit(v), "$lte": col <= F.lit(v)}[op]
    if op == "$eq":
        if v is None:
            return col.isNull()
        if not isinstance(v, _SCALARS) or not _lit_compat(fs, v):
            return None
        return col == F.lit(v)
    if op == "$ne":
        if v is None:
            return col.isNotNull()
        if not isinstance(v, _SCALARS) or not _lit_compat(fs, v):
            return None
        return col.isNull() | (col != F.lit(v))  # absent/null matches $ne
    if op in ("$in", "$nin"):
        if not isinstance(v, list) or not all(
                isinstance(x, _SCALARS) for x in v):
            return None
        if not all(x is None or _lit_compat(fs, x) for x in v):
            return None
        vals = [x for x in v if x is not None]
        has_null = any(x is None for x in v)
        c = col.isin(vals) if vals else F.lit(False)
        if has_null:
            c = c | col.isNull()
        if op == "$in":
            return c
        # $nin matches docs where the field is absent too
        return ~c | (col.isNull() if not has_null else F.lit(False))
    return None
