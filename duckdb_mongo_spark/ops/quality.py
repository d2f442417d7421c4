"""Repetition/quality signals and benchmark decontamination.

Large-scale training-data curation needs per-document *repetition*
signals (the Gopher filters: a page whose text is dominated by one
repeated n-gram or duplicated lines is boilerplate, not prose) and a
*decontamination* pass (drop corpus documents sharing long n-grams with
an evaluation benchmark, the GPT-3/PaLM 13-gram rule).

Scale design:

- ``repetition_signals`` is a PURE PROJECTION — per-row higher-order
  functions over the token array, zero shuffles, zero UDFs. The cost is
  O(distinct_grams x grams) element comparisons per document (~10^3-10^4
  for real pages), embarrassingly parallel, and the operator composes
  with pushdown: a downstream threshold filter runs in the same stage as
  the scan. The explode+groupBy(doc, gram) alternative shuffles
  #docs x #grams rows — strictly worse at any corpus size for a signal
  that never needs cross-document state.
- ``decontaminate`` joins the corpus's distinct n-grams against the
  benchmark's distinct n-grams. The benchmark side (eval suites: at most
  millions of grams, tens of MB) is broadcast by default, making the
  whole pass map-side: ONE shuffle total (the per-doc hit count
  aggregation), no matter the corpus size. Gram sets reuse the dedup
  module's shingle machinery — same tokenizer, same short-document
  contract, same oracle SQL fragments.

Signal definitions (token-fraction variants of the Gopher char-fraction
rules, each mirrored exactly by the DuckDB oracle SQL in
``*_sql_exprs``):

- ``top_{n}gram_frac``  = count(most frequent n-gram) * n / n_tokens
  (0.0 when the document has fewer than n tokens).
- ``dup_{n}gram_frac``  = (occurrences of n-grams seen more than once)
  / total n-gram occurrences (0.0 when no n-grams).
- ``dup_line_frac``     = 1 - distinct(non-empty lines)/count(non-empty
  lines) (0.0 for single-line documents).

Tokens are the dedup module's normalized tokens (lowercase, ASCII
punctuation to spaces — regex-free hot path, see ``ops/text.py`` module
header for the measured java-regex ban); n-grams here are ALL contiguous
grams, NOT deduplicated, because repetition is exactly what dedup'd
shingles erase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.dedup import _norm_tokens, _with_shingles
from duckdb_mongo_spark.ops.partitioning import ensure_min_parallelism

__all__ = [
    "all_ngrams",
    "repetition_signals",
    "repetition_sql_exprs",
    "gopher_quality_filter",
    "decontaminate",
    "decontaminate_sql",
]


def all_ngrams(toks: Column, n: int) -> Column:
    """ALL contiguous word n-grams (non-distinct) of a MATERIALIZED
    token-array column; empty array when the document has < n tokens.

    ``toks`` must be a plain column reference (see
    ``dedup._shingles_of_tokens`` for the per-element re-evaluation trap
    this avoids). Grams concatenate n ``element_at`` lookups directly —
    the slice-then-join form measured 5.8x slower (``ops/dedup.py``).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    idx = F.sequence(F.lit(1), F.size(toks) - n + 1)

    def _gram(i):
        parts = []
        for j in range(n):
            if j:
                parts.append(F.lit(" "))
            parts.append(F.element_at(toks, i + j))
        return F.concat(*parts)

    # sequence(1, k) with k < 1 DESCENDS instead of yielding [] — guard.
    return F.when(F.size(toks) >= n, F.transform(idx, _gram)).otherwise(
        F.array().cast("array<string>")
    )


def _gram_counts(grams: Column) -> Column:
    """Occurrence count of each DISTINCT gram, aligned with
    ``array_distinct(grams)`` order."""
    return F.transform(
        F.array_distinct(grams), lambda g: F.size(F.filter(grams, lambda x: x == g))
    )


def _top_frac(toks: Column, n: int) -> Column:
    grams = all_ngrams(toks, n)
    top = F.array_max(_gram_counts(grams))
    return F.when(
        F.size(grams) > 0, top * n / F.size(toks)
    ).otherwise(F.lit(0.0)).cast("double")


def _dup_frac(toks: Column, n: int) -> Column:
    grams = all_ngrams(toks, n)
    dup_occ = F.aggregate(
        _gram_counts(grams),
        F.lit(0),
        lambda acc, c: acc + F.when(c > 1, c).otherwise(F.lit(0)),
    )
    return F.when(
        F.size(grams) > 0, dup_occ / F.size(grams)
    ).otherwise(F.lit(0.0)).cast("double")


def _dup_line_frac(text: Column) -> Column:
    # NB: pass an explicit lambda — `F.transform(arr, F.trim)` binds the
    # 2-arg (value, index) form and silently skips the trim.
    lines = F.filter(
        F.transform(F.split(text, "\n", -1), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    return F.when(
        F.size(lines) > 1,
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(F.lit(0.0)).cast("double")


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3),
    dup_ns: tuple[int, ...] = (5,),
    include_lines: bool = True,
    keep_cols: bool = False,
) -> DataFrame:
    """Per-document repetition signals as a zero-shuffle projection.

    Output: (id, n_tokens, top_{n}gram_frac..., dup_{n}gram_frac...
    [, dup_line_frac]); with ``keep_cols`` the input columns ride along
    (still one projection — no self-join). Tokens are materialized in
    their own projection step so every HOF lambda reads an attribute,
    not a recomputed expression.
    """
    df = ensure_min_parallelism(df)
    passthrough = [c for c in df.columns if keep_cols and c != id_col]
    toked = df.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        *([] if text_col in ([id_col] + passthrough) else [F.col(text_col)]),
        _norm_tokens(F.col(text_col)).alias("__toks"),
    )
    toks = F.col("__toks")
    cols = [F.col(id_col), *[F.col(c) for c in passthrough]]
    cols.append(F.size(toks).cast("bigint").alias("n_tokens"))
    for n in top_ns:
        cols.append(_top_frac(toks, n).alias(f"top_{n}gram_frac"))
    for n in dup_ns:
        cols.append(_dup_frac(toks, n).alias(f"dup_{n}gram_frac"))
    if include_lines:
        cols.append(_dup_line_frac(F.col(text_col)).alias("dup_line_frac"))
    return toked.select(*cols)


# DuckDB list-lambda mirrors of the Spark HOFs above. `t` = token list
# (the dedup `_SHINGLE_TOKS_SQL` expression, aliased upstream).
def repetition_sql_exprs(
    top_ns: tuple[int, ...] = (2, 3), dup_ns: tuple[int, ...] = (5,)
) -> list[str]:
    """Oracle SQL select-list (one expression per signal) over a CTE
    exposing ``t`` as the normalized token list. DuckDB list slices are
    1-based and inclusive on both ends: ``t[i:i+n-1]`` is n elements."""

    def grams(n: int) -> str:
        return (
            f"CASE WHEN len(t) >= {n} THEN "
            f"list_transform(generate_series(1, len(t) - {n} + 1), "
            f"i -> array_to_string(t[i:i+{n - 1}], ' ')) "
            "ELSE [] END"
        )

    def counts(g: str) -> str:
        return f"list_transform(list_distinct({g}), gg -> len(list_filter({g}, x -> x = gg)))"

    exprs = ["CAST(len(t) AS BIGINT) AS n_tokens"]
    for n in top_ns:
        g = grams(n)
        exprs.append(
            f"CASE WHEN len({g}) > 0 THEN "
            f"CAST(list_max({counts(g)}) * {n} AS DOUBLE) / len(t) "
            f"ELSE 0.0 END AS top_{n}gram_frac"
        )
    for n in dup_ns:
        g = grams(n)
        exprs.append(
            f"CASE WHEN len({g}) > 0 THEN "
            f"CAST(list_sum(list_transform({counts(g)}, c -> CASE WHEN c > 1 THEN c ELSE 0 END)) AS DOUBLE)"
            f" / len({g}) ELSE 0.0 END AS dup_{n}gram_frac"
        )
    return exprs


def gopher_quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_2gram_frac: float = 0.20,
    max_top_3gram_frac: float = 0.18,
    max_dup_5gram_frac: float = 0.15,
    max_dup_line_frac: float = 0.30,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    keep_col: str | None = None,
) -> DataFrame:
    """Gopher-rule repetition filter (token-fraction thresholds; the
    published defaults are char-fraction — same intent, documented
    deviation). With ``keep_col`` set, annotates instead of filtering —
    the audit-friendly form (count what you would drop before dropping).

    One projection + one filter, zero joins: signal columns are
    computed inline (``keep_cols=True``), so the whole filter composes
    into the scan stage.
    """
    sig = repetition_signals(
        df, id_col, text_col, top_ns=(2, 3), dup_ns=(5,), keep_cols=True
    )
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
        & (F.col("top_3gram_frac") <= max_top_3gram_frac)
        & (F.col("dup_5gram_frac") <= max_dup_5gram_frac)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
    )
    if keep_col is not None:
        return sig.withColumn(keep_col, keep)
    return sig.filter(keep).select(*[F.col(c) for c in df.columns])


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing >= 1 distinct word n-gram with the
    benchmark corpus (GPT-3's 13-gram decontamination rule, n
    configurable — use smaller n for short benchmark prompts).

    Returns ONLY contaminated documents: (id, n_grams, n_hits,
    hit_frac), where n_grams is the document's distinct-gram count and
    n_hits how many of those grams appear anywhere in the benchmark.
    Anti-join the result against the corpus to scrub it.

    Both sides use the dedup module's shingle contract (normalized
    tokens; a document with < n tokens contributes its whole normalized
    text as one gram — so very short exact matches are still caught).

    Plan: benchmark grams deduplicate and broadcast (eval suites are
    small by construction); the corpus-side join is then map-side, and
    the only shuffle is the per-document hit aggregation — bounded by
    the number of contaminated (doc, gram) pairs, not corpus size. Set
    ``broadcast_benchmark=False`` for an oversized benchmark to fall
    back to a hash join.
    """
    sh = _with_shingles(corpus, id_col, text_col, n)
    ex = sh.select(
        F.col(id_col),
        F.size("__sh").cast("bigint").alias("n_grams"),
        F.explode("__sh").alias("__gram"),
    )
    bench = (
        _with_shingles(benchmark, id_col, text_col, n)
        .select(F.explode("__sh").alias("__gram"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    return (
        ex.join(bench, "__gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
        .withColumn("hit_frac", (F.col("n_hits") / F.col("n_grams")).cast("double"))
    )


def decontaminate_sql(
    corpus_sql: str, benchmark_sql: str, id_col: str = "doc_id", n: int = 8
) -> str:
    """DuckDB oracle for ``decontaminate`` — same gram contract as the
    dedup oracles (short-document whole-text fallback included)."""
    toks = (
        "list_filter(string_split_regex(trim(regexp_replace(lower(text), "
        "'[^a-z0-9\\s]', ' ', 'g')), '\\s+'), x -> x <> '')"
    )

    def grams_cte(src: str, name: str) -> str:
        return f"""
    {name}_tk AS (SELECT {id_col}, {toks} AS t FROM ({src})),
    {name} AS (
        SELECT {id_col},
               CASE WHEN len(t) >= {n}
                    THEN list_distinct(list_transform(
                             generate_series(1, len(t) - {n} + 1),
                             i -> array_to_string(t[i:i+{n - 1}], ' ')))
                    ELSE [array_to_string(t, ' ')] END AS g
        FROM {name}_tk)"""

    return f"""
    WITH {grams_cte(corpus_sql, "cg")},
    {grams_cte(benchmark_sql, "bg")},
    ce AS (SELECT {id_col}, CAST(len(g) AS BIGINT) AS n_grams, unnest(g) AS gram FROM cg),
    be AS (SELECT DISTINCT unnest(g) AS gram FROM bg)
    SELECT ce.{id_col}, ce.n_grams, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(*) AS DOUBLE) / ce.n_grams AS hit_frac
    FROM ce JOIN be USING (gram)
    GROUP BY ce.{id_col}, ce.n_grams
    """
