"""Exact-substring span deduplication: remove duplicated ≥k-token spans
from a corpus, keeping one canonical occurrence.

Whole-document dedup (exact or near-dup, ``ops/dedup.py``) misses the
dominant real-world duplication mode: boilerplate PARAGRAPHS repeated
across otherwise-distinct pages (licenses, navigation text, quoted
passages). The published remedy is exact substring deduplication at the
span level (suffix-array dedup in "Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022): any k-token window occurring
more than once in the corpus keeps its FIRST occurrence and is cut
everywhere else.

Distributed design (no suffix array — a grouped k-gram equi-join gives
the same duplicated-window relation):

1. tokenize once (the dedup module's regex-free normalizer), explode to
   ``(doc, pos, gram_hash)`` — gram hashed to its md5 64-bit prefix so
   the shuffle carries 8-byte keys, never k-token strings;
2. group by hash: occurrence count + the canonical owner = lexicographic
   min ``(doc, pos)``; hot grams past ``max_gram_freq`` are dropped
   (boilerplate caps the group size exactly like the Jaccard
   stop-shingle cap — they are guaranteed-kept text anyway, since their
   owner occurrence survives);
3. every non-owner occurrence marks span ``[pos, pos + k)`` for removal;
4. per document, overlapping/adjacent spans merge via one window pass
   (classic island detection: a span whose start exceeds the running
   max end so far opens a new island);
5. ``remove_duplicate_spans`` rebuilds the text with covered token
   positions filtered out — pure higher-order functions, no UDFs.

Shuffles: one on gram hash (bounded by occurrence count, capped), one
window on doc id. Hash collisions (64-bit) can at worst remove a
non-duplicated span at ~2^-64 per gram pair — the standard trade
(the paper's suffix approach is exact; a verify-join against true gram
strings would close even that at 2x shuffle width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.dedup import _norm_tokens
from duckdb_mongo_spark.ops.partitioning import ensure_min_parallelism


def _gram_hash(toks: Column, pos: Column, k: int) -> Column:
    """64-bit md5 prefix of the k tokens starting at 1-based ``pos``."""
    gram = F.array_join(F.slice(toks, pos, k), " ")
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("bigint")


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    max_gram_freq: int = 1000,
    exact_grams: bool = False,
) -> DataFrame:
    """Merged token spans to REMOVE per document: ``(id, span_start,
    span_end)`` with 0-based start, exclusive end. The first occurrence
    (lexicographic min over (doc, pos)) of every duplicated k-gram is
    the canonical copy and is never marked; later occurrences — in other
    documents or later in the same document — are.

    ``max_gram_freq`` drops grams occurring more often (hot boilerplate
    would explode the join; its first occurrence is kept regardless, so
    the cap trades completeness of REMOVAL, never correctness of KEPT
    text).

    ``exact_grams=True`` keys the duplicate relation on the gram TEXT
    instead of its 64-bit md5 prefix — zero collision risk (matching the
    suffix-array approach exactly) at the cost of shuffling k-token
    strings instead of 8-byte hashes. The default hash mode mis-marks a
    span only when two distinct k-grams collide in 64 bits (~2^-64 per
    pair)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = ensure_min_parallelism(df)
    toked = df.select(
        F.col(id_col), _norm_tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    n = F.size(toks)

    def _key(p):
        if exact_grams:
            return F.array_join(F.slice(toks, p, k), " ")
        return _gram_hash(toks, p, k)

    empty_t = "array<string>" if exact_grams else "array<bigint>"
    occ = toked.select(
        F.col(id_col),
        F.posexplode(
            F.when(
                n >= k,
                F.transform(F.sequence(F.lit(1), n - k + 1), _key),
            ).otherwise(F.array().cast(empty_t))
        ).alias("__pos0", "__h"),
    )
    # duplicate relation via ONE window pass over the occurrences: the
    # agg-then-join-back formulation computes the same thing but makes
    # Spark scan+tokenize+explode the corpus TWICE (once per join side)
    # and sort-merge-join the full gram-keyed stream — at sf10 that was
    # 2x the tokenize work and 3x the gram-string shuffle volume for
    # zero semantic difference. One Exchange(__h) + sort feeds both the
    # count and the canonical-owner min; each (doc, pos) occurrence
    # appears exactly once, so no post-join distinct is needed either.
    wh = Window.partitionBy("__h")
    marked = (
        occ.withColumn("__cnt", F.count(F.lit(1)).over(wh))
        .withColumn(
            "__owner",
            F.min(F.struct(F.col(id_col), F.col("__pos0"))).over(wh),
        )
        .filter(
            (F.col("__cnt") > 1)
            & (F.col("__cnt") <= max_gram_freq)
            & ~(
                (F.col(id_col) == F.col("__owner").getField(id_col))
                & (F.col("__pos0") == F.col("__owner.__pos0"))
            )
        )
        .select(F.col(id_col), F.col("__pos0").alias("__start"))
    )
    # island merge: spans [start, start+k) per doc, ordered by start
    w = Window.partitionBy(id_col).orderBy("__start")
    prev_max_end = F.max(F.col("__start") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull() | (F.col("__start") > prev_max_end), 1
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new_island").over(w))
    return (
        islands.groupBy(id_col, "__island")
        .agg(
            F.min("__start").cast("long").alias("span_start"),
            (F.max("__start") + k).cast("long").alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def remove_duplicate_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "dedup_text",
) -> DataFrame:
    """Rebuild each document's normalized text with the span-covered
    token positions removed (``out_col``), plus ``n_tokens_removed``.
    Documents with no spans pass through intact (left join). Output text
    is the NORMALIZED token stream re-joined with single spaces — the
    same canonical form every dedup operator in this package compares
    on."""
    agg_spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    # materialize the token array in its own projection BEFORE any HOF
    # references it — an expression-typed `toks` re-evaluates the
    # normalizer per use (and per lambda element), the 10-50x trap
    # documented in ops/text.py
    out = df.join(agg_spans, id_col, "left").withColumn(
        "__toks", _norm_tokens(F.col(text_col))
    )
    toks = F.col("__toks")
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    kept = F.filter(
        F.zip_with(toks, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.coalesce(F.col("__spans"), F.array()),
            lambda sp: (s.getField("i") >= sp.getField("span_start"))
            & (s.getField("i") < sp.getField("span_end")),
        ),
    )
    return (
        out.withColumn("__kept", F.when(F.size(toks) > 0, kept).otherwise(F.array()))
        .withColumn(out_col, F.array_join(F.transform("__kept", lambda s: s.getField("t")), " "))
        .withColumn(
            "n_tokens_removed",
            (F.size(toks) - F.size("__kept")).cast("long"),
        )
        .drop("__spans", "__kept", "__toks")
    )
