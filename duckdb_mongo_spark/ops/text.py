"""Text analysis operators for document tables.

All operators are pure ``pyspark.sql.functions`` compositions (JVM-side,
whole-stage-codegen'd — no Python in the executor hot path), and each has
an exact ANSI-SQL equivalent so a DuckDB oracle can verify values.

Operators: token counting (whitespace + BPE-ish word/punct regex),
quality scoring (length/punctuation/stopword/token-shape ratios),
language ID (marker-word n-gram heuristic), document fingerprinting
(normalized md5 + positional rolling sample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenization: word pieces OR single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"

STOPWORDS_EN = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

# marker words per language for the n-gram language-ID heuristic;
# deliberately tiny and deterministic so the SQL oracle can mirror it
LANG_MARKERS = {
    "en": ["the", "and", "is", "of", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "los", "es", "de"],
}


def token_count(col) -> Column:
    """Whitespace token count (empty tokens excluded)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != F.lit("")))


def bpe_token_count(col) -> Column:
    """BPE-ish token count: word pieces + punctuation marks.

    size(regexp_extract_all(...)) measured ~8x faster than
    ``regexp_count`` here (Spark 4.1 evaluates RegExpCount outside
    whole-stage codegen), despite materializing the match array."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0)))


def punct_ratio(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (lowercased) stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.regexp_replace(t, r"[^a-z]", ""))))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def with_text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Adds n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio,
    avg_token_len.

    The token array is materialized ONCE as a real column before any
    higher-order function touches it: Spark evaluates HOF lambda bodies
    per element, so an inline split/regexp expression inside a lambda
    would be recomputed per token (~10-50× slowdown on real documents).
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    base = [F.col(c) for c in df.columns]
    toked = df.select(
        *base, F.filter(F.split(F.col(col), r"\s+"), lambda x: x != F.lit("")).alias("__toks")
    )
    toks = F.col("__toks")
    return toked.select(
        *base,
        F.size(toks).alias("n_tokens"),
        bpe_token_count(col).alias("n_bpe_tokens"),
        punct_ratio(col).alias("punct_ratio"),
        F.when(
            F.size(toks) > 0,
            F.size(
                F.filter(
                    F.transform(toks, F.lower),
                    lambda t: F.array_contains(sw, F.regexp_replace(t, r"[^a-z]", "")),
                )
            )
            / F.size(toks),
        ).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(
            F.size(toks) > 0,
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            / F.size(toks),
        ).otherwise(F.lit(0.0)).alias("avg_token_len"),
    )


def quality_score(col) -> Column:
    """Deterministic [0,1] quality score from cheap surface statistics.

    score = 0.3*len_score + 0.3*(1-punct_excess) + 0.4*stopword_presence
    — the shape of C4/Gopher-style heuristic filters, exactly
    reproducible in SQL.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    p = punct_ratio(c)
    punct_score = F.lit(1.0) - F.least(p * 5.0, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 4.0, F.lit(1.0))
    return F.round(0.3 * len_score + 0.3 * punct_score + 0.4 * sw_score, 6)


def _language_id_from_toks(toks) -> Column:
    """argmax over per-language marker counts from a MATERIALIZED
    lowercase token array column; ties broken by language code order;
    'und' when nothing matches."""
    counts = {
        lang: F.size(
            F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(m) for m in markers]), t))
        )
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)  # deterministic tie order
    best_count = F.greatest(*[counts[l] for l in langs])
    out = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (applied last)
        out = F.when((counts[lang] > 0) & (counts[lang] == best_count), F.lit(lang)).otherwise(out)
    return out


def _lang_tokens(col) -> Column:
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return F.filter(
        F.split(F.regexp_replace(c, r"[^a-z\s]", " "), r"\s+"),
        lambda x: x != F.lit(""),
    )


def language_id(col) -> Column:
    """Marker-word language ID (one-shot column form; hot paths should
    materialize the token array and use ``_language_id_from_toks``)."""
    return _language_id_from_toks(_lang_tokens(col))


def fingerprint(col) -> Column:
    """Document fingerprint: md5 over lowercase whitespace-normalized text."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(normalized)


def with_analysis(df: DataFrame, col: str = "text") -> DataFrame:
    """Full text-analysis bundle: stats + quality + language + fingerprint.

    quality is derived from the already-computed ratio columns (one
    evaluation per ratio — keeps the codegen'd expression tree small)."""
    out = with_text_stats(df, col)
    n = F.length(F.col(col))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    sw_score = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    stats = [F.col(c) for c in out.columns]
    with_lt = out.select(
        *stats,
        F.round(0.3 * len_score + 0.3 * punct_score + 0.4 * sw_score, 6).alias("quality"),
        _lang_tokens(col).alias("__lt"),
    )
    return with_lt.select(
        *stats,
        F.col("quality"),
        _language_id_from_toks(F.col("__lt")).alias("lang_id"),
        fingerprint(col).alias("fingerprint"),
    )


# --- SQL oracle templates (DuckDB dialect) ---------------------------------

def token_count_sql(col: str = "text") -> str:
    return (
        f"len(list_filter(string_split_regex({col}, '\\s+'), x -> x <> ''))"
    )


def bpe_token_count_sql(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_TOKEN_RE}'))"


def punct_ratio_sql(col: str = "text") -> str:
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"(length({col}) - length(regexp_replace({col}, '[^\\w\\s]', '', 'g')))"
        f" / CAST(length({col}) AS DOUBLE) ELSE 0.0 END"
    )


def stopword_ratio_sql(col: str = "text", stopwords: list[str] | None = None) -> str:
    sw = ", ".join(f"'{w}'" for w in (stopwords or STOPWORDS_EN))
    toks = f"list_filter(string_split_regex(lower({col}), '\\s+'), x -> x <> '')"
    hits = (
        f"len(list_filter({toks}, t -> list_contains([{sw}], "
        f"regexp_replace(t, '[^a-z]', '', 'g'))))"
    )
    return (
        f"CASE WHEN len({toks}) > 0 THEN {hits} / CAST(len({toks}) AS DOUBLE) "
        f"ELSE 0.0 END"
    )


def quality_score_sql(col: str = "text") -> str:
    len_score = f"least(length({col}) / 500.0, 1.0)"
    punct_score = f"(1.0 - least(({punct_ratio_sql(col)}) * 5.0, 1.0))"
    sw_score = f"least(({stopword_ratio_sql(col)}) * 4.0, 1.0)"
    return f"round(0.3*{len_score} + 0.3*{punct_score} + 0.4*{sw_score}, 6)"


def language_id_sql(col: str = "text") -> str:
    toks = (
        f"list_filter(string_split_regex("
        f"regexp_replace(lower({col}), '[^a-z\\s]', ' ', 'g'), '\\s+'), x -> x <> '')"
    )
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        counts[lang] = f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"
    langs = sorted(LANG_MARKERS)
    greatest = "greatest(" + ", ".join(counts[l] for l in langs) + ")"
    whens = " ".join(
        f"WHEN {counts[l]} > 0 AND {counts[l]} = {greatest} THEN '{l}'" for l in langs
    )
    return f"CASE {whens} ELSE 'und' END"


def fingerprint_sql(col: str = "text") -> str:
    return f"md5(trim(regexp_replace(lower({col}), '\\s+', ' ', 'g')))"
