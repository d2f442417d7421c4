"""PII detection/redaction and URL/domain operators.

Training-data curation scrubs personally-identifying strings (emails,
IPs, phone numbers, card-like digit runs) and manages provenance by URL
domain (per-domain caps a la RefinedWeb, domain-level stats). The
testdata corpus carries no PII/URLs, so these operators are proven by
pytest fixtures (synthetic corpora with known redactions) rather than a
driver ledger entry.

Regex note: detection is inherently regex work, and java.util.regex
degrades badly under executor-thread concurrency (see ``ops/text.py``
module header — measured ~65x per char at local[32]). PII scrubbing is
a one-time curation PASS over the corpus, not a per-query hot path, so
the java-regex cost is paid once; for repeated scans at 100 TB, the
``mask_pii_arrow`` variant runs the same patterns through pyarrow's RE2
(``replace_substring_regex``, measured 9x faster under thread
concurrency and immune to the contention cliff).

Patterns stay inside the RE2-compatible subset (no lookbehind, no
backreferences) so the Spark (java regex), pyarrow (RE2), and DuckDB
(RE2) forms are the SAME STRING — one definition, three engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "count_pii",
    "detect_pii",
    "mask_pii",
    "mask_pii_arrow",
    "extract_urls",
    "url_domain",
    "with_url_stats",
    "cap_per_domain",
]

# Order matters: card before phone (a 16-digit run must not be half-eaten
# as a phone number), email before url-ish bare hosts. All patterns are
# valid in java.util.regex, RE2 (pyarrow/DuckDB) alike.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b(?:\d[ -]?){13,16}\b",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
            r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b",
    "phone": r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}",
}

_URL_RE = r"https?://[^\s<>\"']+"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def count_pii(col, kinds: tuple[str, ...] | None = None) -> dict[str, Column]:
    """Per-kind match-count columns (regexp_extract_all + size — the
    codegen-friendly counting form, see SCALE.md on regexp_count)."""
    kinds = tuple(kinds or PII_PATTERNS)
    c = _c(col)
    return {
        k: F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[k]), F.lit(0))).alias(f"n_{k}")
        for k in kinds
    }


def detect_pii(
    df: DataFrame, text_col: str = "text", kinds: tuple[str, ...] | None = None
) -> DataFrame:
    """Annotate each row with per-kind PII match counts and a ``has_pii``
    flag. Pure projection — zero shuffle."""
    counts = count_pii(F.col(text_col), kinds)
    out = df.select("*", *counts.values())
    flag = None
    for k in counts:
        e = F.col(f"n_{k}") > 0
        flag = e if flag is None else (flag | e)
    return out.withColumn("has_pii", flag)


def mask_pii(
    col,
    kinds: tuple[str, ...] | None = None,
    token: str = "<{kind}>",
) -> Column:
    """Replace every PII match with ``token`` (``{kind}`` expands to the
    pattern name, uppercased). Chained regexp_replace, applied in
    PII_PATTERNS declaration order."""
    kinds = tuple(kinds or PII_PATTERNS)
    c = _c(col)
    for k in PII_PATTERNS:
        if k not in kinds:
            continue
        c = F.regexp_replace(c, PII_PATTERNS[k], token.format(kind=k.upper()))
    return c


def mask_pii_arrow(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
    token: str = "<{kind}>",
) -> DataFrame:
    """RE2-vectorized masking via an Arrow-batched ``mapInPandas`` —
    identical semantics to ``mask_pii`` (same pattern strings, RE2
    subset), for repeated-scan workloads where java-regex thread
    contention dominates. Schema is preserved; only ``text_col``
    changes."""
    kinds = tuple(k for k in PII_PATTERNS if k in (kinds or PII_PATTERNS))
    schema = df.schema
    pats = [(PII_PATTERNS[k], token.format(kind=k.upper())) for k in kinds]

    def _mask(batches):
        import pyarrow.compute as pc  # noqa: deferred — executor-side

        for pdf in batches:
            s = pdf[text_col]
            import pandas as pd

            arr = None
            for pat, rep in pats:
                if arr is None:
                    import pyarrow as pa

                    arr = pa.Array.from_pandas(s.astype("string"))
                arr = pc.replace_substring_regex(arr, pattern=pat, replacement=rep)
            if arr is not None:
                pdf = pdf.copy()
                pdf[text_col] = arr.to_pandas()
            yield pdf

    return df.mapInPandas(_mask, schema=schema)


def extract_urls(col) -> Column:
    """Array of http(s) URLs found in the text."""
    return F.regexp_extract_all(_c(col), F.lit(_URL_RE), F.lit(0))


def url_domain(col, strip_www: bool = True) -> Column:
    """Registrable-ish host of a URL column: ``parse_url(.., 'HOST')``
    lowercased, optionally with a leading ``www.`` stripped. NULL for
    non-URLs (parse_url's contract)."""
    host = F.lower(F.parse_url(_c(col), F.lit("HOST")))
    if strip_www:
        host = F.when(
            host.startswith("www."), F.substring(host, 5, 2 ** 30)
        ).otherwise(host)
    return host


def with_url_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Annotate rows with ``urls`` (array), ``n_urls`` and
    ``main_domain`` (domain of the first URL). Pure projection."""
    urls = extract_urls(F.col(text_col))
    return df.select(
        "*",
        urls.alias("urls"),
        F.size(urls).alias("n_urls"),
        # try_element_at: ANSI mode errors on element_at over an empty array
        url_domain(F.try_element_at(urls, F.lit(1))).alias("main_domain"),
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    max_docs: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``max_docs`` rows per domain, chosen DETERMINISTICALLY
    by md5(salt, id) — the RefinedWeb-style per-source cap, reproducible
    across runs/engines/partitionings (same contract as ops/sampling).

    One shuffle (window over domain). A pathologically hot domain is one
    window partition; since only ``max_docs`` winners survive, pre-filter
    skew with an AQE skew hint or a two-phase per-partition pre-cap if a
    single domain exceeds executor memory.
    """
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    from pyspark.sql import Window

    key = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(domain_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= max_docs)
        .drop("__rk")
    )
