"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Spark-first design for 100 TB:

- exact dedup = hash groupBy on the dedup key (single shuffle, map-side
  partial aggregation)
- n-gram Jaccard = explode shingles → self-join on shingle → pair
  intersection counts (no pairwise cross join; ``max_doc_freq`` drops
  stop-shingles to cap join skew, the standard big-corpus trick)
- MinHash+LSH = k md5-permutation minhashes → band hashes → bucket join
  produces candidates only (sub-quadratic), then exact-Jaccard verify
- SimHash = per-token 16-bit md5 projections, bit-majority vote via one
  groupBy

Hashes are md5-based so a DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHINGLE_WORDS = 3


def _norm_tokens(col):
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9\s]", " ")), r"\s+"),
        lambda x: x != F.lit(""),
    )


def _shingles_of_tokens(toks, n: int = SHINGLE_WORDS):
    """Distinct word n-gram shingles of an ALREADY-MATERIALIZED token
    array column.

    ``toks`` must be a plain column reference, not an expression: Spark
    evaluates a higher-order-function lambda body per element, so an
    inline token expression (regexp+split) would be recomputed for every
    shingle — the difference is ~50× on realistic documents.
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    # short docs (< n tokens): single shingle of the whole normalized text
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def shingle_array(col, n: int = SHINGLE_WORDS):
    """Distinct word n-gram shingles of the normalized text (one-shot
    column form — fine for small data / tests; hot paths should
    materialize tokens first via ``_with_shingles``)."""
    return _shingles_of_tokens(_norm_tokens(col), n)


def _with_shingles(df: DataFrame, id_col: str, text_col: str, n: int = SHINGLE_WORDS):
    """(id, __sh) projection with tokens materialized in their own
    projection step so the shingle lambda reads an attribute."""
    toked = df.select(F.col(id_col), _norm_tokens(F.col(text_col)).alias("__toks"))
    return toked.select(
        F.col(id_col), _shingles_of_tokens(F.col("__toks"), n).alias("__sh")
    )


def exact_duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Groups of exact duplicates: key cols + n_dups + representative id."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row per distinct key: the minimum id (deterministic)."""
    keep = df.groupBy(*cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=[*cols, id_col], how="inner")


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = SHINGLE_WORDS) -> DataFrame:
    return _with_shingles(df, id_col, text_col, n).select(
        F.col(id_col).alias("doc"), F.explode(F.col("__sh")).alias("shingle")
    )


def near_dup_pairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n: int = SHINGLE_WORDS,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard ≥ threshold.

    Columns: a, b, inter, size_a, size_b, jaccard (rounded to 6).
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(freq.filter(F.col("df_") <= max_doc_freq), "shingle").drop("df_")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("a"), F.col("b.doc").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        _jaccard_scores(inter, sizes)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "inter", "size_a", "size_b", "jaccard")
    )


def _jaccard_scores(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """Attach size_a/size_b and the rounded Jaccard score to an
    (a, b, inter) pair frame — the ONE definition of the score used by
    both the exact path and the LSH-verified path, so they cannot
    diverge (the bucketed-⊆-exact equal-scores contract depends on it).
    """
    return (
        inter.join(sizes.select(F.col("doc").alias("a"), F.col("sz").alias("size_a")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("sz").alias("size_b")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
            ),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, n: int = SHINGLE_WORDS
) -> DataFrame:
    """k-permutation MinHash signature per doc.

    Permutations come in groups of four per md5 digest: digest j =
    md5(j || ':' || shingle) (j = i // 4), and permutation i takes the
    8-hex-char slice (i % 4) of its digest — a 128-bit digest yields
    four independent 32-bit hash functions, so k=4 costs ONE md5 per
    shingle instead of four (the md5 calls dominate signature cost; the
    slice trick measured ~2x end-to-end on the sf0.1 bench). The
    minhash is the lexicographic min of the hex slices (= numeric min
    of the 32-bit values; engine-portable, no native hash dependence).
    Output: id + minhash_0..minhash_{k-1}.

    Scale note: computed per-row with ``array_min(transform(...))`` —
    a pure map (whole-stage codegen, zero shuffle), unlike the naive
    explode→groupBy which shuffles every shingle. At 100 TB the shuffle
    would dominate; this form scales linearly with input splits.
    """
    with_sh = _with_shingles(df, id_col, text_col, n)

    # factories returning STRICTLY one-arg lambdas: a two-arg lambda
    # (even via default args) would receive the element INDEX as its
    # second argument and clobber the closure value
    def digest(prefix: str):
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    def hex_slice(pos: int):
        return lambda h: F.substring(h, pos, 8)

    n_digests = (k + 3) // 4
    digest_cols = [
        F.transform(F.col("__sh"), digest(f"{j}:")).alias(f"__dg{j}")
        for j in range(n_digests)
    ]
    digested = with_sh.select(F.col(id_col), *digest_cols)
    cols = [
        F.array_min(
            F.transform(F.col(f"__dg{i // 4}"), hex_slice((i % 4) * 8 + 1))
        ).alias(f"minhash_{i}")
        for i in range(k)
    ]
    return digested.select(F.col(id_col), *cols)


def near_dup_pairs_minhash_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 8,
    bands: int = 4,
    n: int = SHINGLE_WORDS,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact Jaccard verification.

    Bands of k/bands rows each; candidates = pairs sharing any band
    bucket. Verification computes exact Jaccard ONLY over candidate
    pairs: candidate (a, b) is joined to a's shingles, then matched to
    b's shingles on (b, shingle), and only that restricted set hits the
    intersection groupBy — sub-quadratic end-to-end. (An all-pairs
    shingle self-join before candidate restriction would defeat LSH at
    scale: at 100 TB the self-join output is O(corpus²) in hot
    shingles while the candidate set is ~linear.)
    """
    assert k % bands == 0
    rows = k // bands
    sig = minhash_signatures(df, id_col, text_col, k=k, n=n)
    band_cols = []
    for bidx in range(bands):
        parts = [F.col(f"minhash_{bidx * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(bidx).alias("band"), F.md5(F.concat_ws("|", *parts)).alias("bucket"))
        )
    buckets = sig.select(
        F.col(id_col).alias("doc"), F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    l, r = buckets.alias("l"), buckets.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("a"), F.col("r.doc").alias("b"))
        .distinct()
    )
    sh = exploded_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    # candidate-restricted intersection: shingles of a for each candidate
    # pair, matched against b's shingles — never an all-pairs self-join
    a_sh = cands.join(sh.select(F.col("doc").alias("a"), "shingle"), "a")
    inter = (
        a_sh.join(sh.select(F.col("doc").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        _jaccard_scores(inter, sizes)
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """SimHash over distinct normalized tokens.

    Token projection = first 4 hex chars of md5(token) → 16-bit int;
    per bit: majority vote (+1 if set, −1 if clear); simhash bit = 1
    iff vote > 0. Output: id + simhash (BIGINT).

    Computed per row (token hashes materialized once, one aggregate per
    bit over the array) — ZERO shuffles, like minhash; the explode +
    groupBy formulation shuffles every token at scale.
    """
    toked = df.select(
        F.col(id_col),
        F.array_distinct(_norm_tokens(F.col(text_col))).alias("__toks"),
    ).filter(F.size("__toks") > 0)  # token-less docs have no simhash (as
    # in the explode formulation and the unnest-based oracle)
    hashed = toked.select(
        F.col(id_col),
        F.transform(
            F.col("__toks"),
            lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long"),
        ).alias("__hv"),
    )

    # ONE pass over the hash array: the accumulator is the vector of
    # per-bit votes (zip_with merge), instead of `bits` separate
    # aggregate() passes — smaller codegen, same result
    zero = F.array_repeat(F.lit(0).cast("long"), bits)
    idx = F.sequence(F.lit(0), F.lit(bits - 1))

    def bit_votes(x):
        # vote_b = 2*bit_b(x) - 1, with bit_b = floor(x / 2^b) % 2 — a
        # single transform over the bit-index sequence instead of `bits`
        # unrolled when-branches (a 16x smaller expression tree; the
        # unrolled form cost ~1 s of Catalyst analysis per query build).
        # Exact in doubles: x < 2^bits << 2^53.
        return F.transform(
            idx,
            lambda b: (
                F.floor(x / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2
            ) * 2 - 1,
        )

    votes = F.aggregate(
        F.col("__hv"), zero, lambda acc, x: F.zip_with(acc, bit_votes(x), lambda a, b: a + b)
    )
    voted = hashed.select(F.col(id_col), votes.alias("__votes"))
    weights = F.array(*[F.lit(2 ** b).cast("long") for b in range(bits)])
    sim = F.aggregate(
        F.zip_with(
            F.col("__votes"), weights,
            lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return voted.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a, b):
    """Hamming distance between two BIGINT hash values (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
