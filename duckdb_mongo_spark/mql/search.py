"""``$search`` (Atlas Search) — a deterministic local subset.

The reference ships ``$search`` pipelines to Atlas verbatim (it is a
server-side stage, like ``$vectorSearch``); this module is the hermetic
stand-in so manual ``pipeline :=`` queries using it are executable and
testable. Implemented operators: ``text`` (BM25 relevance; r9 adds
``fuzzy`` — whole-term Levenshtein expansion against the corpus term
dictionary, scored as an ordinary BM25 disjunction), ``phrase``
(token subsequence with ``slop``), ``autocomplete`` (prefix matching,
tokenOrder any/sequential, fuzzy via prefix edit distance — r8),
``near`` (numeric/date proximity, pivot/(pivot+dist) — r8),
``wildcard`` (keyword-field glob, whole un-analyzed value — r8),
``regex`` (Lucene RegExp dialect over keyword fields — r9,
``_lucene_regex_source``), ``embeddedDocument`` (per-array-element
nested-document evaluation with score aggregation — r9,
``_eval_embedded_document``), ``geoWithin``/``geoShape`` (point
documents vs circle/box/GeoJSON geometries — r9, planar ray-cast pin
shared with ``mql/match``), ``equals``, ``range``, ``exists``,
``in``, and ``compound``
(must/should/mustNot/filter with ``minimumShouldMatch``); plus
``$searchMeta`` ``count`` and ``facet`` (string/number/date buckets —
r8, ``facet_meta``). Score options: ``boost`` (value or path),
``constant``, and doc-local ``function`` expression trees (r8).
Scores follow Lucene's BM25 (k1=1.2, b=0.75,
idf = ln(1 + (N - df + 0.5)/(df + 0.5))) and surface through
``{$meta: "searchScore"}``. Results return in descending score order
(Atlas relevance order); ties keep input order.

Analyzer: the pinned engine-wide contract in ``_analyze`` (lowercase +
alphanumeric-codepoint runs; see its docstring). ``queryString``
translates its Lucene-syntax subset to these operators
(``parse_query_string`` — one shared translation, so routing comes
free). ``moreLikeThis`` pins to a text-should disjunction over the
like-documents' analyzed string paths (``translate_more_like_this``
— Atlas's representative-term selection is index-statistic-bound and
unpublished; ALL terms is the deterministic superset). Constructs
whose semantics cannot be pinned without live index metadata or
Lucene's automaton algebra — analyzed-field wildcard/regex,
``text.synonyms``/``matchCriteria``, and the ``regex`` automaton
operators ``~`` ``&`` ``<n-m>`` ``#`` — raise loudly (no silent
best-effort), so a pipeline that needs a live Atlas index fails
visibly. Unknown options on any operator raise rather than silently
changing relevance (r9).
"""

from __future__ import annotations

import math

from duckdb_mongo_spark.mql.match import MISSING, compare_values, get_path

_K1 = 1.2
_B = 0.75

def _analyze(text) -> list[str]:
    """lucene.standard-ish analyzer, pinned as the engine-wide
    tokenizer CONTRACT (r8): lowercase the text (CPython full case
    mapping), then emit maximal runs of alphanumeric codepoints
    (``str.isalnum`` — Unicode L* + Nd/Nl/No; underscores, marks and
    punctuation separate). On ASCII text this is exactly runs of
    ``[0-9a-z]`` — the JVM twin (``frame._tokens_of``) reproduces that
    fast path in whole-stage codegen, and NON-ASCII corpora route
    through an Arrow pass running THIS function (parity by
    construction, no Python-vs-JVM case-table skew)."""
    if not isinstance(text, str):
        return []
    out: list[str] = []
    cur: list[str] = []
    for ch in text.lower():
        if ch.isalnum():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _paths(spec) -> list[str]:
    p = spec["path"]
    return [p] if isinstance(p, str) else list(p)


def _field_tokens(doc, path, analyze=_analyze) -> list[str]:
    v = get_path(doc, path)
    if v is MISSING:
        return []
    if isinstance(v, list):
        out = []
        for el in v:
            out.extend(analyze(el))
        return out
    return analyze(v)


class _Corpus:
    """Per-query corpus statistics for BM25 (built once per $search).
    ``field_tokens`` pluggable since r10: a search-index definition may
    assign per-path analyzers (``mql/search_index``)."""

    def __init__(self, docs: list[dict], paths: list[str],
                 field_tokens=_field_tokens):
        self.n = len(docs)
        self.tokens = []   # per doc: {path: [tokens]}
        df = {}            # (path, term) -> doc freq
        total_len = {p: 0 for p in paths}
        for d in docs:
            per = {}
            for p in paths:
                toks = field_tokens(d, p)
                per[p] = toks
                total_len[p] += len(toks)
                for t in set(toks):
                    df[(p, t)] = df.get((p, t), 0) + 1
            self.tokens.append(per)
        self.df = df
        self.avg_len = {
            p: (total_len[p] / self.n if self.n else 0.0) for p in paths
        }

    def idf(self, path, term) -> float:
        d = self.df.get((path, term), 0)
        return math.log(1.0 + (self.n - d + 0.5) / (d + 0.5))

    def vocab(self, path) -> list[str]:
        """Distinct corpus terms for one path (the local stand-in for
        the Lucene term dictionary a fuzzy query expands against)."""
        cache = getattr(self, "_vocab", None)
        if cache is None:
            cache = self._vocab = {}
        if path not in cache:
            cache[path] = sorted(
                t for (p, t) in self.df if p == path)
        return cache[path]

    def fuzzy_expand(self, path, terms, max_edits, prefix_length):
        """Expand each query term to every corpus term of ``path``
        within ``max_edits`` Levenshtein edits after an exact
        ``prefix_length`` head (r9 — the pinned ``text.fuzzy``
        semantics; see ``_eval_operator``). Expansions concatenate per
        query term, so a corpus term reachable from two query terms
        contributes twice, like two disjuncts in a boolean query."""
        cache = getattr(self, "_fuzzy", None)
        if cache is None:
            cache = self._fuzzy = {}
        out = []
        for q in terms:
            key = (path, q, max_edits, prefix_length)
            if key not in cache:
                cache[key] = [
                    t for t in self.vocab(path)
                    if _within_edits(q, t, max_edits, prefix_length)]
            out.extend(cache[key])
        return out

    def bm25(self, i: int, path: str, terms: list[str]) -> float:
        toks = self.tokens[i].get(path)
        if toks is None:
            toks = []
        score = 0.0
        dl, avg = len(toks), self.avg_len.get(path, 0.0)
        norm = _K1 * (1.0 - _B + (_B * dl / avg if avg else 0.0))
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            score += self.idf(path, t) * (tf * (_K1 + 1.0)) / (tf + norm)
        return score


def _within_edits(q: str, t: str, max_edits: int,
                  prefix_length: int = 0) -> bool:
    """Full-term fuzzy test (``text.fuzzy``, r9): after an exact
    ``prefix_length`` head, the whole remainder of the corpus term must
    be within ``max_edits`` Levenshtein edits (single-character
    insert/delete/substitute — Atlas's documented definition of an
    edit) of the query term's remainder. Contrast with
    ``_fuzzy_prefix_match``: autocomplete fuzziness is PREFIX edit
    distance (search-as-you-type), text fuzziness is whole-term."""
    if prefix_length:
        if len(q) < prefix_length or len(t) < prefix_length \
                or q[:prefix_length] != t[:prefix_length]:
            return False
        q, t = q[prefix_length:], t[prefix_length:]
    if abs(len(q) - len(t)) > max_edits:
        return False
    prev = list(range(len(t) + 1))
    for i, qc in enumerate(q, 1):
        cur = [i]
        for j, tc in enumerate(t, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (qc != tc)))
        if min(cur) > max_edits:
            return False  # the band can only grow from here
        prev = cur
    return prev[-1] <= max_edits


def _prefix_edit_distance(q: str, t: str) -> int:
    """min over prefixes t' of t of editdist(q, t') — the natural
    fuzzy-PREFIX metric for search-as-you-type: how many edits to turn
    the typed query term into the START of the token. One Levenshtein
    DP over (q, t); the answer is the minimum of the final row."""
    prev = list(range(len(q) + 1))
    best = prev[-1]
    for ch in t:
        cur = [prev[0] + 1]
        for i, qc in enumerate(q):
            cur.append(min(prev[i] + (qc != ch),   # substitute/keep
                           prev[i + 1] + 1,        # delete from q...
                           cur[i] + 1))            # insert into q
        prev = cur
        best = min(best, prev[-1])
    return best


def _fuzzy_prefix_match(q: str, t: str, max_edits: int,
                        prefix_length: int) -> bool:
    """Pinned fuzzy-autocomplete term test: the first ``prefix_length``
    characters must match exactly (Atlas fuzzy.prefixLength), then the
    remainder of the query term must be within ``max_edits`` prefix
    edit distance of the token's remainder."""
    if prefix_length:
        if len(q) < prefix_length or len(t) < prefix_length \
                or q[:prefix_length] != t[:prefix_length]:
            return False
        q, t = q[prefix_length:], t[prefix_length:]
    if not q:
        return True
    return _prefix_edit_distance(q, t) <= max_edits


def _autocomplete_matches(tokens: list[str], qterms: list[str],
                          token_order: str, fuzzy=None) -> bool:
    """Search-as-you-type prefix matching — the engine's pinned
    ``autocomplete`` semantics (index-free stand-in for Atlas
    edge-gram indexes): every analyzed query term must PREFIX-match a
    document token; ``tokenOrder: "sequential"`` additionally requires
    the matched tokens to appear at strictly increasing positions
    (greedy earliest-match, the usual prefix-sequence check). Scores
    are a constant 1.0 — Atlas autocomplete relevance is a property of
    the gram index, which has no local stand-in; constants keep routed
    and interpreted results identical (same contract as phrase).

    ``fuzzy`` (r8): ``{maxEdits (default 2), prefixLength (default 0),
    maxExpansions}`` — a term prefix-matches within ``maxEdits`` of
    prefix edit distance after an exact ``prefixLength`` head
    (``_fuzzy_prefix_match``). ``maxExpansions`` caps the INDEX
    expansion on Atlas and has no local analog: this stand-in behaves
    as unbounded expansions (a documented superset)."""
    if not qterms:
        return False
    if fuzzy is not None:
        max_edits = int(fuzzy.get("maxEdits", 2))
        prefix_length = int(fuzzy.get("prefixLength", 0))

        def hit(tok, term):
            return _fuzzy_prefix_match(term, tok, max_edits, prefix_length)
    else:
        def hit(tok, term):
            return tok.startswith(term)

    if token_order == "sequential":
        pos = 0
        for t in qterms:
            nxt = None
            for j in range(pos, len(tokens)):
                if hit(tokens[j], t):
                    nxt = j + 1
                    break
            if nxt is None:
                return False
            pos = nxt
        return True
    return all(any(hit(tok, t) for tok in tokens) for t in qterms)


def _phrase_matches(tokens: list[str], phrase: list[str], slop: int) -> bool:
    """Token subsequence with at most ``slop`` total extra gap positions."""
    if not phrase:
        return False
    n, m = len(tokens), len(phrase)
    for start in range(n):
        if tokens[start] != phrase[0]:
            continue
        pos, budget, ok = start, slop, True
        for term in phrase[1:]:
            nxt = None
            for j in range(pos + 1, min(n, pos + 2 + budget)):
                if tokens[j] == term:
                    nxt = j
                    break
            if nxt is None:
                ok = False
                break
            budget -= nxt - pos - 1
            pos = nxt
        if ok:
            return True
    return False


def _eval_operator(op: str, spec, corpus_cache, docs, i: int, index=None):
    """Returns the clause score for document ``i`` — None when no match.
    ``index`` is a parsed ``search_index.SearchIndex`` (r10) pinning
    per-path analyzers, token/geo/autocomplete coverage and synonym
    mappings; ``None`` keeps the engine-contract defaults."""
    d = docs[i]
    if op == "text":
        extra = set(spec) - {"query", "path", "fuzzy", "score",
                             "synonyms", "matchCriteria"}
        if extra:
            # anything unknown raises rather than silently changing
            # relevance (r9 — extras were previously ignored)
            raise ValueError(f"$search text: unsupported options "
                             f"{sorted(extra)}")
        if "synonyms" in spec or "matchCriteria" in spec:
            from duckdb_mongo_spark.mql.search_index import rewrite_text_spec

            rewritten = rewrite_text_spec(spec, index)
            if rewritten is not None:
                # the original clause's score option is applied by the
                # caller (_eval_clause / search_stage) on this base
                return _eval_clause(rewritten, corpus_cache, docs, i, index)
        paths = _paths(spec)
        q = spec["query"]
        qlist = [q] if isinstance(q, str) else list(q)
        if index is None:
            terms = [t for s in qlist for t in _analyze(s)]
            terms_for = {p: terms for p in paths}
            key = tuple(paths)
            ft = _field_tokens
        else:
            # per-path analyzers from the index definition: paths with
            # no string coverage tokenize to [] (match nothing — Lucene
            # absent-field semantics, see mql/search_index)
            toks = {p: index.text_tokenizers(p) for p in paths}
            terms_for = {
                p: ([t for s in qlist for t in toks[p][1](s)]
                    if toks[p] else []) for p in paths}
            key = (tuple(paths), tuple(
                index.text_analyzer_names(p) for p in paths))

            def ft(d2, p2, _t=toks):
                fns = _t.get(p2)
                return _field_tokens(d2, p2, fns[0]) if fns else []
        if key not in corpus_cache:
            corpus_cache[key] = _Corpus(docs, paths, ft)
        corpus = corpus_cache[key]
        fuzzy = spec.get("fuzzy")
        if fuzzy is None:
            score = sum(corpus.bm25(i, p, terms_for[p]) for p in paths)
            return score if score > 0.0 else None
        # text.fuzzy (r9, pinned): each query term expands to EVERY
        # corpus term within maxEdits whole-term Levenshtein edits
        # after an exact prefixLength head, and the expansion scores as
        # an ordinary BM25 disjunction (each expanded term with its own
        # df/tf). maxExpansions caps Lucene's index expansion and has
        # no local analog — unbounded here, the documented superset
        # (same stance as autocomplete.fuzzy). Lucene's distance-decay
        # boost on expanded terms is index-tuning and not applied.
        if not isinstance(fuzzy, dict) or set(fuzzy) - {
                "maxEdits", "prefixLength", "maxExpansions"}:
            raise ValueError(f"$search text: bad fuzzy {fuzzy!r}")
        max_edits = int(fuzzy.get("maxEdits", 2))
        if max_edits not in (1, 2):
            raise ValueError("$search text: fuzzy.maxEdits must be 1 or 2")
        prefix_length = int(fuzzy.get("prefixLength", 0))
        score = sum(
            corpus.bm25(i, p, corpus.fuzzy_expand(
                p, terms_for[p], max_edits, prefix_length))
            for p in paths)
        return score if score > 0.0 else None
    if op == "phrase":
        extra = set(spec) - {"query", "path", "slop", "score"}
        if extra:
            raise ValueError(f"$search phrase: unsupported options "
                             f"{sorted(extra)}")
        paths = _paths(spec)
        slop = int(spec.get("slop", 0))
        queries = spec["query"] if isinstance(spec["query"], list) else [spec["query"]]
        for p in paths:
            if index is None:
                ia = sa = _analyze
            else:
                fns = index.text_tokenizers(p)
                if fns is None:
                    continue  # path not text-indexed: matches nothing
                ia, sa = fns
            toks = _field_tokens(d, p, ia)
            for q in queries:
                if _phrase_matches(toks, sa(q), slop):
                    return 1.0  # constant score; Atlas phrase scoring is index-bound
        return None
    if op == "equals":
        if set(spec) - {"path", "value", "score"}:
            raise ValueError(f"$search equals: unsupported options "
                             f"{sorted(set(spec) - {'path', 'value', 'score'})}")
        want = spec["value"]
        lower = False
        if index is not None:
            if not index.covers_value(spec["path"], want):
                return None  # no compatible indexed type (strings need token)
            lower = (isinstance(want, str) and
                     index.token_normalizer(spec["path"]) == "lowercase")
        v = get_path(d, spec["path"])
        if v is MISSING:
            return None

        def eq(x):
            if lower and isinstance(x, str):
                return x.lower() == want.lower()
            return _equals_value(x, want)

        if isinstance(v, list):
            return 1.0 if any(eq(el) for el in v) else None
        return 1.0 if eq(v) else None
    if op == "range":
        if set(spec) - {"path", "gt", "gte", "lt", "lte", "score"}:
            raise ValueError(
                "$search range: unsupported options "
                f"{sorted(set(spec) - {'path', 'gt', 'gte', 'lt', 'lte', 'score'})}")
        lower = False
        if index is not None:
            if not all(index.covers_value(spec["path"], spec[b])
                       for b in ("gt", "gte", "lt", "lte") if b in spec):
                return None
            lower = index.token_normalizer(spec["path"]) == "lowercase"
        v = get_path(d, spec["path"])
        vals = v if isinstance(v, list) else [v]
        for x in vals:
            if x is MISSING or x is None:
                continue
            ok = True
            for bound, cmp_ok in (("gt", lambda c: c > 0), ("gte", lambda c: c >= 0),
                                  ("lt", lambda c: c < 0), ("lte", lambda c: c <= 0)):
                if bound in spec:
                    b = spec[bound]
                    xx = x
                    if lower and isinstance(x, str) and isinstance(b, str):
                        # token normalizer lowercases the stored term;
                        # the query bound normalizes the same way
                        xx, b = x.lower(), b.lower()
                    c = compare_values(xx, b)
                    if c is None or not cmp_ok(c):
                        ok = False
                        break
            if ok:
                return 1.0
        return None
    if op == "exists":
        if set(spec) - {"path", "score"}:
            raise ValueError(f"$search exists: unsupported options "
                             f"{sorted(set(spec) - {'path', 'score'})}")
        if index is not None and not index.is_indexed(spec["path"]):
            return None  # unindexed paths never match (Lucene semantics)
        return 1.0 if get_path(d, spec["path"]) is not MISSING else None
    if op == "in":
        if set(spec) - {"path", "value", "score"}:
            raise ValueError(f"$search in: unsupported options "
                             f"{sorted(set(spec) - {'path', 'value', 'score'})}")
        wants = spec["value"]
        lower = False
        if index is not None:
            wants = [w for w in wants
                     if index.covers_value(spec["path"], w)]
            if not wants:
                return None
            lower = index.token_normalizer(spec["path"]) == "lowercase"
        v = get_path(d, spec["path"])
        if v is MISSING:
            return None
        vals = v if isinstance(v, list) else [v]

        def eq(x, want):
            if lower and isinstance(x, str) and isinstance(want, str):
                return x.lower() == want.lower()
            return _equals_value(x, want)

        return 1.0 if any(
            any(eq(x, want) for want in wants) for x in vals
        ) else None
    if op == "autocomplete":
        if set(spec) - {"query", "path", "tokenOrder", "fuzzy", "score"}:
            raise ValueError(
                "$search autocomplete: unsupported options "
                f"{sorted(set(spec) - {'query', 'path', 'tokenOrder', 'fuzzy', 'score'})}")
        fuzzy = spec.get("fuzzy")
        if fuzzy is not None:
            if not isinstance(fuzzy, dict) or set(fuzzy) - {
                    "maxEdits", "prefixLength", "maxExpansions"}:
                raise ValueError(
                    f"$search autocomplete: bad fuzzy {fuzzy!r}")
            if int(fuzzy.get("maxEdits", 2)) not in (1, 2):
                raise ValueError(
                    "$search autocomplete: fuzzy.maxEdits must be 1 or 2")
        token_order = spec.get("tokenOrder", "any")
        if token_order not in ("any", "sequential"):
            raise ValueError(
                f"$search autocomplete: bad tokenOrder {token_order!r}")
        queries = (spec["query"] if isinstance(spec["query"], list)
                   else [spec["query"]])
        paths = _paths(spec)
        for p in paths:
            if index is None:
                an, min_grams, fold = _analyze, 0, False
            else:
                ac = index.autocomplete_def(p)  # raises on unpinnable opts
                if ac is None:
                    continue  # not indexed as autocomplete: matches nothing
                an, min_grams, fold = (
                    ac["analyzer"], ac["minGrams"], ac["foldDiacritics"])
            toks = _field_tokens(d, p, an)
            if fold:
                from duckdb_mongo_spark.mql.search_index import \
                    fold_diacritics

                toks = [fold_diacritics(t) for t in toks]
            for q in queries:
                qterms = an(q)
                if fold:
                    qterms = [fold_diacritics(t) for t in qterms]
                if min_grams and any(len(t) < min_grams for t in qterms):
                    # the gram index holds no grams shorter than minGrams
                    continue
                if _autocomplete_matches(toks, qterms, token_order, fuzzy):
                    return 1.0  # constant; Atlas scoring is index-bound
        return None
    if op == "near":
        return _eval_near(spec, d, index)
    if op in ("wildcard", "regex"):
        extra = set(spec) - {"query", "path", "allowAnalyzedField", "score"}
        if extra:
            raise ValueError(f"$search {op}: bad options {extra}")
        queries = (spec["query"] if isinstance(spec["query"], list)
                   else [spec["query"]])
        pats = (_compile_wildcards(queries) if op == "wildcard"
                else _compile_lucene_regexes(queries))
        if index is None:
            if spec.get("allowAnalyzedField"):
                raise ValueError(
                    f"$search {op}: allowAnalyzedField is analyzer/"
                    "index-dependent and unsupported — supply "
                    "search_index= on mongo_scan")
            return _keyword_value_match(d, spec, pats)
        return _indexed_term_match(d, spec, pats, index, op)
    if op == "moreLikeThis":
        translated = translate_more_like_this(spec)
        return _eval_operator("compound", translated["compound"],
                              corpus_cache, docs, i, index)
    if op == "queryString":
        extra = set(spec) - {"defaultPath", "query", "score"}
        if extra:
            raise ValueError(f"$search queryString: bad options {extra}")
        if not isinstance(spec.get("defaultPath"), str) \
                or not isinstance(spec.get("query"), str):
            raise ValueError(
                "$search queryString: defaultPath and query are required")
        translated = parse_query_string(spec["query"], spec["defaultPath"])
        (top, tspec), = translated.items()
        return _eval_operator(top, tspec, corpus_cache, docs, i, index)
    if op == "compound":
        return _eval_compound(spec, corpus_cache, docs, i, index)
    if op == "embeddedDocument":
        return _eval_embedded_document(spec, corpus_cache, docs, i, index)
    if op in ("geoWithin", "geoShape"):
        if index is not None:
            p = spec.get("path")
            gp = [p] if isinstance(p, str) else p if isinstance(p, list) else None
            if gp and not any("geo" in index.types(x) for x in gp
                              if isinstance(x, str)):
                # geo fields need an explicit mapping (dynamic never
                # indexes geo) — unindexed paths match nothing; malformed
                # specs fall through to the evaluator's loud validation
                return None
        return (_eval_geo_within if op == "geoWithin"
                else _eval_geo_shape)(spec, d)
    raise ValueError(f"unsupported $search operator: {op!r}")


def _doc_points(d, path):
    """Every point-shaped value at ``path``: the value itself (GeoJSON
    Point dict or legacy pair — note a legacy pair IS a 2-list, so the
    raw value is tried first) or, failing that, each point-shaped
    element of an array. Non-points contribute nothing (never match,
    never error — mongod simply doesn't index them)."""
    from duckdb_mongo_spark.mql.match import get_path as _gp
    from duckdb_mongo_spark.mql.match import parse_point

    v = _gp(d, path)
    if v is MISSING:
        return []
    pt = parse_point(v)
    if pt is not None:
        return [pt]
    if isinstance(v, list):
        return [p for p in (parse_point(x) for x in v) if p is not None]
    return []


def _eval_geo_within(spec, d):
    """Atlas ``geoWithin`` (r9): constant-1.0 term-level operator over
    indexed points — exactly one of ``circle`` (GeoJSON-Point center +
    radius in METERS on the sphere), ``box`` (bottomLeft/topRight
    points, planar lat/lng box) or ``geometry`` (GeoJSON
    Polygon/MultiPolygon; the engine-wide planar ray-cast pin of
    ``mql/match._point_in_geometry`` — mongod/Atlas run the S2
    spherical test, the documented approximation). Any point of an
    array value matching matches the document."""
    from duckdb_mongo_spark.mql.match import (
        EARTH_RADIUS_M,
        _point_in_geometry,
        haversine_rad,
        parse_point,
    )

    extra = set(spec) - {"path", "circle", "box", "geometry", "score"}
    if extra:
        raise ValueError(f"$search geoWithin: unsupported options "
                         f"{sorted(extra)}")
    shapes = [k for k in ("circle", "box", "geometry") if k in spec]
    if len(shapes) != 1:
        raise ValueError(
            "$search geoWithin: exactly one of circle/box/geometry")
    shape = shapes[0]
    if shape == "circle":
        c = spec["circle"]
        if not isinstance(c, dict) or set(c) != {"center", "radius"}:
            raise ValueError("$search geoWithin: circle needs "
                             "{center, radius}")
        ctr = parse_point(c["center"])
        if ctr is None:
            raise ValueError("$search geoWithin: circle.center must be "
                             "a GeoJSON point")
        radius = float(c["radius"])  # meters on the sphere

        def hit(x, y):
            return haversine_rad(ctr[0], ctr[1], x, y) \
                * EARTH_RADIUS_M <= radius
    elif shape == "box":
        b = spec["box"]
        if not isinstance(b, dict) or set(b) != {"bottomLeft", "topRight"}:
            raise ValueError("$search geoWithin: box needs "
                             "{bottomLeft, topRight}")
        bl, tr = parse_point(b["bottomLeft"]), parse_point(b["topRight"])
        if bl is None or tr is None:
            raise ValueError("$search geoWithin: box corners must be "
                             "points")

        def hit(x, y):
            return (min(bl[0], tr[0]) <= x <= max(bl[0], tr[0])
                    and min(bl[1], tr[1]) <= y <= max(bl[1], tr[1]))
    else:
        geom = spec["geometry"]

        def hit(x, y):
            return _point_in_geometry(x, y, geom)

    for p in _paths(spec):
        for x, y, _gj in _doc_points(d, p):
            if hit(x, y):
                return 1.0
    return None


def _eval_geo_shape(spec, d):
    """Atlas ``geoShape`` (r9) over POINT documents: ``within`` and
    ``intersects`` are the point-in-geometry test (a Point query
    geometry intersects iff coordinates are equal), ``disjoint``
    matches when ANY indexed point does not intersect (each indexed
    value is its own Lucene shape, a document matches if any value
    satisfies the relation), ``contains`` is only defined here for a
    Point query geometry (a stored point contains exactly the equal
    point) — stored-shape algebra (polygon documents, polygon contains
    polygon) needs an S2 library and raises loudly."""
    from duckdb_mongo_spark.mql.match import _point_in_geometry, parse_point

    extra = set(spec) - {"path", "relation", "geometry", "score"}
    if extra:
        raise ValueError(f"$search geoShape: unsupported options "
                         f"{sorted(extra)}")
    rel = spec.get("relation")
    if rel not in ("contains", "disjoint", "intersects", "within"):
        raise ValueError(f"$search geoShape: bad relation {rel!r}")
    geom = spec.get("geometry")
    if not isinstance(geom, dict):
        raise ValueError("$search geoShape: geometry is required")
    qpt = parse_point(geom) if geom.get("type") == "Point" else None
    if rel == "contains" and qpt is None:
        raise ValueError(
            "$search geoShape: contains over stored points is only "
            "defined for a Point query geometry (stored-shape algebra "
            "needs S2 and is unsupported)")

    def intersects(x, y):
        if qpt is not None:
            return x == qpt[0] and y == qpt[1]
        return _point_in_geometry(x, y, geom)

    for p in _paths(spec):
        for x, y, _gj in _doc_points(d, p):
            ok = intersects(x, y)
            if rel == "disjoint":
                ok = not ok
            elif rel == "contains":
                ok = x == qpt[0] and y == qpt[1]
            if ok:
                return 1.0
    return None


def _nest(path: str, el):
    """Wrap an array element back under its fully-qualified embedded
    path, so inner-operator paths (Atlas requires them fully qualified,
    e.g. ``items.name`` inside ``path: "items"``) resolve unchanged."""
    out = el
    for seg in reversed(path.split(".")):
        out = {seg: out}
    return out


def _eval_embedded_document(spec, corpus_cache, docs, i: int, index=None):
    """``embeddedDocument`` (r9): Atlas indexes each element of the
    array at ``path`` as its own nested Lucene document, evaluates
    ``operator`` independently per element, and aggregates the matching
    elements' scores into the parent's score (``score.embedded.
    aggregate``: sum — the documented default — maximum, minimum or
    mean; ``score.embedded.outerScore`` then applies ordinary score
    options to the aggregate). Locally the nested-document corpus is
    exactly the set of embedded documents across the collection, so
    inner BM25 statistics use that sub-corpus — the same statistics a
    nested Lucene index computes. $elemMatch-shaped matching: the
    parent matches iff at least one element matches."""
    extra = set(spec) - {"path", "operator", "score"}
    if extra:
        raise ValueError(f"$search embeddedDocument: bad options {extra}")
    path = spec.get("path")
    inner = spec.get("operator")
    if not isinstance(path, str) or not isinstance(inner, dict) \
            or len(inner) != 1:
        raise ValueError("$search embeddedDocument: path and a single "
                         "operator are required")
    agg, outer = "sum", None
    mod = spec.get("score")
    if mod is not None:
        if not (isinstance(mod, dict) and set(mod) == {"embedded"}
                and isinstance(mod["embedded"], dict)
                and set(mod["embedded"]) <= {"aggregate", "outerScore"}):
            raise ValueError(
                f"$search embeddedDocument: unsupported score option {mod!r}")
        agg = mod["embedded"].get("aggregate", "sum")
        if agg not in ("sum", "maximum", "minimum", "mean"):
            raise ValueError(
                f"$search embeddedDocument: bad aggregate {agg!r}")
        outer = mod["embedded"].get("outerScore")
    if index is not None and "embeddedDocuments" not in index.types(path):
        # embeddedDocument needs an explicit embeddedDocuments mapping
        # (dynamic indexes sub-documents as `document`, not as nested
        # Lucene documents) — unmapped paths match nothing
        return None
    key = ("__embedded__", path)
    if key not in corpus_cache:
        wrapped, by_owner = [], {}
        for j, doc in enumerate(docs):
            arr = get_path(doc, path)
            if arr is MISSING or not isinstance(arr, list):
                continue
            for el in arr:
                if isinstance(el, dict):
                    by_owner.setdefault(j, []).append(len(wrapped))
                    wrapped.append(_nest(path, el))
        corpus_cache[key] = (wrapped, by_owner, {})
    wrapped, by_owner, sub_cache = corpus_cache[key]
    vals = [_eval_clause(inner, sub_cache, wrapped, idx, index)
            for idx in by_owner.get(i, [])]
    matched = [v for v in vals if v is not None]
    if not matched:
        return None
    base = {"sum": sum, "maximum": max, "minimum": min,
            "mean": lambda v: sum(v) / len(v)}[agg](matched)
    if outer is not None:
        base = _apply_score_mod(base, {"score": outer}, docs[i])
    return base


def _keyword_value_match(d, spec, pats):
    """Shared wildcard/regex keyword-field matcher: the WHOLE
    un-analyzed value (scalar string or each string element of an
    array), case-sensitive, constant 1.0 score — Atlas term-level
    semantics with ``allowAnalyzedField: false`` (the default)."""
    for p in _paths(spec):
        v = get_path(d, p)
        if v is MISSING:
            continue
        for x in (v if isinstance(v, list) else [v]):
            if isinstance(x, str) and any(pt.fullmatch(x) for pt in pats):
                return 1.0
    return None


def _indexed_term_match(d, spec, pats, index, op):
    """wildcard/regex under a search-index definition (r10): Lucene
    matches the pattern against the TERM DICTIONARY, so what a term is
    depends on how the path is indexed. ``token`` fields hold the whole
    normalized value (``normalizer: lowercase`` lowercases the stored
    term; the pattern matches against that, as written). ``string``
    fields hold analyzed tokens — matching them requires
    ``allowAnalyzedField: true`` (the Atlas-documented error otherwise)
    and then the pattern must match ANY analyzed token. Paths with
    neither type match nothing."""
    allow_analyzed = bool(spec.get("allowAnalyzedField"))
    for p in _paths(spec):
        norm = index.token_normalizer(p)
        fns = index.text_tokenizers(p)
        if norm is None and fns is not None and not allow_analyzed:
            raise ValueError(
                f"$search {op}: path {p!r} is indexed as an analyzed "
                "string — set allowAnalyzedField: true to match its "
                "analyzed terms")
        v = get_path(d, p)
        if v is MISSING:
            continue
        vals = [x for x in (v if isinstance(v, list) else [v])
                if isinstance(x, str)]
        if norm is not None:
            stored = [x.lower() for x in vals] if norm == "lowercase" else vals
            if any(pt.fullmatch(x) for x in stored for pt in pats):
                return 1.0
        if allow_analyzed and fns is not None:
            for x in vals:
                if any(pt.fullmatch(t) for t in fns[0](x) for pt in pats):
                    return 1.0
    return None


def _compile_wildcards(queries):
    """Shared compile for oracle AND the routed Arrow kernel — DOTALL
    so ``*``/``?`` cross newlines like Lucene wildcards do."""
    import re as _re

    return [_re.compile(_wildcard_regex(q), _re.DOTALL) for q in queries]


def _compile_lucene_regexes(queries):
    """Shared compile for oracle AND the routed Arrow kernel — DOTALL
    because Lucene's ``.`` matches every character, newline included;
    matching is via ``fullmatch`` because Lucene regexes are implicitly
    anchored to the whole term.

    Patterns using the automaton-algebra operators (``~`` complement,
    ``&`` intersection, ``<n-m>`` numeric interval, ``#`` empty
    language) have no backtracking-regex equivalent and compile through
    the DFA engine instead (r10, ``mql/lucene_regex`` — same fullmatch
    surface, linear-time matching, bounded-or-loud state cap); the
    shared-core majority stays on CPython's C regex engine."""
    import re as _re

    from duckdb_mongo_spark.mql.lucene_regex import (
        LuceneRegex, LuceneRegexError, needs_automaton)

    out = []
    for q in queries:
        if needs_automaton(q):
            try:
                out.append(LuceneRegex(q))
            except LuceneRegexError:
                raise
            except (ValueError, RecursionError) as e:
                raise ValueError(f"$search regex: bad pattern {q!r}: {e}")
            continue
        src = _lucene_regex_source(q)
        try:
            out.append(_re.compile(src, _re.DOTALL))
        except _re.error as e:
            raise ValueError(f"$search regex: bad pattern {q!r}: {e}")
    return out


def _lucene_regex_source(pattern: str) -> str:
    """Lucene RegExp syntax -> Python regex source (r9).

    The structurally shared core maps one-to-one: literals, ``\\``
    escapes, ``.`` (any char — DOTALL at compile), ``?`` ``*`` ``+``,
    ``{n}``/``{n,}``/``{n,m}``, alternation ``|``, grouping ``()``,
    character classes ``[...]`` with negation and ranges, and the
    default-enabled optional operator ``@`` (any string). Lucene has no
    anchor operators — matching is always whole-term — so ``^``/``$``
    are literal characters here and get escaped. The automaton-algebra
    operators — ``~`` complement, ``&`` intersection, ``<n-m>`` numeric
    interval, ``#`` empty language — have no backtracking-regex
    equivalent; patterns using them never reach this translator
    (``_compile_lucene_regexes`` routes them through the r10 DFA engine,
    ``mql/lucene_regex``), so hitting one here raises as a guard."""
    import re as _re

    out = []
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                raise ValueError("$search regex: trailing backslash")
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
                out.append("]")
            elif c in "^-":
                out.append(c)  # negation / range — same meaning in re
            else:
                out.append(_re.escape(c))
            i += 1
            continue
        if c == "[":
            in_class = True
            out.append("[")
        elif c == '"':
            # Lucene quoted string (r11): characters verbatim until the
            # next '"' (no escapes inside — RegExp.java reads to the
            # closing quote); grouped so postfix repetition applies to
            # the WHOLE string, as in Lucene's grammar
            j = pattern.find('"', i + 1)
            if j < 0:
                raise ValueError(
                    f"$search regex: unterminated quoted string in "
                    f"{pattern!r}")
            out.append("(?:" + _re.escape(pattern[i + 1:j]) + ")")
            i = j + 1
            continue
        elif c in "~&#" or c == "<":
            raise ValueError(
                f"$search regex: Lucene automaton operator {c!r} "
                "(complement/intersection/interval/empty-language) has "
                "no regex-engine equivalent and is unsupported")
        elif c == "@":
            out.append(".*")  # Lucene 'any string' (enabled by default)
        elif c == "{":
            m = _re.match(r"\{\d+(,\d*)?\}", pattern[i:])
            if not m:
                raise ValueError(
                    f"$search regex: bad repetition at index {i} in "
                    f"{pattern!r}")
            out.append(m.group(0))
            i += len(m.group(0))
            continue
        elif c == "(":
            # Lucene RegExp has plain groups only; '(?' would compile as a
            # Python group EXTENSION ((?i), (?:...), (?=...)) with
            # Python-only semantics where Lucene rejects it — raise
            # rather than silently change match behavior
            if i + 1 < n and pattern[i + 1] == "?":
                raise ValueError(
                    f"$search regex: '(?' at index {i} in {pattern!r} is "
                    "not Lucene RegExp syntax (Python group extensions "
                    "are unsupported)")
            out.append(c)
        elif c in ".?*+|)":
            out.append(c)
        else:
            out.append(_re.escape(c))
        i += 1
    if in_class:
        raise ValueError(f"$search regex: unterminated class in {pattern!r}")
    return "".join(out)


def _wildcard_regex(pattern: str) -> str:
    """Lucene wildcard -> Python regex source: ``*`` = any sequence,
    ``?`` = exactly one char, ``\\`` escapes the next char; everything
    else is literal, the WHOLE (un-analyzed) field value must match,
    case-sensitively — keyword-field semantics, the Atlas default
    (``allowAnalyzedField: false``)."""
    import re as _re

    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        else:
            out.append(_re.escape(c))
        i += 1
    return "".join(out)


_EPOCH = None


def _dt_micros(x) -> int:
    """Exact integer microseconds since epoch from a datetime —
    timedelta arithmetic, no float rounding."""
    global _EPOCH
    import datetime as _dt

    if _EPOCH is None:
        _EPOCH = _dt.datetime(1970, 1, 1)
    base = _EPOCH
    if x.tzinfo is not None:
        base = _EPOCH.replace(tzinfo=_dt.timezone.utc)
    td = x - base
    return (td.days * 86_400_000_000 + td.seconds * 1_000_000
            + td.microseconds)


def _eval_near(spec, d, index=None):
    """Atlas ``near`` (numeric/date proximity): score =
    pivot / (pivot + dist), dist = |value - origin| (dates: integer
    microsecond difference over 1000.0 — exact milliseconds). The
    CLOSEST value wins across paths and array elements; docs without
    a comparable value don't match. pivot must be positive. Geo
    origins are ``$geoNear``'s territory and raise here."""
    import datetime as _dt

    origin = spec.get("origin")
    pivot = spec.get("pivot")
    if isinstance(pivot, bool) or not isinstance(pivot, (int, float)) \
            or not pivot > 0:
        raise ValueError("$search near: pivot must be a positive number")
    is_date = isinstance(origin, _dt.datetime)
    if not is_date and (isinstance(origin, bool)
                        or not isinstance(origin, (int, float))):
        raise ValueError(
            "$search near: origin must be a number or date "
            "(geo proximity is $geoNear)")
    best = None
    for p in _paths(spec):
        if index is not None and not index.covers_value(p, origin):
            continue  # path lacks a number/date mapping: matches nothing
        v = get_path(d, p)
        if v is MISSING:
            continue
        for x in (v if isinstance(v, list) else [v]):
            if is_date:
                if not isinstance(x, _dt.datetime):
                    continue
                dist = abs(_dt_micros(x) - _dt_micros(origin)) / 1000.0
            else:
                if isinstance(x, bool) or not isinstance(x, (int, float)):
                    continue
                dist = abs(float(x) - float(origin))
            s = float(pivot) / (float(pivot) + dist)
            if best is None or s > best:
                best = s
    return best


def _equals_value(a, b) -> bool:
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b if isinstance(a, bool) and isinstance(b, bool) else False
    c = compare_values(a, b)
    return c == 0 if c is not None else a == b


def _clauses(spec, key) -> list[dict]:
    cl = spec.get(key, [])
    return [cl] if isinstance(cl, dict) else list(cl)


def _path_number(doc, path, undefined=0.0) -> float:
    """Numeric value of a document path for score expressions —
    missing / non-numeric / boolean values take the ``undefined``
    default (Atlas path-score semantics)."""
    v = get_path(doc, path)
    if v is MISSING or isinstance(v, bool) or not isinstance(v, (int, float)):
        return float(undefined)
    return float(v)


def _eval_score_function(expr, base: float, doc) -> float:
    """Atlas ``score: {function: ...}`` expression tree (r8): all of
    its inputs are DOC-LOCAL (the relevance score, document field
    values, constants) — no index metadata involved — so the full
    surface evaluates deterministically here. Pinned semantics:
    ``score`` = the clause's unmodified relevance score; ``path`` =
    the field's numeric value (``undefined`` default, 0.0 when not
    given); ``constant``; ``add``/``multiply`` fold left;
    ``log`` = log10(x) with non-positive x scoring 0; ``log1p`` =
    log10(x+1) likewise; ``gauss`` = decay^(max(0, |v-origin|-offset)^2
    / scale^2) with decay default 0.5 and offset default 0."""
    if isinstance(expr, (int, float)) and not isinstance(expr, bool):
        return float(expr)
    if not isinstance(expr, dict) or len(expr) != 1:
        raise ValueError(f"$search: unsupported function score {expr!r}")
    (kind, body), = expr.items()
    if kind == "score":
        if body != "relevance":
            raise ValueError(f"$search: unsupported score source {body!r}")
        return base
    if kind == "constant":
        return float(body)
    if kind == "path":
        if isinstance(body, str):
            return _path_number(doc, body)
        return _path_number(doc, body["value"], body.get("undefined", 0.0))
    if kind == "add":
        return sum(_eval_score_function(e, base, doc) for e in body)
    if kind == "multiply":
        out = 1.0
        for e in body:
            out *= _eval_score_function(e, base, doc)
        return out
    if kind == "log":
        x = _eval_score_function(body, base, doc)
        return math.log10(x) if x > 0 else 0.0
    if kind == "log1p":
        x = _eval_score_function(body, base, doc) + 1.0
        return math.log10(x) if x > 0 else 0.0
    if kind == "gauss":
        v = _path_number(doc, body["path"], body.get("undefined", 0.0)) \
            if isinstance(body.get("path"), str) else \
            _eval_score_function(body["path"], base, doc)
        origin = float(body["origin"])
        scale = float(body["scale"])
        offset = float(body.get("offset", 0.0))
        decay = float(body.get("decay", 0.5))
        dist = max(0.0, abs(v - origin) - offset)
        return decay ** ((dist * dist) / (scale * scale))
    raise ValueError(f"$search: unsupported function score {expr!r}")


def _apply_score_mod(base, spec, doc=None):
    """Atlas ``score`` option on an operator: ``boost.value`` multiplies
    the clause score, ``boost.path`` multiplies by a document field's
    numeric value (``undefined`` default when absent), ``constant.value``
    replaces it, and ``function`` evaluates a doc-local expression tree
    (r8 — see ``_eval_score_function``; a negative final function score
    clamps to 0, the documented Atlas behavior). Matching is always
    decided on the UN-modified base."""
    mod = spec.get("score") if isinstance(spec, dict) else None
    if base is None or mod is None:
        return base
    if not isinstance(mod, dict) or len(mod) != 1:
        raise ValueError(f"$search: unsupported score option {mod!r}")
    (kind, body), = mod.items()
    if kind == "boost" and isinstance(body, dict) and set(body) == {"value"}:
        return base * float(body["value"])
    if kind == "boost" and isinstance(body, dict) \
            and set(body) <= {"path", "undefined"} and "path" in body:
        return base * _path_number(doc, body["path"],
                                   body.get("undefined", 0.0))
    if kind == "constant" and isinstance(body, dict) \
            and set(body) == {"value"}:
        return float(body["value"])
    if kind == "function":
        return max(0.0, _eval_score_function(body, base, doc))
    raise ValueError(f"$search: unsupported score option {mod!r}")


def _eval_clause(clause: dict, corpus_cache, docs, i: int, index=None):
    (op, spec), = clause.items()
    base = _eval_operator(op, spec, corpus_cache, docs, i, index)
    if op in ("compound", "embeddedDocument"):
        # compound takes no score option; embeddedDocument's
        # score.embedded (aggregate + outerScore) is applied inside
        return base
    return _apply_score_mod(base, spec, docs[i])


def _eval_compound(spec, corpus_cache, docs, i: int, index=None):
    score = 0.0
    for cl in _clauses(spec, "must"):
        s = _eval_clause(cl, corpus_cache, docs, i, index)
        if s is None:
            return None
        score += s
    for cl in _clauses(spec, "mustNot"):
        if _eval_clause(cl, corpus_cache, docs, i, index) is not None:
            return None
    for cl in _clauses(spec, "filter"):
        if _eval_clause(cl, corpus_cache, docs, i, index) is None:
            return None  # filter: must match, contributes no score
    should = _clauses(spec, "should")
    matched = 0
    for cl in should:
        s = _eval_clause(cl, corpus_cache, docs, i, index)
        if s is not None:
            matched += 1
            score += s
    need = int(spec.get("minimumShouldMatch", 0))
    if should and matched < need:
        return None
    if not spec.get("must") and not spec.get("filter") and should and matched == 0:
        # pure-should compound needs at least one should hit
        return None
    return score


def _sort_key_fn(docs, sort_spec):
    """Compile the ``$search`` ``sort`` option (r9) into a key function
    over ``(score, i)`` tuples. Pinned semantics: keys apply in spec
    order; ``{"$meta": "searchScore"}`` sorts by the relevance score
    (1 ascending is allowed but unusual; Atlas defaults it descending —
    pass -1 explicitly, we follow the given direction with -1 default
    for the $meta form); documents MISSING a field sort AFTER documents
    that have it regardless of direction (the documented Atlas rule);
    values of incomparable types raise loudly (Atlas requires a single
    indexed sort type per field). Ties keep (score desc, input order)."""
    from functools import cmp_to_key

    if not isinstance(sort_spec, dict) or not sort_spec:
        raise ValueError(f"$search: bad sort {sort_spec!r}")
    keys = []
    for field, direction in sort_spec.items():
        if isinstance(direction, dict):
            if direction != {"$meta": "searchScore"}:
                raise ValueError(f"$search sort: bad value {direction!r}")
            keys.append((None, -1))  # score, Atlas's default descending
            continue
        if direction not in (1, -1):
            raise ValueError(
                f"$search sort: direction must be 1 or -1, got {direction!r}")
        keys.append((field, int(direction)))

    def _cmp_vals(a, b, field):
        try:
            if a == b:
                return 0
            return -1 if a < b else 1
        except TypeError:
            raise ValueError(
                f"$search sort: incomparable values for {field!r}: "
                f"{type(a).__name__} vs {type(b).__name__}")

    def compare(t1, t2):
        (s1, i1), (s2, i2) = t1, t2
        for field, direction in keys:
            if field is None:
                if s1 != s2:
                    return direction * (-1 if s1 < s2 else 1)
                continue
            v1, v2 = get_path(docs[i1], field), get_path(docs[i2], field)
            m1, m2 = v1 is MISSING or v1 is None, v2 is MISSING or v2 is None
            if m1 or m2:
                if m1 != m2:
                    return 1 if m1 else -1  # missing sorts last, always
                continue
            c = _cmp_vals(v1, v2, field)
            if c:
                return direction * c
        if s1 != s2:  # tie-break: relevance desc, then input order
            return -1 if s1 > s2 else 1
        return -1 if i1 < i2 else 1

    return cmp_to_key(compare)


# ---------------------------------------------------------------------------
# highlight (r10) — the engine's pinned passage semantics.
#
# Atlas renders ``searchHighlights`` from Lucene's UnifiedHighlighter,
# whose passages depend on index options with no local stand-in. This
# engine pins a deterministic passage model derived from its OWN
# analyzer contract (``_analyze``), documented here so routed/oracle
# parity is by construction:
#
# - ``highlight: {path, maxCharsToExamine (default 500000),
#   maxNumPassages (default 5)}``; unknown options raise.
# - hit terms come from the analyzed-text operators of the query that
#   reference the highlighted path: ``text`` (terms; ``fuzzy`` marks
#   every token within the clause's edit budget), ``phrase`` (only
#   tokens participating in a matched occurrence), ``autocomplete``
#   (every prefix-matching token), and the keyword operators
#   ``wildcard``/``regex`` (a matching value is ONE whole-value hit).
#   ``compound`` contributes its must/should/filter clauses — never
#   mustNot; ``queryString``/``moreLikeThis`` contribute through their
#   shared translations. Constant-score condition operators (equals/
#   range/in/exists/near/geo*) and ``embeddedDocument`` yield no text
#   hits.
# - a passage is one SENTENCE of the stored value — maximal spans
#   ending after a run of ``. ! ? \n`` — containing at least one hit;
#   its ``texts`` alternate ``{"value", "type": "text"|"hit"}`` chunks
#   covering the sentence verbatim.
# - passage score (pinned): ``unique_hit_terms + hit_tokens /
#   (passage_tokens + 1)`` — monotone in distinct matched terms, ties
#   broken toward hit-dense passages; passages sort by (score desc,
#   path order, value index, offset) and the top ``maxNumPassages``
#   per DOCUMENT return.
# - only the first ``maxCharsToExamine`` characters across the
#   document's highlighted values are examined (Atlas's budget knob).

_HL_KEYS = {"path", "maxCharsToExamine", "maxNumPassages"}


def _analyze_offsets(text: str) -> list[tuple]:
    """``(token, start, end)`` triples over the ORIGINAL string: each
    maximal ``isalnum`` run, lowercased. Equals ``_analyze`` wherever
    lowercasing maps alphanumerics 1:1 (all of ASCII/Cyrillic/CJK and
    practically everything else); a full-text lowering that changes
    character class (Turkish dotted İ → i + combining dot) can split
    differently in ``_analyze`` — a documented display-layer bound,
    not a scoring path."""
    out = []
    cur = None
    for i, ch in enumerate(text):
        if ch.isalnum():
            if cur is None:
                cur = i
        elif cur is not None:
            out.append((text[cur:i].lower(), cur, i))
            cur = None
    if cur is not None:
        out.append((text[cur:].lower(), cur, len(text)))
    return out


def _sentence_spans(text: str) -> list[tuple]:
    """Passage segmentation: sentences end after a RUN of ``. ! ? \\n``;
    spans concatenate back to the whole string."""
    spans, start, i, n = [], 0, 0, len(text)
    while i < n:
        if text[i] in ".!?\n":
            j = i + 1
            while j < n and text[j] in ".!?\n":
                j += 1
            spans.append((start, j))
            start = i = j
        else:
            i += 1
    if start < n:
        spans.append((start, n))
    return spans


def _validate_highlight(hl):
    if not isinstance(hl, dict) or "path" not in hl \
            or set(hl) - _HL_KEYS:
        raise ValueError(f"$search highlight: bad spec {hl!r} "
                         f"(expected keys from {sorted(_HL_KEYS)})")
    p = hl["path"]
    paths = [p] if isinstance(p, str) else list(p) if isinstance(p, list) \
        else None
    if not paths or any(not isinstance(x, str) for x in paths):
        raise ValueError("$search highlight: path must be a string or "
                         "array of strings")
    mc = int(hl.get("maxCharsToExamine", 500000))
    mp = int(hl.get("maxNumPassages", 5))
    if mc <= 0 or mp <= 0:
        raise ValueError("$search highlight: maxCharsToExamine and "
                         "maxNumPassages must be positive")
    return paths, mc, mp


def _new_hl_source() -> dict:
    return {"terms": set(), "fuzzy": [], "prefixes": [], "phrases": [],
            "keyword": []}


def _collect_highlight_sources(op, spec, out: dict, index=None) -> None:
    """Walk the operator tree accumulating per-path hit sources (see the
    module-pinned highlight contract above). Malformed specs are left to
    the scoring pass's own validation — this walker only reads the
    shapes it understands. ``index`` (r10) routes synonym/matchCriteria
    text clauses through the SAME rewrite the scorer executes, so
    expanded synonyms highlight like Atlas's."""
    if not isinstance(spec, dict):
        return
    if op == "text":
        if "synonyms" in spec or "matchCriteria" in spec:
            from duckdb_mongo_spark.mql.search_index import rewrite_text_spec

            rewritten = rewrite_text_spec(spec, index)
            if rewritten is not None:
                (sub_op, sub_spec), = rewritten.items()
                _collect_highlight_sources(sub_op, sub_spec, out, index)
                return
        terms = (_analyze(spec.get("query"))
                 if isinstance(spec.get("query"), str)
                 else [t for q in spec.get("query", [])
                       for t in _analyze(q)])
        fz = spec.get("fuzzy")
        for p in _paths(spec):
            src = out.setdefault(p, _new_hl_source())
            if isinstance(fz, dict):
                me = int(fz.get("maxEdits", 2))
                pl = int(fz.get("prefixLength", 0))
                src["fuzzy"].extend((t, me, pl) for t in terms)
            else:
                src["terms"].update(terms)
    elif op == "phrase":
        qs = (spec["query"] if isinstance(spec.get("query"), list)
              else [spec.get("query")])
        slop = int(spec.get("slop", 0))
        for p in _paths(spec):
            src = out.setdefault(p, _new_hl_source())
            src["phrases"].extend((_analyze(q), slop) for q in qs)
    elif op == "autocomplete":
        qs = (spec["query"] if isinstance(spec.get("query"), list)
              else [spec.get("query")])
        fz = spec.get("fuzzy")
        me = int(fz.get("maxEdits", 2)) if isinstance(fz, dict) else None
        pl = int(fz.get("prefixLength", 0)) if isinstance(fz, dict) else 0
        for p in _paths(spec):
            src = out.setdefault(p, _new_hl_source())
            src["prefixes"].extend(
                (t, me, pl) for q in qs for t in _analyze(q))
    elif op in ("wildcard", "regex"):
        qs = (spec["query"] if isinstance(spec.get("query"), list)
              else [spec.get("query")])
        pats = (_compile_wildcards(qs) if op == "wildcard"
                else _compile_lucene_regexes(qs))
        for p in _paths(spec):
            out.setdefault(p, _new_hl_source())["keyword"].extend(pats)
    elif op == "compound":
        for key in ("must", "should", "filter"):  # mustNot never marks
            for cl in _clauses(spec, key):
                if isinstance(cl, dict) and len(cl) == 1:
                    (sub_op, sub_spec), = cl.items()
                    _collect_highlight_sources(sub_op, sub_spec, out, index)
    elif op == "queryString":
        if isinstance(spec.get("query"), str) \
                and isinstance(spec.get("defaultPath"), str):
            translated = parse_query_string(spec["query"],
                                            spec["defaultPath"])
            (top, tspec), = translated.items()
            _collect_highlight_sources(top, tspec, out, index)
    elif op == "moreLikeThis":
        translated = translate_more_like_this(spec)
        _collect_highlight_sources("compound", translated["compound"], out,
                                   index)
    # equals/range/in/exists/near/geoWithin/geoShape/embeddedDocument:
    # no analyzed-text hits


def _phrase_hit_positions(tokens, phrase, slop) -> set:
    """Token positions participating in ANY matched occurrence — the
    same greedy scan as ``_phrase_matches``, collecting positions
    instead of short-circuiting."""
    hits: set = set()
    if not phrase:
        return hits
    n = len(tokens)
    for start in range(n):
        if tokens[start] != phrase[0]:
            continue
        pos, budget, seq, ok = start, slop, [start], True
        for term in phrase[1:]:
            nxt = None
            for j in range(pos + 1, min(n, pos + 2 + budget)):
                if tokens[j] == term:
                    nxt = j
                    break
            if nxt is None:
                ok = False
                break
            budget -= nxt - pos - 1
            pos = nxt
            seq.append(nxt)
        if ok:
            hits.update(seq)
    return hits


def _token_hit(tok: str, src: dict) -> bool:
    if tok in src["terms"]:
        return True
    for q, me, pl in src["fuzzy"]:
        if _within_edits(q, tok, me, pl):
            return True
    for q, me, pl in src["prefixes"]:
        if me is None:
            if tok.startswith(q):
                return True
        elif _fuzzy_prefix_match(q, tok, me, pl):
            return True
    return False


def _doc_highlights(d, paths, max_chars, max_passages, sources):
    """The ``searchHighlights`` array for one matched document — see the
    module-pinned highlight contract."""
    passages = []  # (score, path_i, val_i, start, texts, path)
    budget = max_chars
    for pi, path in enumerate(paths):
        src = sources.get(path)
        if src is None:
            continue  # no query clause touches this path: no highlights
        v = get_path(d, path)
        if v is MISSING:
            continue
        for vi, val in enumerate(v if isinstance(v, list) else [v]):
            if not isinstance(val, str) or budget <= 0:
                continue
            text = val[:budget]
            budget -= len(text)
            if src["keyword"] and any(p.fullmatch(val)
                                      for p in src["keyword"]):
                # keyword operators match the WHOLE raw value as one
                # token — the value is a single hit passage (subsumes
                # any term passages of the same value)
                passages.append((1.0, pi, vi, 0,
                                 [{"value": text, "type": "hit"}], path))
                continue
            toks = _analyze_offsets(text)
            tok_strs = [t[0] for t in toks]
            hit = {k for k, (tok, _s, _e) in enumerate(toks)
                   if _token_hit(tok, src)}
            for phrase, slop in src["phrases"]:
                hit |= _phrase_hit_positions(tok_strs, phrase, slop)
            if not hit:
                continue
            for s, e in _sentence_spans(text):
                span = [k for k in range(len(toks)) if s <= toks[k][1] < e]
                hits_here = [k for k in span if k in hit]
                if not hits_here:
                    continue
                texts, cur = [], s
                for k in hits_here:
                    ts, te = toks[k][1], toks[k][2]
                    if ts > cur:
                        texts.append({"value": text[cur:ts],
                                      "type": "text"})
                    texts.append({"value": text[ts:te], "type": "hit"})
                    cur = te
                if cur < e:
                    texts.append({"value": text[cur:e], "type": "text"})
                uniq = len({tok_strs[k] for k in hits_here})
                score = uniq + len(hits_here) / (len(span) + 1.0)
                passages.append((score, pi, vi, s, texts, path))
    passages.sort(key=lambda t: (-t[0], t[1], t[2], t[3]))
    return [{"score": sc, "path": p, "texts": tx}
            for sc, _pi, _vi, _st, tx, p in passages[:max_passages]]


def search_stage(docs, spec, meta_key: str) -> list[dict]:
    """Execute ``$search`` over materialized ``docs``; returns new doc
    dicts in descending-score order (or the ``sort`` option's field
    order — r9) with the score in ``meta_key``. The ``highlight``
    option (r10) renders passage arrays into the ``searchHighlights``
    meta of every returned document, per the module-pinned contract."""
    docs = [d for d in docs]
    spec = dict(spec)
    spec.pop("index", None)
    index = None
    index_payload = spec.pop("__indexDefinition__", None)
    if index_payload is not None:
        from duckdb_mongo_spark.mql.search_index import SearchIndex

        index = SearchIndex.from_payload(index_payload)
    hl = spec.pop("highlight", None)
    spec.pop("tracking", None)    # search-terms telemetry: no-op here
    spec.pop("concurrent", None)  # parallelism hint: always parallel
    count_spec = spec.pop("count", None)
    sort_spec = spec.pop("sort", None)
    if spec.pop("scoreDetails", False):
        # the per-clause Lucene explain tree is index-format-bound;
        # accepting true and omitting the $meta would silently break
        # consumers that read it
        raise ValueError("$search: scoreDetails is unsupported")
    if len(spec) != 1:
        raise ValueError(
            f"$search expects exactly one operator, got {sorted(spec)}")
    (op, opspec), = spec.items()
    hl_parsed = None
    if hl is not None:
        paths, mc, mp = _validate_highlight(hl)  # raises on bad specs
        if index is not None:
            for p in paths:
                names = index.text_analyzer_names(p)
                if names != ("lucene.standard", "lucene.standard"):
                    # passage offsets are pinned to the engine-contract
                    # analyzer; a custom analyzer's token runs would
                    # silently misalign highlights
                    raise ValueError(
                        f"$search highlight: path {p!r} is not indexed "
                        "as a lucene.standard string field")
        sources: dict = {}
        _collect_highlight_sources(op, opspec, sources, index)
        hl_parsed = (paths, mc, mp, sources)
    corpus_cache = {}
    scored = []
    for i in range(len(docs)):
        s = _eval_operator(op, opspec, corpus_cache, docs, i, index)
        if op not in ("compound", "embeddedDocument"):
            # embeddedDocument's score.embedded is applied inside
            s = _apply_score_mod(s, opspec, docs[i])
        if s is not None:
            scored.append((s, i))
    if sort_spec is not None:
        scored.sort(key=_sort_key_fn(docs, sort_spec))
    else:
        scored.sort(key=lambda t: (-t[0], t[1]))
    out = []
    total = len(scored)
    for s, i in scored:
        nd = dict(docs[i])
        meta = dict(nd.get(meta_key) or {})
        meta["searchScore"] = s
        if hl_parsed is not None:
            meta["searchHighlights"] = _doc_highlights(docs[i], *hl_parsed)
        if count_spec is not None:
            meta["searchScoreDetails"] = None
            meta["count"] = {"lowerBound" if count_spec.get("type") == "lowerBound"
                             else "total": total}
        nd[meta_key] = meta
        out.append(nd)
    return out


def facet_meta(docs, facet_spec, meta_key: str, index_payload=None) -> dict:
    """``$searchMeta {facet}`` over materialized docs — the engine's
    pinned facet semantics (r8):

    - ``operator`` (optional) selects the matching docs through the
      normal ``$search`` evaluation; absent means every document.
    - string facets count each STRING value (array elements
      individually) of ``path`` among the matches; the top
      ``numBuckets`` (default 10) buckets return ordered by
      (count desc, value asc) — a deterministic refinement of Atlas's
      count ordering.
    - number/date facets require ascending ``boundaries`` (>= 2);
      bucket ``_id`` is the lower boundary, values bucket into
      [b_i, b_{i+1}); out-of-range values count toward the ``default``
      bucket when one is named and are dropped otherwise; missing or
      differently-typed values never count. ALL boundary buckets
      return (zeros included) in boundary order, then the default.
    - the result document is Atlas-shaped:
      ``{"count": {"lowerBound": N}, "facet": {name: {"buckets":
      [{"_id": ..., "count": ...}, ...]}, ...}}``.
    """
    import datetime as _dt
    from bisect import bisect_right

    docs = list(docs)
    if not isinstance(facet_spec, dict) or "facets" not in facet_spec \
            or not isinstance(facet_spec["facets"], dict) \
            or not facet_spec["facets"]:
        raise ValueError(f"$searchMeta: bad facet spec {facet_spec!r}")
    op = facet_spec.get("operator")
    if op is not None:
        inner = dict(op)
        if index_payload is not None:
            inner["__indexDefinition__"] = index_payload
        hits = search_stage(docs, inner, meta_key)
    else:
        hits = docs

    def _values(d, path):
        v = get_path(d, path)
        if v is MISSING:
            return []
        return v if isinstance(v, list) else [v]

    out_facets = {}
    for name, fs in facet_spec["facets"].items():
        ftype = fs.get("type")
        path = fs.get("path")
        if not isinstance(path, str):
            raise ValueError(f"$searchMeta facet {name!r}: path required")
        if ftype == "string":
            counts: dict = {}
            for d in hits:
                for x in _values(d, path):
                    if isinstance(x, str):
                        counts[x] = counts.get(x, 0) + 1
            nb = int(fs.get("numBuckets", 10))
            top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:nb]
            out_facets[name] = {
                "buckets": [{"_id": k, "count": n} for k, n in top]}
        elif ftype in ("number", "date"):
            bounds = fs.get("boundaries")
            if not isinstance(bounds, list) or len(bounds) < 2 or any(
                    not (bounds[i] < bounds[i + 1])
                    for i in range(len(bounds) - 1)):
                raise ValueError(
                    f"$searchMeta facet {name!r}: boundaries must be an "
                    "ascending list of at least 2 values")

            def ok(x):
                if ftype == "number":
                    return (isinstance(x, (int, float))
                            and not isinstance(x, bool))
                return isinstance(x, _dt.datetime)

            counts_n = [0] * (len(bounds) - 1)
            dflt = 0
            for d in hits:
                for x in _values(d, path):
                    if not ok(x):
                        continue
                    j = bisect_right(bounds, x) - 1
                    if 0 <= j < len(counts_n):
                        counts_n[j] += 1
                    else:
                        dflt += 1
            buckets = [{"_id": bounds[i], "count": counts_n[i]}
                       for i in range(len(counts_n))]
            if "default" in fs:
                buckets.append({"_id": fs["default"], "count": dflt})
            out_facets[name] = {"buckets": buckets}
        else:
            raise ValueError(
                f"$searchMeta facet {name!r}: type must be "
                f"string/number/date, got {ftype!r}")
    return {"count": {"lowerBound": len(hits)}, "facet": out_facets}


def parse_query_string(query: str, default_path: str) -> dict:
    """Lucene ``queryString`` syntax -> a ``$search`` operator spec
    built ONLY from supported operators (text / phrase / compound) —
    one shared translation, so the interpreter and the routed path
    execute the same tree by construction. Pinned subset:

    - terms (analyzed ``text`` over the default or ``field:``-prefixed
      path), ``"quoted phrases"`` (``phrase``), ``AND``/``&&``,
      ``OR``/``||``, ``NOT``, parentheses; adjacency = OR (Lucene's
      default operator); precedence NOT > AND > OR.
    - ``NOT x`` compiles to ``{"compound": {"mustNot": [x]}}`` — it
      matches everything x does not, scoring 0 (pinned; Lucene's
      pure-negative behavior is index-dependent).
    - a single TRAILING ``*`` (``spar*``, ``title:spar*`` — r9)
      compiles to the ``autocomplete`` operator: prefix matching per
      analyzed term, constant 1.0 score (Lucene's constant-score
      wildcard rewrite; the head is analyzed with the engine analyzer,
      a pinned deviation from Lucene's unanalyzed wildcard terms).
    - Lucene specials without a pinned local meaning — other wildcard
      placements, fuzzy/boost suffixes, ranges, escapes
      (``* ? ~ ^ [ ] { } \\``) — raise loudly instead of silently
      degrading to literals.
    """
    specials = set('*?~^[]{}\\')

    # --- tokenizer: parens, colons, quoted strings, bare terms ---
    toks: list[tuple[str, str]] = []
    i, n = 0, len(query)
    while i < n:
        c = query[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            toks.append((c, c))
            i += 1
            continue
        if c == '"':
            j = query.find('"', i + 1)
            if j < 0:
                raise ValueError("$search queryString: unclosed quote")
            toks.append(("quoted", query[i + 1:j]))
            i = j + 1
            continue
        j = i
        while j < n and not query[j].isspace() and query[j] not in '()"':
            j += 1
        word = query[i:j]
        i = j
        bad = specials & set(word)
        if bad == {"*"} and word.count("*") == 1 and word.endswith("*"):
            pass  # single trailing star: prefix term, emitted below
        elif bad:
            raise ValueError(
                f"$search queryString: unsupported syntax {sorted(bad)} "
                f"in {word!r}")
        if word in ("AND", "&&"):
            toks.append(("AND", word))
        elif word in ("OR", "||"):
            toks.append(("OR", word))
        elif word == "NOT":
            toks.append(("NOT", word))
        else:
            # field:term / field:"phrase"? the colon splits here; a
            # trailing colon grabs the NEXT quoted/term token
            def emit_term(s):
                if s.endswith("*"):
                    head = s[:-1]
                    if not _analyze(head):
                        raise ValueError(
                            "$search queryString: bare '*' wildcard "
                            "is unsupported")
                    toks.append(("prefix", head))
                else:
                    toks.append(("term", s))

            if ":" in word:
                field, _, rest = word.partition(":")
                if not field or "*" in field:
                    raise ValueError(
                        f"$search queryString: bad clause {word!r}")
                toks.append(("field", field))
                if rest:
                    emit_term(rest)
            else:
                emit_term(word)

    # --- recursive descent: or := and (OR and)* ; adjacency = OR ---
    pos = 0

    def peek():
        return toks[pos][0] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def clause():
        kind = peek()
        if kind == "(":
            take()
            node = parse_or()
            if peek() != ")":
                raise ValueError("$search queryString: missing ')'")
            take()
            return node
        path = default_path
        if kind == "field":
            path = take()[1]
            kind = peek()
        if kind == "quoted":
            return {"phrase": {"query": take()[1], "path": path}}
        if kind == "term":
            return {"text": {"query": take()[1], "path": path}}
        if kind == "prefix":
            return {"autocomplete": {"query": take()[1], "path": path}}
        raise ValueError("$search queryString: expected a term")

    def unary():
        if peek() == "NOT":
            take()
            return {"compound": {"mustNot": [unary()]}}
        return clause()

    def parse_and():
        nodes = [unary()]
        while peek() == "AND":
            take()
            nodes.append(unary())
        if len(nodes) == 1:
            return nodes[0]
        return {"compound": {"must": nodes}}

    def parse_or():
        nodes = [parse_and()]
        while peek() in ("OR",) or peek() in (
                "term", "quoted", "field", "(", "NOT", "prefix"):
            if peek() == "OR":
                take()
            nodes.append(parse_and())
        if len(nodes) == 1:
            return nodes[0]
        return {"compound": {"should": nodes}}

    if not toks:
        raise ValueError("$search queryString: empty query")
    tree = parse_or()
    if pos != len(toks):
        raise ValueError("$search queryString: trailing tokens")
    return tree


def translate_more_like_this(spec) -> dict:
    """``moreLikeThis`` -> a compound-should of ``text`` clauses — the
    engine's pinned semantics (Atlas extracts "representative terms"
    using index statistics it does not publish; this local stand-in
    uses ALL the like-documents' analyzed text, one clause per dotted
    string path, BM25-scored like any text disjunction). Shared by the
    oracle and the router, so the routed tree is the oracle's tree.
    String values merge per path across like documents; arrays
    contribute their string elements; non-string leaves are ignored;
    no string content anywhere raises."""
    like = spec.get("like")
    if like is None:
        raise ValueError("$search moreLikeThis: like is required")
    if set(spec) - {"like", "score"}:
        raise ValueError(
            f"$search moreLikeThis: bad options {set(spec) - {'like'}}")
    docs = like if isinstance(like, list) else [like]
    by_path: dict = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}.{k}" if prefix else str(k))
            return
        if isinstance(node, list):
            for el in node:
                if isinstance(el, str):
                    by_path.setdefault(prefix, []).append(el)
            return
        if isinstance(node, str) and prefix:
            by_path.setdefault(prefix, []).append(node)

    for d in docs:
        if not isinstance(d, dict):
            raise ValueError(
                "$search moreLikeThis: like must be document(s)")
        walk(d, "")
    clauses = [{"text": {"query": vals, "path": p}}
               for p, vals in sorted(by_path.items())
               if any(_analyze(v) for v in vals)]
    if not clauses:
        raise ValueError(
            "$search moreLikeThis: no analyzable text in like documents")
    return {"compound": {"should": clauses}}
