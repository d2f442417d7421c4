"""Atlas search-index definitions for ``$search``/``$searchMeta`` (r10).

The reference ships search pipelines verbatim to the server, where the
LIVE index definition (field mappings, analyzers, synonym collections)
decides how every operator matches (reference README.md pipeline
passthrough; the index lives server-side and is invisible to the
engine). Locally there is no live index, so until r10 every
index-metadata-bound feature raised loudly. This module closes that
gap: the user supplies the same PUBLIC Atlas index-definition JSON
(``search_index=`` on ``mongo_scan``) and the engine pins deterministic
semantics from it.

Pinned contract (documented local stand-in for Lucene behavior):

- ``mappings.dynamic`` defaults to **false** (the Atlas default). A
  dynamic mapping indexes string/number/date/boolean/objectId values
  and recurses into sub-documents; it NEVER creates ``token``,
  ``autocomplete``, ``geo`` or ``embeddedDocuments`` fields (those need
  explicit mappings, as in Atlas).
- An operator whose path has no compatible indexed type **matches
  nothing** — Lucene absent-field semantics, not an error. The one
  exception keeps its Atlas-documented error: ``wildcard``/``regex``
  over an analyzed-only (``string``) path without
  ``allowAnalyzedField: true`` raises.
- Analyzers are pinned implementations: ``lucene.standard`` (the
  engine-wide contract, ``mql/search._analyze``), ``lucene.whitespace``
  (split on Unicode whitespace, case preserved), ``lucene.simple``
  (lowercase, maximal letter runs), ``lucene.keyword`` (the whole value
  as one term, case preserved). Custom ``analyzers`` entries compose a
  tokenizer of one of those families with an optional ``lowercase``
  token filter. Language analyzers (``lucene.english``...) raise:
  their stemmer/stopword tables are index tuning with no pinned local
  stand-in, and a silent approximation would change relevance.
- ``token`` fields match whole un-analyzed values; ``normalizer:
  "lowercase"`` lowercases the STORED value (equals/in/range compare
  both sides lowercased; wildcard/regex match the lowercased value with
  the pattern as written, as Lucene matches patterns against the
  normalized term dictionary).
- ``text.synonyms`` / ``text.matchCriteria`` become a spec-level
  REWRITE (``rewrite_text_spec``) shared verbatim by the interpreter
  and the routed path, the same rewrite-then-reuse strategy as r9's
  ``text.fuzzy``: each analyzed query term expands to its synonym
  alternatives (single-token alternatives as ``text`` terms, multi-token
  alternatives as ``phrase`` clauses), ``matchCriteria: "any"`` wraps
  them in a should-compound (BM25 sum — the engine's pinned text
  scoring) and ``"all"`` in a must-compound of per-term alternative
  groups. Multi-token synonym INPUTS raise loudly (Lucene's synonym
  graph has no bounded local equivalent).
- ``autocomplete`` field options: ``tokenization`` must be
  ``edgeGram`` (the default; nGram/rightEdgeGram change matching in
  ways the prefix stand-in cannot pin — loud raise at query time);
  ``minGrams`` is enforced (query terms shorter than the shortest
  indexed gram match nothing); ``maxGrams`` is accepted but not
  enforced — the full-prefix stand-in is a documented superset of the
  gram index for long terms; ``foldDiacritics`` (default true) folds
  both corpus tokens and query terms through NFKD-strip-combining
  (the deterministic core of Lucene's ASCIIFolding).

Reference parity anchor: the reference's own tests exercise $search
only against a live server (test/sql/query/basic.test requires
MONGODB_TEST_DATABASE_AVAILABLE); this module is the local stand-in
for the server-side metadata those tests assume.
"""

from __future__ import annotations

import hashlib
import json
import unicodedata

# ---------------------------------------------------------------------------
# analyzers

_LANGUAGE_ANALYZERS = frozenset({
    "lucene.english", "lucene.french", "lucene.german", "lucene.spanish",
    "lucene.portuguese", "lucene.italian", "lucene.dutch", "lucene.russian",
    "lucene.arabic", "lucene.chinese", "lucene.japanese", "lucene.korean",
    "lucene.cjk", "lucene.thai", "lucene.turkish", "lucene.swedish",
    "lucene.norwegian", "lucene.danish", "lucene.finnish", "lucene.greek",
    "lucene.hindi", "lucene.hungarian", "lucene.polish", "lucene.romanian",
})


def _an_standard(text):
    from duckdb_mongo_spark.mql.search import _analyze

    return _analyze(text)


def _an_whitespace(text):
    if not isinstance(text, str):
        return []
    return text.split()


def _an_simple(text):
    if not isinstance(text, str):
        return []
    out, cur = [], []
    for ch in text.lower():
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _an_keyword(text):
    if not isinstance(text, str):
        return []
    return [text]


_BUILTIN_ANALYZERS = {
    "lucene.standard": _an_standard,
    "lucene.whitespace": _an_whitespace,
    "lucene.simple": _an_simple,
    "lucene.keyword": _an_keyword,
}

_TOKENIZER_FAMILIES = {
    "standard": _an_standard,
    "whitespace": _an_whitespace,
    "letter": _an_simple,      # letter runs; 'simple' = letter+lowercase
    "keyword": _an_keyword,
}


def fold_diacritics(tok: str) -> str:
    """NFKD + drop combining marks — the deterministic core of Lucene's
    ASCIIFolding filter (``café`` -> ``cafe``)."""
    return "".join(
        c for c in unicodedata.normalize("NFKD", tok)
        if not unicodedata.combining(c))


# field types a dynamic mapping creates automatically (Atlas: dynamic
# mappings index all "dynamically indexable" types; token, autocomplete,
# geo, facets and embeddedDocuments always need explicit mappings)
_DYNAMIC_TYPES = frozenset(
    {"string", "number", "date", "boolean", "objectId", "document"})

_KNOWN_TYPES = frozenset({
    "string", "token", "autocomplete", "number", "date", "boolean",
    "objectId", "geo", "document", "embeddedDocuments", "stringFacet",
    "numberFacet", "dateFacet", "uuid",
})


class SearchIndex:
    """One parsed Atlas search-index definition plus its resolved
    synonym collections, eagerly validated and fully serializable
    (``payload()``/``from_payload`` round-trip plain dicts so the
    definition rides inside the pipeline spec to executors)."""

    def __init__(self, definition: dict,
                 synonym_docs: dict[str, list[dict]] | None = None):
        if not isinstance(definition, dict):
            raise ValueError(
                f"search index definition must be a dict, got "
                f"{type(definition).__name__}")
        extra = set(definition) - {
            "mappings", "analyzer", "searchAnalyzer", "analyzers",
            "synonyms", "storedSource", "name"}
        if extra:
            raise ValueError(
                f"search index definition: unsupported keys {sorted(extra)}")
        self.definition = definition
        self.synonym_docs = dict(synonym_docs or {})
        self._custom: dict = {}
        for spec in definition.get("analyzers", []) or []:
            self._add_custom_analyzer(spec)
        self.default_analyzer = definition.get("analyzer", "lucene.standard")
        self.default_search_analyzer = definition.get(
            "searchAnalyzer", self.default_analyzer)
        # validate eagerly so a bad name fails at scan time, not mid-query
        self._analyzer_fn(self.default_analyzer)
        self._analyzer_fn(self.default_search_analyzer)
        mappings = definition.get("mappings", {}) or {}
        if not isinstance(mappings, dict) or set(mappings) - {
                "dynamic", "fields"}:
            raise ValueError(f"search index: bad mappings {mappings!r}")
        self.dynamic = bool(mappings.get("dynamic", False))
        self.fields = mappings.get("fields", {}) or {}
        self._validate_fields(self.fields, "")
        self._synonym_mappings = self._parse_synonyms(
            definition.get("synonyms", []) or [])

    # -- construction ------------------------------------------------------

    def _add_custom_analyzer(self, spec):
        if not isinstance(spec, dict) or not isinstance(
                spec.get("name"), str):
            raise ValueError(f"search index: bad analyzer entry {spec!r}")
        extra = set(spec) - {"name", "tokenizer", "tokenFilters",
                             "charFilters"}
        if extra:
            raise ValueError(
                f"search index analyzer {spec['name']!r}: unsupported keys "
                f"{sorted(extra)}")
        if spec.get("charFilters"):
            raise ValueError(
                f"search index analyzer {spec['name']!r}: charFilters are "
                "unsupported (no pinned local stand-in)")
        tok = spec.get("tokenizer") or {}
        fam = tok.get("type") if isinstance(tok, dict) else None
        base = _TOKENIZER_FAMILIES.get(fam)
        if base is None:
            raise ValueError(
                f"search index analyzer {spec['name']!r}: tokenizer type "
                f"{fam!r} unsupported (supported: "
                f"{sorted(_TOKENIZER_FAMILIES)})")
        filters = spec.get("tokenFilters", []) or []
        lower = False
        for f in filters:
            if isinstance(f, dict) and f.get("type") == "lowercase" \
                    and set(f) == {"type"}:
                lower = True
            else:
                raise ValueError(
                    f"search index analyzer {spec['name']!r}: tokenFilter "
                    f"{f!r} unsupported (only lowercase)")
        if lower:
            def fn(text, _b=base):
                return [t.lower() for t in _b(text)]
        else:
            fn = base
        self._custom[spec["name"]] = fn

    def analyzer_key(self, name: str) -> str:
        """Stable identity of an analyzer for statistics-sidecar keying
        (``ops/text_index``): builtin names are their own key; a custom
        analyzer's key hashes its full spec, so two definitions that
        reuse one NAME for different tokenizer/filter stacks never share
        cached statistics."""
        if name in self._custom:
            spec = next(
                (s for s in self.definition.get("analyzers", []) or []
                 if isinstance(s, dict) and s.get("name") == name), None)
            digest = hashlib.sha1(
                json.dumps(spec, sort_keys=True).encode()).hexdigest()[:12]
            return f"{name}#{digest}"
        return name

    def _analyzer_fn(self, name):
        fn = self._custom.get(name) or _BUILTIN_ANALYZERS.get(name)
        if fn is None:
            if name in _LANGUAGE_ANALYZERS:
                raise ValueError(
                    f"search index: analyzer {name!r} is unsupported — its "
                    "stemmer/stopword tables are index tuning with no "
                    "pinned local stand-in")
            raise ValueError(f"search index: unknown analyzer {name!r}")
        return fn

    def _validate_fields(self, fields, prefix):
        if not isinstance(fields, dict):
            raise ValueError(
                f"search index: mappings.fields{prefix and ' at ' + prefix} "
                f"must be a dict, got {fields!r}")
        for name, defs in fields.items():
            for d in (defs if isinstance(defs, list) else [defs]):
                if not isinstance(d, dict):
                    raise ValueError(
                        f"search index field {prefix + name!r}: bad "
                        f"definition {d!r}")
                t = d.get("type")
                if t not in _KNOWN_TYPES:
                    raise ValueError(
                        f"search index field {prefix + name!r}: unknown "
                        f"type {t!r}")
                if t == "string":
                    for k in ("analyzer", "searchAnalyzer"):
                        if k in d:
                            self._analyzer_fn(d[k])
                if t == "token":
                    norm = d.get("normalizer", "none")
                    if norm not in ("none", "lowercase"):
                        raise ValueError(
                            f"search index field {prefix + name!r}: bad "
                            f"token normalizer {norm!r}")
                if t == "autocomplete" and "analyzer" in d:
                    self._analyzer_fn(d["analyzer"])
                if t in ("document", "embeddedDocuments"):
                    self._validate_fields(
                        d.get("fields", {}) or {}, prefix + name + ".")

    def _parse_synonyms(self, entries):
        out = {}
        for e in entries:
            if not isinstance(e, dict) or not isinstance(
                    e.get("name"), str) or set(e) - {
                        "name", "analyzer", "source"}:
                raise ValueError(f"search index: bad synonyms entry {e!r}")
            src = e.get("source") or {}
            coll = src.get("collection") if isinstance(src, dict) else None
            if not isinstance(coll, str):
                raise ValueError(
                    f"search index synonyms {e['name']!r}: source."
                    "collection is required")
            an_name = e.get("analyzer", "lucene.standard")
            an = self._analyzer_fn(an_name)
            docs = self.synonym_docs.get(e["name"])
            if docs is None:
                docs = self.synonym_docs.get(coll)
            if docs is None:
                raise ValueError(
                    f"search index synonyms {e['name']!r}: source "
                    f"collection {coll!r} was not resolved — pass its "
                    "documents (mongo_scan resolves it from the backend)")
            rules = []  # (input token tuple, [alternative token tuples])
            for d in docs:
                mt = d.get("mappingType")
                if mt == "equivalent":
                    seqs = [tuple(an(s)) for s in d.get("synonyms", [])]
                    seqs = [s for s in seqs if s]
                    for s in seqs:
                        rules.append((s, [o for o in seqs if o != s]))
                elif mt == "explicit":
                    alts = [tuple(an(s)) for s in d.get("synonyms", [])]
                    alts = [a for a in alts if a]
                    for inp in d.get("input", []):
                        seq = tuple(an(inp))
                        if seq:
                            rules.append((seq, alts))
                else:
                    raise ValueError(
                        f"search index synonyms {e['name']!r}: bad "
                        f"mappingType {mt!r}")
            for inp, _alts in rules:
                if len(inp) > 1:
                    raise ValueError(
                        f"search index synonyms {e['name']!r}: multi-token "
                        f"input {' '.join(inp)!r} is unsupported (Lucene's "
                        "synonym graph has no pinned local stand-in)")
            merged: dict = {}
            for inp, alts in rules:
                merged.setdefault(inp[0], []).extend(alts)
            out[e["name"]] = {"analyzer": an_name, "rules": merged}
        return out

    # -- serialization -----------------------------------------------------

    def payload(self) -> dict:
        return {"definition": self.definition,
                "synonyms": self.synonym_docs}

    @classmethod
    def from_payload(cls, payload) -> "SearchIndex":
        return cls(payload["definition"], payload.get("synonyms"))

    # -- path resolution ---------------------------------------------------

    def _defs(self, path: str) -> list[dict] | None:
        """Explicit type definitions covering ``path``; ``None`` when the
        path falls under a dynamic mapping instead (indexed with the
        default analyzer / dynamic types); ``[]`` when unindexed."""
        parts = path.split(".")
        fields, dynamic = self.fields, self.dynamic
        for i, p in enumerate(parts):
            defs = fields.get(p)
            if defs is None:
                return None if dynamic else []
            defs = defs if isinstance(defs, list) else [defs]
            if i == len(parts) - 1:
                return defs
            nxt = [d for d in defs
                   if d.get("type") in ("document", "embeddedDocuments")]
            if not nxt:
                return []
            d = nxt[0]
            fields = d.get("fields", {}) or {}
            dynamic = bool(d.get("dynamic", False))
        return []

    def types(self, path: str) -> set:
        defs = self._defs(path)
        if defs is None:
            return set(_DYNAMIC_TYPES)
        return {d.get("type") for d in defs}

    def is_indexed(self, path: str) -> bool:
        return bool(self.types(path))

    def _first_def(self, path: str, t: str) -> dict | None:
        defs = self._defs(path)
        for d in defs or []:
            if d.get("type") == t:
                return d
        return None

    def text_tokenizers(self, path: str):
        """``(index_fn, search_fn)`` for an analyzed string path, or
        ``None`` when the path has no ``string`` coverage (text/phrase
        then match nothing)."""
        names = self.text_analyzer_names(path)
        if names is None:
            return None
        return self._analyzer_fn(names[0]), self._analyzer_fn(names[1])

    def text_analyzer_names(self, path: str):
        defs = self._defs(path)
        if defs is None:  # dynamic: default analyzers
            return self.default_analyzer, self.default_search_analyzer
        d = self._first_def(path, "string")
        if d is None:
            return None
        a = d.get("analyzer", self.default_analyzer)
        return a, d.get("searchAnalyzer",
                        d.get("analyzer", self.default_search_analyzer))

    def token_normalizer(self, path: str):
        """``"none"``/``"lowercase"`` when the path has a ``token``
        definition, else ``None`` (dynamic mappings never create one)."""
        d = self._first_def(path, "token")
        if d is None:
            return None
        return d.get("normalizer", "none")

    def autocomplete_def(self, path: str):
        """The autocomplete definition with defaults filled, or ``None``.
        Raises for option values the prefix stand-in cannot pin."""
        d = self._first_def(path, "autocomplete")
        if d is None:
            return None
        tok = d.get("tokenization", "edgeGram")
        if tok != "edgeGram":
            raise ValueError(
                f"$search autocomplete: tokenization {tok!r} on {path!r} "
                "is unsupported (the local stand-in pins edgeGram prefix "
                "matching; nGram/rightEdgeGram change match semantics)")
        return {
            "analyzer": self._analyzer_fn(
                d.get("analyzer", "lucene.standard")),
            "minGrams": int(d.get("minGrams", 2)),
            "maxGrams": int(d.get("maxGrams", 15)),
            "foldDiacritics": bool(d.get("foldDiacritics", True)),
        }

    def covers_value(self, path: str, value) -> bool:
        """Can ``equals``/``in``/``range``/``near`` match this constant on
        this path? Strings need an explicit ``token`` field; the other
        kinds ride explicit or dynamic coverage."""
        import datetime as _dt

        from duckdb_mongo_spark.bsonlike import ObjectId

        ts = self.types(path)
        if isinstance(value, bool):
            return "boolean" in ts
        if isinstance(value, (int, float)):
            return "number" in ts
        if isinstance(value, str):
            return "token" in ts
        if isinstance(value, _dt.datetime):
            return "date" in ts
        if isinstance(value, ObjectId):
            return "objectId" in ts
        if value is None:
            return bool(ts)
        return False

    def synonym_mapping(self, name: str) -> dict:
        m = self._synonym_mappings.get(name)
        if m is None:
            raise ValueError(
                f"$search text: synonyms mapping {name!r} is not declared "
                "in the search index definition")
        return m


class Unroutable(Exception):
    """A rewrite produced a tree the routed compiler cannot score (e.g.
    a score option on a synonym-expanded compound) — the caller
    declines to the interpreter, which handles it exactly."""


def rewrite_spec_tree(op, spec, index):
    """Recursively rewrite every ``text`` clause carrying ``synonyms``/
    ``matchCriteria`` in an operator tree (``rewrite_text_spec``) —
    the routed path applies this ONCE to the whole tree so its clause
    compilers only ever see plain text/phrase/compound, the same shapes
    the interpreter's per-clause rewrite produces. Returns the new
    ``(op, spec)``; raises ``ValueError`` for specs the interpreter
    would reject and ``Unroutable`` for valid-but-uncompilable shapes."""
    if not isinstance(spec, dict):
        return op, spec
    if op == "text" and ("synonyms" in spec or "matchCriteria" in spec):
        rw = rewrite_text_spec(spec, index)
        if rw is None:
            # matchCriteria "any" (or absent) without synonyms IS the
            # default text semantics — drop the redundant key
            return "text", {k: v for k, v in spec.items()
                            if k != "matchCriteria"}
        (nop, nspec), = rw.items()
        if "score" in spec:
            if nop == "compound":
                # compound carries no score slot in the routed compiler;
                # the interpreter applies the original mod to the
                # rewritten tree's base
                raise Unroutable("score option on a synonym expansion")
            nspec = {**nspec, "score": spec["score"]}
        return nop, nspec
    if op == "compound":
        out = {}
        for key, cls in spec.items():
            if key in ("must", "mustNot", "filter", "should"):
                cls = [cls] if isinstance(cls, dict) else list(cls)
                new = []
                for cl in cls:
                    if isinstance(cl, dict) and len(cl) == 1:
                        (sop, sspec), = cl.items()
                        sop, sspec = rewrite_spec_tree(sop, sspec, index)
                        new.append({sop: sspec})
                    else:
                        new.append(cl)
                out[key] = new
            else:
                out[key] = cls
        return "compound", out
    if op == "embeddedDocument" and isinstance(spec.get("operator"), dict) \
            and len(spec["operator"]) == 1:
        (iop, ispec), = spec["operator"].items()
        iop, ispec = rewrite_spec_tree(iop, ispec, index)
        return op, {**spec, "operator": {iop: ispec}}
    return op, spec


def routes_default(index, op, spec) -> bool:
    """True when ``index`` leaves this operator tree's semantics exactly
    at the engine-contract default, so an already-verified routed
    compilation stays valid unchanged (r10). False declines the routed
    path; the interpreter then executes the index-aware semantics (or
    raises the spec's loud error). Malformed shapes return True — the
    clause parsers and the interpreter own that validation."""
    if index is None:
        return True
    if not isinstance(spec, dict):
        return True
    p = spec.get("path")
    paths = ([p] if isinstance(p, str)
             else [x for x in p if isinstance(x, str)]
             if isinstance(p, list) else [])
    try:
        if op in ("text", "phrase", "moreLikeThis"):
            # moreLikeThis translates into text clauses over its paths
            return bool(paths) and all(
                index.text_analyzer_names(x) ==
                ("lucene.standard", "lucene.standard") for x in paths)
        if op == "autocomplete":
            return False  # gram bounds / diacritic folding apply
        if op == "near":
            return bool(paths) and all(
                index.covers_value(x, spec.get("origin")) for x in paths)
        if op in ("wildcard", "regex"):
            return (not spec.get("allowAnalyzedField") and bool(paths)
                    and all(index.token_normalizer(x) == "none"
                            for x in paths))
        if op in ("geoWithin", "geoShape"):
            return bool(paths) and all(
                "geo" in index.types(x) for x in paths)
        if op == "exists":
            return bool(paths) and all(index.is_indexed(x) for x in paths)
        if op in ("equals", "in", "range"):
            if op == "equals":
                vals = [spec.get("value")]
            elif op == "in":
                vals = spec.get("value")
                vals = vals if isinstance(vals, list) else []
            else:
                vals = [spec[b] for b in ("gt", "gte", "lt", "lte")
                        if b in spec]
            return bool(paths) and all(
                index.covers_value(x, v) and not (
                    isinstance(v, str)
                    and index.token_normalizer(x) == "lowercase")
                for x in paths for v in vals)
        if op == "embeddedDocument":
            if not paths or not all(
                    "embeddedDocuments" in index.types(x) for x in paths):
                return False
            inner = spec.get("operator")
            if isinstance(inner, dict) and len(inner) == 1:
                (iop, ispec), = inner.items()
                return routes_default(index, iop, ispec)
            return True
        if op == "compound":
            for key in ("must", "mustNot", "filter", "should"):
                cls = spec.get(key, [])
                for cl in ([cls] if isinstance(cls, dict) else list(cls)):
                    if isinstance(cl, dict) and len(cl) == 1:
                        (sop, sspec), = cl.items()
                        if not routes_default(index, sop, sspec):
                            return False
            return True
        if op == "queryString":
            if isinstance(spec.get("query"), str) and isinstance(
                    spec.get("defaultPath"), str):
                from duckdb_mongo_spark.mql.search import parse_query_string

                translated = parse_query_string(
                    spec["query"], spec["defaultPath"])
                (top, tspec), = translated.items()
                return routes_default(index, top, tspec)
            return True
    except ValueError:
        return False  # the interpreter raises the loud error
    return True


class RoutedIndexCtx:
    """Per-path analyzer resolution the routed ``$search`` compiler
    stashes on the frame in "custom" mode (r11 — mixed analyzer pairs).
    Each path resolves its OWN (index, search) analyzer pair from the
    definition, so clauses whose paths declare different analyzers
    route together: corpus token columns are produced per path by that
    path's index-analyzer CPython fn (the oracle-fn Arrow pass — parity
    by construction) and query terms analyze per (clause, path) with
    the path's search analyzer, exactly the interpreter's
    ``terms_for[p]`` semantics (mql/search.py ``_eval_operator``)."""

    def __init__(self, index: "SearchIndex"):
        self.index = index

    def pair_names(self, path: str):
        return self.index.text_analyzer_names(path)

    def index_fn(self, path: str):
        nm = self.index.text_analyzer_names(path)
        return None if nm is None else self.index._analyzer_fn(nm[0])

    def search_fn(self, path: str):
        nm = self.index.text_analyzer_names(path)
        return None if nm is None else self.index._analyzer_fn(nm[1])

    def stats_key(self, path: str):
        """Statistics-sidecar analyzer key for this path's INDEX
        analyzer (``ops/text_index`` keying), or None when uncovered."""
        nm = self.index.text_analyzer_names(path)
        return None if nm is None else self.index.analyzer_key(nm[0])


def text_route_analyzers(index, op, spec):
    """Routing mode for an operator tree under ``index`` (r10 analyzer
    routing; r11 drops the one-pair restriction). Returns:

    - ``("default", None)`` — ``routes_default`` holds: the verified
      routed compilation is valid unchanged;
    - ``("custom", None)`` — every ``text``/``phrase`` path (including
      inside compounds and translated queryStrings) resolves to SOME
      supported analyzer pair (pairs may differ per path — the routed
      compiler analyzes query terms per (clause, path) and produces
      corpus tokens per path, see ``RoutedIndexCtx``; ``text.fuzzy``
      expands against each path's index-analyzer vocabulary — r11) and
      every other clause stays at the default or is a
      lowercase-normalized cond/wildcard (Arrow-pass match columns);
    - ``("decline", None)`` — the interpreter executes the index-aware
      semantics (or raises the spec's loud error).
    """
    if index is None or routes_default(index, op, spec):
        return ("default", None)
    names: set = set()
    try:
        if not _collect_text_analyzers(index, op, spec, names):
            return ("decline", None)
    except ValueError:
        return ("decline", None)  # the interpreter raises the loud error
    return ("custom", None)


def _collect_text_analyzers(index, op, spec, names) -> bool:
    """routes_default's recursion with text/phrase relaxed: collect
    their analyzer pairs into ``names``; everything else must hold the
    engine-contract default. False ⇒ decline."""
    if not isinstance(spec, dict):
        return False
    if op in ("text", "phrase"):
        # (r11: text.fuzzy no longer declines here — the expansion
        # dictionary builds with each path's INDEX analyzer and the
        # per-path expansions ride the clause; an expansion that cannot
        # proceed falls back at parse time, interpreter-exact)
        p = spec.get("path")
        paths = ([p] if isinstance(p, str)
                 else [x for x in p if isinstance(x, str)]
                 if isinstance(p, list) else [])
        if not paths:
            return False
        for x in paths:
            nm = index.text_analyzer_names(x)
            if nm is None:
                return False  # uncovered path matches nothing — interpreter
            names.add(nm)
        return True
    if op == "compound":
        for key in ("must", "mustNot", "filter", "should"):
            cls = spec.get(key, [])
            for cl in ([cls] if isinstance(cls, dict) else list(cls)):
                if isinstance(cl, dict) and len(cl) == 1:
                    (sop, sspec), = cl.items()
                    if sop in ("text", "phrase", "compound",
                               "queryString", "moreLikeThis",
                               "autocomplete", "wildcard", "regex",
                               "equals", "in", "range",
                               "embeddedDocument"):
                        if not _collect_text_analyzers(
                                index, sop, sspec, names):
                            return False
                    elif not routes_default(index, sop, sspec):
                        return False
        return True
    if op == "queryString":
        if isinstance(spec.get("query"), str) and isinstance(
                spec.get("defaultPath"), str):
            from duckdb_mongo_spark.mql.search import parse_query_string

            translated = parse_query_string(
                spec["query"], spec["defaultPath"])
            (top, tspec), = translated.items()
            return _collect_text_analyzers(index, top, tspec, names)
        return False
    if op == "moreLikeThis":
        # translation extracts terms with the engine-contract analyzer
        # (the interpreter does the same); the RESULTING text clauses
        # evaluate per-path, so their analyzers must join the set
        from duckdb_mongo_spark.mql.search import translate_more_like_this

        translated = translate_more_like_this(spec)
        return _collect_text_analyzers(
            index, "compound", translated["compound"], names)
    if op == "autocomplete":
        # routable when every path has an edgeGram autocomplete mapping
        # (autocomplete_def raises on other tokenizations — caught by
        # the caller, declining to the interpreter's loud error); its
        # per-path analyzer/gram/fold options ride the clause payload,
        # independent of the text-analyzer pair
        p = spec.get("path")
        paths = ([p] if isinstance(p, str)
                 else [x for x in p if isinstance(x, str)]
                 if isinstance(p, list) else [])
        return bool(paths) and all(
            index.autocomplete_def(x) is not None for x in paths)
    if op in ("wildcard", "regex"):
        # token-"none" paths match the raw stored value (the default
        # routed semantics); with allowAnalyzedField the pattern also
        # matches ANY analyzed token, so those paths' analyzers join
        # the set and the clause matches against the shared token
        # columns. lowercase normalizers and the analyzed-without-allow
        # loud raise decline to the interpreter.
        p = spec.get("path")
        paths = ([p] if isinstance(p, str)
                 else [x for x in p if isinstance(x, str)]
                 if isinstance(p, list) else [])
        if not paths:
            return False
        allow = bool(spec.get("allowAnalyzedField"))
        for x in paths:
            norm = index.token_normalizer(x)
            nm = index.text_analyzer_names(x)
            # r11: normalizer "lowercase" routes too — the pattern (as
            # written) matches the oracle-lowercased stored value via an
            # Arrow-pass column (JVM lower() diverges off-ASCII)
            if allow:
                if nm is not None:
                    names.add(nm)
            elif norm is None and nm is not None:
                return False  # the interpreter raises the loud error
        return True
    if op == "embeddedDocument":
        # r11: routable when the path is mapped embeddedDocuments and
        # the inner operator tree collects (inner text paths resolve
        # their OWN analyzer pairs through the mapping; inner conds
        # must hold the engine default — the element compiler has no
        # lowercase machinery)
        p = spec.get("path")
        paths = ([p] if isinstance(p, str)
                 else [x for x in p if isinstance(x, str)]
                 if isinstance(p, list) else [])
        if not paths or not all(
                "embeddedDocuments" in index.types(x) for x in paths):
            return False
        inner = spec.get("operator")
        if isinstance(inner, dict) and len(inner) == 1:
            (iop, ispec), = inner.items()
            if iop in ("equals", "in", "range", "exists"):
                return routes_default(index, iop, ispec)
            return _collect_text_analyzers(index, iop, ispec, names)
        return True
    if op in ("equals", "in", "range"):
        # r11: lowercase token normalizers on string constants route —
        # both comparison sides lowercase through the oracle's own
        # str.lower (the Arrow-pass match column + a CPython-lowered
        # literal); everything else must match the engine default
        if routes_default(index, op, spec):
            return True
        if op == "equals":
            vals = [spec.get("value")]
        elif op == "in":
            vals = spec.get("value")
            vals = vals if isinstance(vals, list) else []
        else:
            vals = [spec[b] for b in ("gt", "gte", "lt", "lte")
                    if b in spec]
        p = spec.get("path")
        paths = ([p] if isinstance(p, str)
                 else [x for x in p if isinstance(x, str)]
                 if isinstance(p, list) else [])
        return bool(paths) and all(
            index.covers_value(x, v) for x in paths for v in vals)
    return routes_default(index, op, spec)


_SYN_COLLECTION_CAP = 100_000

_DEFN_KEYS = frozenset({"mappings", "analyzer", "searchAnalyzer",
                        "analyzers", "synonyms", "storedSource", "name"})


def attach_search_index(pipeline, search_index, resolve_collection):
    """Validate ``search_index`` (the public Atlas index-definition
    JSON, or a ``{index_name: definition}`` mapping), resolve its
    synonym source collections through ``resolve_collection(name) ->
    iterable of docs`` (bounded: synonym collections are query-side
    metadata, not data — more than 100k entries raises), and embed the
    serializable payload into the pipeline's leading ``$search``/
    ``$searchMeta`` stage, where EVERY execution path (interpreter,
    partitioned datasource, routed plans) picks it up. Returns the new
    pipeline; the input is not mutated."""
    if not pipeline or not isinstance(pipeline[0], dict) \
            or len(pipeline[0]) != 1 \
            or next(iter(pipeline[0])) not in ("$search", "$searchMeta"):
        raise ValueError(
            "search_index= requires the pipeline to start with $search "
            "or $searchMeta")
    (head_op, head_spec), = pipeline[0].items()
    if not isinstance(head_spec, dict):
        raise ValueError(f"search_index=: bad {head_op} spec {head_spec!r}")
    if not isinstance(search_index, dict):
        raise ValueError(
            f"search_index= must be a dict, got "
            f"{type(search_index).__name__}")
    definition = search_index
    if search_index and not (set(search_index) & _DEFN_KEYS) and all(
            isinstance(v, dict) for v in search_index.values()):
        # {index_name: definition} form: pick by the spec's index name
        name = head_spec.get("index", "default")
        definition = search_index.get(name)
        if definition is None:
            raise ValueError(
                f"search_index=: no definition for index {name!r} "
                f"(declared: {sorted(search_index)})")
    syn_docs = {}
    for e in (definition.get("synonyms") or []):
        if not isinstance(e, dict):
            continue  # SearchIndex() below raises the loud shape error
        src = e.get("source")
        coll = src.get("collection") if isinstance(src, dict) else None
        if not isinstance(coll, str) or not isinstance(e.get("name"), str):
            continue
        docs = []
        for j, doc in enumerate(resolve_collection(coll)):
            if j >= _SYN_COLLECTION_CAP:
                raise ValueError(
                    f"search_index=: synonym source collection {coll!r} "
                    f"exceeds {_SYN_COLLECTION_CAP} documents — a synonym "
                    "mapping is query-side metadata, not data")
            docs.append(doc)
        syn_docs[e["name"]] = docs
    payload = SearchIndex(definition, syn_docs).payload()  # validates
    new_head = {head_op: {**head_spec, "__indexDefinition__": payload}}
    return [new_head] + list(pipeline[1:])


def rewrite_text_spec(spec: dict, index: SearchIndex | None):
    """Rewrite a ``text`` clause carrying ``synonyms``/``matchCriteria``
    into a clause tree built only from plain ``text``/``phrase``/
    ``compound`` — the ONE translation both the interpreter and the
    routed path execute (parity by construction, the r9 fuzzy-rewrite
    strategy). Returns ``None`` when no rewrite applies (no synonyms,
    matchCriteria absent or ``"any"`` — the engine's default text
    semantics), else a single-operator clause dict WITHOUT the original
    ``score`` option (callers apply it to the rewritten tree's score).

    Scoring pin: ``"any"`` wraps all alternatives in a should-compound
    with ``minimumShouldMatch: 1`` — matching clause scores sum, which
    for single-token alternatives equals multi-term BM25 text scoring.
    ``"all"`` is a must-compound of per-term alternative groups. Lucene's
    SynonymQuery blending (df=max, tf=sum) is index-statistics-bound;
    the sum-of-alternatives pin is this engine's documented contract.
    """
    syn = spec.get("synonyms")
    mc = spec.get("matchCriteria")
    if mc is not None and mc not in ("any", "all"):
        raise ValueError(f"$search text: bad matchCriteria {mc!r}")
    if syn is None and mc in (None, "any"):
        return None
    if "fuzzy" in spec:
        raise ValueError(
            "$search text: fuzzy cannot combine with synonyms/"
            "matchCriteria (Atlas rejects the combination)")
    if not isinstance(spec.get("query"), (str, list)):
        raise ValueError(f"$search text: bad query {spec.get('query')!r}")
    if syn is not None and index is None:
        raise ValueError(
            "$search text: synonyms need the index definition's synonym "
            "mapping — supply search_index= on mongo_scan")

    paths = spec["path"] if isinstance(spec["path"], list) else [spec["path"]]
    # one search analyzer must govern the whole rewrite (Atlas requires
    # the synonym mapping's analyzer to match the queried fields')
    if index is not None:
        names = {index.text_analyzer_names(p) for p in paths}
        names.discard(None)  # uncovered paths match nothing either way
        if len(names) > 1:
            raise ValueError(
                "$search text: synonyms/matchCriteria over paths with "
                f"different analyzers {sorted(n[1] for n in names)} is "
                "unsupported")
        search_an_name = next(iter(names))[1] if names else "lucene.standard"
        search_an = index._analyzer_fn(search_an_name)
    else:
        from duckdb_mongo_spark.mql.search import _analyze as search_an

        search_an_name = "lucene.standard"

    rules = {}
    if syn is not None:
        if not isinstance(syn, str):
            raise ValueError(f"$search text: bad synonyms {syn!r}")
        mapping = index.synonym_mapping(syn)
        if mapping["analyzer"] != search_an_name:
            raise ValueError(
                f"$search text: synonyms mapping {syn!r} uses analyzer "
                f"{mapping['analyzer']!r} but the queried paths use "
                f"{search_an_name!r} (Atlas requires them to match)")
        rules = mapping["rules"]

    q = spec["query"]
    terms = (search_an(q) if isinstance(q, str)
             else [t for s in q for t in search_an(s)])
    if not terms:
        raise ValueError(
            f"$search text: query {q!r} has no analyzable terms")

    path_spec = spec["path"]

    def alt_clause(seq):
        if len(seq) == 1:
            return {"text": {"query": seq[0], "path": path_spec}}
        return {"phrase": {"query": " ".join(seq), "path": path_spec}}

    def alternatives(t):
        alts = [(t,)]
        for a in rules.get(t, []):
            if a not in alts:
                alts.append(a)
        return alts

    if mc != "all":
        # "any": one should-compound over every alternative of every term;
        # single-token alternatives collapse into one multi-term text
        singles, clauses = [], []
        for t in terms:
            for a in alternatives(t):
                if len(a) == 1:
                    if a[0] not in singles:
                        singles.append(a[0])
                else:
                    cl = alt_clause(a)
                    if cl not in clauses:
                        clauses.append(cl)
        if singles:
            clauses.insert(
                0, {"text": {"query": singles if len(singles) > 1
                             else singles[0], "path": path_spec}})
        if len(clauses) == 1:
            return clauses[0]
        return {"compound": {"should": clauses, "minimumShouldMatch": 1}}

    groups = []
    for t in terms:
        alts = [alt_clause(a) for a in alternatives(t)]
        if len(alts) == 1:
            groups.append(alts[0])
        else:
            groups.append({"compound": {
                "should": alts, "minimumShouldMatch": 1}})
    if len(groups) == 1:
        return groups[0]
    return {"compound": {"must": groups}}
