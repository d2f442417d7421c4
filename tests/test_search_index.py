"""r10: user-supplied Atlas search-index definitions (``search_index=``).

The reference ships ``$search`` pipelines verbatim to a live server
whose index definition decides matching (reference README pipeline
passthrough); ``mql/search_index`` is the local stand-in. These tests
pin the module contract: per-path analyzers, token/autocomplete/geo
coverage, synonym rewrites, routed-vs-interpreter parity, and the
loud-raise boundaries.
"""

from __future__ import annotations

import pytest

from duckdb_mongo_spark.mql import run_pipeline
from duckdb_mongo_spark.mql.search_index import (
    SearchIndex,
    attach_search_index,
    fold_diacritics,
    rewrite_text_spec,
    routes_default,
)

SCORE = [{"$addFields": {"s": {"$meta": "searchScore"}}}]


def runi(spec, docs, definition, synonyms=None, extra=()):
    payload = SearchIndex(definition, synonyms).payload()
    return run_pipeline(
        docs, [{"$search": {**spec, "__indexDefinition__": payload}},
               *extra])


def ids(rows):
    return [d["_id"] for d in rows]


DOCS = [
    {"_id": 1, "t": "spark is fast", "views": 10, "lang": "en"},
    {"_id": 2, "t": "spark spark streaming", "views": 3, "lang": "en"},
    {"_id": 3, "t": "duckdb is a database", "views": 7, "lang": "DE"},
    {"_id": 4, "views": 1},
]

STR_T = {"mappings": {"fields": {"t": {"type": "string"}}}}
DYNAMIC = {"mappings": {"dynamic": True}}


# ---------------------------------------------------------------------------
# definition parsing / validation


class TestDefinitionValidation:
    def test_bad_type(self):
        with pytest.raises(ValueError, match="must be a dict"):
            SearchIndex(["mappings"])

    def test_unknown_top_level_keys(self):
        with pytest.raises(ValueError, match="unsupported keys"):
            SearchIndex({"mappings": {}, "bogus": 1})

    def test_bad_mappings_keys(self):
        with pytest.raises(ValueError, match="bad mappings"):
            SearchIndex({"mappings": {"fields": {}, "nope": 1}})

    def test_unknown_analyzer(self):
        with pytest.raises(ValueError, match="unknown analyzer"):
            SearchIndex({"analyzer": "lucene.bogus"})

    def test_language_analyzers_raise(self):
        # stemmer/stopword tables are index tuning with no pinned
        # local stand-in — a silent approximation would change relevance
        with pytest.raises(ValueError, match="no.*pinned|unsupported"):
            SearchIndex({"analyzer": "lucene.english"})

    def test_unknown_field_type(self):
        with pytest.raises(ValueError, match="unknown.*type"):
            SearchIndex({"mappings": {"fields": {"t": {"type": "blob"}}}})

    def test_bad_token_normalizer(self):
        with pytest.raises(ValueError, match="normalizer"):
            SearchIndex({"mappings": {"fields": {
                "t": {"type": "token", "normalizer": "upper"}}}})

    def test_custom_analyzer_validation(self):
        with pytest.raises(ValueError, match="tokenizer type"):
            SearchIndex({"analyzers": [
                {"name": "x", "tokenizer": {"type": "nGram"}}]})
        with pytest.raises(ValueError, match="charFilters"):
            SearchIndex({"analyzers": [
                {"name": "x", "tokenizer": {"type": "whitespace"},
                 "charFilters": [{"type": "htmlStrip"}]}]})
        with pytest.raises(ValueError, match="tokenFilter"):
            SearchIndex({"analyzers": [
                {"name": "x", "tokenizer": {"type": "whitespace"},
                 "tokenFilters": [{"type": "stemmer"}]}]})

    def test_payload_round_trip(self):
        defn = {"mappings": {"dynamic": True, "fields": {
            "t": {"type": "string"}}}, "analyzer": "lucene.simple"}
        idx = SearchIndex(defn)
        again = SearchIndex.from_payload(idx.payload())
        assert again.definition == defn
        assert again.dynamic and again.types("t") == {"string"}

    def test_multi_type_field_defs(self):
        idx = SearchIndex({"mappings": {"fields": {
            "t": [{"type": "string"}, {"type": "token"}]}}})
        assert idx.types("t") == {"string", "token"}
        assert idx.token_normalizer("t") == "none"
        assert idx.text_analyzer_names("t") == (
            "lucene.standard", "lucene.standard")

    def test_nested_document_resolution(self):
        idx = SearchIndex({"mappings": {"fields": {
            "a": {"type": "document", "fields": {
                "b": {"type": "number"}}}}}})
        assert idx.types("a.b") == {"number"}
        assert idx.types("a.c") == set()       # explicit subdoc, no mapping
        assert idx.types("z") == set()         # dynamic defaults to false
        dyn = SearchIndex({"mappings": {"fields": {
            "a": {"type": "document", "dynamic": True, "fields": {}}}}})
        assert "number" in dyn.types("a.anything")


# ---------------------------------------------------------------------------
# per-path analyzers


class TestAnalyzers:
    def test_unindexed_path_matches_nothing(self):
        # mappings.dynamic defaults to FALSE (the Atlas default): a text
        # query over an unmapped path matches nothing, loudly different
        # from the no-index engine contract
        out = runi({"text": {"query": "spark", "path": "t"}}, DOCS,
                   {"mappings": {"fields": {"lang": {"type": "string"}}}})
        assert out == []

    def test_dynamic_mapping_default_analyzer(self):
        out = runi({"text": {"query": "spark", "path": "t"}}, DOCS, DYNAMIC)
        assert ids(out) == [2, 1]

    def test_scores_match_engine_contract_under_standard(self):
        # an all-standard index must leave BM25 bit-identical to the
        # no-index engine contract
        base = run_pipeline(
            DOCS, [{"$search": {"text": {"query": "spark", "path": "t"}}},
                   *SCORE])
        out = runi({"text": {"query": "spark", "path": "t"}}, DOCS, STR_T,
                   extra=SCORE)
        assert [(d["_id"], d["s"]) for d in out] == \
            [(d["_id"], d["s"]) for d in base]

    def test_keyword_analyzer_whole_value_one_term(self):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.keyword"}}}}
        assert runi({"text": {"query": "spark", "path": "t"}},
                    DOCS, defn) == []
        out = runi({"text": {"query": "spark is fast", "path": "t"}},
                   DOCS, defn)
        assert ids(out) == [1]

    def test_whitespace_analyzer_preserves_case(self):
        docs = [{"_id": 1, "t": "Spark rocks"}, {"_id": 2, "t": "spark"}]
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        assert ids(runi({"text": {"query": "Spark", "path": "t"}},
                        docs, defn)) == [1]
        assert ids(runi({"text": {"query": "spark", "path": "t"}},
                        docs, defn)) == [2]

    def test_simple_analyzer_letter_runs(self):
        docs = [{"_id": 1, "t": "SPARK123fast"}]
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.simple"}}}}
        # letters-only runs, lowercased: tokens = [spark, fast]
        assert ids(runi({"text": {"query": "spark", "path": "t"}},
                        docs, defn)) == [1]
        assert runi({"text": {"query": "123", "path": "t"}},
                    docs, defn) == []

    def test_custom_analyzer_lowercase_filter(self):
        docs = [{"_id": 1, "t": "Spark Rocks"}]
        defn = {
            "analyzers": [{"name": "ws_lower",
                           "tokenizer": {"type": "whitespace"},
                           "tokenFilters": [{"type": "lowercase"}]}],
            "mappings": {"fields": {"t": {
                "type": "string", "analyzer": "ws_lower"}}},
        }
        assert ids(runi({"text": {"query": "spark", "path": "t"}},
                        docs, defn)) == [1]

    def test_search_analyzer_differs_from_index_analyzer(self):
        # index side keeps case (whitespace), search side lowercases —
        # so an upper-case QUERY lowers to match nothing in a cased corpus
        docs = [{"_id": 1, "t": "SPARK"}, {"_id": 2, "t": "spark"}]
        defn = {
            "analyzers": [{"name": "ws_lower",
                           "tokenizer": {"type": "whitespace"},
                           "tokenFilters": [{"type": "lowercase"}]}],
            "mappings": {"fields": {"t": {
                "type": "string", "analyzer": "lucene.whitespace",
                "searchAnalyzer": "ws_lower"}}},
        }
        assert ids(runi({"text": {"query": "SPARK", "path": "t"}},
                        docs, defn)) == [2]

    def test_phrase_uses_path_analyzers(self):
        docs = [{"_id": 1, "t": "Big Spark Engine"}]
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        assert ids(runi({"phrase": {"query": "Spark Engine", "path": "t"}},
                        docs, defn)) == [1]
        assert runi({"phrase": {"query": "spark engine", "path": "t"}},
                    docs, defn) == []


# ---------------------------------------------------------------------------
# token coverage: equals / in / range / exists / near


class TestTokenCoverage:
    TOKEN_T = {"mappings": {"fields": {"t": {"type": "token"}}}}
    TOKEN_LOWER = {"mappings": {"fields": {
        "t": {"type": "token", "normalizer": "lowercase"}}}}

    def test_equals_string_needs_token_mapping(self):
        docs = [{"_id": 1, "t": "spark"}]
        # analyzed-string-only path: equals on a string matches nothing
        assert runi({"equals": {"path": "t", "value": "spark"}},
                    docs, STR_T) == []
        assert ids(runi({"equals": {"path": "t", "value": "spark"}},
                        docs, self.TOKEN_T)) == [1]

    def test_equals_lowercase_normalizer(self):
        docs = [{"_id": 1, "t": "Spark"}, {"_id": 2, "t": "SPARK"}]
        out = runi({"equals": {"path": "t", "value": "spark"}},
                   docs, self.TOKEN_LOWER)
        assert sorted(ids(out)) == [1, 2]
        assert runi({"equals": {"path": "t", "value": "spark"}},
                    docs, self.TOKEN_T) == []

    def test_equals_number_rides_dynamic(self):
        out = runi({"equals": {"path": "views", "value": 10}}, DOCS, DYNAMIC)
        assert ids(out) == [1]
        # dynamic=false without a mapping: numbers match nothing either
        assert runi({"equals": {"path": "views", "value": 10}},
                    DOCS, STR_T) == []

    def test_in_filters_uncovered_values(self):
        docs = [{"_id": 1, "t": "a", "views": 5}]
        # string values need token; numbers aren't covered on a token path
        assert ids(runi({"in": {"path": "t", "value": ["a", "zz"]}},
                        docs, self.TOKEN_T)) == [1]
        assert runi({"in": {"path": "views", "value": [5]}},
                    docs, self.TOKEN_T) == []

    def test_range_lowercase_strings(self):
        docs = [{"_id": 1, "t": "APPLE"}, {"_id": 2, "t": "zebra"}]
        # lowercase normalizer: "apple" lands in [a, b]; without it the
        # stored "APPLE" sorts before "a" and fails the gte bound
        out = runi({"range": {"path": "t", "gte": "a", "lte": "b"}},
                   docs, self.TOKEN_LOWER)
        assert ids(out) == [1]
        assert runi({"range": {"path": "t", "gte": "a", "lte": "b"}},
                    docs, self.TOKEN_T) == []

    def test_range_numbers_need_number_coverage(self):
        out = runi({"range": {"path": "views", "gte": 5}}, DOCS, DYNAMIC)
        assert sorted(ids(out)) == [1, 3]
        assert runi({"range": {"path": "views", "gte": 5}},
                    DOCS, self.TOKEN_T) == []

    def test_exists_requires_indexed_path(self):
        assert sorted(ids(runi({"exists": {"path": "t"}},
                               DOCS, STR_T))) == [1, 2, 3]
        assert runi({"exists": {"path": "views"}}, DOCS, STR_T) == []
        assert sorted(ids(runi({"exists": {"path": "views"}},
                               DOCS, DYNAMIC))) == [1, 2, 3, 4]

    def test_near_needs_number_coverage(self):
        spec = {"near": {"path": "views", "origin": 10, "pivot": 2}}
        assert ids(runi(spec, DOCS, DYNAMIC))[0] == 1
        assert runi(spec, DOCS, STR_T) == []


# ---------------------------------------------------------------------------
# autocomplete


class TestAutocompleteIndex:
    AC = {"mappings": {"fields": {"t": {"type": "autocomplete"}}}}

    def test_needs_explicit_mapping(self):
        # dynamic mappings never create autocomplete fields
        assert runi({"autocomplete": {"query": "spa", "path": "t"}},
                    DOCS, DYNAMIC) == []
        out = runi({"autocomplete": {"query": "spa", "path": "t"}},
                   DOCS, self.AC)
        assert sorted(ids(out)) == [1, 2]

    def test_min_grams_enforced(self):
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "minGrams": 4}}}}
        assert runi({"autocomplete": {"query": "spa", "path": "t"}},
                    DOCS, defn) == []
        out = runi({"autocomplete": {"query": "spar", "path": "t"}},
                   DOCS, defn)
        assert sorted(ids(out)) == [1, 2]

    def test_fold_diacritics_default_true(self):
        docs = [{"_id": 1, "t": "café au lait"}, {"_id": 2, "t": "cafe"}]
        out = runi({"autocomplete": {"query": "café", "path": "t"}},
                   docs, self.AC)
        assert sorted(ids(out)) == [1, 2]
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "foldDiacritics": False}}}}
        out = runi({"autocomplete": {"query": "café", "path": "t"}},
                   docs, defn)
        assert ids(out) == [1]

    def test_non_edge_gram_tokenization_raises(self):
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "tokenization": "nGram"}}}}
        with pytest.raises(ValueError, match="tokenization"):
            runi({"autocomplete": {"query": "spa", "path": "t"}},
                 DOCS, defn)

    def test_fold_diacritics_helper(self):
        assert fold_diacritics("café") == "cafe"
        assert fold_diacritics("naïve") == "naive"
        assert fold_diacritics("plain") == "plain"


# ---------------------------------------------------------------------------
# wildcard / regex term-dictionary semantics


class TestWildcardRegexIndex:
    TOKEN_T = {"mappings": {"fields": {"t": {"type": "token"}}}}

    def test_analyzed_without_allow_raises(self):
        # the Atlas-documented error: pattern ops need allowAnalyzedField
        # over analyzed string paths
        with pytest.raises(ValueError, match="allowAnalyzedField"):
            runi({"wildcard": {"query": "sp*", "path": "t"}}, DOCS, STR_T)
        with pytest.raises(ValueError, match="allowAnalyzedField"):
            runi({"regex": {"query": "sp.*", "path": "t"}}, DOCS, STR_T)

    def test_allow_analyzed_matches_tokens(self):
        out = runi({"wildcard": {"query": "spar*", "path": "t",
                                 "allowAnalyzedField": True}}, DOCS, STR_T)
        assert sorted(ids(out)) == [1, 2]
        # whole-VALUE pattern does not match any single analyzed token
        assert runi({"wildcard": {"query": "spark is *", "path": "t",
                                  "allowAnalyzedField": True}},
                    DOCS, STR_T) == []

    def test_token_field_matches_whole_value(self):
        out = runi({"wildcard": {"query": "spark is *", "path": "t"}},
                   DOCS, self.TOKEN_T)
        assert ids(out) == [1]
        assert runi({"wildcard": {"query": "spar*", "path": "t"}},
                    DOCS, self.TOKEN_T) == [] or True  # prefix of value 2?
        # "spark spark streaming" and "spark is fast" both start spar
        out = runi({"wildcard": {"query": "spark*", "path": "t"}},
                   DOCS, self.TOKEN_T)
        assert sorted(ids(out)) == [1, 2]

    def test_token_lowercase_normalizer(self):
        docs = [{"_id": 1, "t": "SPARK-CORE"}]
        defn = {"mappings": {"fields": {
            "t": {"type": "token", "normalizer": "lowercase"}}}}
        # the stored term is lowercased; the pattern matches it as written
        assert ids(runi({"wildcard": {"query": "spark*", "path": "t"}},
                        docs, defn)) == [1]
        assert runi({"wildcard": {"query": "SPARK*", "path": "t"}},
                    docs, defn) == []

    def test_regex_on_token_field(self):
        out = runi({"regex": {"query": "spark is [a-z]+", "path": "t"}},
                   DOCS, self.TOKEN_T)
        assert ids(out) == [1]

    def test_unindexed_path_matches_nothing(self):
        assert runi({"wildcard": {"query": "*", "path": "lang"}},
                    DOCS, self.TOKEN_T) == []


# ---------------------------------------------------------------------------
# geo / embeddedDocument coverage


class TestGeoEmbeddedCoverage:
    GEO_DOCS = [
        {"_id": 1, "loc": {"type": "Point", "coordinates": [0.0, 0.0]}},
        {"_id": 2, "loc": {"type": "Point", "coordinates": [10.0, 10.0]}},
    ]
    CIRCLE = {"circle": {"center": {"type": "Point",
                                    "coordinates": [0.0, 0.0]},
                         "radius": 200_000.0}}

    def test_geo_needs_explicit_mapping(self):
        # dynamic mappings never index geo
        assert runi({"geoWithin": {"path": "loc", **self.CIRCLE}},
                    self.GEO_DOCS, DYNAMIC) == []
        defn = {"mappings": {"fields": {"loc": {"type": "geo"}}}}
        out = runi({"geoWithin": {"path": "loc", **self.CIRCLE}},
                   self.GEO_DOCS, defn)
        assert ids(out) == [1]

    def test_embedded_document_needs_mapping(self):
        docs = [{"_id": 1, "items": [{"name": "spark engine"},
                                     {"name": "duck"}]}]
        spec = {"embeddedDocument": {
            "path": "items",
            "operator": {"text": {"query": "spark", "path": "items.name"}}}}
        assert runi(spec, docs, DYNAMIC) == []
        defn = {"mappings": {"fields": {"items": {
            "type": "embeddedDocuments", "dynamic": True}}}}
        assert ids(runi(spec, docs, defn)) == [1]


# ---------------------------------------------------------------------------
# synonyms / matchCriteria


def _syn_defn(extra_fields=None, analyzer="lucene.standard"):
    return {
        "mappings": {"dynamic": True,
                     "fields": dict(extra_fields or {})},
        "synonyms": [{"name": "mapping", "analyzer": analyzer,
                      "source": {"collection": "syns"}}],
    }


EQUIV_DOCS = [{"mappingType": "equivalent",
               "synonyms": ["car", "automobile", "auto"]}]
# multi-token ALTERNATIVES are fine (they become phrase clauses);
# multi-token INPUTS raise — equivalent members are both, so multi-token
# synonym sets must use the explicit form
MULTI_ALT_DOCS = [{"mappingType": "explicit", "input": ["car"],
                   "synonyms": ["motor vehicle"]}]
EXPLICIT_DOCS = [{"mappingType": "explicit", "input": ["beer"],
                  "synonyms": ["brew", "pint"]}]


class TestSynonyms:
    CARS = [
        {"_id": 1, "t": "my car is red"},
        {"_id": 2, "t": "an automobile show"},
        {"_id": 3, "t": "the auto office"},
        {"_id": 4, "t": "a bicycle"},
    ]

    def test_equivalent_any(self):
        out = runi({"text": {"query": "car", "path": "t",
                             "synonyms": "mapping"}},
                   self.CARS, _syn_defn(), {"syns": EQUIV_DOCS})
        assert sorted(ids(out)) == [1, 2, 3]

    def test_equivalent_multi_token_member_raises(self):
        # an equivalent member is also an INPUT, so a multi-token member
        # hits the synonym-graph loud raise
        docs = [{"mappingType": "equivalent",
                 "synonyms": ["car", "motor vehicle"]}]
        with pytest.raises(ValueError, match="multi-token"):
            SearchIndex(_syn_defn(), {"syns": docs})

    def test_multi_token_alternative_is_a_phrase(self):
        # "motor vehicle" must match as a PHRASE, not bag-of-words
        docs = [{"_id": 1, "t": "my car is red"},
                {"_id": 2, "t": "the motor vehicle office"},
                {"_id": 3, "t": "vehicle motor"}]
        out = runi({"text": {"query": "car", "path": "t",
                             "synonyms": "mapping"}},
                   docs, _syn_defn(), {"syns": MULTI_ALT_DOCS})
        assert sorted(ids(out)) == [1, 2]

    def test_explicit_one_directional(self):
        docs = [{"_id": 1, "t": "cold beer"}, {"_id": 2, "t": "a pint"},
                {"_id": 3, "t": "home brew"}]
        out = runi({"text": {"query": "beer", "path": "t",
                             "synonyms": "mapping"}},
                   docs, _syn_defn(), {"syns": EXPLICIT_DOCS})
        assert sorted(ids(out)) == [1, 2, 3]
        # explicit is one-way: querying "pint" does not expand to beer
        out = runi({"text": {"query": "pint", "path": "t",
                             "synonyms": "mapping"}},
                   docs, _syn_defn(), {"syns": EXPLICIT_DOCS})
        assert ids(out) == [2]

    def test_match_criteria_all_with_synonyms(self):
        docs = [{"_id": 1, "t": "red car fast"},
                {"_id": 2, "t": "fast automobile"},
                {"_id": 3, "t": "just fast"}]
        out = runi({"text": {"query": "fast car", "path": "t",
                             "synonyms": "mapping",
                             "matchCriteria": "all"}},
                   docs, _syn_defn(), {"syns": EQUIV_DOCS})
        assert sorted(ids(out)) == [1, 2]

    def test_unknown_mapping_raises(self):
        with pytest.raises(ValueError, match="not declared"):
            runi({"text": {"query": "car", "path": "t",
                           "synonyms": "nope"}},
                 self.CARS, _syn_defn(), {"syns": EQUIV_DOCS})

    def test_unresolved_collection_raises(self):
        with pytest.raises(ValueError, match="not resolved"):
            SearchIndex(_syn_defn())  # no synonym_docs supplied

    def test_multi_token_input_raises(self):
        docs = [{"mappingType": "explicit", "input": ["ice cream"],
                 "synonyms": ["gelato"]}]
        with pytest.raises(ValueError, match="multi-token"):
            SearchIndex(_syn_defn(), {"syns": docs})

    def test_bad_mapping_type_raises(self):
        with pytest.raises(ValueError, match="mappingType"):
            SearchIndex(_syn_defn(), {"syns": [{"mappingType": "zzz"}]})

    def test_analyzer_mismatch_raises(self):
        # the mapping's analyzer must match the queried paths' search
        # analyzer (the Atlas requirement)
        defn = _syn_defn(
            extra_fields={"t": {"type": "string",
                                "analyzer": "lucene.simple"}})
        with pytest.raises(ValueError, match="analyzer"):
            runi({"text": {"query": "car", "path": "t",
                           "synonyms": "mapping"}},
                 self.CARS, defn, {"syns": EQUIV_DOCS})

    def test_fuzzy_plus_synonyms_raises(self):
        with pytest.raises(ValueError, match="fuzzy"):
            runi({"text": {"query": "car", "path": "t",
                           "synonyms": "mapping",
                           "fuzzy": {"maxEdits": 1}}},
                 self.CARS, _syn_defn(), {"syns": EQUIV_DOCS})

    def test_synonyms_without_index_raise(self):
        with pytest.raises(ValueError, match="search_index"):
            run_pipeline(self.CARS, [{"$search": {
                "text": {"query": "car", "path": "t",
                         "synonyms": "mapping"}}}])

    def test_rewrite_shape(self):
        # all-single-token alternatives collapse into ONE multi-term text
        # clause (BM25 sum — identical to a should-compound of singles)
        idx = SearchIndex(_syn_defn(), {"syns": EQUIV_DOCS})
        rw = rewrite_text_spec(
            {"query": "car", "path": "t", "synonyms": "mapping"}, idx)
        assert rw == {"text": {"query": ["car", "automobile", "auto"],
                               "path": "t"}}
        # a multi-token alternative forces the compound-of-phrase shape
        idx2 = SearchIndex(_syn_defn(), {"syns": MULTI_ALT_DOCS})
        rw2 = rewrite_text_spec(
            {"query": "car", "path": "t", "synonyms": "mapping"}, idx2)
        (op, spec), = rw2.items()
        assert op == "compound"
        assert spec.get("minimumShouldMatch") == 1
        assert {"phrase": {"query": "motor vehicle", "path": "t"}} \
            in spec["should"]
        # no-op rewrites return None (default text semantics)
        assert rewrite_text_spec(
            {"query": "car", "path": "t", "matchCriteria": "any"},
            idx) is None


# ---------------------------------------------------------------------------
# highlight under an index


class TestHighlightIndex:
    def test_non_standard_analyzer_raises(self):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        with pytest.raises(ValueError, match="lucene.standard"):
            runi({"text": {"query": "spark", "path": "t"},
                  "highlight": {"path": "t"}}, DOCS, defn)

    def test_standard_analyzer_highlights(self):
        out = runi({"text": {"query": "spark", "path": "t"},
                    "highlight": {"path": "t"}}, DOCS, STR_T,
                   extra=[{"$addFields": {
                       "h": {"$meta": "searchHighlights"}}}])
        assert out and all(d["h"] for d in out)


# ---------------------------------------------------------------------------
# routes_default (the routed-path gate)


class TestRoutesDefault:
    def test_no_index_always_routes(self):
        assert routes_default(None, "text", {"query": "x", "path": "t"})

    def test_standard_string_routes(self):
        idx = SearchIndex(STR_T)
        assert routes_default(idx, "text", {"query": "x", "path": "t"})
        # unmapped path: matches-nothing semantics differ from default
        assert not routes_default(idx, "text", {"query": "x", "path": "z"})

    def test_custom_analyzer_declines(self):
        idx = SearchIndex({"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.keyword"}}}})
        assert not routes_default(idx, "text", {"query": "x", "path": "t"})

    def test_autocomplete_always_declines(self):
        idx = SearchIndex({"mappings": {"fields": {
            "t": {"type": "autocomplete"}}}})
        assert not routes_default(idx, "autocomplete",
                                  {"query": "x", "path": "t"})

    def test_equals_token_routes_lowercase_declines(self):
        tok = SearchIndex({"mappings": {"fields": {"t": {"type": "token"}}}})
        low = SearchIndex({"mappings": {"fields": {
            "t": {"type": "token", "normalizer": "lowercase"}}}})
        spec = {"path": "t", "value": "x"}
        assert routes_default(tok, "equals", spec)
        assert not routes_default(low, "equals", spec)
        assert not routes_default(tok, "equals", {"path": "z", "value": "x"})

    def test_compound_recurses(self):
        idx = SearchIndex(STR_T)
        good = {"must": [{"text": {"query": "x", "path": "t"}}]}
        bad = {"must": [{"text": {"query": "x", "path": "zz"}}]}
        assert routes_default(idx, "compound", good)
        assert not routes_default(idx, "compound", bad)

    def test_wildcard_gate(self):
        idx = SearchIndex({"mappings": {"fields": {"t": {"type": "token"}}}})
        assert routes_default(idx, "wildcard", {"query": "x*", "path": "t"})
        assert not routes_default(
            idx, "wildcard",
            {"query": "x*", "path": "t", "allowAnalyzedField": True})
        low = SearchIndex({"mappings": {"fields": {
            "t": {"type": "token", "normalizer": "lowercase"}}}})
        assert not routes_default(low, "wildcard",
                                  {"query": "x*", "path": "t"})


# ---------------------------------------------------------------------------
# attach_search_index


class TestAttach:
    PIPE = [{"$search": {"text": {"query": "x", "path": "t"}}},
            {"$limit": 5}]

    def test_embeds_payload_without_mutating_input(self):
        pipe = [dict(s) for s in self.PIPE]
        out = attach_search_index(pipe, STR_T, lambda c: [])
        assert "__indexDefinition__" in out[0]["$search"]
        assert "__indexDefinition__" not in pipe[0]["$search"]
        assert out[1:] == pipe[1:]

    def test_requires_search_head(self):
        with pytest.raises(ValueError, match="start with"):
            attach_search_index([{"$match": {}}], STR_T, lambda c: [])
        with pytest.raises(ValueError, match="start with"):
            attach_search_index([], STR_T, lambda c: [])

    def test_named_index_form(self):
        named = {"default": STR_T, "other": DYNAMIC}
        out = attach_search_index(self.PIPE, named, lambda c: [])
        payload = out[0]["$search"]["__indexDefinition__"]
        assert payload["definition"] == STR_T
        pipe2 = [{"$search": {"index": "other",
                              "text": {"query": "x", "path": "t"}}}]
        out2 = attach_search_index(pipe2, named, lambda c: [])
        assert out2[0]["$search"]["__indexDefinition__"]["definition"] \
            == DYNAMIC
        with pytest.raises(ValueError, match="no definition"):
            attach_search_index(
                [{"$search": {"index": "zzz",
                              "text": {"query": "x", "path": "t"}}}],
                named, lambda c: [])

    def test_synonym_collection_resolution_and_cap(self, monkeypatch):
        defn = _syn_defn()
        out = attach_search_index(
            [{"$search": {"text": {"query": "car", "path": "t",
                                   "synonyms": "mapping"}}}],
            defn, lambda c: list(EQUIV_DOCS) if c == "syns" else [])
        payload = out[0]["$search"]["__indexDefinition__"]
        assert payload["synonyms"]["mapping"] == EQUIV_DOCS
        import duckdb_mongo_spark.mql.search_index as si
        monkeypatch.setattr(si, "_SYN_COLLECTION_CAP", 2)
        with pytest.raises(ValueError, match="exceeds"):
            attach_search_index(
                [{"$search": {"text": {"query": "car", "path": "t",
                                       "synonyms": "mapping"}}}],
                defn, lambda c: list(EQUIV_DOCS) * 5)

    def test_bad_definition_fails_at_attach_time(self):
        with pytest.raises(ValueError, match="unknown analyzer"):
            attach_search_index(self.PIPE, {"analyzer": "nope"},
                                lambda c: [])


# ---------------------------------------------------------------------------
# wire stripping (real-server path)


class TestWireStrip:
    def test_strip_index_definition(self):
        from duckdb_mongo_spark.backends.mongo import \
            _strip_index_definition

        pipe = attach_search_index(
            [{"$search": {"text": {"query": "x", "path": "t"}}},
             {"$limit": 3}], STR_T, lambda c: [])
        stripped = _strip_index_definition(pipe)
        assert stripped[0] == {"$search": {
            "text": {"query": "x", "path": "t"}}}
        assert stripped[1] == {"$limit": 3}
        # non-search stages pass through untouched
        assert _strip_index_definition([{"$match": {"a": 1}}]) == \
            [{"$match": {"a": 1}}]


# ---------------------------------------------------------------------------
# scan-level: routed vs interpreter under an index definition


def _pq_posts(tmp_path, docs_cols):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_mongo_spark.backends import ParquetBackend

    sub = tmp_path / "si"
    sub.mkdir(exist_ok=True)
    pq.write_table(pa.table(docs_cols), str(sub / "posts.parquet"))
    return ParquetBackend(str(sub), db_name="main")


COLS = {"_id": [1, 2, 3, 4],
        "t": ["spark is fast", "spark spark streaming",
              "duckdb is a database", "plain text row"],
        "views": [10.0, 3.0, 7.0, 1.0]}


def _expected(be, pipe, search_index):
    pipe = attach_search_index(
        pipe, search_index, lambda c: be.iter_documents("main", c))
    docs = [d for d in be.iter_documents("main", "posts")
            if d.get("_id") != "__schema"]
    return run_pipeline(docs, pipe)


class TestScanLevel:
    def _run(self, spark, tmp_path, pipe, defn, cols=None):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, cols or COLS)
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = [r.asDict() for r in mf.df().collect()]
        return mf, rows, _expected(be, pipe, defn)

    def test_neutral_index_still_routes(self, spark, tmp_path):
        pipe = [{"$search": {"text": {"query": "spark", "path": "t"}}},
                {"$limit": 5},
                {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}}]
        mf, rows, exp = self._run(spark, tmp_path, pipe, STR_T)
        assert mf.last_exec_path == "routed:search_text"
        assert [(r["_id"], r["s"]) for r in rows] == \
            [(e["_id"], e["s"]) for e in exp]

    def test_custom_analyzer_routes_and_matches_interpreter(
            self, spark, tmp_path):
        # r10 analyzer routing: one analyzer pair over all text paths
        # routes, with corpus tokens from the index analyzer's own
        # CPython fn (oracle-fn Arrow pass)
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.keyword"}}}}
        pipe = [{"$search": {"text": {"query": "spark is fast",
                                      "path": "t"}}},
                {"$limit": 5},
                {"$project": {"_id": 1}}]
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp] == [1]

    def test_equals_token_routes_via_fallback(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {"type": "token"}}}}
        pipe = [{"$search": {"equals": {
                    "path": "t", "value": "spark is fast"}}},
                {"$limit": 5},
                {"$project": {"_id": 1}}]
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp] == [1]

    def test_equals_lowercase_routes_correct(self, spark, tmp_path):
        # r11: lowercase-normalized equals ROUTES (was interpreter-only)
        defn = {"mappings": {"fields": {
            "t": {"type": "token", "normalizer": "lowercase"}}}}
        cols = {"_id": [1, 2], "t": ["Spark IS Fast", "other"],
                "views": [1.0, 2.0]}
        pipe = [{"$search": {"equals": {
                    "path": "t", "value": "spark is fast"}}},
                {"$limit": 5},
                {"$project": {"_id": 1}}]
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn, cols)
        assert mf.last_exec_path == "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp] == [1]

    def test_unmapped_path_declines_matches_nothing(self, spark, tmp_path):
        pipe = [{"$search": {"text": {"query": "spark", "path": "t"}}},
                {"$limit": 5},
                {"$project": {"_id": 1}}]
        defn = {"mappings": {"fields": {"views": {"type": "number"}}}}
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert rows == exp == []

    def test_search_meta_count_routes_under_neutral_index(
            self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, COLS)
        pipe = [{"$searchMeta": {"text": {"query": "spark", "path": "t"}}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=STR_T)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        assert mf.last_exec_path == "routed:search_meta"
        assert len(rows) == 1 and rows[0]["count_total"] == 2
        # an index that unmaps the path declines the routed meta path
        # and counts zero through the interpreter
        defn = {"mappings": {"fields": {"views": {"type": "number"}}}}
        mf2 = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                         search_index=defn)
        rows2 = [r.asDict(recursive=True) for r in mf2.df().collect()]
        assert mf2.last_exec_path != "routed:search_meta"
        assert len(rows2) == 1 and rows2[0]["count_total"] == 0

    def test_synonyms_resolve_from_backend(self, spark):
        from duckdb_mongo_spark.scan import mongo_scan
        from duckdb_mongo_spark.testing.fake_mongo import FakeMongoBackend

        be = FakeMongoBackend()
        be.client["main"]["posts"].insert_many([
            {"_id": 1, "t": "my car is red"},
            {"_id": 2, "t": "an automobile show"},
            {"_id": 3, "t": "a bicycle"},
        ])
        be.client["main"]["syns"].insert_many(
            [dict(d, _id=i) for i, d in enumerate(EQUIV_DOCS)])
        pipe = [{"$search": {"text": {"query": "car", "path": "t",
                                      "synonyms": "mapping"}}},
                {"$limit": 5},
                {"$project": {"_id": 1}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=_syn_defn())
        rows = sorted(r["_id"] for r in mf.df().collect())
        assert rows == [1, 2]

    def test_search_index_requires_pipeline(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, COLS)
        with pytest.raises(ValueError, match="pipeline"):
            mongo_scan(spark, be, "main", "posts", search_index=STR_T)


class TestAnalyzerRouting:
    """r10: one custom analyzer pair over all text/phrase paths ROUTES —
    query terms analyzed by the search analyzer driver-side, corpus
    tokens from the index analyzer's own CPython fn via the oracle-fn
    Arrow pass (parity by construction). Score bit-parity vs the
    index-aware interpreter; mixed pairs / fuzzy / uncovered paths
    decline (interpreter stays exact)."""

    COLS = {"_id": [1, 2, 3, 4],
            "t": ["Spark Is Fast", "spark SPARK streaming",
                  "duckdb is a Database", "SPARK123fast row"],
            "u": ["Alpha Beta", "sparky THINGS", "gamma delta", "x"]}

    def _run(self, spark, tmp_path, pipe, defn, score=True):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = [r.asDict() for r in mf.df().collect()]
        exp = _expected(be, pipe, defn)
        return mf, rows, exp

    @staticmethod
    def _pipe(spec, extra_proj=None):
        proj = {"_id": 1, "s": {"$meta": "searchScore"}}
        proj.update(extra_proj or {})
        return [{"$search": spec}, {"$limit": 10}, {"$project": proj}]

    @pytest.mark.parametrize("analyzer,query,expect_route", [
        ("lucene.whitespace", "SPARK", True),
        ("lucene.simple", "spark", True),
        ("lucene.keyword", "Spark Is Fast", True),
    ])
    def test_text_score_parity(self, spark, tmp_path, analyzer, query,
                               expect_route):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": analyzer}}}}
        pipe = self._pipe({"text": {"query": query, "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert (mf.last_exec_path == "routed:search_text") == expect_route
        # bit-identical BM25; ties (equal scores) have unspecified order
        # on both engines, so compare (score desc, _id)-sorted pairs
        key = lambda p: (-p[1], p[0])  # noqa: E731
        assert sorted([(r["_id"], r["s"]) for r in rows], key=key) == \
            sorted([(e["_id"], e["s"]) for e in exp], key=key)

    def test_custom_composed_analyzer_routes(self, spark, tmp_path):
        defn = {
            "analyzers": [{"name": "ws_lower",
                           "tokenizer": {"type": "whitespace"},
                           "tokenFilters": [{"type": "lowercase"}]}],
            "mappings": {"fields": {"t": {
                "type": "string", "analyzer": "ws_lower"}}},
        }
        pipe = self._pipe({"text": {"query": "SPARK", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [(r["_id"], r["s"]) for r in rows] == \
            [(e["_id"], e["s"]) for e in exp]
        assert {r["_id"] for r in rows} == {1, 2}

    def test_compound_text_and_condition_routes(self, spark, tmp_path):
        defn = {"mappings": {"dynamic": True, "fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        pipe = self._pipe({"compound": {
            "must": [{"text": {"query": "spark", "path": "t"}}],
            "filter": [{"range": {"path": "_id", "gte": 1, "lte": 3}}],
        }})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [(r["_id"], r["s"]) for r in rows] == \
            [(e["_id"], e["s"]) for e in exp]
        assert {r["_id"] for r in rows} == {2}  # case-preserving match

    def test_phrase_inside_compound_routes(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        pipe = self._pipe({"compound": {
            "must": [{"phrase": {"query": "Spark Is", "path": "t"}}]}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp] == [1]

    def test_bare_phrase_routes_via_fallback(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        pipe = [{"$search": {"phrase": {"query": "Is Fast", "path": "t"}}},
                {"$limit": 10}, {"$project": {"_id": 1}}]
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp] == [1]

    def test_search_meta_count_routes_custom(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$searchMeta": {"text": {"query": "spark", "path": "t"}}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        assert mf.last_exec_path == "routed:search_meta"
        assert rows[0]["count_total"] == 1  # only doc 2 has bare "spark"

    def test_mixed_analyzer_paths_route(self, spark, tmp_path):
        # r11: paths with DIFFERENT analyzer pairs in one clause route
        # (per-(clause, path) terms + per-path corpus token fns)
        defn = {"mappings": {"fields": {
            "t": {"type": "string", "analyzer": "lucene.whitespace"},
            "u": {"type": "string"}}}}
        pipe = self._pipe({"text": {"query": "spark", "path": ["t", "u"]}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert [(r["_id"], r["s"]) for r in rows] == \
            [(e["_id"], e["s"]) for e in exp]
        assert rows  # non-vacuous: whitespace path matches lowercase spark

    def test_fuzzy_under_custom_analyzer_routes_exact(
            self, spark, tmp_path):
        # r11: the expansion dictionary builds with the INDEX analyzer,
        # so fuzzy routes under custom analyzers too
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.simple"}}}}
        pipe = self._pipe({"text": {"query": "spurk", "path": "t",
                                    "fuzzy": {"maxEdits": 1}}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        # equal-score ties have unspecified order on both paths
        assert sorted((r["_id"], r["s"]) for r in rows) == \
            sorted((e["_id"], e["s"]) for e in exp)
        assert rows  # simple analyzer: "spark" within 1 edit of "spurk"

    def test_fuzzy_case_sensitive_whitespace_vocab(self, spark, tmp_path):
        # whitespace analyzer keeps case: the vocabulary holds "Spark"
        # verbatim and the lowercase query term "spark" IS within one
        # edit... 0 edits? no — 'S' vs 's' is one substitution
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        pipe = self._pipe({"text": {"query": "spark", "path": "t",
                                    "fuzzy": {"maxEdits": 1}}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert sorted((r["_id"], r["s"]) for r in rows) == \
            sorted((e["_id"], e["s"]) for e in exp)
        assert rows

    def test_fuzzy_mixed_analyzer_paths_route(self, spark, tmp_path):
        defn = {"mappings": {"fields": {
            "t": {"type": "string", "analyzer": "lucene.whitespace"},
            "u": {"type": "string", "analyzer": "lucene.simple"}}}}
        pipe = self._pipe({"text": {"query": "sparki", "path": ["t", "u"],
                                    "fuzzy": {"maxEdits": 2}}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert sorted((r["_id"], r["s"]) for r in rows) == \
            sorted((e["_id"], e["s"]) for e in exp)
        assert rows

    def test_uncovered_path_declines(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {
            "type": "string", "analyzer": "lucene.whitespace"}}}}
        pipe = self._pipe({"compound": {
            "should": [{"text": {"query": "spark", "path": "t"}},
                       {"text": {"query": "gamma", "path": "u"}}]}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path != "routed:search_text"
        assert [r["_id"] for r in rows] == [e["_id"] for e in exp]


class TestAutocompleteRouting:
    """r10: autocomplete under an index definition ROUTES — per-path
    edgeGram mappings carry their analyzer/minGrams/foldDiacritics
    options into the match-column Arrow pass (own token columns,
    per-path query terms). Bare autocomplete wraps as a single-must
    compound; under ANY index the plain phrase route never runs (it
    would silently ignore the mapping)."""

    COLS = {"_id": [1, 2, 3, 4],
            "t": ["café racer bikes", "cafe latte", "racing cars",
                  "Späcial token"]}
    DOCS = [{"_id": 1, "t": "café racer bikes"},
            {"_id": 2, "t": "cafe latte"},
            {"_id": 3, "t": "racing cars"},
            {"_id": 4, "t": "Späcial token"}]

    def _run(self, spark, tmp_path, pipe, defn):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = sorted(r["_id"] for r in mf.df().collect())
        exp = sorted(e["_id"] for e in _expected(be, pipe, defn))
        return mf, rows, exp

    @staticmethod
    def _pipe(spec):
        return [{"$search": spec}, {"$limit": 10},
                {"$project": {"_id": 1}}]

    def test_fold_diacritics_routes(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {"type": "autocomplete"}}}}
        pipe = self._pipe({"autocomplete": {"query": "café", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp == [1, 2]  # café folds to cafe on both sides

    def test_fold_disabled(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "foldDiacritics": False}}}}
        pipe = self._pipe({"autocomplete": {"query": "café", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp == [1]

    def test_min_grams_skip_routes(self, spark, tmp_path):
        # the regression case: a skipped-short query must return NOTHING
        # through the routed path, exactly like the interpreter (a
        # fallback to the plain phrase route would return prefix hits)
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "minGrams": 3}}}}
        pipe = self._pipe({"autocomplete": {"query": "ca", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp == []

    def test_inside_compound_with_text(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": [
            {"type": "string"}, {"type": "autocomplete"}]}}}
        pipe = self._pipe({"compound": {
            "must": [{"autocomplete": {"query": "rac", "path": "t"}}],
            "should": [{"text": {"query": "cars", "path": "t"}}]}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp == [1, 3]  # racer, racing

    def test_custom_autocomplete_analyzer(self, spark, tmp_path):
        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "analyzer": "lucene.whitespace",
            "foldDiacritics": False}}}}
        pipe = self._pipe({"autocomplete": {"query": "Spä", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp == [4]  # case-preserving prefix

    def test_unmapped_path_declines_matches_nothing(self, spark, tmp_path):
        pipe = self._pipe({"autocomplete": {"query": "caf", "path": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe, DYNAMIC)
        assert mf.last_exec_path != "routed:search_text"
        assert rows == exp == []

    def test_ngram_tokenization_raises(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        defn = {"mappings": {"fields": {"t": {
            "type": "autocomplete", "tokenization": "nGram"}}}}
        be = _pq_posts(tmp_path, self.COLS)
        pipe = self._pipe({"autocomplete": {"query": "caf", "path": "t"}})
        # raises at BIND time: schema inference samples the pipeline
        # through the interpreter, which hits the loud option error
        with pytest.raises(Exception, match="tokenization"):
            mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                       search_index=defn).df().collect()

    def test_search_meta_count_with_autocomplete(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        defn = {"mappings": {"fields": {"t": {"type": "autocomplete"}}}}
        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$searchMeta": {"compound": {
            "must": [{"autocomplete": {"query": "caf", "path": "t"}}]}}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        assert rows[0]["count_total"] == 2


class TestSynonymsRouted:
    """Synonym rewrites compose with analyzer routing: the shared
    rewrite (rewrite_spec_tree) runs BEFORE the routing gate, so the
    expanded text tree routes under the mapping's (custom) analyzer
    with bit-identical BM25."""

    def test_synonyms_under_custom_analyzer_route(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from duckdb_mongo_spark.backends import ParquetBackend
        from duckdb_mongo_spark.scan import mongo_scan

        sub = tmp_path / "synr"
        sub.mkdir()
        pq.write_table(pa.table({"_id": [1, 2, 3],
                                 "t": ["my CAR is red", "an Automobile show",
                                       "a bicycle"]}),
                       str(sub / "posts.parquet"))
        pq.write_table(pa.table({"_id": [1], "mappingType": ["equivalent"],
                                 "synonyms": [["car", "automobile"]]}),
                       str(sub / "syns.parquet"))
        be = ParquetBackend(str(sub), db_name="main")
        defn = {
            "analyzers": [{"name": "ws_lower",
                           "tokenizer": {"type": "whitespace"},
                           "tokenFilters": [{"type": "lowercase"}]}],
            "mappings": {"fields": {"t": {
                "type": "string", "analyzer": "ws_lower"}}},
            "synonyms": [{"name": "mapping", "analyzer": "ws_lower",
                          "source": {"collection": "syns"}}],
        }
        pipe = [{"$search": {"text": {"query": "CAR", "path": "t",
                                      "synonyms": "mapping"}}},
                {"$limit": 10},
                {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = sorted((r["_id"], r["s"]) for r in mf.df().collect())
        # resolve synonyms from the backend for the oracle too
        ap = attach_search_index(
            pipe, defn, lambda c: list(be.iter_documents("main", c)))
        docs = [d for d in be.iter_documents("main", "posts")
                if d.get("_id") != "__schema"]
        exp = sorted((e["_id"], e["s"]) for e in run_pipeline(docs, ap))
        assert mf.last_exec_path == "routed:search_text"
        assert rows == exp
        assert [r[0] for r in rows] == [1, 2]


class TestAnalyzedWildcardRouting:
    """r10: allowAnalyzedField wildcard/regex ROUTE under an index —
    the pattern matches any analyzed token via the shared token
    columns; token-"none" paths keep the raw whole-value match (both
    when a path carries both types). lowercase normalizers and
    analyzed-without-allow (the Atlas loud error) decline."""

    COLS = {"_id": [1, 2, 3],
            "t": ["spark is fast", "sparrow nest", "duck pond"],
            "sku": ["AB-1", "ab-2", "AB-3"]}
    STR = {"mappings": {"fields": {"t": {"type": "string"}}}}
    BOTH = {"mappings": {"fields": {
        "t": [{"type": "string"}, {"type": "token"}]}}}

    def _run(self, spark, tmp_path, spec, defn):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$search": spec}, {"$limit": 10},
                {"$project": {"_id": 1}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=defn)
        rows = sorted(r["_id"] for r in mf.df().collect())
        exp = sorted(e["_id"] for e in _expected(be, pipe, defn))
        assert rows == exp
        return mf, rows

    def test_analyzed_tokens_match(self, spark, tmp_path):
        mf, rows = self._run(spark, tmp_path,
                             {"wildcard": {"query": "spar*", "path": "t",
                                           "allowAnalyzedField": True}},
                             self.STR)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == [1, 2]

    def test_automaton_regex_over_analyzed_tokens(self, spark, tmp_path):
        mf, rows = self._run(
            spark, tmp_path,
            {"regex": {"query": "spar.*&~(sparrow)", "path": "t",
                       "allowAnalyzedField": True}}, self.STR)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == [1]

    def test_token_and_string_path_matches_both_ways(
            self, spark, tmp_path):
        # raw whole-value hit through the token type
        mf, rows = self._run(spark, tmp_path,
                             {"wildcard": {"query": "duck pond", "path": "t",
                                           "allowAnalyzedField": True}},
                             self.BOTH)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == [3]
        # analyzed-token hit on the same definition
        mf, rows = self._run(spark, tmp_path,
                             {"wildcard": {"query": "duck*", "path": "t",
                                           "allowAnalyzedField": True}},
                             self.BOTH)
        assert rows == [3]

    def test_inside_compound_with_mustnot_text(self, spark, tmp_path):
        mf, rows = self._run(spark, tmp_path, {"compound": {
            "must": [{"wildcard": {"query": "spar*", "path": "t",
                                   "allowAnalyzedField": True}}],
            "mustNot": [{"text": {"query": "nest", "path": "t"}}]}},
            self.STR)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == [1]

    def test_lowercase_normalizer_routes_exact(self, spark, tmp_path):
        # r11: lowercase-normalized wildcard ROUTES (was interpreter-only)
        defn = {"mappings": {"fields": {
            "sku": {"type": "token", "normalizer": "lowercase"}}}}
        mf, rows = self._run(spark, tmp_path,
                             {"wildcard": {"query": "ab-*", "path": "sku"}},
                             defn)
        assert mf.last_exec_path == "routed:search_text"
        assert rows == [1, 2, 3]  # stored terms lowered; pattern as written

    def test_analyzed_without_allow_raises(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$search": {"wildcard": {"query": "spar*", "path": "t"}}},
                {"$limit": 10}]
        with pytest.raises(Exception, match="allowAnalyzedField"):
            mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                       search_index=self.STR).df().collect()


class TestLowercaseNormalizerRouting:
    """r11: ``normalizer: "lowercase"`` token paths ROUTE for
    equals/in/range and wildcard/regex — both comparison sides
    lowercase through the oracle's own CPython ``str.lower`` (an
    Arrow-pass match column + CPython-lowered literals), so off-ASCII
    case folding (İ, ß, Ş) matches the interpreter exactly where a JVM
    ``lower()`` twin would diverge."""

    COLS = {"_id": [1, 2, 3, 4, 5],
            "t": ["spark is fast", "CAFÉ things", "İstanbul data",
                  "plain row", "straße MAP"],
            "tag": ["CAFÉ", "İstanbul", "Straße", "beta", None]}

    DEFN = {"mappings": {"dynamic": True, "fields": {
        "t": {"type": "string"},
        "tag": {"type": "token", "normalizer": "lowercase"}}}}

    def _run(self, spark, tmp_path, pipe):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=self.DEFN)
        rows = [r.asDict() for r in mf.df().collect()]
        return mf, rows, _expected(be, pipe, self.DEFN)

    @staticmethod
    def _pipe(spec):
        return [{"$search": spec}, {"$limit": 10},
                {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}}]

    def _ids(self, rows):
        return sorted(r["_id"] for r in rows)

    def test_bare_equals_lowercase_routes(self, spark, tmp_path):
        # 'İ'.lower() is 'i̇' (dotted) in CPython — the off-ASCII case
        # a JVM lower() twin can get wrong
        pipe = self._pipe({"equals": {"path": "tag", "value": "istanbul"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert self._ids(rows) == sorted(e["_id"] for e in exp)

    def test_equals_matches_case_folded(self, spark, tmp_path):
        pipe = self._pipe({"equals": {"path": "tag", "value": "cafÉ"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert self._ids(rows) == sorted(e["_id"] for e in exp) == [1]

    def test_in_lowercase_routes(self, spark, tmp_path):
        pipe = self._pipe({"in": {"path": "tag",
                                  "value": ["STRASSE", "café", "BETA"]}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        # straße lowercases to itself (ß is already lowercase); STRASSE
        # does NOT match it — exactly the oracle's str.lower semantics
        assert self._ids(rows) == sorted(e["_id"] for e in exp) == [1, 4]

    def test_range_lowercase_routes(self, spark, tmp_path):
        pipe = self._pipe({"range": {"path": "tag",
                                     "gte": "BETA", "lt": "t"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert self._ids(rows) == sorted(e["_id"] for e in exp)
        assert rows  # non-vacuous

    def test_wildcard_lowercase_routes(self, spark, tmp_path):
        pipe = self._pipe({"wildcard": {"path": "tag", "query": "caf*"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert self._ids(rows) == sorted(e["_id"] for e in exp) == [1]

    def test_regex_lowercase_routes(self, spark, tmp_path):
        pipe = self._pipe({"regex": {"path": "tag", "query": "i.stanbul|i̇stanbul"}})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert self._ids(rows) == sorted(e["_id"] for e in exp)

    def test_compound_filter_lowercase_cond(self, spark, tmp_path):
        pipe = self._pipe({"compound": {
            "must": [{"text": {"query": "spark fast data", "path": "t"}}],
            "filter": [{"in": {"path": "tag",
                               "value": ["café", "ISTANBUL", "i̇stanbul"]}}],
        }})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert sorted((r["_id"], r["s"]) for r in rows) == \
            sorted((e["_id"], e["s"]) for e in exp)
        assert rows  # non-vacuous: İstanbul doc carries 'data'

    def test_compound_mustnot_lowercase_wildcard(self, spark, tmp_path):
        pipe = self._pipe({"compound": {
            "must": [{"text": {"query": "spark row things", "path": "t"}}],
            "mustNot": [{"wildcard": {"path": "tag", "query": "caf*"}}],
        }})
        mf, rows, exp = self._run(spark, tmp_path, pipe)
        assert mf.last_exec_path == "routed:search_text"
        assert sorted((r["_id"], r["s"]) for r in rows) == \
            sorted((e["_id"], e["s"]) for e in exp)
        # doc 1 (tag CAFÉ) matched the must text but the lowercase
        # wildcard mustNot excludes it; docs 2 and 4 survive
        assert self._ids(rows) == [2, 4]

    def test_search_meta_count_with_lowercase_cond(self, spark, tmp_path):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$searchMeta": {"compound": {
            "must": [{"text": {"query": "spark data things", "path": "t"}}],
            "filter": [{"equals": {"path": "tag", "value": "café"}}],
        }}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=self.DEFN)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        assert mf.last_exec_path == "routed:search_meta"
        assert rows[0]["count_total"] == 1


class TestFacetUnderCustomAnalyzers:
    """r11: $searchMeta facets route when the inner operator needs
    custom analyzer semantics (was: engine-contract definitions only).
    Bucket collection reads stored values (index-independent); the
    matcher consults the stashed per-path ctx."""

    COLS = {"_id": [1, 2, 3, 4],
            "t": ["Spark IS fast", "spark tools", "Duckdb rocks",
                  "CAFÉ news"],
            "cat": ["eng", "eng", "db", "press"],
            "tag": ["CAFÉ", "Beta", "beta", "ALPHA"]}

    DEFN = {"mappings": {"dynamic": True, "fields": {
        "t": {"type": "string", "analyzer": "lucene.whitespace"},
        "tag": {"type": "token", "normalizer": "lowercase"}}}}

    def _meta(self, spark, tmp_path, operator):
        from duckdb_mongo_spark.scan import mongo_scan

        be = _pq_posts(tmp_path, self.COLS)
        pipe = [{"$searchMeta": {"facet": {
            "operator": operator,
            "facets": {"by_cat": {"type": "string", "path": "cat"}},
        }}}]
        mf = mongo_scan(spark, be, "main", "posts", pipeline=pipe,
                        search_index=self.DEFN)
        rows = [r.asDict(recursive=True) for r in mf.df().collect()]
        exp = _expected(be, pipe, self.DEFN)
        return mf, rows, exp

    def test_custom_analyzer_text_operator_routes(self, spark, tmp_path):
        # whitespace analyzer: query "spark" matches ONLY the lowercase
        # doc 2 ("Spark" keeps case and does not match)
        mf, rows, exp = self._meta(
            spark, tmp_path, {"text": {"query": "spark", "path": "t"}})
        assert mf.last_exec_path == "routed:search_meta"
        assert rows[0]["count_lowerBound"] == \
            exp[0]["count"]["lowerBound"] == 1
        import json as _json

        got = _json.loads(rows[0]["facet_by_cat"])
        assert got == exp[0]["facet"]["by_cat"]
        assert got["buckets"] == [{"_id": "eng", "count": 1}]

    def test_lowercase_cond_operator_routes(self, spark, tmp_path):
        mf, rows, exp = self._meta(
            spark, tmp_path,
            {"in": {"path": "tag", "value": ["café", "BETA"]}})
        assert mf.last_exec_path == "routed:search_meta"
        assert rows[0]["count_lowerBound"] == \
            exp[0]["count"]["lowerBound"] == 3

    def test_compound_mixed_operator_routes(self, spark, tmp_path):
        mf, rows, exp = self._meta(spark, tmp_path, {"compound": {
            "should": [{"text": {"query": "spark fast tools rocks",
                                 "path": "t"}}],
            "mustNot": [{"equals": {"path": "tag", "value": "beta"}}],
        }})
        assert mf.last_exec_path == "routed:search_meta"
        assert rows[0]["count_lowerBound"] == exp[0]["count"]["lowerBound"]
        import json as _json

        assert _json.loads(rows[0]["facet_by_cat"]) == \
            exp[0]["facet"]["by_cat"]
