"""$search (Atlas Search subset) — BM25 hand-oracle + operator tests."""

import math

import pytest

from duckdb_mongo_spark.mql import run_pipeline

DOCS = [
    {"_id": 1, "t": "spark is fast", "views": 10, "lang": "en"},
    {"_id": 2, "t": "spark spark streaming", "views": 3, "lang": "en"},
    {"_id": 3, "t": "duckdb is a database", "views": 7, "lang": "de"},
    {"_id": 4, "views": 1},
]


def run(spec, docs=DOCS, extra=()):
    return run_pipeline(docs, [{"$search": spec}, *extra])


def bm25_one(tf, dl, avg, n, df, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avg))


class TestText:
    def test_bm25_scores_and_order(self):
        out = run({"text": {"query": "spark", "path": "t"}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        # N=4 docs, df(spark)=2, avg field len (3+3+4+0)/4 = 2.5
        assert [d["_id"] for d in out] == [2, 1]
        assert out[0]["s"] == pytest.approx(bm25_one(2, 3, 2.5, 4, 2))
        assert out[1]["s"] == pytest.approx(bm25_one(1, 3, 2.5, 4, 2))

    def test_multi_term_sums_and_multi_path(self):
        out = run({"text": {"query": "duckdb database", "path": "t"}})
        assert [d["_id"] for d in out] == [3]
        docs = [{"_id": 1, "a": "x y", "b": "z"}, {"_id": 2, "a": "z", "b": "x"}]
        out = run({"text": {"query": "z", "path": ["a", "b"]}}, docs=docs)
        assert {d["_id"] for d in out} == {1, 2}

    def test_analyzer_lowercases_and_splits(self):
        docs = [{"_id": 1, "t": "Hello, WORLD!"}]
        out = run({"text": {"query": "hello world", "path": "t"}}, docs=docs)
        assert len(out) == 1

    def test_no_match_returns_empty(self):
        assert run({"text": {"query": "zzz", "path": "t"}}) == []


class TestTextFuzzy:
    """r9: text.fuzzy — whole-term Levenshtein expansion against the
    corpus term dictionary (exact prefixLength head), scored as an
    ordinary BM25 disjunction. Previously the option was silently
    IGNORED (a fuzzy query just under-matched); now it is exact."""

    def _score(self, tf, dl, df):
        return bm25_one(tf, dl, 2.5, 4, df)

    def test_fuzzy_expands_to_corpus_terms(self):
        # "sparc" is 1 edit from the corpus term "spark" and nothing else
        out = run({"text": {"query": "sparc", "path": "t",
                            "fuzzy": {"maxEdits": 1}}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        got = {d["_id"]: d["s"] for d in out}
        assert set(got) == {1, 2}
        assert got[1] == pytest.approx(self._score(1, 3, 2))
        assert got[2] == pytest.approx(self._score(2, 3, 2))

    def test_fuzzy_two_edits_and_own_df_per_expansion(self):
        # "dat" is 2 edits from BOTH "fast" and "a" — each expanded term
        # scores with its own df/tf, like two disjuncts
        out = run({"text": {"query": "dat", "path": "t",
                            "fuzzy": {"maxEdits": 2}}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        got = {d["_id"]: d["s"] for d in out}
        assert set(got) == {1, 3}
        assert got[1] == pytest.approx(self._score(1, 3, 1))  # fast
        assert got[3] == pytest.approx(self._score(1, 4, 1))  # a

    def test_prefix_length_pins_the_head(self):
        out = run({"text": {"query": "zpark", "path": "t",
                            "fuzzy": {"maxEdits": 1}}})
        assert {d["_id"] for d in out} == {1, 2}  # z->s substitution
        out = run({"text": {"query": "zpark", "path": "t",
                            "fuzzy": {"maxEdits": 1, "prefixLength": 1}}})
        assert out == []  # exact head 'z' matches no corpus term

    def test_two_query_terms_same_expansion_count_twice(self):
        one = run({"text": {"query": "sparc", "path": "t",
                            "fuzzy": {"maxEdits": 1}}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        two = run({"text": {"query": "sparc spark", "path": "t",
                            "fuzzy": {"maxEdits": 1}}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        s1 = {d["_id"]: d["s"] for d in one}
        s2 = {d["_id"]: d["s"] for d in two}
        assert s2 == {k: pytest.approx(2 * v) for k, v in s1.items()}

    def test_validation(self):
        with pytest.raises(ValueError, match="maxEdits must be 1 or 2"):
            run({"text": {"query": "x", "path": "t",
                          "fuzzy": {"maxEdits": 3}}})
        with pytest.raises(ValueError, match="bad fuzzy"):
            run({"text": {"query": "x", "path": "t",
                          "fuzzy": {"nope": 1}}})

    def test_unknown_operator_options_raise(self):
        # r9: extras were silently dropped before — anything unknown
        # must fail visibly
        for spec in (
            {"text": {"query": "spark", "path": "t", "bogus": 1}},
            {"phrase": {"query": "spark", "path": "t", "bogus": 1}},
            {"equals": {"path": "lang", "value": "en", "bogus": 1}},
            {"range": {"path": "views", "gte": 1, "bogus": 1}},
            {"exists": {"path": "t", "bogus": 1}},
            {"in": {"path": "views", "value": [1], "bogus": 1}},
            {"autocomplete": {"query": "sp", "path": "t", "bogus": 1}},
        ):
            with pytest.raises(ValueError, match="unsupported options"):
                run(spec)
        # r10: synonyms is supported but needs the index definition's
        # synonym mapping — still loud, different message
        with pytest.raises(ValueError, match="search_index"):
            run({"text": {"query": "spark", "path": "t", "synonyms": "m"}})

    def test_match_criteria_all_without_synonyms(self):
        # r10: matchCriteria "all" requires every term (must-compound of
        # per-term text clauses — mql/search_index.rewrite_text_spec)
        out = run({"text": {"query": "duckdb database", "path": "t",
                            "matchCriteria": "all"}})
        assert [d["_id"] for d in out] == [3]
        out = run({"text": {"query": "spark database", "path": "t",
                            "matchCriteria": "all"}})
        assert out == []
        # "any" (or absent) keeps the default multi-term OR semantics
        out = run({"text": {"query": "spark database", "path": "t",
                            "matchCriteria": "any"}})
        assert {d["_id"] for d in out} == {1, 2, 3}


class TestPhrase:
    def test_exact_subsequence(self):
        out = run({"phrase": {"query": "spark streaming", "path": "t"}})
        assert [d["_id"] for d in out] == [2]

    def test_slop(self):
        assert run({"phrase": {"query": "spark fast", "path": "t"}}) == []
        out = run({"phrase": {"query": "spark fast", "path": "t", "slop": 1}})
        assert [d["_id"] for d in out] == [1]


class TestStructuredOperators:
    def test_equals_range_exists_in(self):
        out = run({"equals": {"path": "lang", "value": "de"}})
        assert [d["_id"] for d in out] == [3]
        out = run({"range": {"path": "views", "gte": 5, "lte": 10}})
        assert {d["_id"] for d in out} == {1, 3}
        out = run({"exists": {"path": "t"}})
        assert {d["_id"] for d in out} == {1, 2, 3}
        out = run({"in": {"path": "views", "value": [1, 3]}})
        assert {d["_id"] for d in out} == {2, 4}

    def test_regex_keyword_semantics(self):
        # r9: Lucene RegExp dialect — whole un-analyzed value,
        # case-sensitive, constant 1.0 score
        docs = [
            {"_id": 1, "sku": "ABC-123-X"},
            {"_id": 2, "sku": "ABC-99-Y"},
            {"_id": 3, "sku": "abc-123-x"},
            {"_id": 4, "sku": ["Z-1", "ABC-7-X"]},  # array element matches
            {"_id": 5},
        ]
        out = run({"regex": {"query": "ABC-[0-9]+-X", "path": "sku"}},
                  docs=docs,
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        assert {d["_id"] for d in out} == {1, 4}
        assert all(d["s"] == 1.0 for d in out)
        # implicit anchoring: a substring match is NOT a match
        out = run({"regex": {"query": "[0-9]+", "path": "sku"}}, docs=docs)
        assert out == []
        # Lucene `@` = any string; `.` crosses newlines (DOTALL stance)
        out = run({"regex": {"query": "ABC@", "path": "sku"}}, docs=docs)
        assert {d["_id"] for d in out} == {1, 2, 4}
        out = run({"regex": {"query": "A.C-(123|99)-.", "path": "sku"}},
                  docs=docs)
        assert {d["_id"] for d in out} == {1, 2}
        # quantified groups and classes
        out = run({"regex": {"query": "(ABC-)?99?-?[A-Z]{1}",
                             "path": "sku"}}, docs=docs)
        assert {d["_id"] for d in out} == {2}

    def test_regex_newline_and_literal_anchors(self):
        docs = [{"_id": 1, "v": "a\nb"}, {"_id": 2, "v": "a^b$"}]
        out = run({"regex": {"query": "a.b", "path": "v"}}, docs=docs)
        assert {d["_id"] for d in out} == {1}
        # ^ and $ are LITERAL characters in Lucene RegExp
        out = run({"regex": {"query": "a^b$", "path": "v"}}, docs=docs)
        assert {d["_id"] for d in out} == {2}

    def test_regex_automaton_operators_evaluate(self):
        # r10: the automaton-algebra operators route through the DFA
        # engine instead of raising (tests/test_lucene_regex.py pins the
        # full semantics; this is the $search wiring check)
        docs = [{"_id": 1, "sku": "ab"}, {"_id": 2, "sku": "b"},
                {"_id": 3, "sku": "42"}]
        assert [d["_id"] for d in run(
            {"regex": {"query": "a~(c)", "path": "sku"}}, docs=docs)] == [1]
        assert [d["_id"] for d in run(
            {"regex": {"query": ".*b&a.*", "path": "sku"}},
            docs=docs)] == [1]
        assert [d["_id"] for d in run(
            {"regex": {"query": "<40-45>", "path": "sku"}},
            docs=docs)] == [3]
        assert run({"regex": {"query": "#", "path": "sku"}},
                   docs=docs) == []
        with pytest.raises(ValueError, match="bad repetition"):
            run({"regex": {"query": "a{x}", "path": "sku"}},
                docs=[{"_id": 1, "sku": "a"}])
        with pytest.raises(ValueError, match="allowAnalyzedField"):
            run({"regex": {"query": "a", "path": "sku",
                           "allowAnalyzedField": True}},
                docs=[{"_id": 1, "sku": "a"}])
        # escaped automaton chars are plain literals
        out = run({"regex": {"query": "a\\&b", "path": "sku"}},
                  docs=[{"_id": 1, "sku": "a&b"}])
        assert [d["_id"] for d in out] == [1]

    def test_regex_python_group_extensions_raise(self):
        # r10 (r9 advice): '(?i)', '(?:...)', '(?=...)' are Python group
        # extensions Lucene RegExp rejects — raise instead of silently
        # compiling with Python semantics (e.g. case-insensitive match)
        for pat in ("(?i)abc", "(?:ab)c", "a(?=b)", "(?<x>a)"):
            with pytest.raises(ValueError, match="Lucene RegExp"):
                run({"regex": {"query": pat, "path": "sku"}},
                    docs=[{"_id": 1, "sku": "abc"}])
        # plain groups still work; escaped '(' + '?' is two literals
        out = run({"regex": {"query": "(ab|cd)+", "path": "sku"}},
                  docs=[{"_id": 1, "sku": "abcd"}, {"_id": 2, "sku": "x"}])
        assert [d["_id"] for d in out] == [1]
        out = run({"regex": {"query": "\\(\\?x", "path": "sku"}},
                  docs=[{"_id": 1, "sku": "(?x"}])
        assert [d["_id"] for d in out] == [1]

    def test_unsupported_operator_raises(self):
        with pytest.raises(ValueError, match="unsupported \\$search operator"):
            run({"knnBeta": {"path": "v", "vector": [1.0], "k": 3}})

    def test_more_like_this_pins_to_text_should(self):
        # r8 session 3: all analyzed like-doc text, BM25 disjunction
        out = run({"moreLikeThis": {"like": {"t": "spark"}}})
        assert {d["_id"] for d in out} == {1, 2}

    def test_autocomplete_prefix_semantics(self):
        # r8: autocomplete is supported — prefix matching, constant 1.0
        out = run({"autocomplete": {"query": "sp", "path": "t"}},
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        assert {d["_id"] for d in out} == {1, 2}
        assert all(d["s"] == 1.0 for d in out)
        # sequential: "is" then "fa*" appears in order only in doc 1
        out = run({"autocomplete": {"query": "is fa", "path": "t",
                                    "tokenOrder": "sequential"}})
        assert [d["_id"] for d in out] == [1]

    def test_autocomplete_fuzzy_prefix_edits(self):
        # r8 session 2: fuzzy = prefix edit distance after an exact
        # prefixLength head; "sparc" is 1 edit from a prefix of "spark"
        out = run({"autocomplete": {"query": "sparc", "path": "t",
                                    "fuzzy": {"maxEdits": 1}}})
        assert {d["_id"] for d in out} == {1, 2}
        # prefixLength pins the head: "zpark" fails prefixLength=1
        out = run({"autocomplete": {"query": "zpark", "path": "t",
                                    "fuzzy": {"maxEdits": 1,
                                              "prefixLength": 1}}})
        assert out == []
        # ... but matches with no prefix requirement (substitute z->s)
        out = run({"autocomplete": {"query": "zpark", "path": "t",
                                    "fuzzy": {"maxEdits": 1}}})
        assert {d["_id"] for d in out} == {1, 2}

    def test_autocomplete_fuzzy_validation(self):
        with pytest.raises(ValueError, match="maxEdits"):
            run({"autocomplete": {"query": "sp", "path": "t",
                                  "fuzzy": {"maxEdits": 3}}})
        with pytest.raises(ValueError, match="bad fuzzy"):
            run({"autocomplete": {"query": "sp", "path": "t",
                                  "fuzzy": {"nope": 1}}})


GEO_DOCS = [
    {"_id": 1, "loc": {"type": "Point", "coordinates": [0.5, 0.5]}},
    {"_id": 2, "loc": [10.0, 10.0]},                      # legacy pair
    {"_id": 3, "loc": [{"type": "Point", "coordinates": [0.1, 0.1]},
                       {"type": "Point", "coordinates": [50.0, 50.0]}]},
    {"_id": 4, "loc": "not a point"},
    {"_id": 5},
]

UNIT_SQUARE = {"type": "Polygon",
               "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}


class TestGeoOperators:
    """r9: $search geoWithin (circle/box/geometry) and geoShape
    (within/intersects/disjoint over point documents) — constant 1.0
    scores, any point of an array matches, non-points never match."""

    def run_g(self, spec, docs=GEO_DOCS):
        return run(spec, docs=docs,
                   extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])

    def test_geo_within_geometry(self):
        out = self.run_g({"geoWithin": {"path": "loc",
                                        "geometry": UNIT_SQUARE}})
        got = {d["_id"]: d["s"] for d in out}
        assert got == {1: 1.0, 3: 1.0}  # doc 3 via its first point

    def test_geo_within_box_and_circle(self):
        out = self.run_g({"geoWithin": {"path": "loc", "box": {
            "bottomLeft": {"type": "Point", "coordinates": [5, 5]},
            "topRight": {"type": "Point", "coordinates": [20, 20]}}}})
        assert {d["_id"] for d in out} == {2}
        # circle radius is METERS on the sphere: ~157km covers 1 degree
        out = self.run_g({"geoWithin": {"path": "loc", "circle": {
            "center": {"type": "Point", "coordinates": [0, 0]},
            "radius": 200_000}}})
        assert {d["_id"] for d in out} == {1, 3}
        out = self.run_g({"geoWithin": {"path": "loc", "circle": {
            "center": {"type": "Point", "coordinates": [0, 0]},
            "radius": 1_000}}})
        assert out == []

    def test_geo_within_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            run({"geoWithin": {"path": "loc", "geometry": UNIT_SQUARE,
                               "box": {"bottomLeft": [0, 0],
                                       "topRight": [1, 1]}}},
                docs=GEO_DOCS)
        with pytest.raises(ValueError, match="unsupported options"):
            run({"geoWithin": {"path": "loc", "geometry": UNIT_SQUARE,
                               "bogus": 1}}, docs=GEO_DOCS)

    def test_geo_shape_relations(self):
        within = self.run_g({"geoShape": {"path": "loc",
                                          "relation": "within",
                                          "geometry": UNIT_SQUARE}})
        assert {d["_id"] for d in within} == {1, 3}
        inter = self.run_g({"geoShape": {"path": "loc",
                                         "relation": "intersects",
                                         "geometry": UNIT_SQUARE}})
        assert {d["_id"] for d in inter} == {1, 3}
        # disjoint: ANY indexed point disjoint from the query geometry —
        # doc 3 matches via its (50, 50) point; non-points never match
        dis = self.run_g({"geoShape": {"path": "loc",
                                       "relation": "disjoint",
                                       "geometry": UNIT_SQUARE}})
        assert {d["_id"] for d in dis} == {2, 3}
        # intersects with a Point geometry = coordinate equality
        eq = self.run_g({"geoShape": {"path": "loc",
                                      "relation": "intersects",
                                      "geometry": {"type": "Point",
                                                   "coordinates": [10.0, 10.0]}}})
        assert {d["_id"] for d in eq} == {2}

    def test_geo_shape_contains_raises(self):
        # stored-shape algebra (polygon contains polygon) needs S2;
        # point docs can only contain an equal Point
        out = self.run_g({"geoShape": {"path": "loc",
                                       "relation": "contains",
                                       "geometry": {"type": "Point",
                                                    "coordinates": [10.0, 10.0]}}})
        assert {d["_id"] for d in out} == {2}
        with pytest.raises(ValueError, match="contains"):
            run({"geoShape": {"path": "loc", "relation": "contains",
                              "geometry": UNIT_SQUARE}}, docs=GEO_DOCS)
        with pytest.raises(ValueError, match="relation"):
            run({"geoShape": {"path": "loc", "relation": "overlaps",
                              "geometry": UNIT_SQUARE}}, docs=GEO_DOCS)

    def test_geo_in_compound_with_score(self):
        out = run({"compound": {"should": [
            {"geoWithin": {"path": "loc", "geometry": UNIT_SQUARE,
                           "score": {"boost": {"value": 2.5}}}}]}},
            docs=GEO_DOCS,
            extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        assert {d["_id"]: d["s"] for d in out} == {1: 2.5, 3: 2.5}


EDOCS = [
    {"_id": 1, "items": [{"name": "red apple", "qty": 2},
                         {"name": "green pear", "qty": 5}]},
    {"_id": 2, "items": [{"name": "apple pie", "qty": 1}]},
    {"_id": 3, "items": [{"name": "banana", "qty": 9}]},
    {"_id": 4},
]


class TestEmbeddedDocument:
    """r9: per-array-element nested-document evaluation. BM25 inner
    statistics are over the EMBEDDED-document corpus (each element is
    its own nested Lucene doc in Atlas), hand-computed here; aggregate
    strategies and outerScore follow the documented score.embedded
    option (default: sum)."""

    # nested corpus over items.name: 4 elements, avg len 7/4
    def _s(self, tf, dl, df):
        return bm25_one(tf, dl, 7 / 4, 4, df)

    def run_e(self, spec, docs=EDOCS):
        return run(spec, docs=docs,
                   extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])

    def test_text_inner_bm25_over_nested_corpus(self):
        out = self.run_e({"embeddedDocument": {
            "path": "items",
            "operator": {"text": {"query": "apple", "path": "items.name"}},
        }})
        got = {d["_id"]: d["s"] for d in out}
        # df(apple)=2 over the 4-element corpus; "red apple" dl=2,
        # "apple pie" dl=2; one matching element each -> sum = element
        assert set(got) == {1, 2}
        assert got[1] == pytest.approx(self._s(1, 2, 2))
        assert got[2] == pytest.approx(self._s(1, 2, 2))

    def test_aggregate_strategies(self):
        spec = lambda agg: {"embeddedDocument": {
            "path": "items",
            "operator": {"text": {"query": "apple pear",
                                  "path": "items.name"}},
            "score": {"embedded": {"aggregate": agg}},
        }}
        # doc 1: two matching elements (apple df=2, pear df=1)
        s_apple = self._s(1, 2, 2)
        s_pear = bm25_one(1, 2, 7 / 4, 4, 1)
        for agg, expect in (("sum", s_apple + s_pear),
                            ("maximum", max(s_apple, s_pear)),
                            ("minimum", min(s_apple, s_pear)),
                            ("mean", (s_apple + s_pear) / 2)):
            got = {d["_id"]: d["s"] for d in self.run_e(spec(agg))}
            assert got[1] == pytest.approx(expect), agg
            assert got[2] == pytest.approx(s_apple)  # single element

    def test_outer_score_and_elem_match_shape(self):
        out = self.run_e({"embeddedDocument": {
            "path": "items",
            "operator": {"equals": {"path": "items.qty", "value": 5}},
            "score": {"embedded": {
                "aggregate": "maximum",
                "outerScore": {"boost": {"value": 4}}}},
        }})
        got = {d["_id"]: d["s"] for d in out}
        assert got == {1: 4.0}  # equals scores 1.0; boost on aggregate
        # compound inner operator: BOTH conditions on the SAME element
        # ($elemMatch shape) — doc 1 has apple/qty-2 and pear/qty-5
        # elements but no apple/qty-5 element
        out = self.run_e({"embeddedDocument": {
            "path": "items",
            "operator": {"compound": {"must": [
                {"text": {"query": "apple", "path": "items.name"}},
                {"equals": {"path": "items.qty", "value": 5}},
            ]}},
        }})
        assert out == []

    def test_inside_compound_and_missing_arrays(self):
        out = run({"compound": {
            "must": [{"embeddedDocument": {
                "path": "items",
                "operator": {"range": {"path": "items.qty", "gte": 9}},
            }}],
        }}, docs=EDOCS)
        assert [d["_id"] for d in out] == [3]
        # doc 4 has no items array: never matches, never errors
        out = self.run_e({"embeddedDocument": {
            "path": "items",
            "operator": {"exists": {"path": "items.name"}},
        }})
        assert {d["_id"] for d in out} == {1, 2, 3}

    def test_validation_raises(self):
        with pytest.raises(ValueError, match="bad options"):
            run({"embeddedDocument": {"path": "items", "operator": {},
                                      "nope": 1}}, docs=EDOCS)
        with pytest.raises(ValueError, match="single"):
            run({"embeddedDocument": {"path": "items", "operator": {}}},
                docs=EDOCS)
        with pytest.raises(ValueError, match="bad aggregate"):
            run({"embeddedDocument": {
                "path": "items",
                "operator": {"exists": {"path": "items.name"}},
                "score": {"embedded": {"aggregate": "median"}}}},
                docs=EDOCS)
        with pytest.raises(ValueError, match="unsupported score option"):
            run({"embeddedDocument": {
                "path": "items",
                "operator": {"exists": {"path": "items.name"}},
                "score": {"boost": {"value": 2}}}}, docs=EDOCS)


class TestCompound:
    def test_must_filter_must_not(self):
        out = run({"compound": {
            "must": [{"text": {"query": "spark", "path": "t"}}],
            "filter": [{"range": {"path": "views", "gte": 5}}],
        }})
        assert [d["_id"] for d in out] == [1]
        out = run({"compound": {
            "must": [{"exists": {"path": "t"}}],
            "mustNot": [{"text": {"query": "duckdb", "path": "t"}}],
        }})
        assert {d["_id"] for d in out} == {1, 2}

    def test_filter_contributes_no_score(self):
        scored = run({"compound": {
            "must": [{"text": {"query": "spark", "path": "t"}}],
            "filter": [{"exists": {"path": "views"}}],
        }}, extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        plain = run({"text": {"query": "spark", "path": "t"}},
                    extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        assert [d["s"] for d in scored] == [d["s"] for d in plain]

    def test_minimum_should_match(self):
        spec = {"compound": {
            "should": [{"text": {"query": "spark", "path": "t"}},
                       {"equals": {"path": "lang", "value": "de"}}],
            "minimumShouldMatch": 2,
        }}
        assert run(spec) == []  # no doc matches both
        spec["compound"]["minimumShouldMatch"] = 1
        assert {d["_id"] for d in run(spec)} == {1, 2, 3}


class TestSortOption:
    """r9: the $search `sort` option — field-order results instead of
    relevance order; missing fields sort last regardless of direction;
    {"$meta": "searchScore"} sorts by score; ties fall back to
    (score desc, input order)."""

    SDOCS = [
        {"_id": 1, "t": "spark", "views": 10},
        {"_id": 2, "t": "spark spark", "views": 3},
        {"_id": 3, "t": "spark", "views": 7},
        {"_id": 4, "t": "spark"},               # missing views
    ]

    def test_field_sort_missing_last(self):
        out = run({"text": {"query": "spark", "path": "t"},
                   "sort": {"views": 1}}, docs=self.SDOCS)
        assert [d["_id"] for d in out] == [2, 3, 1, 4]
        out = run({"text": {"query": "spark", "path": "t"},
                   "sort": {"views": -1}}, docs=self.SDOCS)
        assert [d["_id"] for d in out] == [1, 3, 2, 4]  # missing still last

    def test_meta_score_and_compound_keys(self):
        # secondary key breaks the equal-views tie... build docs where
        # views ties and score differs
        docs = [
            {"_id": 1, "t": "spark", "views": 5},
            {"_id": 2, "t": "spark spark", "views": 5},
            {"_id": 3, "t": "spark", "views": 1},
        ]
        out = run({"text": {"query": "spark", "path": "t"},
                   "sort": {"views": -1,
                            "relevance": {"$meta": "searchScore"}}},
                  docs=docs)
        # views 5 group first, within it higher score (doc 2, tf=2) first
        assert [d["_id"] for d in out] == [2, 1, 3]

    def test_scores_still_reported(self):
        out = run({"text": {"query": "spark", "path": "t"},
                   "sort": {"views": 1}}, docs=self.SDOCS,
                  extra=[{"$addFields": {"s": {"$meta": "searchScore"}}}])
        assert all(d["s"] > 0 for d in out)

    def test_validation(self):
        with pytest.raises(ValueError, match="direction"):
            run({"text": {"query": "spark", "path": "t"},
                 "sort": {"views": 2}}, docs=self.SDOCS)
        with pytest.raises(ValueError, match="bad value"):
            run({"text": {"query": "spark", "path": "t"},
                 "sort": {"views": {"$meta": "searchHighlights"}}},
                docs=self.SDOCS)
        with pytest.raises(ValueError, match="incomparable"):
            run({"text": {"query": "spark", "path": "t"},
                 "sort": {"views": 1}},
                docs=[{"_id": 1, "t": "spark", "views": 5},
                      {"_id": 2, "t": "spark", "views": "five"}])


class TestAuxiliaryOptions:
    """r9: tracking (search-terms telemetry) and concurrent
    (parallelism hint) are accepted no-ops; scoreDetails: true raises
    (the Lucene explain tree is index-format-bound) while false is the
    explicit default."""

    def test_tracking_concurrent_accepted(self):
        out = run({"text": {"query": "spark", "path": "t"},
                   "tracking": {"searchTerms": "spark"},
                   "concurrent": True,
                   "scoreDetails": False})
        assert {d["_id"] for d in out} == {1, 2}

    def test_score_details_true_raises(self):
        with pytest.raises(ValueError, match="scoreDetails"):
            run({"text": {"query": "spark", "path": "t"},
                 "scoreDetails": True})


class TestHighlight:
    """r10 (r9 verdict #1): ``highlight`` renders passage arrays into
    the ``searchHighlights`` meta per the engine's pinned contract
    (sentence passages, analyzer token offsets, score =
    unique_hit_terms + hit_tokens/(passage_tokens+1)) — the option was
    previously accepted and silently dropped."""

    HDOCS = [
        {"_id": 1, "t": "Spark is fast. Spark streaming works."},
        {"_id": 2, "t": "duckdb is a database"},
    ]

    def _hl(self, spec, docs=None, hl=None):
        spec = dict(spec)
        spec["highlight"] = hl or {"path": "t"}
        out = run(spec, docs=docs or self.HDOCS,
                  extra=[{"$project": {
                      "_id": 1, "h": {"$meta": "searchHighlights"}}}])
        return {d["_id"]: d["h"] for d in out}

    def test_text_passages_hand_built(self):
        h = self._hl({"text": {"query": "spark", "path": "t"}})
        assert set(h) == {1}
        p = h[1]
        assert len(p) == 2  # both sentences contain a hit
        # equal scores (1 unique term, 1 hit, 3 tokens): 1 + 1/4
        assert p[0]["score"] == pytest.approx(1.25)
        assert p[1]["score"] == pytest.approx(1.25)
        assert p[0]["path"] == "t"
        # tie broken by offset: the first sentence leads
        assert p[0]["texts"] == [
            {"value": "Spark", "type": "hit"},
            {"value": " is fast.", "type": "text"}]
        assert p[1]["texts"] == [
            {"value": " ", "type": "text"},
            {"value": "Spark", "type": "hit"},
            {"value": " streaming works.", "type": "text"}]
        # chunks concatenate back to the stored value verbatim
        whole = "".join(c["value"] for ps in p for c in ps["texts"])
        assert whole == self.HDOCS[0]["t"]

    def test_two_term_passage_outranks(self):
        h = self._hl({"text": {"query": "spark streaming", "path": "t"}})
        p = h[1]
        # sentence 2: 2 unique terms, 2 hits, 3 tokens -> 2.5; first
        assert p[0]["score"] == pytest.approx(2.5)
        assert [c["value"] for c in p[0]["texts"]
                if c["type"] == "hit"] == ["Spark", "streaming"]
        assert p[1]["score"] == pytest.approx(1.25)

    def test_max_num_passages_caps(self):
        h = self._hl({"text": {"query": "spark", "path": "t"}},
                     hl={"path": "t", "maxNumPassages": 1})
        assert len(h[1]) == 1
        assert h[1][0]["texts"][0]["value"] == "Spark"

    def test_max_chars_to_examine(self):
        # budget covers only the first sentence; the second is unseen
        h = self._hl({"text": {"query": "spark", "path": "t"}},
                     hl={"path": "t", "maxCharsToExamine": 14})
        assert len(h[1]) == 1
        assert h[1][0]["texts"][0]["value"] == "Spark"

    def test_phrase_marks_only_matched_occurrences(self):
        docs = [{"_id": 1, "t": "fast spark. slow boat. fast ship"}]
        h = self._hl({"phrase": {"query": "fast spark", "path": "t"}},
                     docs=docs)
        # "fast" at position 0 participates in the occurrence; the
        # stray "fast ship" tokens do not match the phrase -> only the
        # first sentence is a passage
        assert len(h[1]) == 1
        assert [c["value"] for c in h[1][0]["texts"]
                if c["type"] == "hit"] == ["fast", "spark"]

    def test_fuzzy_text_marks_edit_neighbors(self):
        h = self._hl({"text": {"query": "sparc", "path": "t",
                               "fuzzy": {"maxEdits": 1}}})
        assert set(h) == {1}
        assert h[1][0]["texts"][0] == {"value": "Spark", "type": "hit"}

    def test_autocomplete_prefix_hits(self):
        docs = [{"_id": 1, "t": "sparkling water"}]
        h = self._hl({"autocomplete": {"query": "spark", "path": "t"}},
                     docs=docs)
        assert h[1][0]["texts"][0] == {"value": "sparkling", "type": "hit"}

    def test_wildcard_whole_value_hit(self):
        docs = [{"_id": 1, "sku": "spark-01"}, {"_id": 2, "sku": "x"}]
        h = self._hl({"wildcard": {"query": "spark-*", "path": "sku"}},
                     docs=docs, hl={"path": "sku"})
        assert h[1] == [{"score": 1.0, "path": "sku",
                         "texts": [{"value": "spark-01", "type": "hit"}]}]

    def test_compound_filter_marks_mustnot_never(self):
        docs = [{"_id": 1, "t": "spark is fast"}]
        h = self._hl({"compound": {
            "must": [{"text": {"query": "spark", "path": "t"}}],
            "filter": [{"text": {"query": "fast", "path": "t"}}],
            "mustNot": [{"text": {"query": "duck", "path": "t"}}]}},
            docs=docs)
        hits = [c["value"] for c in h[1][0]["texts"] if c["type"] == "hit"]
        assert hits == ["spark", "fast"]

    def test_untouched_path_and_array_values(self):
        docs = [{"_id": 1, "t": "spark here", "u": ["no spark", "none"]}]
        # highlight path not referenced by any clause -> empty array
        h = self._hl({"text": {"query": "spark", "path": "t"}},
                     docs=docs, hl={"path": "u"})
        assert h[1] == []
        # array-of-string path: per-element passages
        h = self._hl({"text": {"query": "spark", "path": "u"}},
                     docs=docs, hl={"path": ["t", "u"]})
        assert [p["path"] for p in h[1]] == ["u"]
        assert h[1][0]["texts"] == [
            {"value": "no ", "type": "text"},
            {"value": "spark", "type": "hit"}]

    def test_bad_highlight_specs_raise(self):
        for bad in ({"maxNumPassages": 3},              # path required
                    {"path": 7},
                    {"path": "t", "nope": 1},
                    {"path": "t", "maxNumPassages": 0}):
            with pytest.raises(ValueError, match="highlight"):
                run({"text": {"query": "spark", "path": "t"},
                     "highlight": bad}, docs=self.HDOCS)


class TestStageWiring:
    def test_search_meta_count(self):
        out = run_pipeline(DOCS, [
            {"$searchMeta": {"text": {"query": "spark", "path": "t"}}}])
        assert out == [{"count": {"total": 2}}]

    def test_must_be_first_stage(self):
        with pytest.raises(ValueError, match="first"):
            run_pipeline(DOCS, [
                {"$limit": 2},
                {"$search": {"text": {"query": "spark", "path": "t"}}}])

    def test_meta_stripped_from_output(self):
        out = run({"text": {"query": "spark", "path": "t"}})
        assert all("__mql_meta__" not in d for d in out)
