"""r10: Lucene RegExp automaton operators (~ & <n-m> #) via the DFA
engine (mql/lucene_regex) — hand-computed oracles, parity with the r9
``re`` path on the shared core, and the $search integration."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_mongo_spark.mql.lucene_regex import (
    LuceneRegex,
    LuceneRegexError,
    needs_automaton,
)
from duckdb_mongo_spark.mql.search import _lucene_regex_source


def m(pattern, s):
    return LuceneRegex(pattern).fullmatch(s) is not None


class TestSharedCore:
    """The DFA engine must agree with the r9 re-translation on every
    construct both support."""

    CASES = [
        ("abc", ["abc"], ["ab", "abcd", ""]),
        ("a.c", ["abc", "a\nc", "axc"], ["ac", "abbc"]),
        ("ab*", ["a", "ab", "abbb"], ["b", "aba"]),
        ("ab+c", ["abc", "abbc"], ["ac"]),
        ("ab?c", ["ac", "abc"], ["abbc"]),
        ("a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
        ("a{2}", ["aa"], ["a", "aaa"]),
        ("a{2,}", ["aa", "aaaa"], ["a"]),
        ("(ab|cd)+", ["ab", "cdab"], ["", "abc"]),
        ("[a-c]x", ["ax", "cx"], ["dx", "x"]),
        ("[^a-c]x", ["dx", "zx"], ["ax", "x"]),
        ("a@", ["a", "abc", "a\n!"], ["", "ba"]),
        ("\\*x", ["*x"], ["ax"]),
        ("x^y", ["x^y"], ["xy"]),        # ^ literal mid-pattern
        ("a$", ["a$"], ["a"]),           # $ literal (no anchors)
        ("()", [""], ["a"]),             # empty string
        # r11: quoted-string simpleexp — characters verbatim, metas
        # inert inside, repetition applies to the WHOLE string
        ('"a.c"', ["a.c"], ["abc", "axc"]),
        ('"ab*"', ["ab*"], ["a", "abb"]),
        ('x"y|z"w', ["xy|zw"], ["xw", "xyw", "xzw"]),
        ('"ab"+', ["ab", "abab"], ["", "a", "aba"]),
        ('""', [""], ["a"]),             # empty quoted string
        ('"~#<>"', ["~#<>"], ["~#<", ""]),  # automaton ops inert
    ]

    @pytest.mark.parametrize("pattern,yes,no", CASES)
    def test_hand_cases(self, pattern, yes, no):
        rx = re.compile(_lucene_regex_source(pattern), re.DOTALL)
        for s in yes:
            assert m(pattern, s), (pattern, s)
            assert rx.fullmatch(s), (pattern, s)
        for s in no:
            assert not m(pattern, s), (pattern, s)
            assert not rx.fullmatch(s), (pattern, s)

    @settings(max_examples=150, deadline=None)
    @given(
        pattern=st.from_regex(
            r"\A[ab]([ab.]|\*|\|[ab]|\[ab\]|\{1,2\}){0,6}\Z", fullmatch=True),
        s=st.text(alphabet="ab", max_size=6),
    )
    def test_property_parity_with_re_path(self, pattern, s):
        try:
            rx = re.compile(_lucene_regex_source(pattern), re.DOTALL)
        except ValueError:
            with pytest.raises(ValueError):
                LuceneRegex(pattern)
            return
        except re.error:
            # r9-path deviation: Python re rejects stacked quantifiers
            # ('a**') that the Lucene grammar allows — the DFA engine
            # may legitimately accept these
            return
        assert bool(rx.fullmatch(s)) == m(pattern, s), (pattern, s)


class TestComplement:
    def test_whole_pattern(self):
        assert m("~(abc)", "abd")
        assert m("~(abc)", "")
        assert m("~(abc)", "abcd")
        assert not m("~(abc)", "abc")

    def test_inside_concat(self):
        # a then anything-but-"b" then c
        p = "a~(b)c"
        assert m(p, "axc")
        assert m(p, "ac")          # middle matches the empty string
        assert m(p, "abbc")        # "bb" != "b"
        assert not m(p, "abc")

    def test_binds_tighter_than_repetition(self):
        # ~(a)* is (~a)* — iterated anything-but-"a"; "" matches via
        # zero iterations, and any string splits into non-"a" chunks
        assert m("~(a)*", "")
        assert m("~(a)*", "bb")
        assert m("~(a)*", "aa")  # one chunk "aa" != "a"

    def test_double_complement(self):
        assert m("~(~(abc))", "abc")
        assert not m("~(~(abc))", "abd")


class TestIntersection:
    def test_basic(self):
        p = "[ab]*&.*a.*"
        assert m(p, "ba")
        assert m(p, "aab")
        assert not m(p, "bb")      # no 'a'
        assert not m(p, "ca")      # 'c' not in [ab]

    def test_with_complement(self):
        # strings of a/b containing "ab" but not ending in b
        p = "(@ab@)&~(@b)&[ab]*"
        assert m(p, "aba")
        assert m(p, "abba")
        assert not m(p, "ab")
        assert not m(p, "aa")

    def test_empty_intersection(self):
        assert not m("a&b", "a")
        assert not m("a&b", "b")


class TestNumericInterval:
    def test_basic_range(self):
        p = "<1-100>"
        for s in ["1", "42", "100", "007", "0001"]:
            assert m(p, s), s
        for s in ["0", "101", "", "1a", "a1", "-5"]:
            assert not m(p, s), s

    def test_single_value(self):
        assert m("<7-7>", "7")
        assert m("<7-7>", "07")
        assert not m("<7-7>", "8")

    def test_zero_in_range(self):
        assert m("<0-5>", "0")
        assert m("<0-5>", "00")
        assert m("<0-5>", "5")
        assert not m("<0-5>", "6")

    def test_large_bounds(self):
        p = "<250-1024>"
        for v in [250, 251, 999, 1000, 1024, 512]:
            assert m(p, str(v)), v
            assert m(p, "0" + str(v)), v
        for v in [0, 1, 249, 1025, 9999]:
            assert not m(p, str(v)), v

    def test_reversed_bounds_normalize(self):
        assert m("<9-3>", "5")  # Lucene swaps reversed bounds
        assert not m("<9-3>", "10")

    def test_in_context(self):
        p = "v<1-3>\\.x"
        assert m(p, "v2.x")
        assert not m(p, "v4.x")

    def test_exhaustive_against_int_oracle(self):
        p = LuceneRegex("<38-412>")
        for v in range(0, 1500):
            assert (p.fullmatch(str(v)) is not None) == (38 <= v <= 412), v

    def test_bad_interval_raises(self):
        with pytest.raises(ValueError, match="interval"):
            LuceneRegex("<1->")


class TestEmptyLanguage:
    def test_matches_nothing(self):
        for s in ["", "a", "#"]:
            assert not m("#", s)

    def test_union_identity(self):
        assert m("#|abc", "abc")
        assert not m("#|abc", "abd")

    def test_complement_is_any_string(self):
        assert m("~#", "")
        assert m("~#", "anything")


class TestValidation:
    def test_group_extension_raises(self):
        with pytest.raises(ValueError, match=r"\(\?"):
            LuceneRegex("a(?i)b&c")

    def test_unbalanced_raises(self):
        with pytest.raises(ValueError):
            LuceneRegex("(ab&c")
        with pytest.raises(ValueError):
            LuceneRegex("ab)&c")

    def test_unterminated_class_raises(self):
        with pytest.raises(ValueError, match="unterminated"):
            LuceneRegex("[ab&c")

    def test_trailing_backslash_raises(self):
        with pytest.raises(ValueError, match="backslash"):
            LuceneRegex("ab&\\")

    def test_dangling_repeat_raises(self):
        with pytest.raises(ValueError):
            LuceneRegex("&*a")

    def test_huge_repetition_raises(self):
        with pytest.raises(ValueError, match="1000"):
            LuceneRegex("a{1,5000}&b")

    def test_needs_automaton_detection(self):
        assert needs_automaton("a&b")
        assert needs_automaton("~x")
        assert needs_automaton("<1-5>")
        assert needs_automaton("#")
        assert not needs_automaton("a\\&b")     # escaped
        assert not needs_automaton("[~&#<]")    # inside a class
        assert not needs_automaton("plain|.*")

    def test_escaped_ops_are_literals(self):
        assert m("a\\&b", "a&b")
        assert m("\\~x", "~x")
        assert m("[~&]x", "&x")
        assert m("[~&]x", "~x")


class TestSearchIntegration:
    DOCS = [
        {"_id": 1, "sku": "v7"},
        {"_id": 2, "sku": "v12"},
        {"_id": 3, "sku": "v99"},
        {"_id": 4, "sku": "x12"},
    ]

    def _run(self, query):
        from duckdb_mongo_spark.mql import run_pipeline

        out = run_pipeline(
            self.DOCS, [{"$search": {"regex": {"query": query,
                                               "path": "sku"}}}])
        return sorted(d["_id"] for d in out)

    def test_interval_operator_end_to_end(self):
        assert self._run("v<10-99>") == [2, 3]

    def test_complement_end_to_end(self):
        assert self._run("v.*&~(v99)") == [1, 2]

    def test_shared_core_still_uses_re(self):
        from duckdb_mongo_spark.mql.search import _compile_lucene_regexes

        (pat,) = _compile_lucene_regexes(["v.*"])
        assert isinstance(pat, re.Pattern)
        (pat2,) = _compile_lucene_regexes(["v.*&~(v99)"])
        assert isinstance(pat2, LuceneRegex)

    def test_routed_parity(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from duckdb_mongo_spark.backends import ParquetBackend
        from duckdb_mongo_spark.scan import mongo_scan

        sub = tmp_path / "lrx"
        sub.mkdir()
        pq.write_table(
            pa.table({"_id": [1, 2, 3, 4],
                      "sku": ["v7", "v12", "v99", "x12"]}),
            str(sub / "items.parquet"))
        be = ParquetBackend(str(sub), db_name="main")
        pipe = [{"$search": {"regex": {"query": "v<10-99>&~(v99)",
                                       "path": "sku"}}},
                {"$limit": 10}, {"$project": {"_id": 1}}]
        mf = mongo_scan(spark, be, "main", "items", pipeline=pipe)
        got = sorted(r["_id"] for r in mf.df().collect())
        assert got == [2]


class TestAlgebraicLaws:
    """Internal-consistency laws over enumerated strings: the automaton
    operators must satisfy the boolean algebra they implement —
    L(a&b) = L(a) ∩ L(b), L(a|b) = L(a) ∪ L(b), L(~a) = complement,
    L(~~a) = L(a) — for random small patterns over a tiny alphabet."""

    ALPHABET = "ab"

    @classmethod
    def _universe(cls, max_len=4):
        from itertools import product
        out = [""]
        for n in range(1, max_len + 1):
            out += ["".join(t) for t in product(cls.ALPHABET, repeat=n)]
        return out

    @classmethod
    def _lang(cls, pattern):
        rx = LuceneRegex(pattern)
        return {s for s in cls._universe() if rx.fullmatch(s)}

    _PAT = st.from_regex(
        r"\A[ab]([ab.]|\*|\|[ab]|\(~\([ab][ab]?\)\)){0,4}\Z",
        fullmatch=True)

    @settings(max_examples=60, deadline=None)
    @given(a=_PAT, b=_PAT)
    def test_intersection_and_union_laws(self, a, b):
        la, lb = self._lang(a), self._lang(b)
        assert self._lang(f"({a})&({b})") == la & lb, (a, b)
        assert self._lang(f"({a})|({b})") == la | lb, (a, b)

    @settings(max_examples=60, deadline=None)
    @given(a=_PAT)
    def test_complement_laws(self, a):
        la = self._lang(a)
        univ = set(self._universe())
        assert self._lang(f"~({a})") == univ - la, a
        assert self._lang(f"~(~({a}))") == la, a
        # a & ~a is the empty language; a | ~a is everything
        assert self._lang(f"({a})&~({a})") == set(), a
        assert self._lang(f"({a})|~({a})") == univ, a

    def test_interval_intersection_with_pattern(self):
        # digits in [10, 30] that also match 1.* (i.e. 10..19)
        lang = {s for s in (str(v) for v in range(0, 100))
                if LuceneRegex("<10-30>&1.").fullmatch(s)}
        assert lang == {str(v) for v in range(10, 20)}


class TestQuotedString:
    def test_unterminated_raises_both_paths(self):
        with pytest.raises(ValueError, match="unterminated quoted"):
            _lucene_regex_source('"abc')
        with pytest.raises(LuceneRegexError, match="unterminated quoted"):
            LuceneRegex('x"abc')

    def test_quoted_with_automaton_ops_outside(self):
        # quoted literal composes with the DFA-only operators
        assert m('"a|b"&.{3}', "a|b")
        assert not m('"a|b"&.{2}', "a|b")
        assert m('~("ab")', "cd")
        assert not m('~("ab")', "ab")

    def test_quote_escape_still_literal(self):
        # a backslash-escaped quote is the literal character, not a
        # quoted-string opener (both paths)
        assert m('\\"a', '"a')
        rx = re.compile(_lucene_regex_source('\\"a'), re.DOTALL)
        assert rx.fullmatch('"a')
