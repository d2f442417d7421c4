"""Exact-substring span dedup (ops/span_dedup.py): planted-duplicate
detection, canonical-owner preservation, island merging, self-repeat
removal, hot-gram cap, and parity with a straight-line local reference
implementation over a random corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.span_dedup import duplicate_spans, remove_duplicate_spans

K = 5

_BOILER = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # d1 owns the boilerplate (first occurrence)
        ("d1", f"intro one two three {_BOILER} outro four five six"),
        # d2 repeats it mid-document
        ("d2", f"completely different opening text here {_BOILER} and a unique tail part"),
        # d3 no duplication
        ("d3", "nothing shared with anything else at all in this row honestly"),
        # d4 repeats the boilerplate TWICE (cross-doc + self-repeat)
        ("d4", f"{_BOILER} middle filler words {_BOILER} closing"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def spans(docs):
    return duplicate_spans(docs, k=K).cache()


class TestDetection:
    def test_owner_not_marked(self, spans):
        assert spans.filter(F.col("doc_id") == "d1").count() == 0

    def test_unique_doc_untouched(self, spans):
        assert spans.filter(F.col("doc_id") == "d3").count() == 0

    def test_duplicate_marked_and_merged(self, spans):
        rows = spans.filter(F.col("doc_id") == "d2").collect()
        # the 8 boilerplate tokens yield 4 overlapping k=5 windows that
        # must merge into ONE span of exactly the boilerplate's extent
        assert len(rows) == 1
        r = rows[0]
        assert r["span_end"] - r["span_start"] == 8
        # d2 prefix has 5 tokens -> boilerplate starts at index 5
        assert r["span_start"] == 5

    def test_self_repeat_both_marked(self, spans):
        rows = sorted(
            (r["span_start"], r["span_end"])
            for r in spans.filter(F.col("doc_id") == "d4").collect()
        )
        # d4 is not the owner (d1 sorts first), so BOTH its occurrences
        # are marked: [0,8) and [11,19)
        assert rows == [(0, 8), (11, 19)]


class TestRemoval:
    def test_text_rebuilt(self, docs, spans):
        out = {r["doc_id"]: r for r in remove_duplicate_spans(docs, spans).collect()}
        assert out["d1"]["n_tokens_removed"] == 0
        assert _BOILER in out["d1"]["dedup_text"]
        d2 = out["d2"]
        assert d2["n_tokens_removed"] == 8
        assert "alpha" not in d2["dedup_text"]
        assert d2["dedup_text"].startswith("completely different opening text here")
        assert d2["dedup_text"].endswith("and a unique tail part")
        d4 = out["d4"]
        assert d4["n_tokens_removed"] == 16
        assert d4["dedup_text"] == "middle filler words closing"

    def test_total_token_conservation(self, docs, spans):
        out = remove_duplicate_spans(docs, spans)
        rows = out.select(
            F.size(F.split("dedup_text", " ")).alias("kept"),
            "n_tokens_removed",
            F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))).alias("orig"),
        ).collect()
        for r in rows:
            kept = r["kept"] if r["kept"] > 0 else 0
            assert kept + r["n_tokens_removed"] == r["orig"]


class TestCapAndValidation:
    def test_hot_gram_cap_drops_marking(self, spark):
        rows = [(f"x{i}", f"hot common repeated block here now {i}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        # 10 occurrences of the 6-token prefix window; cap at 5 -> no marking
        capped = duplicate_spans(df, k=6, max_gram_freq=5)
        assert capped.count() == 0
        uncapped = duplicate_spans(df, k=6, max_gram_freq=1000)
        assert uncapped.count() == 9  # all but the owner doc

    def test_exact_grams_mode_identical_results(self, docs, spans):
        """exact_grams=True (gram-text keys, zero collision risk) must
        produce the same spans as the default hash mode on a
        collision-free corpus."""
        exact = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(docs, k=K, exact_grams=True).collect()
        }
        hashed = {
            (r["doc_id"], r["span_start"], r["span_end"]) for r in spans.collect()
        }
        assert exact == hashed and exact

    def test_bad_k(self, spark):
        df = spark.createDataFrame([("a", "b")], "doc_id string, text string")
        with pytest.raises(ValueError):
            duplicate_spans(df, k=0)


class TestLocalReferenceParity:
    def test_random_corpus(self, spark):
        """Distributed spans == a straight-line single-process
        implementation of the same rule over a random corpus with
        planted repeats."""
        import random

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(30)]
        planted = ["p1", "p2", "p3", "p4", "p5", "p6"]
        docs = []
        for i in range(12):
            body = [rng.choice(vocab) for _ in range(rng.randrange(8, 20))]
            if i % 3 == 0:
                at = rng.randrange(0, len(body))
                body[at:at] = planted
            docs.append((f"r{i:02d}", " ".join(body)))
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in duplicate_spans(df, k=4).collect()
        }

        # local reference
        toks = {d: t.split(" ") for d, t in docs}
        occ: dict = {}
        for d in sorted(toks):
            t = toks[d]
            for p in range(len(t) - 4 + 1):
                occ.setdefault(" ".join(t[p : p + 4]), []).append((d, p))
        marked: dict = {}
        for g, lst in occ.items():
            if len(lst) > 1:
                owner = min(lst)
                for d, p in lst:
                    if (d, p) != owner:
                        marked.setdefault(d, set()).add(p)
        expect = set()
        for d, starts in marked.items():
            cur_s = cur_e = None
            for s in sorted(starts):
                if cur_s is None:
                    cur_s, cur_e = s, s + 4
                elif s > cur_e:
                    expect.add((d, cur_s, cur_e))
                    cur_s, cur_e = s, s + 4
                else:
                    cur_e = max(cur_e, s + 4)
            if cur_s is not None:
                expect.add((d, cur_s, cur_e))
        assert got == expect
