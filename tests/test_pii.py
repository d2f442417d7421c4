"""PII detect/mask + URL/domain ops (ops/pii.py) — synthetic fixtures
(driver testdata carries no PII/URLs), DuckDB RE2 cross-checks for the
shared pattern strings, determinism + plan assertions."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_mongo_spark.ops.pii import (
    PII_PATTERNS,
    cap_per_domain,
    detect_pii,
    extract_urls,
    mask_pii,
    mask_pii_arrow,
    url_domain,
    with_url_stats,
)

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk or on +1 (415) 555-0199"),
    (2, "server at 192.168.1.254 responded; bogus 999.999.1.1 is not an ip"),
    (3, "card 4111 1111 1111 1111 leaked alongside ip 10.0.0.1"),
    (4, "clean text with no identifiers at all"),
    (5, "see https://www.Example.com/path?q=1 and http://data.example.org/x"),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(ROWS, ["id", "text"])


class TestDetect:
    def test_counts_and_flag(self, pii_df):
        out = {r.id: r for r in detect_pii(pii_df).collect()}
        assert out[1].n_email == 1 and out[1].n_phone >= 1
        assert out[2].n_ipv4 == 1          # 999.999.1.1 must NOT match
        assert out[3].n_card == 1 and out[3].n_ipv4 == 1
        assert out[4].has_pii is False and out[1].has_pii is True

    def test_zero_shuffle(self, pii_df):
        plan = detect_pii(pii_df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestMask:
    def test_mask_all_kinds(self, pii_df):
        got = {r.id: r.m for r in pii_df.select("id", mask_pii("text").alias("m")).collect()}
        assert "<EMAIL>" in got[1] and "jane.doe" not in got[1]
        assert "<IPV4>" in got[2] and "192.168.1.254" not in got[2]
        assert "<CARD>" in got[3] and "4111" not in got[3]
        assert got[4] == ROWS[3][1]  # untouched

    def test_arrow_variant_matches_jvm(self, pii_df):
        jvm = {r.id: r.text for r in pii_df.select("id", mask_pii("text").alias("text")).collect()}
        arrow = {r.id: r.text for r in mask_pii_arrow(pii_df).collect()}
        assert jvm == arrow

    def test_duckdb_re2_agreement(self):
        # the SAME pattern strings run in DuckDB's RE2 — e-mail/ipv4
        # matches must agree with the java-regex result on the fixture
        con = duckdb.connect()
        for _id, text in ROWS:
            for kind in ("email", "ipv4"):
                n = con.execute(
                    "SELECT len(regexp_extract_all(?, ?))", [text, PII_PATTERNS[kind]]
                ).fetchone()[0]
                if kind == "email":
                    assert n == (1 if _id == 1 else 0)
                if kind == "ipv4" and _id == 2:
                    assert n == 1


class TestUrls:
    def test_extract_and_domain(self, pii_df):
        out = {r.id: r for r in with_url_stats(pii_df).collect()}
        assert out[5].n_urls == 2
        assert out[5].main_domain == "example.com"  # lowercased, www-stripped
        assert out[4].n_urls == 0 and out[4].main_domain is None

    def test_domain_of_plain_url(self, spark):
        df = spark.createDataFrame([("https://WWW.Foo.BAR/x",)], ["u"])
        assert df.select(url_domain("u").alias("d")).collect()[0].d == "foo.bar"


class TestCapPerDomain:
    def _docs(self, spark):
        rows = [(i, f"d{i % 3}.com") for i in range(30)]
        return spark.createDataFrame(rows, ["doc_id", "domain"])

    def test_cap_and_determinism(self, spark):
        df = self._docs(spark)
        a = sorted(r.doc_id for r in cap_per_domain(df, "domain", "doc_id", 4).collect())
        b = sorted(
            r.doc_id
            for r in cap_per_domain(df.repartition(7), "domain", "doc_id", 4).collect()
        )
        assert a == b and len(a) == 12  # 3 domains x 4
        per = (
            cap_per_domain(df, "domain", "doc_id", 4)
            .groupBy("domain").count().collect()
        )
        assert all(r["count"] == 4 for r in per)

    def test_salt_changes_selection(self, spark):
        df = self._docs(spark)
        a = sorted(r.doc_id for r in cap_per_domain(df, "domain", "doc_id", 4).collect())
        c = sorted(r.doc_id for r in cap_per_domain(df, "domain", "doc_id", 4, salt="s2").collect())
        assert a != c

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            cap_per_domain(self._docs(spark), "domain", "doc_id", 0)
