"""PII scrub: detection counts, redaction order, Spark/DuckDB regex parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lanterndb_spark.functions.pii import (
    duck_pii_fragments,
    pii_count,
    pii_redact,
    scrub,
)

SAMPLES = [
    (1, "mail me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567"),
    (2, "server 192.168.0.1 and 10.0.0.255 are up"),
    (3, "card 4111 1111 1111 1111 exp 12/26, ssn 123-45-6789"),
    (4, "no pii here, just words and the number 42"),
    (5, "two mails: a@b.io c@d.org; ip 8.8.8.8"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id int, text string")
    return {r["doc_id"]: r for r in scrub(df).collect()}


def test_counts(scrubbed):
    assert scrubbed[1]["n_email"] == 1 and scrubbed[1]["n_phone"] >= 1
    assert scrubbed[2]["n_ipv4"] == 2
    assert scrubbed[3]["n_card"] == 1 and scrubbed[3]["n_ssn"] == 1
    assert not scrubbed[4]["has_pii"]
    assert scrubbed[5]["n_email"] == 2 and scrubbed[5]["n_ipv4"] == 1


def test_redaction_replaces_all(scrubbed):
    clean = scrubbed[1]["text_clean"]
    assert "<EMAIL>" in clean and "@" not in clean
    assert scrubbed[2]["text_clean"].count("<IP>") == 2
    c3 = scrubbed[3]["text_clean"]
    assert "<CARD>" in c3 and "<SSN>" in c3 and "4111" not in c3
    assert scrubbed[4]["text_clean"] == SAMPLES[3][1]


def test_card_redacted_before_phone_sees_it(spark):
    df = spark.createDataFrame([(1, "pay 4111-1111-1111-1111 now")], "doc_id int, text string")
    clean = df.select(pii_redact("text").alias("c")).collect()[0]["c"]
    assert clean == "pay <CARD> now"  # not chewed by the phone pattern


def test_duckdb_parity_on_counts_and_redaction(spark):
    """The oracle fragments must reproduce Spark's output byte-for-byte."""
    df = spark.createDataFrame(SAMPLES, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in scrub(df).select("doc_id", "n_email", "n_phone", "n_ipv4",
                                  "n_card", "n_ssn", "text_clean").collect()
    }
    frags = duck_pii_fragments("text")
    sel = ", ".join(f"{frags[f'n_{k}']} AS n_{k}" for k in ("email", "phone", "ipv4", "card", "ssn"))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", SAMPLES)
    rows = con.execute(
        f"SELECT doc_id, {sel}, {frags['redacted']} AS text_clean FROM t"
    ).fetchall()
    for doc_id, n_email, n_phone, n_ipv4, n_card, n_ssn, clean in rows:
        g = got[doc_id]
        assert (n_email, n_phone, n_ipv4, n_card, n_ssn) == (
            g["n_email"], g["n_phone"], g["n_ipv4"], g["n_card"], g["n_ssn"]
        ), doc_id
        assert clean == g["text_clean"], doc_id


def test_scrub_is_pure_projection(spark, tables):
    plan = scrub(tables["documents"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: rides the scan
