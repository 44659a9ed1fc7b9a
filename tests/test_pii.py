"""PII detection/redaction (operators/text.py). The driver corpus is
PII-free, so the nonzero semantics are pinned here — including a direct
DuckDB replay on crafted rows proving the Java∩RE2 pattern subset counts
identically where matches actually exist."""

import duckdb
import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.text import pii_counts, redact_pii

ROWS = [
    (0, "contact alice@example.com or bob.smith+tag@sub.domain.org today"),
    (1, "server at 10.0.0.1 fell back to 192.168.254.254 overnight"),
    (2, "call +1 555 123 4567 or 020-7946-0958 now"),
    (3, "no sensitive content here at all"),
    (4, "mixed: eve@corp.io from 172.16.0.9 dialed 415 867 5309 x2"),
]


@pytest.fixture(scope="module")
def scanned(spark):
    df = spark.createDataFrame(ROWS, "doc_id: long, text: string")
    out = df.select("doc_id", *pii_counts(F.col("text")),
                    redact_pii(F.col("text")).alias("red")).collect()
    return {r.doc_id: r for r in out}


def test_email_detection_and_redaction(scanned):
    r = scanned[0]
    assert r.n_email == 2 and r.n_ipv4 == 0
    assert r.red.count("<EMAIL>") == 2 and "alice" not in r.red


def test_ipv4_detection(scanned):
    r = scanned[1]
    assert r.n_ipv4 == 2 and "<IPV4>" in r.red and "10.0.0.1" not in r.red


def test_phone_detection(scanned):
    r = scanned[2]
    assert r.n_phone == 2 and r.red.count("<PHONE>") == 2


def test_clean_text_untouched(scanned):
    r = scanned[3]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)
    assert r.red == ROWS[3][1]


def test_email_digits_not_rematched_as_phone(scanned):
    r = scanned[4]
    assert r.n_email == 1 and r.n_ipv4 == 1 and r.n_phone == 1
    for kind in ("<EMAIL>", "<IPV4>", "<PHONE>"):
        assert kind in r.red


def test_duckdb_counts_match_on_nonzero_rows(scanned):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    got = con.execute(r"""
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')),
               len(regexp_extract_all(text,
                   '\b(\d{1,3}\.){3}\d{1,3}\b')),
               len(regexp_extract_all(text, '\+?\d[\d -]{7,}\d'))
        FROM t ORDER BY doc_id""").fetchall()
    for doc_id, n_email, n_ipv4, n_phone in got:
        r = scanned[doc_id]
        assert (r.n_email, r.n_ipv4, r.n_phone) == (n_email, n_ipv4, n_phone)
