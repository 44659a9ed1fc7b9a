"""Cross-dialect differential fuzz for the format regexes: the Python
checker (re over FORMAT_REGEX) and the Spark predicate (rlike over the
transpiled form + try_to_date calendar check) must agree on EVERY string,
including newline/tab/unicode adversaries — the r4 review found a class
of inputs (trailing newline) where both dialects agreed on the WRONG
verdict, so this test also pins a curated set of known-tricky inputs
against expected verdicts, not just path agreement.
"""

import random
import string

from pyspark.sql import functions as F

from json_schema_lean_spark.formats import FORMAT_REGEX, check_format

SEED_INPUTS = [
    "", " ", "\n", "a\n", "\na",
    "127.0.0.1", "127.0.0.1\n", "127.0.0.1 ", " 127.0.0.1",
    "1963-06-19", "1963-06-19\n", "1963-06-19T08:30:06Z\n",
    "joe@example.com", "joe@example.com\n", "a@b\nc.com",
    "http://x/y", "http://x/\ny", "urn:a\tb",
    "::1\n", "1/foo\n", "0#", "#frag", "a" * 300,
    "\U0001d11e", "café.example.com", "née@example.com",
]


def _random_strings(n, rng):
    alphabet = (string.ascii_letters + string.digits +
                ".:-/@#~%+\\<> \t\n\réÿ")
    out = []
    for _ in range(n):
        k = rng.randrange(0, 24)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


def test_python_and_spark_format_verdicts_agree(spark):
    rng = random.Random(20260817)
    inputs = SEED_INPUTS + _random_strings(400, rng)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(inputs)],
                               "i int, s string")
    from json_schema_lean_spark.formats import format_predicate
    cols = [F.coalesce(format_predicate(name, F.col("s")), F.lit(True))
             .alias(f"f{j}")
            for j, name in enumerate(FORMAT_REGEX)]
    rows = {r["i"]: r for r in df.select("i", *cols).collect()}
    mismatches = []
    for i, s in enumerate(inputs):
        for j, name in enumerate(FORMAT_REGEX):
            py = check_format(name, s)
            jv = rows[i][f"f{j}"]
            if py != jv:
                mismatches.append((name, repr(s), py, jv))
    assert not mismatches, mismatches[:15]


def test_known_tricky_inputs_rejected():
    expect_false = [
        ("ipv4", "127.0.0.1\n"), ("ipv4", " 127.0.0.1"),
        ("date", "1963-06-19\n"), ("date-time", "1963-06-19T08:30:06Z\n"),
        ("email", "joe@example.com\n"), ("email", "a@b\nc.com"),
        ("uri", "http://x/\ny"), ("uri", "urn:a\tb"),
        ("ipv6", "::1\n"),
        ("uri-reference", "a b"), ("uri-reference", "a\nb"),
        ("hostname", "a.example.com\n"),
    ]
    for name, s in expect_false:
        assert check_format(name, s) is False, (name, repr(s))
    # and the plain forms still pass
    for name, s in [("ipv4", "127.0.0.1"), ("date", "1963-06-19"),
                    ("email", "joe@example.com"), ("uri", "http://x/y"),
                    ("ipv6", "::1"), ("relative-json-pointer", "1/foo")]:
        assert check_format(name, s) is True, (name, s)
    # RFC 6901 allows control characters INSIDE pointer tokens (unescaped =
    # %x00-2E / %x30-7D / %x7F-10FFFF) — a '\n' in a token is a legal
    # pointer, unlike in every other format above
    assert check_format("json-pointer", "/a\n") is True
    assert check_format("relative-json-pointer", "1/foo\n") is True
