"""Gopher/MassiveText-style repetition + shape signals (operators/text.py).

Crafted inputs pin the edge semantics the synthetic corpus doesn't hit:
fully-repetitive text, multiline duplicates, blank strings, single-token
docs (the <n-gram fallback)."""

import pytest
from pyspark.sql import functions as F

from json_schema_lean_spark.operators.text import (
    mean_word_length,
    ngram_repetition_ratio,
    repeated_line_fraction,
    symbol_word_ratio,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (0, "spam spam spam spam spam"),       # one distinct bigram of 4
        (1, "all words here are unique"),      # no repetition
        (2, "a\nb\na\na"),                     # 4 lines, 2 distinct 'a' dups
        (3, ""),                               # blank
        (4, "single"),                         # < n tokens
        (5, "$$ %% @@ !!"),                    # symbols only
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = df.select(
        "doc_id",
        F.round(ngram_repetition_ratio(F.col("text"), 2), 6).alias("rep"),
        F.round(mean_word_length(F.col("text")), 6).alias("mwl"),
        F.round(symbol_word_ratio(F.col("text")), 6).alias("swr"),
        F.round(repeated_line_fraction(F.col("text")), 6).alias("rlf"),
    ).collect()
    return {r.doc_id: r for r in out}


def test_fully_repetitive_text_scores_high(scored):
    assert scored[0].rep == 0.75          # 4 bigrams, 1 distinct


def test_unique_text_scores_zero(scored):
    assert scored[1].rep == 0.0


def test_repeated_lines_fraction(scored):
    assert scored[2].rlf == 0.5           # 4 lines, 2 distinct


def test_blank_text_is_all_zero(scored):
    r = scored[3]
    assert (r.rep, r.mwl, r.swr, r.rlf) == (0.0, 0.0, 0.0, 0.0)


def test_single_token_has_no_bigrams(scored):
    assert scored[4].rep == 0.0
    assert scored[4].mwl == 6.0           # 'single' is 6 chars / 1 token


def test_symbol_ratio_counts_per_token(scored):
    assert scored[5].swr == 2.0           # 8 symbols / 4 tokens
    assert scored[5].mwl == 2.0


def test_mean_word_length_natural(scored):
    # 'all words here are unique' = 21 non-space chars / 5 tokens
    assert scored[1].mwl == 4.2


def test_char_entropy_cases(spark):
    from json_schema_lean_spark.operators.text import char_entropy
    rows = [(0, "aaaaaaaa"), (1, "abcd"), (2, ""), (3, "hello world")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.h for r in df.select(
        "doc_id", F.round(char_entropy(F.col("text")), 6).alias("h")).collect()}
    assert got[0] == 0.0            # degenerate repetition
    assert got[1] == 2.0            # 4 distinct chars, uniform
    assert got[2] == 0.0            # blank
    assert got[3] == 2.845351       # natural-ish text
