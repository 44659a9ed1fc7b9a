"""RFC 6901 pointer goldens (ports of JsonSchemaTesting/SchemaPointer.lean:12-80)."""

from json_schema_lean_spark.pointer import (
    escape_token,
    navigate_json,
    parse_pointer,
    pointer_to_string,
    unescape_token,
)


def test_escape_order_sensitive():
    assert escape_token("a/b") == "a~1b"
    assert escape_token("a~b") == "a~0b"
    assert escape_token("a~/b") == "a~0~1b"
    assert escape_token("~1") == "~01"


def test_unescape_reverse_order():
    assert unescape_token("a~1b") == "a/b"
    assert unescape_token("a~0b") == "a~b"
    assert unescape_token("~01") == "~1"
    assert unescape_token("~10") == "/0"


def test_roundtrip():
    for tok in ["", "a", "a/b", "a~b", "~/", "~0", "~1", "a~0~1b"]:
        assert unescape_token(escape_token(tok)) == tok


def test_parse():
    assert parse_pointer("") == []
    assert parse_pointer("/") == [""]
    assert parse_pointer("/a/b") == ["a", "b"]
    assert parse_pointer("/a~1b/c~0d") == ["a/b", "c~d"]
    assert parse_pointer("a/b") is None  # must start with /


def test_to_string_roundtrip():
    for toks in [[], ["a"], ["a/b", "c~d"], ["", ""]]:
        assert parse_pointer(pointer_to_string(toks)) == toks


def test_navigate():
    doc = {"a": [{"b": 1}, {"c": 2}], "": {"x": 9}, "k/l": 3}
    assert navigate_json(doc, ["a", "0", "b"]) == (True, 1)
    assert navigate_json(doc, ["a", "1", "c"]) == (True, 2)
    assert navigate_json(doc, ["", "x"]) == (True, 9)
    assert navigate_json(doc, ["k/l"]) == (True, 3)
    assert navigate_json(doc, ["a", "2"])[0] is False
    assert navigate_json(doc, ["a", "01"])[0] is False  # non-canonical index
    assert navigate_json(doc, ["missing"])[0] is False
