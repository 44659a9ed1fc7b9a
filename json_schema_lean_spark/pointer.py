"""RFC 6901 JSON Pointer codec + navigation.

Semantic parity target: /root/reference/JsonSchema/PointerFragment.lean:34-90
(escape ``~0``/``~1`` order-sensitive codec; pointer parse; JSON navigation).
Driver-side pure Python — also used to format the ``json_pointer`` field of
violation rows.
"""

from __future__ import annotations

from typing import Any


def escape_token(token: str) -> str:
    """``~`` -> ``~0`` then ``/`` -> ``~1`` (order matters)."""
    return token.replace("~", "~0").replace("/", "~1")


def unescape_token(token: str) -> str:
    """``~1`` -> ``/`` then ``~0`` -> ``~`` (reverse order of escape)."""
    return token.replace("~1", "/").replace("~0", "~")


def parse_pointer(pointer: str) -> list[str] | None:
    """Parse an RFC 6901 pointer string into reference tokens.

    "" -> [] (whole document). A non-empty pointer must start with "/".
    Returns None on malformed input (parity with the reference's Option
    result).
    """
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        return None
    return [unescape_token(tok) for tok in pointer[1:].split("/")]


def parse_uri_fragment_pointer(fragment: str) -> list[str] | None:
    """Parse a pointer arriving as a URI FRAGMENT (RFC 6901 §6): tokens are
    percent-encoded on top of the ~-escaping, so decode per token AFTER
    splitting on '/' (decoding first would mis-split a %2F) and before
    ~-unescaping ('#/definitions/foo%22bar' -> ['definitions', 'foo"bar'];
    '%25' -> '%'). Caught by the official-suite escaped-pointer cases."""
    from urllib.parse import unquote
    if fragment == "":
        return []
    if not fragment.startswith("/"):
        return None
    return [unescape_token(unquote(tok)) for tok in fragment[1:].split("/")]


def pointer_to_string(tokens: list[str]) -> str:
    if not tokens:
        return ""
    return "/" + "/".join(escape_token(t) for t in tokens)


def navigate_json(value: Any, tokens: list[str]) -> tuple[bool, Any]:
    """Walk a parsed pointer through a plain-Python JSON value.

    Returns (found, subvalue). Array indices must be canonical decimals
    (no leading '+', no leading zeros except '0' itself).
    """
    cur = value
    for tok in tokens:
        if isinstance(cur, dict):
            if tok not in cur:
                return False, None
            cur = cur[tok]
        elif isinstance(cur, list):
            if not _is_canonical_index(tok):
                return False, None
            idx = int(tok)
            if idx >= len(cur):
                return False, None
            cur = cur[idx]
        else:
            return False, None
    return True, cur


def _is_canonical_index(tok: str) -> bool:
    if not tok.isdigit():
        return False
    if len(tok) > 1 and tok[0] == "0":
        return False
    return True
