"""Draft-7 ``format`` keyword as an OPT-IN assertion (annotation by
default).

The reference planned but never implemented ``format``
(JsonSchema/Format.lean is 0 LoC; /root/reference/README.md:68 lists it
as future work), so there are no reference verdicts to match — draft-7
§7.2 semantics apply: format is an annotation unless the implementation
opts into assertion. Every engine path keeps format OFF by default
(reference parity, pinned by fixtures/suite_official/draft7/format.json);
``CompiledValidator(assert_formats=True)`` / ``ColumnarCompiler(...)`` /
``VariantCompiler(...)`` turn it into an assertion.

Each format is defined ONCE as a dialect-portable regex evaluated by
Python ``re`` (interpreter path) and Java ``rlike`` (columnar/variant
paths) — run through the same regex_dialect transpiler as the ``pattern``
keyword, so cross-path verdicts agree by construction — plus, for
date-bearing formats, a calendar check (Python ``datetime.date`` and
Spark ``try_to_date`` agree on month lengths and leap years for years
0001-9999; year 0000 is out of scope). Spec behaviors: non-string
instances always pass, and UNKNOWN format names always pass.

``format: "regex"`` (ECMA-262 validity) and the IDNA formats
(``idn-hostname``/``idn-email`` — punycode + nameprep via the stdlib IDNA
2003 codec) are interpreter-only: no native Spark expression can test
regex compilability or run ToASCII, so
:func:`format_predicate` returns None for them and the columnar/variant
compilers raise CompileFallback when asked to assert them. The
validate_json_column chain then routes those schemas to its Arrow
interpreter stage; the all-columnar spans chain (validate_spans_best)
has no interpreter stage and raises a CompileFallback naming the route.

Notes on the chosen (documented) operating points:
- ``time``/``date-time`` accept a leap second (``:60``) at any minute —
  RFC 3339 permits leap seconds and checking "23:59:60 UTC only" needs
  offset arithmetic that buys nothing at this fidelity level.
- ``email`` is the pragmatic dot-atom form (no quoted local parts, no
  address literals); ``hostname`` enforces label shape plus the 253-char
  bound; ``uri`` requires an absolute URI (scheme present, no spaces,
  no backslashes).
"""

from __future__ import annotations

import re
from datetime import date
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4 = rf"{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}"
_H16 = r"[0-9A-Fa-f]{1,4}"
# the exact RFC 3986 `IPv6address` grammar (equivalent to RFC 4291 §2.2
# text forms): nine alternatives over ls32 = (h16 ":" h16) / IPv4address.
# Embedded IPv4 is therefore legal BOTH uncompressed ("1:2:3:4:5:6:1.2.3.4")
# and after any "::" compression ("::ffff:1.2.3.4") — the previous ad-hoc
# list missed the uncompressed and most compressed-with-IPv4 shapes
# (ADVICE r4). Pure alternation + bounded repetition: transpiles 1:1 to
# the Java dialect.
_LS32 = rf"({_H16}:{_H16}|{_IPV4})"
_IPV6 = (
    rf"(({_H16}:){{6}}{_LS32}"
    rf"|::({_H16}:){{5}}{_LS32}"
    rf"|({_H16})?::({_H16}:){{4}}{_LS32}"
    rf"|(({_H16}:){{0,1}}{_H16})?::({_H16}:){{3}}{_LS32}"
    rf"|(({_H16}:){{0,2}}{_H16})?::({_H16}:){{2}}{_LS32}"
    rf"|(({_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}"
    rf"|(({_H16}:){{0,4}}{_H16})?::{_LS32}"
    rf"|(({_H16}:){{0,5}}{_H16})?::{_H16}"
    rf"|(({_H16}:){{0,6}}{_H16})?::)"
)
_DATE = r"[0-9]{4}-[0-9]{2}-[0-9]{2}"
_TIME = (r"([01][0-9]|2[0-3]):[0-5][0-9]:([0-5][0-9]|60)"
         r"(\.[0-9]+)?([Zz]|[+-]([01][0-9]|2[0-3]):[0-5][0-9])")
_LABEL = r"[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"

#: format name -> anchored, dialect-portable regex (shape check)
#: anchored \A...\Z (absolute end — a ^...$ anchor would accept a
#: trailing newline in BOTH dialects, re.search's $-before-final-\n and
#: Java rlike's identical rule, so the cross-path parity tests could
#: never catch it; the transpiler maps Python \Z to Java \z exactly)
FORMAT_REGEX: dict[str, str] = {
    "date": rf"\A{_DATE}\Z",
    "time": rf"\A{_TIME}\Z",
    "date-time": rf"\A{_DATE}[Tt]{_TIME}\Z",
    "ipv4": rf"\A{_IPV4}\Z",
    "ipv6": rf"\A{_IPV6}\Z",
    "email": (r"\A[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@"
              rf"{_LABEL}(\.{_LABEL})*\Z"),
    "hostname": rf"\A(?=.{{1,253}}\Z){_LABEL}(\.{_LABEL})*\Z",
    "uri": "\\A[A-Za-z][A-Za-z0-9+.\\-]*:[^ \\t\\n\\r\\\\]*\\Z",
    # a URI reference may be relative — almost any string qualifies; the
    # practical rejections are whitespace, backslashes and angle brackets
    "uri-reference": "\\A[^ \\t\\n\\r\\\\<>]*\\Z",
    # RFC 3987: an IRI is a URI whose charset widens to ucschar — since the
    # uri/uri-reference operating points above already admit any non-ASCII
    # codepoint in the tail (documented pragmatic shape, not an RFC 3986
    # ABNF transcription), the IRI forms share the same regexes: scheme
    # required for "iri", everything-but-whitespace/backslash/angle for
    # "iri-reference". Both are plain char-class regexes -> JVM-portable,
    # all three engine paths assert them natively.
    "iri": "\\A[A-Za-z][A-Za-z0-9+.\\-]*:[^ \\t\\n\\r\\\\<>]*\\Z",
    "iri-reference": "\\A[^ \\t\\n\\r\\\\<>]*\\Z",
    "json-pointer": r"\A(/([^/~]|~[01])*)*\Z",
    # RFC: non-negative integer (no leading zeros) then '#' or a pointer
    "relative-json-pointer": r"\A(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)\Z",
}

#: formats whose regex shape needs an extra calendar check on chars 1-10
_DATE_BEARING = ("date", "date-time")


def _calendar_ok(s: str) -> bool:
    try:
        y, m, d = int(s[0:4]), int(s[5:7]), int(s[8:10])
        date(y, m, d)
        return True
    except ValueError:
        return False


def _regex_checker(pattern: str, calendar: bool) -> Callable[[str], bool]:
    rx = re.compile(pattern)

    def check(v: str) -> bool:
        if rx.search(v) is None:
            return False
        return _calendar_ok(v) if calendar else True
    return check


def _ecma_regex_ok(v: str) -> bool:
    try:
        re.compile(v)
        return True
    except re.error:
        return False


_LABEL_RX = re.compile(rf"\A{_LABEL}\Z")


def _idn_hostname_ok(v: str) -> bool:
    """Internationalized hostname via the stdlib IDNA 2003 codec: each
    label nameprep-normalizes and punycode-encodes (ToASCII, which also
    enforces the 63-octet label bound), then the ASCII form must satisfy
    the same LDH label shape as ``hostname`` (STD3: alnum + inner hyphens
    — rejects leading/trailing '-', '_', spaces) and the whole name the
    253-octet bound. Operating point: IDNA 2003 (stdlib), not UTS-46/IDNA
    2008 — contextual-rule rejections (e.g. Hangul tone marks U+302E) are
    out of scope and documented as such."""
    if not v:
        return False
    import encodings.idna as idna
    ascii_labels = []
    for label in v.split("."):
        if not label:
            return False
        try:
            a = idna.ToASCII(label).decode("ascii")
        except (UnicodeError, ValueError):
            return False
        if _LABEL_RX.search(a) is None:
            return False
        ascii_labels.append(a)
    return len(".".join(ascii_labels)) <= 253


_IDN_LOCAL_RX = re.compile(
    r"\A([A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]|[^\x00-\x7F])+\Z")


def _idn_email_ok(v: str) -> bool:
    """Internationalized email (RFC 6531 shape at the same fidelity as the
    ``email`` operating point): dot-atom-ish local part whose charset
    widens to any non-ASCII codepoint, '@', then an ``idn-hostname``
    domain. No quoted local parts or address literals (same documented
    gaps as ``email``)."""
    local, sep, domain = v.rpartition("@")
    if not sep or not local or not domain:
        return False
    return (_IDN_LOCAL_RX.search(local) is not None
            and _idn_hostname_ok(domain))


#: format name -> str -> bool (Python side; interpreter path)
FORMAT_CHECKERS: dict[str, Callable[[str], bool]] = {
    name: _regex_checker(rx, calendar=name in _DATE_BEARING)
    for name, rx in FORMAT_REGEX.items()
}
FORMAT_CHECKERS["regex"] = _ecma_regex_ok
FORMAT_CHECKERS["idn-hostname"] = _idn_hostname_ok
FORMAT_CHECKERS["idn-email"] = _idn_email_ok

#: formats no native Spark expression can assert (regex compilability /
#: punycode+nameprep) — format_predicate returns None and the columnar /
#: variant compilers raise CompileFallback, routing those schemas to the
#: Arrow interpreter stage of validate_json_column
INTERPRETER_ONLY_FORMATS = frozenset({"regex", "idn-hostname", "idn-email"})


def check_format(name: str, value) -> bool:
    """Python-side assertion: True when ``value`` satisfies ``name``.
    Non-strings and unknown format names always pass (draft-7 §7.2)."""
    if not isinstance(value, str):
        return True
    checker = FORMAT_CHECKERS.get(name)
    return True if checker is None else checker(value)


def format_predicate(name: str, col: Column) -> Optional[Column]:
    """Spark-side assertion over a STRING column (caller guards the type):
    a boolean Column, or None when the format cannot be asserted natively
    (INTERPRETER_ONLY_FORMATS: regex compilability / IDNA punycode have no
    Spark expression — callers raise CompileFallback so the interpreter
    path takes over). Unknown formats return a literal True (annotation)."""
    if name in INTERPRETER_ONLY_FORMATS:
        return None
    pattern = FORMAT_REGEX.get(name)
    if pattern is None:
        return F.lit(True)
    from .regex_dialect import to_java_regex
    jpat = to_java_regex(pattern)
    if jpat is None:  # all FORMAT_REGEX entries transpile (pytest-pinned)
        return None
    pred = col.rlike(jpat)
    if name in _DATE_BEARING:
        # format must be a plain str: classic pyspark's try_to_date tries
        # to ITERATE a Column format arg (py4j list conversion) and dies
        pred = pred & F.try_to_date(F.substring(col, 1, 10),
                                    "yyyy-MM-dd").isNotNull()
    return pred
