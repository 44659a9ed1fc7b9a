"""URI-keyed schema registry, $id registration, pointer navigation, cycle DFS.

Semantic parity target: /root/reference/JsonSchema/Resolving.lean (Resolver
registry :75-79, registerPaths full-tree fold :124-173, resolvePath :179-193,
getSchemaAndURI?/navigateWithURI? :198-199 + SchemaPointer.lean:20-117, cycle
detection ResolverGraph :206-312).

All driver-side pure Python; the compiled outcome (inlined refs / rejection)
is what ships to executors, never per-row resolution.
"""

from __future__ import annotations

from typing import Any, Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

from .pointer import navigate_json, parse_pointer, pointer_to_string
from .schema_ast import Schema, SchemaObject, parse_schema

#: URI the 1-schema convenience path registers the root under
DEFAULT_URI = ""

# schema-valued keywords: navigating INTO them lands on a schema node
_SCHEMA_KEYWORDS = {
    "not", "if", "then", "else", "additionalProperties", "additionalItems",
    "contains", "propertyNames",
}
# keyword -> container of named schemas (next token lands on a schema)
_MAP_CONTAINERS = {"definitions", "$defs", "properties", "patternProperties", "dependencies"}
# keyword -> container of positional schemas
_LIST_CONTAINERS = {"allOf", "anyOf", "oneOf", "prefixItems"}


def resolve_uri(base: str, ref: str) -> str:
    """RFC 3986 reference resolution (parity: ``resolveURIorRef``).

    Works for ANY scheme: stdlib ``urljoin`` refuses relative resolution
    against schemes outside its whitelist (``urn:``, ``mem:``, ...), so for
    unknown schemes we join under a stand-in scheme and swap back.
    """
    if not base:
        return normalize_uri(ref)
    if ref.startswith("#"):
        # fragment-only reference: replace base's fragment (keeps opaque
        # scheme paths like urn: intact)
        return normalize_uri(split_fragment(base)[0] + ref)
    if urlsplit(ref).scheme:
        return normalize_uri(ref)
    bs = urlsplit(base)
    if bs.scheme and bs.scheme not in ("http", "https", "file", "ftp"):
        fake = urlunsplit(("http", bs.netloc, bs.path, bs.query, bs.fragment))
        js = urlsplit(urljoin(fake, ref))
        return normalize_uri(urlunsplit((bs.scheme, js.netloc, js.path, js.query, js.fragment)))
    return normalize_uri(urljoin(base, ref))


def normalize_uri(uri: str) -> str:
    s = urlsplit(uri)
    # drop empty fragments so "x#" == "x"
    frag = s.fragment
    out = urlunsplit((s.scheme, s.netloc, s.path, s.query, frag))
    if out.endswith("#") and not frag:
        out = out[:-1]
    return out


def split_fragment(uri: str) -> tuple[str, str]:
    s = urlsplit(uri)
    return urlunsplit((s.scheme, s.netloc, s.path, s.query, "")), s.fragment


class Resolver:
    """Two maps: root schemas by URI + registered (nested $id) -> (root, path)."""

    def __init__(self) -> None:
        self.root_schemas: dict[str, Any] = {}  # uri -> raw schema JSON
        self.registered_paths: dict[str, tuple[str, list[str]]] = {}

    # -- registration (parity: Resolver.addSchema / registerPaths) -----------

    def add_schema(self, raw_schema: Any, uri: str = DEFAULT_URI) -> "Resolver":
        uri = normalize_uri(uri)
        self.root_schemas[uri] = raw_schema
        self._register_paths(raw_schema, root_uri=uri, base_uri=uri, path=[])
        return self

    def _register_paths(self, node: Any, root_uri: str, base_uri: str, path: list[str]) -> None:
        """Fold over the whole schema tree recording every nested $id."""
        if not isinstance(node, dict):
            return
        node_id = node.get("$id")
        if isinstance(node_id, str):
            base_uri = resolve_uri(base_uri, node_id)
            self.registered_paths[base_uri] = (root_uri, list(path))
        # 2020-12 alias (extension): $anchor: "name" == draft-7 $id: "#name"
        anchor = node.get("$anchor")
        if isinstance(anchor, str) and anchor:
            self.registered_paths[resolve_uri(base_uri, "#" + anchor)] = \
                (root_uri, list(path))
        for kw, child in node.items():
            if kw in _SCHEMA_KEYWORDS:
                self._register_paths(child, root_uri, base_uri, path + [kw])
            elif kw in _MAP_CONTAINERS and isinstance(child, dict):
                for k, sub in child.items():
                    self._register_paths(sub, root_uri, base_uri, path + [kw, k])
            elif kw in _LIST_CONTAINERS and isinstance(child, list):
                for i, sub in enumerate(child):
                    self._register_paths(sub, root_uri, base_uri, path + [kw, str(i)])
            elif kw == "items":
                if isinstance(child, list):
                    for i, sub in enumerate(child):
                        self._register_paths(sub, root_uri, base_uri, path + [kw, str(i)])
                else:
                    self._register_paths(child, root_uri, base_uri, path + [kw])

    # -- lookup (parity: resolvePath) ----------------------------------------

    def resolve_path(self, uri: str) -> tuple[str, list[str]]:
        """Normalize; prefer registered $id paths; else split fragment as pointer."""
        uri = normalize_uri(uri)
        if uri in self.registered_paths:
            return self.registered_paths[uri]
        base, frag = split_fragment(uri)
        if frag:
            from .pointer import parse_uri_fragment_pointer
            tokens = parse_uri_fragment_pointer(frag) \
                if frag.startswith("/") else None
            if tokens is None:
                # plain-name anchor that was never registered via $id:
                # produce a path that cannot navigate, so lookup fails
                # (parity: reference reports "Could not find ...").
                tokens = ["$unresolved-anchor$", frag]
            if base in self.registered_paths:
                root, prefix = self.registered_paths[base]
                return root, prefix + tokens
            return base, tokens
        return base, []

    # -- navigation (parity: getSchemaAndURI? / navigateWithURI?) ------------

    def get_schema_and_uri(self, root_uri: str, path: list[str]) -> Optional[tuple[Schema, str]]:
        raw_root = self.root_schemas.get(normalize_uri(root_uri))
        if raw_root is None:
            return None
        found, raw_sub, new_uri = navigate_schema(raw_root, path, normalize_uri(root_uri))
        if not found:
            return None
        try:
            return parse_schema(raw_sub), new_uri
        except Exception:
            return None


def navigate_schema(raw_root: Any, tokens: list[str], base_uri: str) -> tuple[bool, Any, str]:
    """Walk a pointer through raw schema JSON, rebasing the URI at every
    schema-position node carrying a string ``$id``.

    Schema-position tracking mirrors the reference's keyword-shaped navigation
    (SchemaPointer.lean:20-117): $id inside e.g. a ``properties`` *container*
    level is a property name, not an identifier, and must not rebase.
    """
    cur = raw_root
    uri = base_uri
    at_schema = True
    pending_container: Optional[str] = None  # map/list container we just entered
    i = 0
    while True:
        if i >= len(tokens):
            # the landed node's OWN $id is deliberately NOT folded here:
            # consumers ($ref landing in the interpreter/compiler) re-enter
            # the node and apply its $id exactly once, the same way normal
            # keyword descent does — folding it here too double-applies
            # relative folder ids ("baseUriChangeFolder/" twice; caught by
            # the reconstructed refRemote suite, base-URI-change-folder case)
            return True, cur, uri
        if at_schema and isinstance(cur, dict):
            nid = cur.get("$id")
            if isinstance(nid, str):
                uri = resolve_uri(uri, nid)
        tok = tokens[i]
        i += 1
        found, nxt = navigate_json(cur, [tok])
        if not found:
            return False, None, uri
        if pending_container is not None:
            at_schema = True
            pending_container = None
            # dependencies/k may be an array of property names (not a schema);
            # navigate_json already handled the value — rebasing skips non-dicts.
        elif at_schema:
            if tok in _SCHEMA_KEYWORDS:
                at_schema = True
            elif tok in _MAP_CONTAINERS or tok in _LIST_CONTAINERS:
                at_schema = False
                pending_container = tok
            elif tok == "items":
                if isinstance(nxt, list):
                    at_schema = False
                    pending_container = tok
                else:
                    at_schema = True
            else:
                at_schema = False
        cur = nxt
    # unreachable


# --------------------------------------------------------------------------
# Cycle detection (parity: ResolverGraph.fromResolver + dfs,
# Resolving.lean:206-312). "Evil" refs are $refs reachable through keywords
# evaluated unconditionally on the same instance (allOf/anyOf/oneOf/not/
# if/then/else) — refs under properties/items only recurse with data depth.
# --------------------------------------------------------------------------

class SchemaCycleError(ValueError):
    def __init__(self, cycle: list[str]):
        super().__init__(f"schema reference cycle: {' -> '.join(cycle)}")
        self.cycle = cycle


def _evil_refs(schema: Schema) -> list[str]:
    """$ref strings reachable from this node via evil combinators only."""
    out: list[str] = []

    def walk(s: Schema) -> None:
        if isinstance(s, bool) or s is None:
            return
        assert isinstance(s, SchemaObject)
        if s.ref is not None:
            out.append(s.ref)
            return  # $ref overrides siblings (Draft 7)
        for group in (s.all_of, s.any_of, s.one_of):
            if group:
                for sub in group:
                    walk(sub)
        for sub in (s.not_, s.if_, s.then_, s.else_):
            if sub is not None:
                walk(sub)

    walk(schema)
    return out


def find_ref_cycle(resolver: Resolver) -> Optional[list[str]]:
    """3-color DFS over the evil-ref graph; returns the cycle path or None."""
    WHITE, GRAY, BLACK = 0, 1, 2

    def node_key(root: str, path: list[str]) -> str:
        return f"{root}#{pointer_to_string(path)}"

    color: dict[str, int] = {}
    parent: dict[str, Optional[str]] = {}

    def neighbors(root: str, path: list[str]) -> list[tuple[str, list[str]]]:
        got = resolver.get_schema_and_uri(root, path)
        if got is None:
            return []
        schema, base = got
        # landed node's own $id (navigation stops at the parent scope) —
        # but a sibling $ref overrides it: that ref resolves against the
        # parent scope, same as interpreter.py:227-240
        if isinstance(schema, SchemaObject) and schema.ref is None \
                and schema.id is not None:
            base = resolve_uri(base, schema.id)
        outs = []
        for ref in _evil_refs(schema):
            target = resolve_uri(base, ref)
            r, p = resolver.resolve_path(target)
            if normalize_uri(r) in resolver.root_schemas:
                outs.append((normalize_uri(r), p))
        return outs

    starts: list[tuple[str, list[str]]] = [(u, []) for u in resolver.root_schemas]
    starts += [(r, p) for (r, p) in resolver.registered_paths.values()]

    for start in starts:
        skey = node_key(*start)
        if color.get(skey, WHITE) != WHITE:
            continue
        stack: list[tuple[tuple[str, list[str]], int]] = [(start, 0)]
        color[skey] = GRAY
        parent[skey] = None
        neigh_cache: dict[str, list[tuple[str, list[str]]]] = {}
        while stack:
            node, idx = stack[-1]
            key = node_key(*node)
            if key not in neigh_cache:
                neigh_cache[key] = neighbors(*node)
            ns = neigh_cache[key]
            if idx >= len(ns):
                color[key] = BLACK
                stack.pop()
                continue
            stack[-1] = (node, idx + 1)
            nxt = ns[idx]
            nkey = node_key(*nxt)
            c = color.get(nkey, WHITE)
            if c == GRAY:
                # reconstruct cycle from key back to nkey
                cycle = [nkey, key]
                cur = parent.get(key)
                while cur is not None and cur != nkey:
                    cycle.append(cur)
                    cur = parent.get(cur)
                cycle.reverse()
                return cycle
            if c == WHITE:
                color[nkey] = GRAY
                parent[nkey] = key
                stack.append((nxt, 0))
    return None
