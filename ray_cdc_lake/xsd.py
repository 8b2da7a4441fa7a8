"""Real XSD-grammar validation: parse an actual ``.xsd`` document into a
compiled grammar and validate XML payloads against it — sequence/choice
content models with minOccurs/maxOccurs, required attributes, and
simple-type facets (pattern, enumeration, min/maxInclusive, maxLength).

This is the XsdValidator.kt:17-45 analog taken the rest of the way: the
hand-declared structure maps in ``validate.XmlSchemaValidator`` check
element PRESENCE and value facets, but cannot express "these children,
in this order, this many times" from a user's own schema document.
``parse_xsd`` compiles the grammar once (per actor, in ``__init__`` —
the SchemaFactory-with-offline-resolver discipline: the schema TEXT is
handed in, never resolved remotely), and validation walks each parsed
document against the compiled content models.

Supported XSD subset (deterministic content models, the practical core):

* top-level ``xs:element`` (first one = document root), named
  ``xs:complexType`` / ``xs:simpleType``, inline anonymous types
* ``xs:sequence`` and ``xs:choice`` particles, arbitrarily nested, with
  ``minOccurs`` / ``maxOccurs`` (``unbounded`` supported)
* ``xs:attribute`` with ``use="required"`` and simple-type facets
* ``xs:restriction`` over ``xs:string`` / ``xs:int`` / ``xs:integer``
  with ``xs:pattern`` (anchored, XSD-style), ``xs:enumeration``,
  ``xs:minInclusive`` / ``xs:maxInclusive``, ``xs:maxLength``

Matching is greedy, which is exact for the deterministic (UPA-conform)
content models real XSDs are required to have.  Like the reference's
validator, document problems are ROUTED (malformed / schema_invalid),
never raised (ValidationResult shape, XsdValidator.kt:324-343).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

XS = "{http://www.w3.org/2001/XMLSchema}"
_UNBOUNDED = 1 << 30

_BUILTINS = {
    "xs:string": {"base": "string"},
    "xs:int": {"base": "int"},
    "xs:integer": {"base": "int"},
    "xs:long": {"base": "int"},
    "xs:anyURI": {"base": "string"},
}


def load_default_xsd() -> str:
    """Text of the committed ``jhove.xsd`` fixture (read driver-side and
    shipped into actors by value — workers never need the file)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jhove.xsd")
    with open(path, encoding="utf-8") as f:
        return f.read()


def _occurs(el) -> tuple[int, int]:
    lo = int(el.get("minOccurs", "1"))
    hi_s = el.get("maxOccurs", "1")
    hi = _UNBOUNDED if hi_s == "unbounded" else int(hi_s)
    return lo, hi


class _SimpleType:
    """Compiled simple type: base kind + value facets, compiled once."""

    def __init__(self, base: str):
        self.base = base  # 'string' | 'int'
        self.pattern: re.Pattern | None = None
        self.enum: list[str] | None = None
        self.min_inc: int | None = None
        self.max_inc: int | None = None
        self.max_len: int | None = None

    def check(self, text: str, where: str, errors: list[str]) -> None:
        if self.base == "int":
            try:
                v = int(text.strip())
            except ValueError:
                errors.append(f"{where}: not an integer: {text!r}")
                return
            if self.min_inc is not None and v < self.min_inc:
                errors.append(f"{where}: {v} < minInclusive {self.min_inc}")
            if self.max_inc is not None and v > self.max_inc:
                errors.append(f"{where}: {v} > maxInclusive {self.max_inc}")
            return
        if self.max_len is not None and len(text) > self.max_len:
            errors.append(f"{where}: length {len(text)} > maxLength {self.max_len}")
        if self.enum is not None and text not in self.enum:
            errors.append(f"{where}: {text!r} not in enumeration {self.enum}")
        if self.pattern is not None and self.pattern.fullmatch(text) is None:
            errors.append(
                f"{where}: {text!r} violates pattern {self.pattern.pattern!r}"
            )


class _ComplexType:
    """Compiled complex type: content-model particle tree + attributes."""

    def __init__(self):
        self.model: dict | None = None  # particle, or None = empty content
        self.attrs: list[tuple[str, bool, _SimpleType | None]] = []


class CompiledXsd:
    def __init__(self, root_name: str, root_decl: dict):
        self.root_name = root_name
        self.root_decl = root_decl  # element declaration dict


def _parse_simple(el, named: dict) -> _SimpleType:
    r = el.find(f"{XS}restriction")
    if r is None:
        raise ValueError("xs:simpleType without xs:restriction unsupported")
    base = r.get("base", "xs:string")
    if base in _BUILTINS:
        st = _SimpleType(_BUILTINS[base]["base"])
    elif base in named:
        # derive-by-restriction from a named simple type: start from a copy
        src = named[base]
        st = _SimpleType(src.base)
        st.__dict__.update({k: v for k, v in src.__dict__.items()})
    else:
        raise ValueError(f"unknown restriction base {base!r}")
    for f in r:
        tag = f.tag.removeprefix(XS)
        v = f.get("value")
        if tag == "pattern":
            st.pattern = re.compile(v)
        elif tag == "enumeration":
            st.enum = (st.enum or []) + [v]
        elif tag == "minInclusive":
            st.min_inc = int(v)
        elif tag == "maxInclusive":
            st.max_inc = int(v)
        elif tag == "maxLength":
            st.max_len = int(v)
        else:
            raise ValueError(f"unsupported facet xs:{tag}")
    return st


def _resolve_type(name: str, simple: dict, cplx: dict):
    if name in _BUILTINS:
        return _SimpleType(_BUILTINS[name]["base"])
    if name in simple:
        return simple[name]
    if name in cplx:
        return cplx[name]
    raise ValueError(f"unknown type reference {name!r}")


def _parse_particle(el, simple: dict, cplx: dict) -> dict:
    tag = el.tag.removeprefix(XS)
    lo, hi = _occurs(el)
    if tag == "element":
        decl = _parse_element(el, simple, cplx)
        return {"kind": "element", "decl": decl, "min": lo, "max": hi}
    if tag in ("sequence", "choice"):
        children = [
            _parse_particle(c, simple, cplx)
            for c in el
            if c.tag.removeprefix(XS) in ("element", "sequence", "choice")
        ]
        return {"kind": tag, "children": children, "min": lo, "max": hi}
    raise ValueError(f"unsupported particle xs:{tag}")


def _parse_complex(el, simple: dict, cplx: dict) -> _ComplexType:
    ct = _ComplexType()
    for c in el:
        tag = c.tag.removeprefix(XS)
        if tag in ("sequence", "choice"):
            ct.model = _parse_particle(c, simple, cplx)
        elif tag == "attribute":
            a_type = c.get("type")
            st = None
            if a_type is not None:
                st = _resolve_type(a_type, simple, cplx)
                if isinstance(st, _ComplexType):
                    raise ValueError("attribute with complex type")
            else:
                inline = c.find(f"{XS}simpleType")
                if inline is not None:
                    st = _parse_simple(inline, simple)
            ct.attrs.append((c.get("name"), c.get("use") == "required", st))
        elif tag == "annotation":
            continue
        else:
            raise ValueError(f"unsupported complexType child xs:{tag}")
    return ct


def _parse_element(el, simple: dict, cplx: dict) -> dict:
    name = el.get("name")
    t = el.get("type")
    if t is not None:
        typ = _resolve_type(t, simple, cplx)
    else:
        inline_c = el.find(f"{XS}complexType")
        inline_s = el.find(f"{XS}simpleType")
        if inline_c is not None:
            typ = _parse_complex(inline_c, simple, cplx)
        elif inline_s is not None:
            typ = _parse_simple(inline_s, simple)
        else:
            typ = _SimpleType("string")  # xs:anyType text, unconstrained
    return {"name": name, "type": typ}


def parse_xsd(text: str) -> CompiledXsd:
    """Compile an XSD document (the supported subset) into a grammar.
    Raises ValueError on constructs outside the subset — loud at
    compile time, never silently lax at validation time."""
    root = ET.fromstring(text)
    if root.tag != f"{XS}schema":
        raise ValueError(f"not an XSD document (root {root.tag})")
    simple: dict = {}
    cplx: dict = {}
    # two passes so named types can reference each other lexically
    for c in root:
        tag = c.tag.removeprefix(XS)
        if tag == "simpleType":
            simple[c.get("name")] = _parse_simple(c, simple)
    for c in root:
        tag = c.tag.removeprefix(XS)
        if tag == "complexType":
            cplx[c.get("name")] = _parse_complex(c, simple, cplx)
    top = [c for c in root if c.tag == f"{XS}element"]
    if not top:
        raise ValueError("schema declares no top-level xs:element")
    decl = _parse_element(top[0], simple, cplx)
    return CompiledXsd(decl["name"], decl)


# ---------------------------------------------------------------------------
# validation walk


def _try_match(children, i: int, particle: dict, path: str):
    """Attempt ONE occurrence of ``particle`` at position ``i``.
    Returns (new_i, pending_errors) — pending errors are committed by
    the caller only when the occurrence is kept — or None when the
    particle does not match at all (nothing consumed)."""
    kind = particle["kind"]
    if kind == "element":
        decl = particle["decl"]
        if i < len(children) and children[i].tag == decl["name"]:
            errs: list[str] = []
            _validate_element(children[i], decl, errs, path)
            return i + 1, errs
        return None
    if kind == "sequence":
        errs: list[str] = []
        j = i
        for sub in particle["children"]:
            r = _match_particle(children, j, sub, errs, path)
            if r is None:
                # a required inner particle failed: if nothing was
                # consumed the sequence simply doesn't match here;
                # if part of it matched, report the partial failure
                if j == i:
                    return None
                return j, errs
            j = r
        return j, errs
    if kind == "choice":
        # branch-level backtracking: a branch that matched CLEANLY wins
        # immediately — choice(seq(A,B), seq(A,C)) against [A, C] picks
        # seq(A,C) instead of committing a failed seq(A,B). When no
        # branch is clean, the deepest-progress branch (first on ties)
        # is committed so the document's actual choice reports its
        # specific inner error (a matched element with a bad attribute,
        # say) rather than a generic missing-choice.
        best = None
        for sub in particle["children"]:
            r = _try_match(children, i, sub, path)
            if r is None:
                continue
            if not r[1]:
                return r
            if best is None or r[0] > best[0]:
                best = r
        return best
    raise AssertionError(kind)


def _match_particle(children, i: int, particle: dict, errors: list[str], path: str):
    """Match ``particle`` with its occurrence bounds, greedily.  Appends
    errors for missing required occurrences; returns the new position,
    or None when a required occurrence is absent."""
    count = 0
    while count < particle["max"]:
        r = _try_match(children, i, particle, path)
        if r is None:
            break
        new_i, pending = r
        errors.extend(pending)
        if new_i == i and not pending:
            break  # zero-width occurrence (all-optional group): stop
        i = new_i
        count += 1
    if count < particle["min"]:
        errors.append(
            f"{path}: missing required {_particle_name(particle)} "
            f"(got {count}, minOccurs {particle['min']})"
        )
        return None
    return i


def _particle_name(p: dict) -> str:
    if p["kind"] == "element":
        return f"<{p['decl']['name']}>"
    inner = ", ".join(_particle_name(c) for c in p["children"])
    return f"{p['kind']}({inner})"


def _validate_element(el, decl: dict, errors: list[str], parent_path: str) -> None:
    path = f"{parent_path}/{decl['name']}" if parent_path else decl["name"]
    typ = decl["type"]
    if isinstance(typ, _SimpleType):
        if len(el) > 0:
            errors.append(f"{path}: child elements in simple-content element")
        typ.check((el.text or "").strip(), path, errors)
        return
    # complex type: attributes
    for name, required, st in typ.attrs:
        val = el.get(name)
        if val is None:
            if required:
                errors.append(f"{path}: missing required attribute '{name}'")
            continue
        if st is not None:
            st.check(val, f"{path}@{name}", errors)
    # complex content may not carry bare text
    if (el.text or "").strip():
        errors.append(f"{path}: unexpected text in complex-content element")
    children = list(el)
    if typ.model is None:
        if children:
            errors.append(f"{path}: unexpected element <{children[0].tag}>")
        return
    r = _match_particle(children, 0, typ.model, errors, path)
    if r is not None and r < len(children):
        errors.append(f"{path}: unexpected element <{children[r].tag}>")


class XsdGrammarValidator:
    """Actor-pool ``map_batches`` stage validating an XML payload column
    against a REAL XSD document.  ``__init__`` parses + compiles the
    grammar once per actor (pass ``xsd_text``; default is the committed
    ``jhove.xsd`` fixture).  Emits the same columns as
    ``validate.XmlSchemaValidator``: ``xsd_route`` ('malformed' |
    'schema_invalid' | 'ok'), ``xsd_valid``, ``xsd_n_errors``,
    ``xsd_errors``."""

    def __init__(self, xsd_text: str | None = None, xml_col: str = "jhove_xml"):
        self.grammar = parse_xsd(xsd_text if xsd_text is not None else load_default_xsd())
        self.xml_col = xml_col

    def validate_one(self, s: str) -> tuple[str, list[str]]:
        try:
            root = ET.fromstring(s)
        except ET.ParseError as exc:
            return "malformed", [f"ParseError: {exc}"]
        errors: list[str] = []
        if root.tag != self.grammar.root_name:
            errors.append(
                f"root element <{root.tag}> != <{self.grammar.root_name}>"
            )
        else:
            _validate_element(root, self.grammar.root_decl, errors, "")
        return ("schema_invalid" if errors else "ok"), errors

    def __call__(self, batch: pa.Table) -> pa.Table:
        routes, valids, n_errs, errs = [], [], [], []
        for s in batch[self.xml_col].to_pylist():
            route, errors = self.validate_one(s)
            routes.append(route)
            valids.append(route == "ok")
            n_errs.append(len(errors))
            errs.append("; ".join(errors))
        out = batch.drop_columns([self.xml_col])
        out = out.append_column("xsd_route", pa.array(routes, type=pa.string()))
        out = out.append_column("xsd_valid", pa.array(valids))
        out = out.append_column("xsd_n_errors", pa.array(n_errs, type=pa.int64()))
        out = out.append_column("xsd_errors", pa.array(errs, type=pa.string()))
        return out
