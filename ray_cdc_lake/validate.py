"""Stateful validation / metadata-extraction stages (actor pools).

Reference analogs (SURVEY.md §2.3):

* ``ContentValidator`` — the ``Jhove`` processor (Jhove.kt:44-556) +
  ``XsdValidator`` (XsdValidator.kt:17-319): one-time setup in ``init()``
  (XSD extraction, schema registry, module map) then per-document
  validation with multi-way relationship routing (success / well-formed /
  failure / empty, Jhove.kt:519-537). Here: compiled regexes + an
  allowed-language "schema registry" built once per ACTOR in ``__init__``,
  vectorized checks per batch in ``__call__``, a ``route`` column instead
  of separate relationships.

* ``XmlMetadataExtractor`` — ``JhoveParser`` (JhoveParser.kt:12-184):
  XPath extraction of width/height/size/checksum/status from per-document
  JHOVE XML. Here the XML payload is a row value; parsing is inherently
  per-row (that IS the operator), but the parser + field map are built
  once per actor.

Both are callable classes for ``map_batches(Cls, concurrency=N,
batch_size=B, batch_format='pyarrow')``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The reference's FOLDER_MAPPINGS analog: a default registry the caller
# can override per pipeline (dynamic properties REPLACE defaults,
# Jhove.kt:38-43,227-244).
DEFAULT_ALLOWED_LANGS = ("en", "de", "fr", "es")
DEFAULT_MIN_CHARS = 1
DEFAULT_MAX_CHARS = 1_000_000


class ContentValidator:
    """4-way routing validator over a text column.

    Routes (first match wins — mirrors Jhove's route precedence where the
    empty case is decided before per-file results, Jhove.kt:490-496):
      'empty'        — null or zero-length content
      'invalid_lang' — language not in the allowed registry
      'malformed'    — control characters in content
      'ok'           — everything else (is_valid=True)
    """

    def __init__(
        self,
        allowed_langs: tuple[str, ...] = DEFAULT_ALLOWED_LANGS,
        min_chars: int = DEFAULT_MIN_CHARS,
        max_chars: int = DEFAULT_MAX_CHARS,
        text_col: str = "text",
        lang_col: str = "lang",
    ):
        # one-time per-actor state (reference: init() extracts XSDs and
        # builds localSchemaMap once, Jhove.kt:148-217)
        self.langs = pa.array(list(allowed_langs), type=pa.string())
        self.min_chars = min_chars
        self.max_chars = max_chars
        self.text_col = text_col
        self.lang_col = lang_col
        # \x01-\x1f minus tab/LF/CR; \x00 deliberately EXCLUDED so the
        # class matches what the SQL oracle can express (a VARCHAR literal
        # cannot carry NUL) — engine and oracle route identically
        self.ctrl_pattern = r"[\x01-\x08\x0b\x0c\x0e-\x1f]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.cast(batch[self.text_col], pa.string())
        lang = pc.cast(batch[self.lang_col], pa.string())
        n = batch.num_rows

        length = pc.fill_null(pc.utf8_length(text), 0)
        empty = pc.or_(pc.is_null(text), pc.equal(length, 0))
        bad_lang = pc.invert(pc.is_in(lang, value_set=self.langs))
        malformed = pc.fill_null(
            pc.match_substring_regex(text, self.ctrl_pattern), False
        )
        bad_len = pc.or_(
            pc.less(length, self.min_chars), pc.greater(length, self.max_chars)
        )

        e = empty.to_numpy(zero_copy_only=False)
        bl = bad_lang.to_numpy(zero_copy_only=False)
        mf = malformed.to_numpy(zero_copy_only=False)
        ln = bad_len.to_numpy(zero_copy_only=False)
        route = np.select(
            [e, bl, mf, ln], ["empty", "invalid_lang", "malformed", "short"], "ok"
        )
        is_valid = route == "ok"
        return batch.append_column(
            "route", pa.array(route.tolist(), type=pa.string())
        ).append_column("is_valid", pa.array(is_valid))


# File-type -> validator-module registry, the FILE_TYPE_MODULE_MAP analog
# (Jhove.kt:95-105): each extension dispatches to a named validator module.
# No real format parsers exist in this container, so a module here is a
# (name, min_chars) pair — a deterministic, SQL-expressible per-format
# validity rule — while the DISPATCH shape (per-actor registry, partition
# the batch by type, run each format's vectorized check on its slice) is
# the real, reusable machinery.
DEFAULT_FILE_TYPE_MODULES: dict[str, tuple[str, int]] = {
    "jp2": ("JPEG2000-hul", 350),
    "jpeg": ("JPEG-hul", 300),
    "jpg": ("JPEG-hul", 300),
    "tif": ("TIFF-hul", 250),
    "tiff": ("TIFF-hul", 250),
    "png": ("PNG-gdm", 200),
    "gif": ("gif-hul", 150),
    "pdf": ("PDF-hul", 400),
    "xml": ("XML-hul", 100),
}

STATUS_VALID = "Well-Formed and valid"
STATUS_NOT_VALID = "Well-Formed, but not valid"
STATUS_NOT_WF = "Not well-formed"
STATUS_NO_MODULE = "No module for type"


class FormatDispatchValidator:
    """Per-format validator dispatch (A1 parity with Jhove's module map,
    Jhove.kt:95-105): each row's file extension selects a validator module
    from a registry built ONCE per actor; the batch is partitioned by
    format and each module's vectorized check runs on its slice. An
    extension with no module routes to ``No module for type`` (never a
    crashed task). ``modules=`` REPLACES the default registry entirely —
    the reference's dynamic-property override rule ("when any dynamic
    property is present, only dynamic mappings are used, defaults are not
    merged", Jhove.kt:38-43).

    Adds columns: ``module`` (null when unmapped), ``status`` (the JHOVE
    status vocabulary), ``is_valid``.
    """

    def __init__(
        self,
        modules: dict[str, tuple[str, int]] | None = None,
        path_col: str = "path",
        text_col: str = "text",
    ):
        reg = DEFAULT_FILE_TYPE_MODULES if modules is None else modules
        # one-time per-actor compile (the init()-builds-localSchemaMap
        # analog, Jhove.kt:148-217): lowercase keys, compiled control-char
        # well-formedness pattern shared by every module
        self.registry = {e.lower(): (str(n), int(m)) for e, (n, m) in reg.items()}
        self.path_col = path_col
        self.text_col = text_col
        self.ctrl_pattern = r"[\x01-\x08\x0b\x0c\x0e-\x1f]"
        self.ext_pattern = r"\.(?P<ext>[A-Za-z0-9]+)$"

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        path = pc.cast(batch[self.path_col], pa.string())
        text = pc.cast(batch[self.text_col], pa.string())
        ext_struct = pc.extract_regex(path, self.ext_pattern)
        exts = pc.fill_null(
            pc.utf8_lower(pc.struct_field(ext_struct, "ext")), ""
        ).to_numpy(zero_copy_only=False)
        length = pc.fill_null(pc.utf8_length(text), 0).to_numpy(
            zero_copy_only=False
        )
        not_wf = pc.fill_null(
            pc.match_substring_regex(text, self.ctrl_pattern), False
        ).to_numpy(zero_copy_only=False)

        module = np.full(n, None, dtype=object)
        status = np.full(n, STATUS_NO_MODULE, dtype=object)
        for e in np.unique(exts):
            entry = self.registry.get(e)
            if entry is None:
                continue  # stays No-module (the unmapped route)
            name, min_chars = entry
            sel = exts == e
            module[sel] = name
            status[sel] = np.select(
                [not_wf[sel], length[sel] < min_chars],
                [STATUS_NOT_WF, STATUS_NOT_VALID],
                STATUS_VALID,
            )
        return (
            batch.append_column("module", pa.array(module, type=pa.string()))
            .append_column("status", pa.array(status, type=pa.string()))
            .append_column("is_valid", pa.array(status == STATUS_VALID))
        )


def build_jhove_xml(batch: pa.Table) -> pa.Table:
    """Deterministically synthesize a per-document JHOVE-shaped XML payload
    (the engine's documents have no real image bytes; the XML layout
    mirrors what JhoveParser reads: size, checksum, width/height, status).
    Vectorized string assembly; adds column ``jhove_xml``."""
    doc_id = batch["doc_id"]
    did = doc_id.to_numpy(zero_copy_only=False)
    width = pa.array((800 + did % 1200).astype(str), type=pa.string())
    height = pa.array((600 + did % 900).astype(str), type=pa.string())
    xml = pc.binary_join_element_wise(
        '<jhove><repInfo uri="docs/',
        pc.cast(batch["lang"], pa.string()),
        "/doc_",
        pc.utf8_lpad(pc.cast(doc_id, pa.string()), 6, "0"),
        '.txt"><size>',
        pc.cast(batch["n_chars"], pa.string()),
        "</size><format>TXT</format>"
        "<status>Well-Formed and valid</status><properties><width>",
        width,
        "</width><height>",
        height,
        "</height></properties></repInfo></jhove>",
        "",
    )
    return batch.append_column("jhove_xml", xml)


# ---------------------------------------------------------------------------
# Structural XML-schema validation (the XsdValidator reborn)
# ---------------------------------------------------------------------------

# The compiled "schema registry" — the analog of XsdValidator's
# URL->classpath-resource map (XsdValidator.kt:31-45): every schema the
# validator may need is declared locally up front, no remote resolution.
# No XSD library exists in this container, so a schema here is a
# structural declaration: required element paths with type/enum/attribute
# constraints, checked against the parsed tree.
JHOVE_STRUCT_SCHEMA = {
    "root": "jhove",
    "elements": {
        # value facets mirror what a real XSD carries (the reference's
        # schemas are genuine XSDs with type/enumeration/pattern facets —
        # XsdValidator.kt compiles them via SchemaFactory): 'pattern' is
        # an anchored regex facet, 'min'/'max' are xs:minInclusive /
        # xs:maxInclusive analogs on integer fields.
        "repInfo": {
            "required": True,
            "attrs": ("uri",),
            "attr_patterns": {"uri": r"docs/[a-z]{2}/doc_\d{6}\.txt"},
        },
        "repInfo/size": {"required": True, "type": "int", "min": 0},
        "repInfo/format": {"required": True, "enum": ("TXT", "XML", "JP2", "TIF")},
        "repInfo/status": {
            "required": True,
            "enum": (
                "Well-Formed and valid",
                "Well-Formed, but not valid",
                "Not well-formed",
            ),
        },
        "repInfo/properties/width": {
            "required": True, "type": "int", "min": 1, "max": 9999,
        },
        "repInfo/properties/height": {
            "required": True, "type": "int", "min": 1, "max": 9999,
        },
    },
    # embedded-document extraction: MIX blocks inside a METS/JHOVE doc are
    # pulled out and validated against their OWN schema, separately
    # (XsdValidator.kt:225-273)
    "embedded": (".//mix", "mix"),
}

MIX_STRUCT_SCHEMA = {
    "root": "mix",
    "elements": {
        "ImageWidth": {"required": True, "type": "int", "min": 1},
        "ImageHeight": {"required": True, "type": "int", "min": 1},
    },
}

DEFAULT_SCHEMA_REGISTRY = {"jhove": JHOVE_STRUCT_SCHEMA, "mix": MIX_STRUCT_SCHEMA}


def _compile_schema(schema: dict) -> dict:
    """Compile a structural schema's regex facets ONCE (the XSD-compile
    analog — XsdValidator compiles SchemaFactory schemas up front, never
    per document). Returns a copy with '_pattern_re' / '_attr_pattern_re'
    entries holding fullmatch-anchored compiled patterns."""
    out = {**schema, "elements": {}}
    for path, spec in schema["elements"].items():
        spec = dict(spec)
        if "pattern" in spec:
            spec["_pattern_re"] = re.compile(spec["pattern"])
        if "attr_patterns" in spec:
            spec["_attr_pattern_re"] = {
                a: re.compile(p) for a, p in spec["attr_patterns"].items()
            }
        out["elements"][path] = spec
    return out


def _check_element(root, schema: dict, errors: list[str], prefix: str = "") -> None:
    for path, spec in schema["elements"].items():
        el = root.find(path)
        if el is None:
            if spec.get("required"):
                errors.append(f"{prefix}missing required element <{path}>")
            continue
        for attr in spec.get("attrs", ()):
            val = el.get(attr)
            if val is None:
                errors.append(f"{prefix}<{path}> missing attribute '{attr}'")
                continue
            attr_re = spec.get("_attr_pattern_re", {}).get(attr)
            if attr_re is not None and attr_re.fullmatch(val) is None:
                errors.append(
                    f"{prefix}<{path}> attribute '{attr}' value {val!r} "
                    f"violates pattern facet {attr_re.pattern!r}"
                )
        text = (el.text or "").strip()
        if spec.get("type") == "int":
            try:
                value = int(text)
            except ValueError:
                errors.append(f"{prefix}<{path}> not an integer: {text!r}")
            else:
                # xs:minInclusive / xs:maxInclusive value facets — catch
                # documents a pure structure check would wrongly accept
                lo, hi = spec.get("min"), spec.get("max")
                if lo is not None and value < lo:
                    errors.append(f"{prefix}<{path}> value {value} < min {lo}")
                if hi is not None and value > hi:
                    errors.append(f"{prefix}<{path}> value {value} > max {hi}")
        enum = spec.get("enum")
        if enum is not None and text not in enum:
            errors.append(f"{prefix}<{path}> value {text!r} not in {enum}")
        pat = spec.get("_pattern_re")
        if pat is not None and pat.fullmatch(text) is None:
            errors.append(
                f"{prefix}<{path}> value {text!r} violates pattern facet "
                f"{pat.pattern!r}"
            )


class XmlSchemaValidator:
    """Structural XML validation stage (A2 reborn: XsdValidator.kt:17-319,
    exercised by MetsXsdValidationTest.kt) as an actor-pool ``map_batches``
    class.

    ``__init__`` compiles the schema registry ONCE per actor (the analog
    of XSD compilation with the offline resolver); ``__call__`` validates
    each row's XML payload:

    * unparseable XML         -> route 'malformed'   (quarantined, not raised)
    * wrong root element      -> route 'schema_invalid'
    * declared-structure miss -> route 'schema_invalid' (all errors listed,
      the ValidationResult(isValid, errors[]) shape, XsdValidator.kt:324-343)
    * VALUE facet violations (int range min/max, anchored regex pattern on
      element text or attributes, enumerations) -> route 'schema_invalid';
      these documents are structurally perfect and pass a pure structure
      check — the facet layer is what makes this the real-XSD analog
    * embedded <mix> blocks validated separately against the MIX schema
      (XsdValidator.kt:225-273)
    * everything green        -> route 'ok'

    Emits: ``xsd_route``, ``xsd_valid`` (bool), ``xsd_n_errors`` (int64),
    ``xsd_errors`` ('; '-joined, '' when valid).
    """

    def __init__(self, doctype: str = "jhove", xml_col: str = "jhove_xml",
                 registry: dict | None = None):
        # compile every schema's regex facets once per ACTOR (the analog
        # of XsdValidator's one-time SchemaFactory compilation with the
        # offline resolver)
        self.registry = {
            k: _compile_schema(v)
            for k, v in (registry or DEFAULT_SCHEMA_REGISTRY).items()
        }
        self.schema = self.registry[doctype]
        self.xml_col = xml_col

    def validate_one(self, s: str) -> tuple[str, list[str]]:
        """(route, errors) for one document — the XsdValidator.validate
        analog; never raises on document content."""
        try:
            root = ET.fromstring(s)
        except ET.ParseError as exc:
            return "malformed", [f"ParseError: {exc}"]
        errors: list[str] = []
        if root.tag != self.schema["root"]:
            errors.append(
                f"root element <{root.tag}> != <{self.schema['root']}>"
            )
        else:
            _check_element(root, self.schema, errors)
            embedded = self.schema.get("embedded")
            if embedded is not None:
                path, doctype = embedded
                sub_schema = self.registry[doctype]
                for i, el in enumerate(root.findall(path)):
                    if el.tag != sub_schema["root"]:
                        errors.append(f"embedded[{i}] root <{el.tag}>")
                        continue
                    _check_element(el, sub_schema, errors, prefix=f"embedded[{i}] ")
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


class XmlMetadataExtractor:
    """Parse the XML payload column; emit extracted metadata columns.

    Per-row ``ET.fromstring`` is the operator's semantics (each row IS an
    XML document, JhoveParser.kt:12-184); the field map lives on the
    actor. Emits: xml_uri, xml_size (int64), xml_width, xml_height
    (int64), xml_status, xml_valid (bool).
    """

    FIELDS = {
        "uri": (".", "uri"),  # attribute on repInfo
        "size": ("size", None),
        "width": ("properties/width", None),
        "height": ("properties/height", None),
        "status": ("status", None),
    }

    def __init__(self, xml_col: str = "jhove_xml"):
        self.xml_col = xml_col
        self.fields = dict(self.FIELDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        uris, sizes, widths, heights, statuses, errors = [], [], [], [], [], []
        for s in batch[self.xml_col].to_pylist():
            # poison-row quarantine (SURVEY.md §4 'Retries'): one malformed
            # document must not kill the task — route it, don't raise
            try:
                rep = ET.fromstring(s).find("repInfo")
                if rep is None:
                    raise ValueError("missing <repInfo> element")
                uris.append(rep.get("uri"))
                sizes.append(int(rep.findtext("size")))
                widths.append(int(rep.findtext("properties/width")))
                heights.append(int(rep.findtext("properties/height")))
                statuses.append(rep.findtext("status"))
                errors.append(None)
            except (ET.ParseError, ValueError, TypeError) as exc:
                uris.append(None)
                sizes.append(None)
                widths.append(None)
                heights.append(None)
                statuses.append(None)
                errors.append(f"{type(exc).__name__}: {exc}")
        out = batch.drop_columns([self.xml_col])
        out = out.append_column("xml_uri", pa.array(uris, type=pa.string()))
        out = out.append_column("xml_size", pa.array(sizes, type=pa.int64()))
        out = out.append_column("xml_width", pa.array(widths, type=pa.int64()))
        out = out.append_column("xml_height", pa.array(heights, type=pa.int64()))
        valid = [s == "Well-Formed and valid" for s in statuses]
        out = out.append_column("xml_status", pa.array(statuses, type=pa.string()))
        out = out.append_column("xml_valid", pa.array(valid))
        out = out.append_column("xml_error", pa.array(errors, type=pa.string()))
        return out
