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
        uris, sizes, widths, heights, statuses = [], [], [], [], []
        for s in batch[self.xml_col].to_pylist():
            rep = ET.fromstring(s).find("repInfo")
            uris.append(rep.get("uri"))
            sizes.append(int(rep.findtext("size")))
            widths.append(int(rep.findtext("properties/width")))
            heights.append(int(rep.findtext("properties/height")))
            statuses.append(rep.findtext("status"))
        out = batch.drop_columns([self.xml_col])
        out = out.append_column("xml_uri", pa.array(uris, type=pa.string()))
        out = out.append_column("xml_size", pa.array(sizes, type=pa.int64()))
        out = out.append_column("xml_width", pa.array(widths, type=pa.int64()))
        out = out.append_column("xml_height", pa.array(heights, type=pa.int64()))
        valid = [s == "Well-Formed and valid" for s in statuses]
        out = out.append_column("xml_status", pa.array(statuses, type=pa.string()))
        out = out.append_column("xml_valid", pa.array(valid))
        return out
