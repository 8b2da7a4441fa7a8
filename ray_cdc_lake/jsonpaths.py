"""Dotted-path / bracket-index JSON construction — the
``GenerateJsonFromProps`` record constructor (M1, SURVEY.md §2.2):
property paths like ``metadata.title.value`` and ``items[0].name`` become
nested objects and arrays (``GenerateJsonFromProps.kt:215-295``; bracket
array support :219-253, 275-289). Insertion order is preserved (Jackson
semantics), so serialization with ``json.dumps(separators=(',',':'))`` is
byte-deterministic.
"""

from __future__ import annotations

import json
import re

_SEG = re.compile(r"^([^\[\]]+)((\[\d+\])*)$")
_IDX = re.compile(r"\[(\d+)\]")


def put_nested(doc: dict, path: str, value) -> None:
    """Set ``value`` at ``path`` in ``doc`` (in place). Path segments are
    dot-separated; a segment may carry bracket indices (``items[0]``,
    even ``grid[1][2]``). Intermediate objects/arrays are created; arrays
    are padded with nulls up to the index (reference behavior: the array
    grows to fit, GenerateJsonFromProps.kt:275-289)."""
    segs = path.split(".")
    cur = doc
    for si, seg in enumerate(segs):
        m = _SEG.match(seg)
        if not m:
            raise ValueError(f"bad path segment {seg!r} in {path!r}")
        name, brackets = m.group(1), m.group(2)
        idxs = [int(x) for x in _IDX.findall(brackets)]
        last_seg = si == len(segs) - 1
        if not idxs:
            if last_seg:
                cur[name] = value
            else:
                cur = cur.setdefault(name, {})
            continue
        arr = cur.setdefault(name, [])
        for di, ix in enumerate(idxs):
            last_dim = di == len(idxs) - 1
            while len(arr) <= ix:
                arr.append(None)
            if last_dim and last_seg:
                arr[ix] = value
            else:
                if arr[ix] is None:
                    arr[ix] = {} if (last_dim and not last_seg) else []
                if last_dim:
                    cur = arr[ix]
                else:
                    arr = arr[ix]


def build_document(props: dict[str, object]) -> str:
    """Property map -> compact JSON document. Keys are applied in the
    given (insertion) order, like the reference's LinkedHashMap walk."""
    doc: dict = {}
    for path, value in props.items():
        put_nested(doc, path, value)
    return json.dumps(doc, separators=(",", ":"))


def merge_json(base: dict, overlay: dict) -> dict:
    """Recursive object merge — GenerateJsonFromProps MERGE mode
    (``GenerateJsonFromProps.kt:302-322``): dict+dict merges recursively,
    arrays/scalars are REPLACED, new keys append after existing ones
    (insertion order preserved, as Jackson does — byte-deterministic
    serialization)."""
    out = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_json(out[k], v)
        else:
            out[k] = v
    return out


_EL = re.compile(r"\$\{([^}]*)\}")


def render_template(value: object, attrs: dict[str, str]) -> object:
    """NiFi expression-language analog (``${attr}`` substitution against
    the row's attribute map — ``evaluateAttributeExpressions``, used per
    record at ReorderFiles.kt:333-342 and on every GenerateJsonFromProps
    dynamic property). Non-strings pass through; a missing attribute
    renders as the empty string (NiFi's null-to-empty EL default)."""
    if not isinstance(value, str):
        return value
    return _EL.sub(lambda m: str(attrs.get(m.group(1), "")), value)


def build_document_for_row(
    props: dict[str, object], attrs: dict[str, str]
) -> str:
    """Per-record parameterized construction: every property VALUE is
    EL-rendered against the row's attributes, then assembled by path —
    the full GenerateJsonFromProps discard-mode pipeline for one row."""
    doc: dict = {}
    for path, value in props.items():
        put_nested(doc, path, render_template(value, attrs))
    return json.dumps(doc, separators=(",", ":"))
