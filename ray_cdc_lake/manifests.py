"""Dual-version manifest serialization: ONE model, TWO byte-exact layouts.

Reference analog: the bundle serializes a single METS model to two schema
versions with deterministic byte layout — custom attribute ordering and
exact whitespace in v1 (``…/mets/MetsBrowsingSerializer.kt:296-412``),
v2's deltas expressed as a small override
(``…/mets/Mets2BrowsingSerializer.kt:8-19``), version-compat notes on the
shared model (``MetsBrowsingModel.kt:10-21``). Consumers pin a schema
version; the producer must emit both from the same build.

Here the model is the per-repo file manifest (paths + content sha256,
the engine's per-row invariant); both serializations are byte-
deterministic (sorted paths, compact separators, fixed key order) so the
judge's value-hash comparison holds across workers and parallelism
levels.
"""

from __future__ import annotations

import json

MANIFEST_VERSIONS = (1, 2)


def build_manifest_model(repo: str, paths: list[str], shas: list[str]) -> dict:
    """The version-independent model (MetsBrowsingBuilder analog): files
    sorted by path — page order is semantic, so it is fixed in the MODEL,
    not left to each serializer."""
    files = sorted(zip(paths, shas))
    return {"repo": repo, "files": files}


def serialize_manifest(model: dict, version: int = 1) -> str:
    """model -> manifest document bytes for the pinned schema version.

    v1: ``{"repo":…,"n_files":N,"files":[{"path":…,"sha256":…}]}``
    v2: ``{"manifest_version":2,"object":{"id":…,"file_count":N},
          "files":[{"href":…,"checksum":"sha256:…"}]}``

    Both use compact separators and insertion-ordered keys — the exact
    byte layout is part of the contract (serializer tests compare full
    strings, the CreateMetsBrowsingTest.kt:372-411 golden-file style).
    """
    repo = model["repo"]
    files = model["files"]
    if version == 1:
        doc = {
            "repo": repo,
            "n_files": len(files),
            "files": [{"path": p, "sha256": h} for p, h in files],
        }
    elif version == 2:
        doc = {
            "manifest_version": 2,
            "object": {"id": repo, "file_count": len(files)},
            "files": [{"href": p, "checksum": f"sha256:{h}"} for p, h in files],
        }
    else:
        raise ValueError(f"unknown manifest version {version!r}")
    return json.dumps(doc, separators=(",", ":"))


# ---------------------------------------------------------------------------
# XML serialization with exact byte-layout control
# ---------------------------------------------------------------------------
#
# Reference analog: ``MetsBrowsingSerializer.kt:280-412`` serializes the
# model to XML with a CUSTOM writer (not a library pretty-printer) so the
# byte layout is part of the contract: single-quoted XML declaration, 2-space
# indent, self-closing empty elements, text-only elements inlined, attributes
# emitted in a fixed per-element ORDER TABLE (``serializeAttributes``,
# :351-412) with leftovers alphabetical, no trailing newline. The v2 layout
# is a small override of the same model (``Mets2BrowsingSerializer.kt:8-19``:
# new namespace, FLocat uses LOCREF instead of xlink:href, structMap moves
# inside structSec). Both versions are reproduced here over the lake's
# repo-manifest model, and both are byte-exact against a SQL oracle that
# rebuilds the same bytes with string_agg.

_NS_MF_V1 = "urn:ray-cdc-lake:manifest:v1"
_NS_MF_V2 = "urn:ray-cdc-lake:manifest:v2"
_NS_XLINK = "http://www.w3.org/1999/xlink"

# div elements order ID before TYPE (MetsBrowsingSerializer.kt:372-378);
# everything else uses the shared table (:379-398). Unlisted attributes
# follow alphabetically (:408-411).
_DIV_ATTR_ORDER = ("ID", "ORDER", "ORDERLABEL", "TYPE", "FILEID")
_ATTR_ORDER = (
    "OBJID",
    "N-FILES",
    "ID",
    "SEQ",
    "FILE-COUNT",
    "CHECKSUM",
    "CHECKSUMTYPE",
    "LOCTYPE",
    "TYPE",
    "LOCREF",
    "xlink:type",
    "xlink:href",
    "ORDER",
    "ORDERLABEL",
    "FILEID",
)


def xml_attr_escape(value: str) -> str:
    """Minimal XML attribute escaping. The escape CHAIN (``&`` first) is
    part of the byte contract — the SQL oracle applies the identical
    replace chain."""
    return (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


class XmlEl:
    """Tiny element node. Attribute INSERTION order is deliberately
    irrelevant — the serializer imposes the order tables, like the
    reference's DOM-based writer."""

    __slots__ = ("tag", "attrs", "children", "text")

    def __init__(self, tag: str, attrs: dict | None = None, text: str | None = None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list[XmlEl] = []
        self.text = text

    def child(self, tag: str, attrs: dict | None = None, text: str | None = None) -> "XmlEl":
        el = XmlEl(tag, attrs, text)
        self.children.append(el)
        return el


def _ordered_attrs(el: XmlEl) -> list[tuple[str, str]]:
    table = _DIV_ATTR_ORDER if el.tag.endswith(":div") else _ATTR_ORDER
    rest = dict(el.attrs)
    out = []
    # namespace declarations first, in a fixed order (the root-element
    # special case, MetsBrowsingSerializer.kt:363-369)
    for key in ("xmlns:mf", "xmlns:xlink"):
        if key in rest:
            out.append((key, rest.pop(key)))
    for key in table:
        if key in rest:
            out.append((key, rest.pop(key)))
    for key in sorted(rest):  # leftovers alphabetical
        out.append((key, rest[key]))
    return out


def _serialize_el(el: XmlEl, out: list[str], level: int) -> None:
    indent = "  " * level
    attrs = "".join(
        f' {k}="{xml_attr_escape(v)}"' for k, v in _ordered_attrs(el)
    )
    if not el.children and not el.text:
        out.append(f"{indent}<{el.tag}{attrs}/>\n")
    elif el.text and not el.children:
        out.append(f"{indent}<{el.tag}{attrs}>{el.text}</{el.tag}>\n")
    else:
        out.append(f"{indent}<{el.tag}{attrs}>\n")
        for c in el.children:
            _serialize_el(c, out, level + 1)
        out.append(f"{indent}</{el.tag}>\n")


def serialize_xml_document(root: XmlEl) -> str:
    """Single-quoted declaration + custom writer, trailing newline trimmed
    (``documentToString``, MetsBrowsingSerializer.kt:280-291)."""
    out = ["<?xml version='1.0' encoding='UTF-8'?>\n"]
    _serialize_el(root, out, 0)
    return "".join(out).rstrip("\n")


def build_manifest_xml_tree(model: dict, version: int = 1) -> XmlEl:
    """Model -> XML tree for the pinned schema version.

    v1 layout::

        <mf:manifest xmlns:mf=…:v1 xmlns:xlink=… OBJID=repo N-FILES=n>
          <mf:fileSec><mf:fileGrp ID="files">
            <mf:file ID="f_000001" SEQ="1" CHECKSUM=sha CHECKSUMTYPE="SHA-256">
              <mf:FLocat LOCTYPE="URL" xlink:type="simple" xlink:href=path/>
          <mf:structMap TYPE="physical"><mf:div ID=… TYPE="repo">
            <mf:div ORDER="1" TYPE="file"><mf:fptr FILEID="f_000001"/>

    v2 deltas (the Mets2 analog): v2 namespace, no xlink namespace —
    FLocat carries ``LOCREF`` instead of ``xlink:type``/``xlink:href`` —
    fileGrp gains FILE-COUNT, and structMap sits inside ``mf:structSec``.
    """
    repo = model["repo"]
    files = model["files"]  # already path-sorted by build_manifest_model
    n = len(files)
    if version == 1:
        root = XmlEl(
            "mf:manifest",
            # xmlns first in fixed order, then the order table applies
            {"xmlns:mf": _NS_MF_V1, "xmlns:xlink": _NS_XLINK,
             "N-FILES": str(n), "OBJID": repo},
        )
    elif version == 2:
        root = XmlEl(
            "mf:manifest",
            {"xmlns:mf": _NS_MF_V2, "N-FILES": str(n), "OBJID": repo},
        )
    else:
        raise ValueError(f"unknown manifest version {version!r}")

    grp_attrs = {"ID": "files"}
    if version == 2:
        grp_attrs["FILE-COUNT"] = str(n)
    grp = root.child("mf:fileSec").child("mf:fileGrp", grp_attrs)
    for seq, (path, sha) in enumerate(files, start=1):
        if version == 1:
            f = grp.child(
                "mf:file",
                {"ID": f"f_{seq:06d}", "SEQ": str(seq),
                 "CHECKSUM": sha, "CHECKSUMTYPE": "SHA-256"},
            )
            f.child(
                "mf:FLocat",
                {"LOCTYPE": "URL", "xlink:type": "simple", "xlink:href": path},
            )
        else:
            f = grp.child(
                "mf:file",
                {"ID": f"f_{seq:06d}", "SEQ": str(seq),
                 "CHECKSUM": f"sha256:{sha}"},
            )
            f.child("mf:FLocat", {"LOCTYPE": "URL", "LOCREF": path})

    smap_parent = root if version == 1 else root.child("mf:structSec")
    top = smap_parent.child("mf:structMap", {"TYPE": "physical"}).child(
        "mf:div", {"ID": f"d_{repo}", "TYPE": "repo"}
    )
    for seq in range(1, n + 1):
        top.child("mf:div", {"ORDER": str(seq), "TYPE": "file"}).child(
            "mf:fptr", {"FILEID": f"f_{seq:06d}"}
        )
    return root


def serialize_manifest_xml(model: dict, version: int = 1) -> str:
    return serialize_xml_document(build_manifest_xml_tree(model, version))


def parse_manifest_xml(text: str) -> dict:
    """Round-trip parser: XML bytes (either version) -> the
    version-independent model. Used by tests to prove the serializations
    are lossless over the same model."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    ns1 = {"mf": _NS_MF_V1, "xlink": _NS_XLINK}
    ns2 = {"mf": _NS_MF_V2}
    ns = ns1 if root.tag == f"{{{_NS_MF_V1}}}manifest" else ns2
    version = 1 if ns is ns1 else 2
    repo = root.attrib["OBJID"]
    files = []
    for f in root.findall(".//mf:fileGrp/mf:file", ns):
        sha = f.attrib["CHECKSUM"]
        if version == 2:
            if not sha.startswith("sha256:"):
                raise ValueError(f"v2 checksum missing scheme prefix: {sha!r}")
            sha = sha[len("sha256:"):]
        loc = f.find("mf:FLocat", ns)
        path = (
            loc.attrib[f"{{{_NS_XLINK}}}href"] if version == 1 else loc.attrib["LOCREF"]
        )
        files.append((path, sha))
    n_declared = int(root.attrib["N-FILES"])
    if n_declared != len(files):
        raise ValueError(f"N-FILES={n_declared} but {len(files)} file entries")
    return {"repo": repo, "files": files}
