"""Byte-layout contract tests for the dual-version manifest serializers.

Reference analog: CreateMetsBrowsingTest.kt golden-file comparisons — the
serializer output is compared as a FULL string, so attribute order,
indentation, declaration quoting and trailing whitespace are all pinned
(MetsBrowsingSerializer.kt:280-412, Mets2BrowsingSerializer.kt:8-19).
"""

import pytest

from ray_cdc_lake.manifests import (
    MANIFEST_VERSIONS,
    XmlEl,
    build_manifest_model,
    build_manifest_xml_tree,
    parse_manifest_xml,
    serialize_manifest,
    serialize_manifest_xml,
    serialize_xml_document,
    xml_attr_escape,
)

MODEL = build_manifest_model(
    "repo-a",
    ["b/img_2.jxl", "a.txt"],
    ["c" * 64, "b" * 64],
)

GOLDEN_V1 = """<?xml version='1.0' encoding='UTF-8'?>
<mf:manifest xmlns:mf="urn:ray-cdc-lake:manifest:v1" xmlns:xlink="http://www.w3.org/1999/xlink" OBJID="repo-a" N-FILES="2">
  <mf:fileSec>
    <mf:fileGrp ID="files">
      <mf:file ID="f_000001" SEQ="1" CHECKSUM="{b}" CHECKSUMTYPE="SHA-256">
        <mf:FLocat LOCTYPE="URL" xlink:type="simple" xlink:href="a.txt"/>
      </mf:file>
      <mf:file ID="f_000002" SEQ="2" CHECKSUM="{c}" CHECKSUMTYPE="SHA-256">
        <mf:FLocat LOCTYPE="URL" xlink:type="simple" xlink:href="b/img_2.jxl"/>
      </mf:file>
    </mf:fileGrp>
  </mf:fileSec>
  <mf:structMap TYPE="physical">
    <mf:div ID="d_repo-a" TYPE="repo">
      <mf:div ORDER="1" TYPE="file">
        <mf:fptr FILEID="f_000001"/>
      </mf:div>
      <mf:div ORDER="2" TYPE="file">
        <mf:fptr FILEID="f_000002"/>
      </mf:div>
    </mf:div>
  </mf:structMap>
</mf:manifest>""".format(b="b" * 64, c="c" * 64)


def test_xml_v1_golden_full_string():
    assert serialize_manifest_xml(MODEL, version=1) == GOLDEN_V1


def test_xml_no_trailing_newline_and_declaration_quoting():
    for v in MANIFEST_VERSIONS:
        doc = serialize_manifest_xml(MODEL, version=v)
        assert not doc.endswith("\n")
        assert doc.startswith("<?xml version='1.0' encoding='UTF-8'?>\n")


def test_xml_v2_deltas():
    doc = serialize_manifest_xml(MODEL, version=2)
    assert 'xmlns:mf="urn:ray-cdc-lake:manifest:v2"' in doc
    assert "xlink" not in doc  # LOCREF replaces xlink:href; namespace dropped
    assert 'LOCREF="a.txt"' in doc
    assert 'CHECKSUM="sha256:' in doc and "CHECKSUMTYPE" not in doc
    assert "<mf:structSec>" in doc  # structMap nests inside structSec
    assert 'FILE-COUNT="2"' in doc


def test_attribute_insertion_order_is_irrelevant():
    # same attrs inserted in reverse must serialize identically
    a = XmlEl("mf:file", {"CHECKSUMTYPE": "SHA-256", "CHECKSUM": "x",
                          "SEQ": "1", "ID": "f_000001"})
    b = XmlEl("mf:file", {"ID": "f_000001", "SEQ": "1",
                          "CHECKSUM": "x", "CHECKSUMTYPE": "SHA-256"})
    assert serialize_xml_document(a) == serialize_xml_document(b)
    assert 'ID="f_000001" SEQ="1" CHECKSUM="x" CHECKSUMTYPE="SHA-256"' in (
        serialize_xml_document(a)
    )


def test_div_attr_order_id_before_type_and_unlisted_alphabetical():
    d = XmlEl("mf:div", {"TYPE": "repo", "ID": "d1", "ZZZ": "1", "AAA": "2"})
    doc = serialize_xml_document(d)
    assert '<mf:div ID="d1" TYPE="repo" AAA="2" ZZZ="1"/>' in doc


def test_text_only_element_inlined_and_empty_self_closed():
    el = XmlEl("mf:outer")
    el.child("mf:name", text="hello")
    el.child("mf:empty")
    doc = serialize_xml_document(el)
    assert "  <mf:name>hello</mf:name>\n" in doc
    assert "  <mf:empty/>" in doc


def test_escape_chain_matches_sql_oracle_order():
    # '&' must be escaped FIRST or the other entities double-escape
    assert xml_attr_escape('&<>"') == "&amp;&lt;&gt;&quot;"
    assert xml_attr_escape("&amp;") == "&amp;amp;"


def test_roundtrip_both_versions_including_escapables():
    model = build_manifest_model(
        "repo&<b>", ['pa"th&1.txt', "z.txt"], ["a" * 64, "d" * 64]
    )
    for v in MANIFEST_VERSIONS:
        doc = serialize_manifest_xml(model, version=v)
        assert parse_manifest_xml(doc) == model


def test_roundtrip_empty_manifest():
    model = build_manifest_model("empty-repo", [], [])
    for v in MANIFEST_VERSIONS:
        assert parse_manifest_xml(serialize_manifest_xml(model, version=v)) == model


def test_json_and_xml_share_one_model():
    # one build, every serialization (CreateMetsBrowsing emits from the
    # same Mets model regardless of pinned version)
    for v in MANIFEST_VERSIONS:
        j = serialize_manifest(MODEL, version=v)
        x = serialize_manifest_xml(MODEL, version=v)
        assert "a.txt" in j and "a.txt" in x


def test_unknown_version_rejected():
    with pytest.raises(ValueError):
        serialize_manifest_xml(MODEL, version=3)
    with pytest.raises(ValueError):
        serialize_manifest(MODEL, version=0)


def test_parse_rejects_nfiles_mismatch():
    doc = serialize_manifest_xml(MODEL, version=1).replace('N-FILES="2"', 'N-FILES="3"')
    with pytest.raises(ValueError):
        parse_manifest_xml(doc)
