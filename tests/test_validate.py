"""Validation stages: structural XML-schema validation (XsdValidator
analog) and poison-row quarantine in the metadata extractor.

Reference test analog: MetsXsdValidationTest / MixXsdValidationTest /
JhoveXsdValidationTest (SURVEY.md §5 item 7) — valid documents pass,
deliberately-broken documents produce errors instead of crashes.
"""

from __future__ import annotations

import pyarrow as pa

from ray_cdc_lake.validate import (
    XmlMetadataExtractor,
    XmlSchemaValidator,
    build_jhove_xml,
)

VALID = (
    '<jhove><repInfo uri="docs/en/doc_000001.txt"><size>120</size>'
    "<format>TXT</format><status>Well-Formed and valid</status>"
    "<properties><width>800</width><height>600</height></properties>"
    "</repInfo></jhove>"
)


def _v() -> XmlSchemaValidator:
    return XmlSchemaValidator()


def test_valid_document_routes_ok():
    route, errors = _v().validate_one(VALID)
    assert route == "ok" and errors == []


def test_unparseable_routes_malformed_not_raises():
    route, errors = _v().validate_one(VALID[:-10])
    assert route == "malformed"
    assert len(errors) == 1 and "ParseError" in errors[0]


def test_wrong_root_is_schema_invalid():
    route, errors = _v().validate_one("<mets><x/></mets>")
    assert route == "schema_invalid"
    assert "root element" in errors[0]


def test_missing_required_element():
    broken = VALID.replace("<size>120</size>", "")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("missing required element <repInfo/size>" in e for e in errors)


def test_missing_required_attribute():
    broken = VALID.replace(' uri="docs/en/doc_000001.txt"', "")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("missing attribute 'uri'" in e for e in errors)


def test_type_violation():
    broken = VALID.replace("<width>800</width>", "<width>NaN</width>")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("not an integer" in e for e in errors)


def test_enum_violation():
    broken = VALID.replace("Well-Formed and valid", "mysterious")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("repInfo/status" in e for e in errors)


def test_range_facet_violation():
    """A structurally-perfect document whose width is a valid integer but
    exceeds the xs:maxInclusive facet — only value-level facet checking
    catches it (the reference's real-XSD behavior, XsdValidator.kt:225-273)."""
    broken = VALID.replace("<width>800</width>", "<width>999999</width>")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("> max 9999" in e for e in errors)


def test_min_facet_violation():
    broken = VALID.replace("<height>600</height>", "<height>0</height>")
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("< min 1" in e for e in errors)


def test_attr_pattern_facet_violation():
    broken = VALID.replace('uri="docs/', 'uri="DOCS/')
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("violates pattern facet" in e for e in errors)


def test_pattern_facet_is_anchored():
    # a uri that CONTAINS a match but has trailing junk must still fail
    broken = VALID.replace(
        'uri="docs/en/doc_000001.txt"', 'uri="docs/en/doc_000001.txt.bak"'
    )
    route, errors = _v().validate_one(broken)
    assert route == "schema_invalid"
    assert any("pattern facet" in e for e in errors)


def test_embedded_mix_range_facet():
    bad = VALID.replace(
        "</properties>",
        "<mix><ImageWidth>0</ImageWidth><ImageHeight>2</ImageHeight></mix>"
        "</properties>",
    )
    route, errors = _v().validate_one(bad)
    assert route == "schema_invalid"
    assert any("embedded[0]" in e and "< min 1" in e for e in errors)


def test_embedded_mix_validated_separately():
    # the XsdValidator.kt:225-273 analog: MIX blocks get their own schema
    ok = VALID.replace(
        "</properties>",
        "<mix><ImageWidth>1</ImageWidth><ImageHeight>2</ImageHeight></mix>"
        "</properties>",
    )
    assert _v().validate_one(ok)[0] == "ok"
    bad = VALID.replace(
        "</properties>", "<mix><ImageWidth>1</ImageWidth></mix></properties>"
    )
    route, errors = _v().validate_one(bad)
    assert route == "schema_invalid"
    assert any("embedded[0]" in e and "ImageHeight" in e for e in errors)


def test_batch_surface_routes_all_rows():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "jhove_xml": pa.array(
                [VALID, VALID[:-10], VALID.replace("<size>120</size>", "")]
            ),
        }
    )
    out = XmlSchemaValidator()(t)
    assert out["xsd_route"].to_pylist() == ["ok", "malformed", "schema_invalid"]
    assert out["xsd_valid"].to_pylist() == [True, False, False]
    assert out["xsd_n_errors"].to_pylist() == [0, 1, 1]
    assert out.num_rows == 3  # no rows lost, no exception


def test_extractor_quarantines_poison_rows():
    """One malformed XML row must not kill the task (the quarantine rule
    the round-1 verdict flagged at validate.py:149-155)."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "lang": pa.array(["en", "en"]),
            "n_chars": pa.array([100, 100], type=pa.int64()),
        }
    )
    withxml = build_jhove_xml(t)
    # poison row 1: truncate its XML
    xmls = withxml["jhove_xml"].to_pylist()
    xmls[1] = xmls[1][:-7]
    poisoned = withxml.set_column(
        withxml.schema.get_field_index("jhove_xml"),
        "jhove_xml",
        pa.array(xmls, type=pa.string()),
    )
    out = XmlMetadataExtractor()(poisoned)
    assert out.num_rows == 2
    assert out["xml_valid"].to_pylist() == [True, False]
    assert out["xml_error"].to_pylist()[0] is None
    assert "ParseError" in out["xml_error"].to_pylist()[1]
    assert out["xml_size"].to_pylist()[1] is None


def test_format_dispatch_validator_routes_by_module():
    """FILE_TYPE_MODULE_MAP analog (Jhove.kt:95-105): the extension picks
    the module, each module applies its own rule, unmapped types route to
    'No module for type', control chars are 'Not well-formed' anywhere."""
    from ray_cdc_lake.validate import (
        STATUS_NO_MODULE,
        STATUS_NOT_VALID,
        STATUS_NOT_WF,
        STATUS_VALID,
        FormatDispatchValidator,
    )

    t = pa.table(
        {
            "path": pa.array(
                [
                    "a/page.tif",      # TIFF-hul, long enough -> valid
                    "a/page.TIF",      # case-insensitive dispatch
                    "a/tiny.tif",      # TIFF-hul, too short -> not valid
                    "a/img.jp2",       # JPEG2000-hul, short -> not valid
                    "a/doc.txt",       # unmapped -> no module
                    "a/noext",         # extension-less -> no module
                    "a/bad.xml",       # control char -> not well-formed
                ]
            ),
            "text": pa.array(
                ["x" * 300, "x" * 300, "x" * 10, "x" * 300, "x" * 300,
                 "x" * 300, "ok\x07ok"]
            ),
        }
    )
    out = FormatDispatchValidator()(t)
    assert out["module"].to_pylist() == [
        "TIFF-hul", "TIFF-hul", "TIFF-hul", "JPEG2000-hul", None, None,
        "XML-hul",
    ]
    assert out["status"].to_pylist() == [
        STATUS_VALID, STATUS_VALID, STATUS_NOT_VALID, STATUS_NOT_VALID,
        STATUS_NO_MODULE, STATUS_NO_MODULE, STATUS_NOT_WF,
    ]
    assert out["is_valid"].to_pylist() == [
        True, True, False, False, False, False, False,
    ]


def test_format_dispatch_override_replaces_defaults():
    """The dynamic-property rule (Jhove.kt:38-43): a caller-supplied
    registry is used INSTEAD of the defaults, not merged with them."""
    from ray_cdc_lake.validate import (
        STATUS_NO_MODULE,
        STATUS_VALID,
        FormatDispatchValidator,
    )

    v = FormatDispatchValidator(modules={"txt": ("TXT-hul", 1)})
    t = pa.table(
        {
            "path": pa.array(["a/x.txt", "a/y.tif"]),
            "text": pa.array(["hello", "x" * 999]),
        }
    )
    out = v(t)
    # txt now maps; tif (a DEFAULT) no longer does — not merged
    assert out["module"].to_pylist() == ["TXT-hul", None]
    assert out["status"].to_pylist() == [STATUS_VALID, STATUS_NO_MODULE]


def test_normalize_sha_unicode_edges_match_duckdb():
    """normalize_content + add_sha256 must stay byte-identical to the
    SQL oracle expression sha256(nfc_normalize(crlf-fix)) on unicode
    edge cases: decomposed combining sequences, CR/CRLF/lone-CR mixes,
    astral-plane emoji, BOM, NBSP, and pure-ASCII fast paths."""
    import duckdb
    import pyarrow as pa

    from ray_cdc_lake.transforms import add_sha256, normalize_content

    texts = [
        "plain ascii only",
        "café composed",             # é precomposed (NFC already)
        "caf\u0065\u0301 decomposed",          # e + combining acute -> NFC composes
        "mixed\r\nline\rendings\n",
        "\r\r\n\r",                       # pathological CR runs
        "emoji \U0001F600 astral",
        "﻿BOM prefix",
        "nbsp and ls ps",
        "Å ring A",            # A + combining ring -> Å
        "ﬁ ligature fi",             # NFC keeps the ligature
        "",
    ]
    batch = pa.table({"content": pa.array(texts, type=pa.string())})
    out = add_sha256(normalize_content(batch))
    got = out["content_sha256"].to_pylist()

    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT sha256(nfc_normalize(replace(replace(?, chr(13)||chr(10),"
            " chr(10)), chr(13), chr(10))))", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want
