"""Real XSD-grammar validation (ray_cdc_lake/xsd.py).

Bar (mirroring the reference's MetsXsdValidationTest.kt): the grammar is
compiled from an ACTUAL .xsd document — the committed jhove.xsd fixture
or any user-supplied schema text; valid documents route 'ok'; sequence
order, occurrence bounds, exclusive choice, required attributes and
value facets are each enforced; unparseable XML routes 'malformed';
constructs outside the supported subset fail loudly at COMPILE time."""

from __future__ import annotations

import pytest

from ray_cdc_lake.xsd import XsdGrammarValidator, load_default_xsd, parse_xsd

VALID = (
    '<jhove><repInfo uri="docs/en/doc_000042.txt"><size>120</size>'
    "<format>TXT</format><status>Well-Formed and valid</status>"
    "<properties><width>800</width><height>600</height></properties>"
    "</repInfo></jhove>"
)


@pytest.fixture(scope="module")
def v():
    return XsdGrammarValidator(load_default_xsd())


def test_fixture_compiles_and_valid_doc_passes(v):
    assert v.grammar.root_name == "jhove"
    assert v.validate_one(VALID) == ("ok", [])


def test_malformed_and_wrong_root(v):
    route, errs = v.validate_one(VALID[:-10])
    assert route == "malformed" and "ParseError" in errs[0]
    route, errs = v.validate_one("<mets/>")
    assert route == "schema_invalid" and "root element" in errs[0]


def test_sequence_order_is_enforced(v):
    # all elements present, <format> moved after <status>: a presence
    # check passes, only the sequence grammar rejects
    doc = VALID.replace("<format>TXT</format>", "").replace(
        "</status>", "</status><format>TXT</format>"
    )
    route, errs = v.validate_one(doc)
    assert route == "schema_invalid"
    assert any("format" in e for e in errs)


def test_min_and_max_occurs(v):
    # missing required element
    doc = VALID.replace("<size>120</size>", "")
    route, errs = v.validate_one(doc)
    assert route == "schema_invalid" and any("missing required" in e for e in errs)
    # <status> duplicated beyond maxOccurs=1
    doc = VALID.replace(
        "</status>", "</status><status>Well-Formed and valid</status>"
    )
    assert v.validate_one(doc)[0] == "schema_invalid"
    # mix allows up to TWO occurrences; a third is rejected
    mix = "<mix><ImageWidth>1</ImageWidth><ImageHeight>2</ImageHeight></mix>"
    two = VALID.replace("</properties>", mix * 2 + "</properties>")
    three = VALID.replace("</properties>", mix * 3 + "</properties>")
    assert v.validate_one(two) == ("ok", [])
    route, errs = v.validate_one(three)
    assert route == "schema_invalid" and any("unexpected" in e for e in errs)


def test_choice_is_exclusive(v):
    one = VALID.replace(
        "</properties>", "<colorSpace>sRGB</colorSpace></properties>"
    )
    other = VALID.replace(
        "</properties>", "<grayScale>8</grayScale></properties>"
    )
    both = VALID.replace(
        "</properties>",
        "<colorSpace>sRGB</colorSpace><grayScale>8</grayScale></properties>",
    )
    assert v.validate_one(one) == ("ok", [])
    assert v.validate_one(other) == ("ok", [])
    route, errs = v.validate_one(both)
    assert route == "schema_invalid" and any("grayScale" in e for e in errs)


def test_attribute_and_value_facets(v):
    # required attribute missing
    doc = VALID.replace(' uri="docs/en/doc_000042.txt"', "")
    route, errs = v.validate_one(doc)
    assert route == "schema_invalid" and any("attribute 'uri'" in e for e in errs)
    # pattern facet on the attribute
    doc = VALID.replace("docs/en/", "DOCS/en/")
    assert "pattern" in v.validate_one(doc)[1][0]
    # enumeration on <format>
    doc = VALID.replace("<format>TXT</format>", "<format>BMP</format>")
    assert "enumeration" in v.validate_one(doc)[1][0]
    # integer type + maxInclusive on <width>
    doc = VALID.replace("<width>800</width>", "<width>NaN</width>")
    assert "not an integer" in v.validate_one(doc)[1][0]
    doc = VALID.replace("<width>800</width>", "<width>999999</width>")
    assert "maxInclusive" in v.validate_one(doc)[1][0]
    doc = VALID.replace("<size>120</size>", "<size>-1</size>")
    assert "minInclusive" in v.validate_one(doc)[1][0]


def test_user_supplied_schema_text():
    """The 'point the validator at your OWN xsd' case the hand-declared
    registry could not serve: an unrelated grammar with an unbounded
    repeat and a nested choice."""
    xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:element name="log">
        <xs:complexType>
          <xs:sequence>
            <xs:choice minOccurs="1" maxOccurs="unbounded">
              <xs:element name="info" type="xs:string"/>
              <xs:element name="error">
                <xs:complexType>
                  <xs:sequence>
                    <xs:element name="code" type="xs:int"/>
                  </xs:sequence>
                  <xs:attribute name="fatal" use="required"/>
                </xs:complexType>
              </xs:element>
            </xs:choice>
          </xs:sequence>
        </xs:complexType>
      </xs:element>
    </xs:schema>"""
    v = XsdGrammarValidator(xsd)
    ok = (
        "<log><info>a</info><error fatal='no'><code>7</code></error>"
        "<info>b</info></log>"
    )
    assert v.validate_one(ok) == ("ok", [])
    assert v.validate_one("<log/>")[0] == "schema_invalid"  # minOccurs 1
    bad = "<log><error><code>7</code></error></log>"  # missing attribute
    route, errs = v.validate_one(bad)
    assert route == "schema_invalid" and any("fatal" in e for e in errs)
    bad2 = "<log><warn>x</warn></log>"  # element outside the choice
    assert v.validate_one(bad2)[0] == "schema_invalid"


def test_unsupported_constructs_fail_at_compile_time():
    with pytest.raises(ValueError, match="not an XSD"):
        parse_xsd("<foo/>")
    with pytest.raises(ValueError, match="top-level"):
        parse_xsd('<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema"/>')
    with pytest.raises(ValueError, match="unsupported"):
        parse_xsd("""<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
          <xs:element name="a">
            <xs:complexType><xs:all>
              <xs:element name="b" type="xs:string"/>
            </xs:all></xs:complexType>
          </xs:element>
        </xs:schema>""")


def test_query_matches_duckdb_oracle():
    """Driver-shaped check for doc_xsd_validate at sf0.001."""
    import duckdb

    from ray_cdc_lake.queries import DOC_SQL, q_doc_xsd_validate

    sf = "/root/testdata/sf0.001"
    got = (
        q_doc_xsd_validate(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.execute(DOC_SQL["doc_xsd_validate"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["xsd_route"]) == list(want["xsd_route"])
    assert list(got["xsd_valid"]) == list(want["xsd_valid"])


def test_choice_backtracks_over_partially_matching_branches():
    """choice(seq(A,B), seq(A,C)) against [A, C]: the first branch
    partially matches (consumes A, fails on B) — the matcher must back
    out and accept the clean second branch, not commit the failure."""
    xsd = """<xs:schema xmlns:xs="http://www.w3.org/2001/XMLSchema">
      <xs:element name="root">
        <xs:complexType>
          <xs:choice>
            <xs:sequence>
              <xs:element name="A" type="xs:string"/>
              <xs:element name="B" type="xs:string"/>
            </xs:sequence>
            <xs:sequence>
              <xs:element name="A" type="xs:string"/>
              <xs:element name="C" type="xs:string"/>
            </xs:sequence>
          </xs:choice>
        </xs:complexType>
      </xs:element>
    </xs:schema>"""
    v = XsdGrammarValidator(xsd)
    assert v.validate_one("<root><A>x</A><C>y</C></root>") == ("ok", [])
    assert v.validate_one("<root><A>x</A><B>y</B></root>") == ("ok", [])
    # neither branch: invalid, and the deepest branch's error surfaces
    route, errs = v.validate_one("<root><A>x</A><D>y</D></root>")
    assert route == "schema_invalid"


def test_nb_train_rejects_null_labels():
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ray_cdc_lake.classify import nb_train

    ds = rd.from_arrow(pa.table({
        "lang": pa.array(["en", None, "de"]),
        "text": pa.array(["a b", "c", "d e"]),
    }))
    with pytest.raises(Exception, match="null"):
        nb_train(ds, "lang")
