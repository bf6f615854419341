"""S2/S3 Excel ingestion via the stdlib xlsx parser (sources/readers.py).

The fixture writes a REAL xlsx (zip of SpreadsheetML parts) exercising
shared strings, rich-text runs, inline strings, booleans, numerics,
sparse rows placed by A1 refs, and a second empty sheet — the features
real exports use — then reads it back through the public API.
Reference analog: /root/reference/src/lambda/s3_event_trigger.py:151-175.
"""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import types as T

from e_commerce_lakehouse_spark.sources.readers import (
    SchemaContractError,
    read_excel,
    read_with_fallback,
    read_xlsx_stdlib,
)

SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.IntegerType()),
        T.StructField("customer", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("rush", T.BooleanType()),
    ]
)

_CT = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="orders" sheetId="1" r:id="rId1"/>
  <sheet name="empty" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
 <Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

# 0: plain shared string; 1: rich-text runs ("Ada" + " Lovelace")
_SHARED = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
 <si><t>acme corp</t></si>
 <si><r><t>Ada</t></r><r><t> Lovelace</t></r></si>
</sst>"""

# header row; row2 shared-string; row3 rich-text + sparse (amount C missing);
# row4 inline string + boolean false
_SHEET1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="inlineStr"><is><t>order_id</t></is></c>
   <c r="B1" t="inlineStr"><is><t>customer</t></is></c>
   <c r="C1" t="inlineStr"><is><t>amount</t></is></c>
   <c r="D1" t="inlineStr"><is><t>rush</t></is></c>
  </row>
  <row r="2">
   <c r="A2"><v>1001</v></c>
   <c r="B2" t="s"><v>0</v></c>
   <c r="C2"><v>99.5</v></c>
   <c r="D2" t="b"><v>1</v></c>
  </row>
  <row r="3">
   <c r="A3"><v>1002</v></c>
   <c r="B3" t="s"><v>1</v></c>
   <c r="D3" t="b"><v>0</v></c>
  </row>
  <row r="4">
   <c r="A4"><v>1003</v></c>
   <c r="B4" t="inlineStr"><is><t>walk-in</t></is></c>
   <c r="C4"><v>12</v></c>
  </row>
 </sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData/>
</worksheet>"""


def write_xlsx(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)


@pytest.fixture()
def xlsx_path(tmp_path):
    p = str(tmp_path / "orders.xlsx")
    write_xlsx(p)
    return p


def test_stdlib_parser_values(xlsx_path):
    sheets = read_xlsx_stdlib(xlsx_path)
    assert set(sheets) == {"orders"}  # empty sheet skipped
    header, rows = sheets["orders"]
    assert header == ["order_id", "customer", "amount", "rush"]
    assert rows[0] == [1001, "acme corp", 99.5, True]
    assert rows[1] == [1002, "Ada Lovelace", None, False]  # sparse C3
    assert rows[2] == [1003, "walk-in", 12, None]


def test_read_excel_typed_dataframes(spark, xlsx_path):
    out = read_excel(spark, xlsx_path, SCHEMA)
    assert [name for name, _ in out] == ["orders"]
    df = out[0][1]
    assert df.schema == SCHEMA
    rows = {r["order_id"]: r for r in df.collect()}
    assert rows[1001]["customer"] == "acme corp"
    assert rows[1001]["amount"] == 99.5
    assert rows[1001]["rush"] is True
    assert rows[1002]["amount"] is None
    assert rows[1003]["rush"] is None


def test_read_excel_header_contract(spark, tmp_path):
    p = str(tmp_path / "orders.xlsx")
    write_xlsx(p)
    bad = T.StructType(SCHEMA.fields + [T.StructField("missing_col", T.StringType())])
    with pytest.raises(SchemaContractError):
        read_excel(spark, p, bad)


def test_fallback_mislabeled_csv(spark, tmp_path):
    p = tmp_path / "actually.csv.xlsx"
    p.write_text("order_id,customer,amount,rush\n7,zed,1.5,true\n")
    df = read_with_fallback(spark, str(p), SCHEMA)
    row = df.collect()[0]
    assert (row["order_id"], row["customer"]) == (7, "zed")


def test_read_jsonl_good_and_corrupt(spark, tmp_path):
    from e_commerce_lakehouse_spark.sources.readers import read_jsonl

    p = tmp_path / "turns.jsonl"
    p.write_text(
        '{"order_id": 1, "customer": "acme corp", "amount": 9.5, "rush": true}\n'
        'NOT JSON AT ALL\n'
        '{"order_id": 2, "customer": "zed", "amount": 1.25, "rush": false}\n'
    )
    good, corrupt = read_jsonl(spark, str(p), SCHEMA)
    rows = {r["order_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["customer"] == "acme corp" and rows[1]["rush"] is True
    bad = corrupt.collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0]["raw_line"]


def test_read_excel_unknown_sheet_raises(spark, xlsx_path):
    with pytest.raises(ValueError, match="no sheet named"):
        read_excel(spark, xlsx_path, SCHEMA, sheet_name="Orders")  # case-sensitive
